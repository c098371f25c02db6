"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a corpus entry's Spark DataFrame and its oracle SQL over the same
parquet tables, then compares row count, column names, and an
order-insensitive canonical value hash.  Used by tests/test_corpus.py so
that correctness failures surface locally before the driver's per-round
check does.
"""

from __future__ import annotations

import hashlib
import math
import os
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from tsdb_parquet_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        # partial table sets are legal (e.g. the synthetic sf1 probe dir
        # ships only documents/embeddings/events); DuckDB binds the view
        # at creation, so skip absent files — a query touching a skipped
        # table fails with a clear missing-view error instead
        if not os.path.exists(path):
            continue
        # Spark writes a DIRECTORY of part files; read_parquet takes a glob
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{src}')"
        )
    return con


def _canon(value) -> str:
    """Canonical string for one cell, tolerant of engine-level type skew
    (int vs float, Decimal, numpy scalars, lists)."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if value == int(value) and abs(value) < 1e15:
            return str(int(value))
        return f"{value:.10g}"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(_canon(v) for v in value) + "]"
    if isinstance(value, bytes):
        return value.hex()
    if hasattr(value, "item"):  # numpy scalar
        return _canon(value.item())
    return str(value)


def canonical_rows(rows, col_names) -> list[str]:
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    return sorted("|".join(_canon(row[i]) for i in order) for row in rows)


def value_hash(rows, col_names) -> str:
    digest = hashlib.sha256()
    for line in canonical_rows(rows, col_names):
        digest.update(line.encode())
        digest.update(b"\n")
    return digest.hexdigest()


_INTEGRAL_SPARK_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def dtype_skews(df: DataFrame, oracle_arrow) -> list[str]:
    """Detect cross-engine dtype skew the tolerant value canon hides.

    The driver's strict hasher fetches the DuckDB result through Arrow,
    where DuckDB's HUGEINT (the result type of integer ``sum``) and
    DECIMAL degrade to non-integer Arrow types — so a Spark bigint column
    hashed against it mismatches (``0`` vs ``0.0``) even when every value
    is identical.  This shipped twice (round-1 q29/q31/q39, round-2 q46)
    because :func:`_canon` deliberately canonicalizes ``124750.0 ==
    124750``.  Flag any oracle column whose Arrow type is not integer
    while the Spark schema says integer: the oracle SQL needs an explicit
    ``CAST(... AS BIGINT)``.  (Nullable BIGINT survives Arrow as int64,
    so plain lag()/outer-join NULLs do not false-positive here.)
    """
    import pyarrow.types as pat

    spark_types = {f.name: f.dataType for f in df.schema.fields}
    skews = []
    for field in oracle_arrow.schema:
        stype = spark_types.get(field.name)
        if not isinstance(stype, _INTEGRAL_SPARK_TYPES):
            continue
        if not pat.is_integer(field.type):
            skews.append(
                f"{field.name}: spark={stype.simpleString()} "
                f"oracle-arrow={field.type} "
                "(CAST the oracle expression AS BIGINT)"
            )
    return skews


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    oracle_rows: int
    columns_match: bool
    hash_match: bool
    spark_cols: tuple
    oracle_cols: tuple
    sample_diff: str = ""
    dtype_skew: tuple = ()

    @property
    def ok(self) -> bool:
        return (
            self.spark_rows == self.oracle_rows
            and self.columns_match
            and self.hash_match
            and not self.dtype_skew
        )


def compare(
    name: str, df: DataFrame, oracle_sql: str, sf_dir: str
) -> CompareResult:
    spark_rows = df.collect()
    spark_cols = tuple(df.columns)
    con = duckdb_connection(sf_dir)
    cur = con.execute(oracle_sql)
    oracle_cols = tuple(d[0] for d in cur.description)
    oracle_rows = cur.fetchall()
    # Second fetch through Arrow: the dtype-strict gate mirrors the
    # driver's Arrow-side view of the same result (see dtype_skews).
    oracle_arrow = con.execute(oracle_sql).fetch_arrow_table()
    skews = tuple(dtype_skews(df, oracle_arrow))
    con.close()

    columns_match = sorted(spark_cols) == sorted(oracle_cols)
    s_canon = canonical_rows(spark_rows, spark_cols)
    o_canon = canonical_rows(oracle_rows, oracle_cols)
    hash_match = s_canon == o_canon

    sample_diff = ""
    if not hash_match:
        s_only = [r for r in s_canon if r not in set(o_canon)][:3]
        o_only = [r for r in o_canon if r not in set(s_canon)][:3]
        sample_diff = f"spark-only={s_only} oracle-only={o_only}"

    return CompareResult(
        name=name,
        spark_rows=len(spark_rows),
        oracle_rows=len(oracle_rows),
        columns_match=columns_match,
        hash_match=hash_match,
        spark_cols=spark_cols,
        oracle_cols=oracle_cols,
        sample_diff=sample_diff,
        dtype_skew=skews,
    )


def check_corpus(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[CompareResult]:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = []
    for name, fn in qs.items():
        if names and name not in names:
            continue
        if name not in oracles:
            continue  # rows-only entries are checked by the driver directly
        results.append(compare(name, fn(spark, sf_dir), oracles[name], sf_dir))
    return results
