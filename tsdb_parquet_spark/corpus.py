"""Declared query corpus (SURVEY.md §2.5) — Spark implementation + DuckDB
oracle SQL, side by side.

Every entry here surfaces through ``__spark_entry__.queries()`` /
``oracle_sql()`` and is hash-compared by the driver at sf0.01.  Conventions
that keep the hashes stable across engines:

- every computed/aggregate column is aliased identically on both sides;
- timestamps are projected as int64 epoch-ms (`unix_millis` / `epoch_ms`) —
  the reference's native representation (`schema/chunk.go:31-34`);
- order-of-accumulation-sensitive float aggregates are rounded to a fixed
  number of decimals on both sides;
- every result has an explicit ORDER BY on a key prefix.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsdb_parquet_spark.catalog import Catalog
from tsdb_parquet_spark.operators import (
    conjunction,
    distinct_rows,
    equals,
    gte,
    lte,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

#: registry filled by the @query decorator: name -> (spark_fn, oracle_sql|None)
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def query(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def _cat(spark: SparkSession, sf_dir: str) -> Catalog:
    return Catalog(spark, sf_dir)


# ---------------------------------------------------------------------------
# Q01-Q15 — reference-parity relational corpus (SURVEY.md §2.5)
# ---------------------------------------------------------------------------


@query(
    "q01_scan_project",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
       ORDER BY l_orderkey, l_linenumber LIMIT 1000""",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+P1: scan + column projection (`compute/projection.go:20-71`)."""
    li = _cat(spark, sf_dir)["lineitem"]
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1000)
    )


@query(
    "q02_eq_filter",
    """SELECT l_orderkey, l_linenumber FROM lineitem
       WHERE l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber""",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: equality predicate (`dataset/predicate.go:62-79`) — pushed to
    the Parquet scan (bloom/dictionary pruning happens in the reader)."""
    li = _cat(spark, sf_dir)["lineitem"]
    return (
        li.filter(equals("l_returnflag", "R"))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q03_range_filter",
    """SELECT l_orderkey, l_linenumber, epoch_ms(l_shipdate) AS l_shipdate_ms
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate <= TIMESTAMP '1996-12-31'
       ORDER BY l_orderkey, l_linenumber""",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3+P4: >= and <= range predicates (`dataset/predicate.go:81-113`);
    zone-map (column-index) pruning path."""
    li = _cat(spark, sf_dir)["lineitem"]
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1996-12-31").cast("timestamp_ntz")
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") <= hi))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.unix_millis(F.col("l_shipdate").cast("timestamp")).alias(
                "l_shipdate_ms"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q04_conjunction",
    """SELECT l_orderkey, l_linenumber FROM lineitem
       WHERE l_returnflag = 'R' AND l_linestatus = 'F' AND l_quantity >= 25
       ORDER BY l_orderkey, l_linenumber""",
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: AND-conjunction of predicates (`dataset/predicate.go:14-42`)."""
    li = _cat(spark, sf_dir)["lineitem"]
    pred = conjunction(
        [
            equals("l_returnflag", "R"),
            equals("l_linestatus", "F"),
            gte("l_quantity", 25),
        ]
    )
    return (
        li.filter(pred)
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q05_distinct",
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
       ORDER BY l_returnflag, l_linestatus""",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: distinct (`compute/distinct.go:16-69`) — map-side partial
    dedup, then one shuffle on the tiny key space."""
    li = _cat(spark, sf_dir)["lineitem"]
    return distinct_rows(li, ["l_returnflag", "l_linestatus"]).orderBy(
        "l_returnflag", "l_linestatus"
    )


@query(
    "q06_first_per_key",
    """SELECT o_custkey, min(o_orderkey) AS first_order FROM orders
       GROUP BY o_custkey ORDER BY o_custkey""",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 deterministic-first-row semantics: smallest order key per
    customer (the reference gets determinism from file sort order,
    `prometheus/querier_test.go:45-49`; we aggregate)."""
    orders = _cat(spark, sf_dir)["orders"]
    return (
        orders.groupBy("o_custkey")
        .agg(F.min("o_orderkey").alias("first_order"))
        .orderBy("o_custkey")
    )


@query(
    "q07_groupby_agg",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_price,
              count(*) AS cnt
       FROM lineitem GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: group-by aggregation (TPC-H Q1 core).  The reference delegates
    all aggregation to an external engine (`prometheus/promql_test.go:28-44`);
    here it is a native hash aggregate with map-side partials."""
    li = _cat(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q08_time_containment",
    """SELECT count(*) AS n FROM events
       WHERE epoch_ns(ts) >= (SELECT min(epoch_ns(ts)) FROM events)
         AND epoch_ns(ts) <= (SELECT (min(epoch_ns(ts)) +
              (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 2) FROM events)""",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range containment semantics of the querier
    (`prometheus/querier.go:67-70`: fully-contained, inclusive bounds).
    `ts` is int64 nanoseconds on the Spark side (nanosAsLong)."""
    cat = _cat(spark, sf_dir)
    cat.register_views()
    return cat.spark.sql(
        """SELECT count(*) AS n FROM events
           WHERE ts >= (SELECT min(ts) FROM events)
             AND ts <= (SELECT min(ts) + CAST((max(ts) - min(ts)) / 2 AS BIGINT)
                        FROM events)"""
    )


@query(
    "q09_label_values",
    "SELECT DISTINCT event_type FROM events ORDER BY event_type",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LabelValues over the stream table — the API the reference declares
    but panics on (`prometheus/querier.go:93-101`)."""
    ev = _cat(spark, sf_dir)["events"]
    return distinct_rows(ev, ["event_type"]).orderBy("event_type")


@query(
    "q10_write_compact_roundtrip",
    """SELECT count(*) AS n, min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
              round(sum(l_quantity), 2) AS sum_qty
       FROM lineitem""",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+S6: sorted-part write + compaction round-trip (`db/writer.go:
    169-216`, `97-159`).  Our engine re-writes lineitem through the layout
    contract (sorted parts -> compact) and aggregates its OWN copy; the
    oracle aggregates the original — a hash match proves losslessness."""
    import tempfile

    from tsdb_parquet_spark.sources.writer import (
        SortedParquetWriter,
        WriterOptions,
    )

    cat = _cat(spark, sf_dir)
    li = cat["lineitem"]
    opts = WriterOptions(
        sort_columns=["l_returnflag", "l_shipdate", "l_orderkey", "l_linenumber"],
        bloom_columns=["l_returnflag", "l_linestatus"],
        max_files=32,
    )
    work = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".work")
    os.makedirs(work, exist_ok=True)
    root = tempfile.mkdtemp(prefix="q10_roundtrip_", dir=work)
    writer = SortedParquetWriter(spark, root, opts)
    # two parts exercises the multi-part merge path of Compact()
    writer.write(li.filter(F.col("l_orderkey") % 2 == 0))
    writer.write(li.filter(F.col("l_orderkey") % 2 == 1))
    compact_dir = writer.compact()
    back = spark.read.parquet(compact_dir)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "q11_predicate_order",
    """SELECT count(*) AS n FROM lineitem
       WHERE l_quantity >= 30 AND l_returnflag = 'A'""",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: predicate-order irrelevance (`compute/scan.go:60`) — written in
    the opposite order from the oracle on purpose."""
    li = _cat(spark, sf_dir)["lineitem"]
    return li.filter(equals("l_returnflag", "A") & gte("l_quantity", 30)).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "q12_dict_equality",
    "SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'F'",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: equality on a low-cardinality dictionary column
    (`dataset/row_filter.go:77-151` path — dictionary filtering inside the
    vectorized reader)."""
    orders = _cat(spark, sf_dir)["orders"]
    return orders.filter(equals("o_orderstatus", "F")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "q13_zonemap_range",
    """SELECT count(*) AS n FROM orders
       WHERE o_orderkey >= 1000 AND o_orderkey <= 5000""",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: range on a sorted-ish numeric column — page min/max pruning
    (`dataset/row_selector.go:45-73`)."""
    orders = _cat(spark, sf_dir)["orders"]
    return orders.filter(gte("o_orderkey", 1000) & lte("o_orderkey", 5000)).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "q14_multi_projection",
    """SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice
       FROM lineitem WHERE l_orderkey <= 100
       ORDER BY l_orderkey, l_linenumber""",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+X2: multi-column projection parity (`compute/projection.go:44-50`
    reads columns in parallel; Spark's vectorized reader does the same)."""
    li = _cat(spark, sf_dir)["lineitem"]
    return (
        li.filter(lte("l_orderkey", 100))
        .orderBy("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice")
    )


@query(
    "q15_empty_result",
    "SELECT count(*) AS n FROM lineitem WHERE l_returnflag = 'Z'",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: bloom-filter definite-miss path (`dataset/row_selector.go:21-41`)
    — value absent from every row group."""
    li = _cat(spark, sf_dir)["lineitem"]
    return li.filter(equals("l_returnflag", "Z")).agg(F.count(F.lit(1)).alias("n"))
