"""Deterministic global shuffle — reproducible training-data ordering.

Training pipelines need a *seeded, reproducible* permutation of the corpus
(so a run can be resumed/replayed bit-identically), which `df.orderBy(rand())`
is not (rand() reseeds per task attempt).  The draw here is
``md5(seed || '|' || key)`` — stateless, engine-portable (the DuckDB oracle
computes the identical hex string), and resume-safe.

Scale shape: ``global_shuffle`` is a plain range sort on the draw — Spark's
sort shuffle handles 100 TB (range partitioner samples the draw space,
which md5 makes perfectly uniform: no skew by construction).  Position
assignment deliberately avoids a global ``row_number()`` window (single
task); it reuses the partition-offset trick of
:func:`tsdb_parquet_spark.chunks.dense_series_ids` — local index within
sorted range partitions + a broadcast running-sum offset per partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["shuffle_draw", "sql_shuffle_draw", "global_shuffle", "with_global_positions"]


def shuffle_draw(key: Column, seed: str) -> Column:
    return F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string")))


def sql_shuffle_draw(key_expr: str, seed: str) -> str:
    return f"md5('{seed}|' || CAST({key_expr} AS VARCHAR))"


def global_shuffle(df: DataFrame, key_col: str, seed: str) -> DataFrame:
    """The corpus in seeded-permutation order (a total order when
    ``key_col`` is unique — md5 collisions aside)."""
    return df.orderBy(shuffle_draw(F.col(key_col), seed))


def with_global_positions(
    df: DataFrame, key_col: str, seed: str, position_col: str = "pos"
) -> DataFrame:
    """Adds a dense 0..N-1 ``position_col`` in seeded-shuffle order.

    Same plan as :func:`~tsdb_parquet_spark.chunks.dense_series_ids`
    (see its docstring for why the tagged frame must be persisted and why
    a global Window is a scale wall): range-sort by draw, tag local index
    via ``monotonically_increasing_id`` minus the partition-id bits,
    broadcast per-partition running-sum offsets back on.

    Bound: ``monotonically_increasing_id`` reserves the low 33 bits for the
    within-partition record index, so the local-index subtraction is only
    valid while every partition holds < 2**33 rows (~8.6e9).  The offsets
    pass counts each partition anyway; we validate the bound there and
    raise rather than silently emit garbage positions.
    """
    draw = shuffle_draw(F.col(key_col), seed).alias("__draw")
    n_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ordered = (
        df.select("*", draw)
        .repartitionByRange(n_parts, "__draw")
        .sortWithinPartitions("__draw")
    )
    tagged = ordered.select(
        "*",
        F.spark_partition_id().alias("__pid"),
        (
            F.monotonically_increasing_id()
            - F.shiftleft(F.spark_partition_id().cast("long"), 33)
        ).alias("__idx"),
    ).persist()

    # ≤ n_parts rows — collect to the driver, validate the 33-bit local-index
    # bound, and build the running-sum offsets there (replaces a
    # Window.orderBy over the same tiny frame; the broadcast join is
    # unchanged).
    counts = sorted(
        (r["__pid"], r["__cnt"])
        for r in tagged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .collect()
    )
    too_big = [(pid, cnt) for pid, cnt in counts if cnt >= 1 << 33]
    if too_big:
        tagged.unpersist()
        raise ValueError(
            "with_global_positions: partition(s) exceed the 2**33-row "
            f"monotonically_increasing_id local-index bound: {too_big[:3]}; "
            "raise spark.sql.shuffle.partitions so each range partition "
            "holds < 8.6e9 rows"
        )
    acc = 0
    offset_rows = []
    for pid, cnt in counts:
        offset_rows.append((pid, acc))
        acc += cnt
    offsets = df.sparkSession.createDataFrame(
        offset_rows, "`__pid` INT, `__offset` BIGINT"
    )
    out = (
        tagged.join(F.broadcast(offsets), on="__pid", how="inner")
        .select(
            (F.col("__offset") + F.col("__idx")).alias(position_col),
            *[F.col(c) for c in df.columns],
        )
        .localCheckpoint(eager=True)
    )
    tagged.unpersist()
    return out
