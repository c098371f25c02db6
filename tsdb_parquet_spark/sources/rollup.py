"""Downsampling rollups: materialize coarser-resolution stores from raw.

The M3/Thanos pattern the reference stops short of (its converter writes
one resolution, `cmd/convert/main.go:79-117`): long retention keeps 5m/1h
rollups instead of raw samples, and recording-rule-style series names
(``metric:sum``, ``metric:count``, ...) let the same query surface serve
both resolutions.  ``avg`` is deliberately NOT materialized — sum/count
re-aggregate losslessly across further rollups or store merges, a
pre-divided avg does not.

Plan: one shuffle (the (series, bucket) groupBy computes every aggregate
together), one explode to recording-rule series, then the standard
chunk encode + sorted write — the rollup store is a first-class store:
the querier, PromQL engine, compaction, and retention all work on it
unchanged.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_AGGS = ("sum", "count", "min", "max", "last")


def downsample_samples(
    samples: DataFrame,
    label_columns: Sequence[str],
    step_ms: int,
    metric_label: str = "__name__",
    aggs: Sequence[str] = ROLLUP_AGGS,
) -> DataFrame:
    """Downsample raw samples to one sample per (series, step bucket) per
    aggregate, named ``<metric>:<agg>`` (recording-rule convention).

    Buckets are right-closed like the PromQL step math: a sample at
    ``ts`` lands in bucket ``ceil(ts / step) * step`` — so a rolled-up
    sample's timestamp is the END of the window it summarizes and a
    range query over the rollup store sees exactly the windows it would
    have computed from raw."""
    bad = [a for a in aggs if a not in ROLLUP_AGGS]
    if bad:
        raise ValueError(f"unknown rollup aggs {bad}")
    labels = [c for c in label_columns if c != metric_label]
    step = int(step_ms)
    t = F.expr(f"((ts + {step - 1}L) div {step}L) * {step}L")

    agg_cols = {
        "sum": F.sum("value"),
        "count": F.count(F.lit(1)).cast("double"),
        "min": F.min("value"),
        "max": F.max("value"),
        "last": F.max_by("value", "ts"),
    }
    rolled = samples.groupBy(metric_label, *labels, t.alias("__t")).agg(
        *[agg_cols[a].alias(f"__{a}") for a in aggs]
    )
    return explode_rollup_rows(rolled, labels, metric_label, aggs)


def explode_rollup_rows(
    rolled: DataFrame,
    labels: Sequence[str],
    metric_label: str = "__name__",
    aggs: Sequence[str] = ROLLUP_AGGS,
) -> DataFrame:
    """Turn one row per (series, bucket) with ``__<agg>`` columns and a
    ``__t`` bucket timestamp into recording-rule samples
    (``metric:agg``) — shared by the batch downsampler and the streaming
    rollup's finalized-bucket sink."""
    series = F.array(
        *[
            F.struct(
                F.concat(F.col(metric_label), F.lit(f":{a}")).alias("m"),
                F.col(f"__{a}").alias("v"),
            )
            for a in aggs
        ]
    )
    return rolled.select(
        F.explode(series).alias("s"), *labels, F.col("__t").alias("ts")
    ).select(
        F.col("s.m").alias(metric_label),
        *labels,
        "ts",
        F.col("s.v").alias("value"),
    )


def rollup_store(
    spark: SparkSession,
    src_compact_dir: str,
    dest_dir: str,
    label_columns: Sequence[str],
    step_ms: int,
    aggs: Sequence[str] = ROLLUP_AGGS,
    chunk_span_ms: int | None = None,
) -> str:
    """Materialize a rollup store from a raw chunk store: decode ->
    downsample -> re-chunk -> sorted write.  Returns ``dest_dir``.

    The output is a normal chunk store (same schema, sort order, bloom
    filters), so every read path — querier matchers, PromQL, multi-store
    merge, compaction, retention — applies to it unchanged."""
    from tsdb_parquet_spark.chunks import samples_to_chunks
    from tsdb_parquet_spark.querier import ChunkQuerier
    from tsdb_parquet_spark.schema import sort_columns
    from tsdb_parquet_spark.sources.writer import WriterOptions, write_sorted

    q = ChunkQuerier.from_parquet(spark, src_compact_dir)
    samples = q.select_samples(labels=list(label_columns))
    rolled = downsample_samples(
        samples, label_columns, step_ms=step_ms, aggs=aggs
    )
    span = int(chunk_span_ms) if chunk_span_ms else max(int(step_ms) * 24, 1)
    chunks = samples_to_chunks(
        rolled, list(label_columns), chunk_span_ms=span
    )
    opts = WriterOptions(
        sort_columns=sort_columns(list(label_columns)),
        bloom_columns=[c for c in label_columns if c != "__name__"],
        max_files=16,
    )
    return write_sorted(chunks, dest_dir, opts)
