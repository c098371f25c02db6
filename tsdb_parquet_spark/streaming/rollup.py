"""Streaming rollup: keep the downsampled store fresh as samples arrive.

The batch path (`sources/rollup.py`) rebuilds a rollup store from a raw
chunk store; here the SAME recording-rule samples (``metric:sum``,
``metric:count``, ...) are maintained incrementally by a Structured
Streaming windowed aggregation:

    samples stream
      -> event-time watermark
      -> groupBy(window(step), series) . agg(sum/count/min/max/last)
         (append mode: a bucket is emitted exactly ONCE, when the
         watermark passes its end — late samples inside the allowance
         still land in their bucket, later ones are dropped, never
         double-counted)
      -> explode to recording-rule samples (shared with the batch path)
      -> chunk encode + idempotent sorted-part sink
         (`streaming/ingest.StreamingChunkIngestor._write_batch`)

This is the piece that makes query-time rollup routing
(`plans/routing.py`) usable on LIVE data at 100 TB: the raw store takes
the full ingest write rate while the rollup store receives one row per
(series, bucket, agg) — the windowed agg is a single keyed shuffle per
micro-batch with partial aggregation map-side, and state per key is one
window's accumulators, bounded by |active series| x (watermark / step).

Bucket semantics match `downsample_samples` exactly: right-closed
buckets — a sample at ts lands in bucket ``ceil(ts/step)*step`` — which
is ``window(ts - 1ms, step).end`` in Spark's left-closed window terms.

Reference: the converter is one-shot batch (`cmd/convert/main.go:23-126`);
online downsampling has no reference analog.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsdb_parquet_spark.sources.rollup import ROLLUP_AGGS, explode_rollup_rows
from tsdb_parquet_spark.streaming.ingest import StreamingChunkIngestor

_STREAM_AGG_COLS = {
    "sum": lambda: F.sum("value"),
    "count": lambda: F.count(F.lit(1)).cast("double"),
    "min": lambda: F.min("value"),
    "max": lambda: F.max("value"),
    "last": lambda: F.max_by("value", "ts"),
}


class StreamingRollupIngestor:
    """Maintains a rollup chunk store from a samples stream.

    The produced store is byte-compatible with the batch rollup store:
    same recording-rule series names, right-closed bucket timestamps,
    chunk layout, sort order and bloom filters — so the querier, PromQL
    engine, rollup routing, compaction and retention all work on it
    unchanged, and ``finalize()`` compacts exactly like the raw
    streaming ingest.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        label_columns: Sequence[str],
        step_ms: int,
        aggs: Sequence[str] = ROLLUP_AGGS,
        chunk_span_ms: int | None = None,
        metric_label: str = "__name__",
    ) -> None:
        bad = [a for a in aggs if a not in ROLLUP_AGGS]
        if bad:
            raise ValueError(f"unknown rollup aggs {bad}")
        self.step_ms = int(step_ms)
        self.aggs = list(aggs)
        self.metric_label = metric_label
        self.labels = [c for c in label_columns if c != metric_label]
        span = int(chunk_span_ms) if chunk_span_ms else max(self.step_ms * 24, 1)
        self._sink = StreamingChunkIngestor(
            spark,
            root,
            [metric_label, *self.labels],
            to_samples=self._to_samples,
            chunk_span_ms=span,
        )

    # -- finalized-bucket micro-batch -> recording-rule samples -------------

    def _to_samples(self, finalized: DataFrame) -> DataFrame:
        return explode_rollup_rows(
            finalized, self.labels, self.metric_label, self.aggs
        )

    # -- streaming query ----------------------------------------------------

    def ingest(
        self,
        stream: DataFrame,
        watermark: str = "10 seconds",
        available_now: bool = True,
    ):
        """``stream`` needs the samples shape: ``metric_label`` + label
        columns (string), ``ts`` (long, ms), ``value`` (double).

        ``watermark`` is the late-data allowance: a bucket closes — and
        is written, once — when the watermark (max event time minus
        this) passes its end.  Under ``Trigger.AvailableNow`` the final
        buckets inside the allowance stay withheld in state (same
        drain semantics as the streaming sessionizer); a far-future
        sentinel sample flushes them in bounded replays.
        """
        step = self.step_ms
        # right-closed buckets: shift 1ms so window(...).end == ceil-bucket
        rolled = (
            stream.withColumn(
                "__evt", F.timestamp_millis(F.col("ts") - F.lit(1))
            )
            .withWatermark("__evt", watermark)
            .groupBy(
                F.window("__evt", f"{step} milliseconds").alias("__w"),
                F.col(self.metric_label),
                *[F.col(c) for c in self.labels],
            )
            .agg(
                *[
                    _STREAM_AGG_COLS[a]().alias(f"__{a}")
                    for a in self.aggs
                ]
            )
            .select(
                self.metric_label,
                *self.labels,
                F.unix_millis(F.col("__w.end")).alias("__t"),
                *[f"__{a}" for a in self.aggs],
            )
        )
        return self._sink.ingest(rolled, available_now=available_now)

    # -- store lifecycle ----------------------------------------------------

    @property
    def rows_ingested(self):
        return self._sink.rows_ingested

    def finalize(self) -> str:
        """Compact all rollup parts into one sorted store with dense
        series ids (same contract as the raw streaming ingest)."""
        return self._sink.finalize()
