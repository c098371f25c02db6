"""Streaming rollup tests: the windowed-agg downsampler must produce a
store EQUAL to the batch `downsample_samples` result (same recording-rule
series, right-closed bucket timestamps, values), emit each bucket exactly
once across micro-batches, and survive multi-batch replay."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.querier import ChunkQuerier
from tsdb_parquet_spark.sources.rollup import downsample_samples
from tsdb_parquet_spark.streaming.rollup import StreamingRollupIngestor

WORK = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".work")
STEP_MS = 60_000
LABELS = ["__name__", "job"]
#: far-future sentinel: advances the watermark past every real bucket so a
#: bounded AvailableNow replay flushes them (its own bucket stays withheld)
FLUSH_TS = 10**13


def _samples_rows():
    rows = []
    for job in ("a", "b"):
        for i in range(240):
            ts = i * 1_000 + 1  # 4 minutes of second-cadence samples
            rows.append(("m", job, ts, float(i % 7) + (job == "b")))
    # a late-but-inside-allowance sample and an exact-boundary sample
    rows.append(("m", "a", 60_000, 99.0))  # boundary: right-closed -> bucket 60k
    rows.append(("__flush__", "z", FLUSH_TS, 0.0))
    return rows


def _stage(spark, staging, rows, n_files=3):
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    df = spark.createDataFrame(
        rows, "`__name__` STRING, job STRING, ts LONG, value DOUBLE"
    )
    # deterministic split into files so multi-batch triggers replay order
    for i in range(n_files):
        df.filter(F.col("ts") % n_files == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(staging, f"f{i}"))
    return df


def _run(spark, staging, root, max_files_per_trigger=None):
    shutil.rmtree(root, ignore_errors=True)
    ing = StreamingRollupIngestor(spark, root, LABELS, step_ms=STEP_MS)
    reader = spark.readStream.schema(
        spark.read.parquet(os.path.join(staging, "f0")).schema
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(os.path.join(staging, "*"))
    ing.ingest(stream, watermark="5 seconds")
    return ing


def _store_samples(spark, compact):
    q = ChunkQuerier.from_parquet(spark, compact)
    return (
        q.select_samples(labels=LABELS)
        .filter(~F.col("__name__").startswith("__flush__"))
    )


@pytest.fixture(scope="module")
def streamed(spark):
    rows = _samples_rows()
    staging = os.path.join(WORK, "roll_staging")
    batch_df = _stage(spark, staging, rows)
    ing = _run(spark, staging, os.path.join(WORK, "roll_store"))
    compact = ing.finalize()
    return batch_df, compact


def test_streamed_rollup_equals_batch(spark, streamed):
    batch_df, compact = streamed
    got = _store_samples(spark, compact)
    want = downsample_samples(
        batch_df.filter(~F.col("__name__").startswith("__flush__")),
        LABELS,
        step_ms=STEP_MS,
    )
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w
    assert len(g) > 0


def test_boundary_sample_lands_right_closed(spark, streamed):
    """ts == 60_000 must land in bucket 60_000, not 120_000."""
    _, compact = streamed
    got = _store_samples(spark, compact)
    row = got.filter(
        (F.col("__name__") == "m:max") & (F.col("job") == "a")
        & (F.col("ts") == 60_000)
    ).collect()
    assert row and row[0]["value"] == 99.0


def test_multi_batch_replay_emits_each_bucket_once(spark):
    """One file per trigger: buckets span micro-batches; append-mode
    watermark finalization must still write each bucket exactly once."""
    rows = _samples_rows()
    staging = os.path.join(WORK, "roll_staging_mb")
    batch_df = _stage(spark, staging, rows, n_files=4)
    ing = _run(
        spark, staging, os.path.join(WORK, "roll_store_mb"),
        max_files_per_trigger=1,
    )
    compact = ing.finalize()
    got = _store_samples(spark, compact)
    # exactly-once: no (series, ts) appears twice
    dupes = (
        got.groupBy("__name__", "job", "ts").count().filter("count > 1")
    )
    assert dupes.count() == 0
    want = downsample_samples(
        batch_df.filter(~F.col("__name__").startswith("__flush__")),
        LABELS,
        step_ms=STEP_MS,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
