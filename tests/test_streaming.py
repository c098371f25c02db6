"""Streaming ingestion tests (M4): losslessness, duplicate suppression,
series-id assignment at compaction."""

import os
import shutil

from pyspark.sql import functions as F

from tsdb_parquet_spark.catalog import normalize_event_time
from tsdb_parquet_spark.querier import ChunkQuerier
from tsdb_parquet_spark.schema import SERIES_ID
from tsdb_parquet_spark.streaming.ingest import StreamingChunkIngestor

WORK = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    ".work", "streaming_tests")

LABELS = ["__name__", "event_type", "shard"]
DAY_MS = 86_400_000


def _to_samples(batch):
    return batch.select(
        F.lit("app_events").alias("__name__"),
        F.col("event_type"),
        (F.col("user_id") % 8).cast("string").alias("shard"),
        F.expr("ts div 1000000").alias("ts"),
        F.col("value"),
    )


def _stage_events(spark, sf_dir, staging, copies=1):
    """Copy events.parquet into a staging dir N times (duplicate delivery)."""
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    src = os.path.join(sf_dir, "events.parquet")
    for i in range(copies):
        shutil.copy(src, os.path.join(staging, f"events_{i}.parquet"))


def _run_ingest(spark, source_dir, root, schema=None, max_files_per_trigger=None):
    shutil.rmtree(root, ignore_errors=True)
    ingestor = StreamingChunkIngestor(
        spark, root, LABELS, _to_samples, chunk_span_ms=DAY_MS
    )
    # schema of the staged RAW files (a normalized schema would make the
    # parquet reader surface raw int64 micros and skew every ts)
    reader = spark.readStream.schema(spark.read.parquet(source_dir).schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = normalize_event_time(
        reader.parquet(source_dir)
    ).withColumn("__event_time", F.timestamp_micros(F.expr("ts div 1000")))
    ingestor.ingest(stream, dedup_key="event_id", event_time_col="__event_time")
    return ingestor


def test_stream_ingest_lossless(spark, sf_smoke):
    events = normalize_event_time(
        spark.read.parquet(f"{sf_smoke}/events.parquet")
    )
    staging = os.path.join(WORK, "staging_single")
    _stage_events(spark, sf_smoke, staging)
    ingestor = _run_ingest(spark, staging, os.path.join(WORK, "single"),
                           events.schema)
    compact = ingestor.finalize()
    q = ChunkQuerier.from_parquet(spark, compact)
    got = q.select_samples(labels=["event_type"]).agg(
        F.count("*").alias("n"), F.sum("value").alias("s")
    ).collect()[0]
    want = events.agg(F.count("*").alias("n"), F.sum("value").alias("s")
                      ).collect()[0]
    assert got["n"] == want["n"]
    assert abs(got["s"] - want["s"]) < 1e-6


def test_stream_dedup_suppresses_duplicate_delivery(spark, sf_smoke):
    """The same source file delivered twice across micro-batches must be
    ingested once (watermarked dropDuplicates on event_id) — protection the
    batch-only reference cannot express."""
    events = normalize_event_time(
        spark.read.parquet(f"{sf_smoke}/events.parquet")
    )
    staging = os.path.join(WORK, "staging_dup")
    _stage_events(spark, sf_smoke, staging, copies=2)
    ingestor = _run_ingest(spark, staging, os.path.join(WORK, "dup"),
                           events.schema, max_files_per_trigger=1)
    compact = ingestor.finalize()
    q = ChunkQuerier.from_parquet(spark, compact)
    n = q.select_samples(labels=["event_type"]).count()
    assert n == events.count()


def test_replayed_micro_batch_is_idempotent(spark, sf_smoke):
    """foreachBatch is at-least-once: re-delivering the same (batch_df,
    batch_id) after a restart must not duplicate rows — the part dir is
    keyed by batch_id and a complete part is skipped."""
    events = normalize_event_time(
        spark.read.parquet(f"{sf_smoke}/events.parquet")
    )
    root = os.path.join(WORK, "replay")
    shutil.rmtree(root, ignore_errors=True)
    ingestor = StreamingChunkIngestor(
        spark, root, LABELS, _to_samples, chunk_span_ms=DAY_MS
    )
    ingestor._write_batch(events, batch_id=7)
    n_first = spark.read.parquet(*ingestor.writer.part_dirs).count()
    ingestor._write_batch(events, batch_id=7)  # replay
    assert ingestor.writer.part_dirs == [os.path.join(root, "part.7")]
    assert spark.read.parquet(*ingestor.writer.part_dirs).count() == n_first


def test_series_ids_assigned_at_compaction(spark, sf_smoke):
    events = normalize_event_time(
        spark.read.parquet(f"{sf_smoke}/events.parquet")
    )
    staging = os.path.join(WORK, "staging_ids")
    _stage_events(spark, sf_smoke, staging)
    ingestor = _run_ingest(spark, staging, os.path.join(WORK, "ids"),
                           events.schema)
    # parts carry no series ids
    parts = spark.read.parquet(*ingestor.writer.part_dirs)
    assert SERIES_ID not in parts.columns
    compact = ingestor.finalize()
    store = spark.read.parquet(compact)
    ids = [r[SERIES_ID] for r in
           store.select(SERIES_ID).distinct().orderBy(SERIES_ID).collect()]
    assert ids == list(range(len(ids)))  # dense 0..N-1


def test_finalize_quiesces_straggler_parts(spark, sf_smoke):
    """A part adopted while finalize() is merging must not be lost: the
    quiesce loop re-merges until no new part remains, and every consumed
    part is folded (a replayed adopt() is a no-op afterwards)."""
    events = normalize_event_time(
        spark.read.parquet(f"{sf_smoke}/events.parquet")
    )
    staging = os.path.join(WORK, "staging_straggler")
    _stage_events(spark, sf_smoke, staging)
    ingestor = _run_ingest(spark, staging, os.path.join(WORK, "straggler"),
                           events.schema)
    # simulate a concurrent micro-batch landing mid-finalize: hook the
    # writer's mark_folded to adopt a straggler part the first time the
    # merge pass completes
    from tsdb_parquet_spark.chunks import samples_to_chunks
    from tsdb_parquet_spark.sources.writer import write_sorted

    writer = ingestor.writer
    straggler = os.path.join(writer.root, "part.900")
    extra = samples_to_chunks(
        _to_samples(events.limit(40)).withColumn(
            "event_type", F.lit("straggler_type")
        ),
        LABELS,
        chunk_span_ms=DAY_MS,
        assign_series_ids=False,
    )
    write_sorted(extra, straggler, writer.opts)
    n_extra = spark.read.parquet(straggler).count()
    orig_mark = writer.mark_folded
    fired = {"done": False}

    def mark_and_adopt(parts):
        orig_mark(parts)
        if not fired["done"]:
            fired["done"] = True
            writer.adopt(straggler)

    writer.mark_folded = mark_and_adopt
    compact = ingestor.finalize()
    writer.mark_folded = orig_mark
    back = spark.read.parquet(compact)
    # the straggler's rows are IN the compact (not silently dropped)
    assert (
        back.filter(F.col("event_type") == "straggler_type").count()
        == n_extra
    )
    # every consumed part is folded: a replayed adopt is a no-op
    assert writer.part_dirs == []
    writer.adopt(straggler)
    assert writer.part_dirs == []


def test_finalize_includes_prior_maybe_compact_output(spark, sf_smoke):
    """A periodic maybe_compact during ingestion folds early parts into
    compact.N; finalize must merge that output (its rows exist nowhere
    else) instead of publishing a store built from the live parts only."""
    from tsdb_parquet_spark.sources.maintenance import maybe_compact

    events = normalize_event_time(
        spark.read.parquet(f"{sf_smoke}/events.parquet")
    )
    staging = os.path.join(WORK, "staging_midcompact")
    _stage_events(spark, sf_smoke, staging)
    # small triggers -> several parts land
    ingestor = _run_ingest(
        spark, staging, os.path.join(WORK, "midcompact"), events.schema
    )
    n_before = spark.read.parquet(*ingestor.writer.part_dirs).count()
    assert n_before > 0
    # background maintenance folds everything into compact.0
    maybe_compact(ingestor.writer, max_parts=1, defer_cleanup=True)
    assert ingestor.writer.part_dirs == []
    # more data lands as a fresh part
    from tsdb_parquet_spark.chunks import samples_to_chunks
    from tsdb_parquet_spark.sources.writer import write_sorted

    extra = samples_to_chunks(
        _to_samples(events.limit(25)).withColumn(
            "event_type", F.lit("late_type")
        ),
        LABELS,
        chunk_span_ms=DAY_MS,
        assign_series_ids=False,
    )
    late_part = os.path.join(ingestor.writer.root, "part.500")
    write_sorted(extra, late_part, ingestor.writer.opts)
    n_extra = spark.read.parquet(late_part).count()
    ingestor.writer.adopt(late_part)
    compact = ingestor.finalize()
    back = spark.read.parquet(compact)
    # BOTH the pre-compacted rows and the late part survive, with ids
    assert back.count() == n_before + n_extra
    assert "__series__id" in back.columns
    assert back.filter(F.col("event_type") == "late_type").count() == n_extra
    # idempotent re-finalize over the id-carrying compact: a TRUE no-op —
    # same path, no new compact.N written (a re-merge would double
    # on-disk data until vacuum)
    dirs_before = sorted(
        d for d in os.listdir(ingestor.writer.root) if d.startswith("compact.")
    )
    again = ingestor.finalize()
    assert again == compact
    assert sorted(
        d for d in os.listdir(ingestor.writer.root) if d.startswith("compact.")
    ) == dirs_before
    assert spark.read.parquet(again).count() == n_before + n_extra
