"""Maintenance-job tests: compaction policy and day-partition retention."""

import os
import shutil

from pyspark.sql import functions as F

from tsdb_parquet_spark.sources.maintenance import (
    DAY_MS,
    maybe_compact,
    retention_sweep,
    vacuum_store,
)
from tsdb_parquet_spark.sources.writer import (
    SortedParquetWriter,
    WriterOptions,
    write_sorted,
)

WORK = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    ".work", "maintenance_tests")


def test_maybe_compact_threshold(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").limit(100)
    root = os.path.join(WORK, "policy")
    shutil.rmtree(root, ignore_errors=True)
    opts = WriterOptions(sort_columns=["l_orderkey"], max_files=1)
    writer = SortedParquetWriter(spark, root, opts)
    writer.write(li)
    writer.write(li)
    assert maybe_compact(writer, max_parts=8) is None  # under threshold
    for _ in range(7):
        writer.write(li)
    compact = maybe_compact(writer, max_parts=8)
    assert compact is not None
    assert writer.part_dirs == []  # parts cleaned after merge
    assert spark.read.parquet(compact).count() == 900


def test_repeated_compaction_is_lossless(spark, sf_smoke):
    """Second maybe_compact cycle must keep rows from the first cycle:
    compact() folds the previous compact output into the merge (regression
    for the overwrite-drops-survivors bug)."""
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").limit(100)
    root = os.path.join(WORK, "two_cycles")
    shutil.rmtree(root, ignore_errors=True)
    opts = WriterOptions(sort_columns=["l_orderkey"], max_files=1)
    writer = SortedParquetWriter(spark, root, opts)
    for _ in range(3):
        writer.write(li)
    assert maybe_compact(writer, max_parts=2) is not None  # cycle 1: 300 rows
    for _ in range(3):
        writer.write(li)
    compact = maybe_compact(writer, max_parts=2)  # cycle 2: +300 rows
    assert compact is not None
    assert writer.part_dirs == []
    assert spark.read.parquet(compact).count() == 600
    # and the merged output is still globally sorted on the sort prefix
    keys = [r[0] for r in spark.read.parquet(compact)
            .select("l_orderkey").collect()]
    assert keys == sorted(keys)


def test_concurrent_part_survives_compaction_cycle(spark, sf_smoke):
    """A part landed between compact()'s input snapshot and the cleanup
    delete (e.g. a streaming micro-batch beside the periodic maintenance
    job) must survive the cycle — regression for the re-listed-delete
    data-loss race."""
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").limit(100)
    root = os.path.join(WORK, "race")
    shutil.rmtree(root, ignore_errors=True)
    opts = WriterOptions(sort_columns=["l_orderkey"], max_files=1)
    writer = SortedParquetWriter(spark, root, opts)
    for _ in range(3):
        writer.write(li)
    compact = writer.compact()  # snapshots the 3 parts
    # concurrent micro-batch lands after the merge, before cleanup
    late_part = writer.write(li)
    for part in writer.last_compacted_parts:
        shutil.rmtree(part, ignore_errors=True)
    assert os.path.exists(late_part)  # the late part was NOT deleted
    assert spark.read.parquet(compact).count() == 300
    # next cycle folds the survivor in: nothing lost
    compact = writer.compact()
    assert spark.read.parquet(compact).count() == 400


def test_retention_sweep_drops_old_days(spark):
    rows = [(d, float(d)) for d in range(10, 20)]
    df = spark.createDataFrame(rows, "`__day` INT, value DOUBLE")
    out = os.path.join(WORK, "retention")
    shutil.rmtree(out, ignore_errors=True)
    write_sorted(
        df,
        out,
        WriterOptions(sort_columns=["value"], partition_by=["__day"],
                      max_files=1),
    )
    now_ms = 25 * DAY_MS
    removed = retention_sweep(out, now_ms=now_ms, keep_days=10)
    # cutoff_day = 25 - 10 = 15 -> days 10..14 removed
    assert removed == [f"__day={d}" for d in range(10, 15)]
    back = spark.read.parquet(out)
    assert sorted(r["__day"] for r in back.select("__day").distinct().collect()
                  ) == list(range(15, 20))


def test_vacuum_reports(spark):
    rows = [(d, float(d)) for d in range(3)]
    df = spark.createDataFrame(rows, "`__day` INT, value DOUBLE")
    out = os.path.join(WORK, "vacuum")
    shutil.rmtree(out, ignore_errors=True)
    write_sorted(
        df,
        out,
        WriterOptions(sort_columns=["value"], partition_by=["__day"],
                      max_files=1),
    )
    report = vacuum_store(spark, out, now_ms=5 * DAY_MS, keep_days=3)
    assert report["removed_partitions"] == ["__day=0", "__day=1"]
    assert report["remaining_chunks"] == 1


def test_replayed_part_not_resurrected_after_compaction(spark, tmp_path):
    """A streaming micro-batch replay must NOT re-adopt a part directory
    a deferred-cleanup compaction already folded — doing so would
    double-count its rows against the compacted copy (the
    crash-between-write-and-checkpoint scenario)."""
    from tsdb_parquet_spark.schema import sort_columns
    from tsdb_parquet_spark.sources.maintenance import maybe_compact
    from tsdb_parquet_spark.sources.manifest import read_snapshot
    from tsdb_parquet_spark.sources.writer import (
        SortedParquetWriter,
        WriterOptions,
    )

    root = str(tmp_path / "store")
    opts = WriterOptions(sort_columns=["k"], max_files=2)
    w = SortedParquetWriter(spark, root, opts)
    for i in range(3):
        w.write(spark.range(i * 10, i * 10 + 10).selectExpr("id AS k"))
    total = 30
    compacted = maybe_compact(w, max_parts=1, defer_cleanup=True)
    assert compacted is not None
    folded = w.last_compacted_parts
    assert folded and all(os.path.isdir(p) for p in folded)  # awaiting vacuum

    # a NEW writer (restart) replays a batch whose part dir still exists:
    # adopt must be a no-op for the folded dir
    w2 = SortedParquetWriter(spark, root, opts)
    w2.adopt(folded[0])
    assert folded[0] not in w2.part_dirs
    assert read_snapshot(spark, root).count() == total  # no double count

    # a genuinely NEW part still adopts fine
    new_part = os.path.join(root, "part.99")
    spark.range(100, 105).selectExpr("id AS k").write.parquet(new_part)
    w2.adopt(new_part)
    assert new_part in w2.part_dirs
    assert read_snapshot(spark, root).count() == total + 5
