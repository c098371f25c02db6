"""Snapshot-manifest tests: atomic publication, reader isolation across a
concurrent compaction, grace-window vacuum, crash resilience, and the
legacy-store migration path."""

import os
import shutil

import pytest

from pyspark.sql import functions as F

from tsdb_parquet_spark.sources.maintenance import maybe_compact
from tsdb_parquet_spark.sources.manifest import (
    current_snapshot,
    latest_version,
    list_versions,
    publish_snapshot,
    read_snapshot,
    vacuum_snapshots,
)
from tsdb_parquet_spark.sources.writer import (
    SortedParquetWriter,
    WriterOptions,
    write_sorted,
)

WORK = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".work",
    "manifest_tests",
)


def _writer(spark, name: str) -> SortedParquetWriter:
    root = os.path.join(WORK, name)
    shutil.rmtree(root, ignore_errors=True)
    opts = WriterOptions(sort_columns=["l_orderkey"], max_files=1)
    return SortedParquetWriter(spark, root, opts)


def test_publish_and_read_roundtrip(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").limit(120)
    writer = _writer(spark, "roundtrip")
    writer.write(li.filter(F.col("l_orderkey") % 2 == 0))
    writer.write(li.filter(F.col("l_orderkey") % 2 == 1))
    snap = current_snapshot(writer.root)
    assert snap is not None and snap.version == 2
    assert sorted(snap.paths) == ["part.0", "part.1"]
    assert read_snapshot(spark, writer.root).count() == 120


def test_reader_isolated_across_compaction(spark, sf_smoke):
    """A reader pinned to the pre-compaction snapshot finishes its scan on
    the retired part files; only vacuum (after the grace window) removes
    them."""
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").limit(100)
    writer = _writer(spark, "isolation")
    for _ in range(3):
        writer.write(li)
    pinned = current_snapshot(writer.root).version  # v3: three parts
    compact_dir = maybe_compact(writer, max_parts=2, defer_cleanup=True)
    assert compact_dir is not None
    # post-compaction manifest: just the versioned compact dir
    now = current_snapshot(writer.root)
    assert list(now.paths) == [os.path.basename(compact_dir)]
    # the pinned snapshot still reads in full — nothing was deleted
    assert read_snapshot(spark, writer.root, version=pinned).count() == 300
    assert read_snapshot(spark, writer.root).count() == 300
    # grace window passes: vacuum keeps only the newest manifest's dirs
    result = vacuum_snapshots(writer.root, keep_versions=1)
    assert sorted(result["removed_dirs"]) == ["part.0", "part.1", "part.2"]
    assert not any(
        d.startswith("part.") for d in os.listdir(writer.root)
    )
    assert read_snapshot(spark, writer.root).count() == 300


def test_second_cycle_folds_previous_compact(spark, sf_smoke):
    """part -> compact -> part -> compact keeps every row and retires the
    first compact version through vacuum, alias always resolving."""
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").limit(100)
    writer = _writer(spark, "cycles")
    writer.write(li)
    writer.write(li)
    first = maybe_compact(writer, max_parts=1, defer_cleanup=True)
    writer.write(li)
    writer.write(li)
    second = maybe_compact(writer, max_parts=1, defer_cleanup=True)
    assert os.path.basename(first) == "compact.0"
    assert os.path.basename(second) == "compact.1"
    alias = os.path.join(writer.root, "compact")
    assert os.path.islink(alias) and os.readlink(alias) == "compact.1"
    assert spark.read.parquet(alias).count() == 400
    vacuum_snapshots(writer.root, keep_versions=1)
    assert not os.path.isdir(os.path.join(writer.root, "compact.0"))
    assert read_snapshot(spark, writer.root).count() == 400


def test_reopened_writer_trusts_manifest(spark, sf_smoke):
    """After a deferred-cleanup compaction the folded parts are still on
    disk; a reopened writer must NOT re-adopt them (double-count)."""
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").limit(50)
    writer = _writer(spark, "reopen")
    for _ in range(3):
        writer.write(li)
    maybe_compact(writer, max_parts=2, defer_cleanup=True)
    reopened = SortedParquetWriter(spark, writer.root, writer.opts)
    assert reopened.part_dirs == []
    # and its next write sequences after the folded parts
    reopened.write(li)
    snap = current_snapshot(writer.root)
    assert sorted(snap.paths) == ["compact.0", "part.3"]
    assert read_snapshot(spark, writer.root).count() == 200


def test_crash_between_manifest_and_pointer(spark):
    """A manifest published without the CURRENT pointer (crash window) must
    not be resurrected as CURRENT, and the next publish sequences past it."""
    root = os.path.join(WORK, "crash")
    shutil.rmtree(root, ignore_errors=True)
    publish_snapshot(root, ["part.0"])  # v1, CURRENT -> 1
    # simulate a crash: v2 manifest written, pointer never moved
    import json

    with open(os.path.join(root, "_snapshots", "MANIFEST.00000002.json"), "w") as fh:
        json.dump({"version": 2, "created_ms": 0, "paths": ["part.9"]}, fh)
    assert current_snapshot(root).version == 1
    assert latest_version(root) == 2
    v = publish_snapshot(root, ["part.0", "part.1"])
    assert v == 3 and current_snapshot(root).version == 3
    assert list_versions(root) == [1, 2, 3]


def test_legacy_real_dir_store_migrates(spark, sf_smoke):
    """A store written before versioned compaction (real ``compact`` dir, no
    manifest) folds losslessly into the snapshot layout on first compact."""
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").limit(80)
    root = os.path.join(WORK, "legacy")
    shutil.rmtree(root, ignore_errors=True)
    opts = WriterOptions(sort_columns=["l_orderkey"], max_files=1)
    write_sorted(li, os.path.join(root, "compact"), opts)
    assert not os.path.islink(os.path.join(root, "compact"))
    writer = SortedParquetWriter(spark, root, opts)
    writer.write(li)
    out = writer.compact()
    alias = os.path.join(root, "compact")
    assert os.path.islink(alias) and os.readlink(alias) == os.path.basename(out)
    assert spark.read.parquet(alias).count() == 160
    assert list(current_snapshot(root).paths) == [os.path.basename(out)]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=6, deadline=None)
@given(
    ops=st.lists(
        st.sampled_from(["write", "compact", "vacuum"]),
        min_size=2,
        max_size=7,
    )
)
def test_random_interleavings_never_lose_or_double_count(spark, ops):
    """Any interleaving of write / deferred-cleanup compact / vacuum keeps
    the current snapshot's row count equal to the total rows ever written —
    no loss (a folded part dropped before its compact published) and no
    double count (a folded part re-adopted beside its compact)."""
    root = os.path.join(WORK, "prop")
    shutil.rmtree(root, ignore_errors=True)
    opts = WriterOptions(sort_columns=["k"], max_files=1)
    writer = SortedParquetWriter(spark, root, opts)
    batch = spark.range(3).select(F.col("id").alias("k"))
    written = 0
    for op in ops:
        if op == "write":
            writer.write(batch)
            written += 3
        elif op == "compact":
            maybe_compact(writer, max_parts=0, defer_cleanup=True)
        else:
            vacuum_snapshots(writer.root, keep_versions=2)
        if written:
            assert read_snapshot(spark, writer.root).count() == written
            # a REOPENED writer agrees with the manifest at every point
            reopened = SortedParquetWriter(spark, root, opts)
            assert reopened.part_dirs == writer.part_dirs


def test_vacuum_refuses_zero_keep_versions(tmp_path):
    from tsdb_parquet_spark.sources.manifest import (
        publish_snapshot,
        vacuum_snapshots,
    )

    root = str(tmp_path)
    (tmp_path / "part.0").mkdir()
    publish_snapshot(root, ["part.0"])
    with pytest.raises(ValueError):
        vacuum_snapshots(root, keep_versions=0)
    # the live snapshot's data must still exist
    assert (tmp_path / "part.0").is_dir()


def test_same_process_replay_cannot_resurrect_folded_part(spark, sf_smoke):
    """The SAME writer instance must refuse to re-adopt a part its own
    compaction just folded (the streaming _SUCCESS-present replay path
    calls adopt() without a writer restart — only _discover_parts knew
    about folded parts before this guard)."""
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").limit(50)
    writer = _writer(spark, "same_process_replay")
    part0 = writer.write(li)
    writer.write(li)
    maybe_compact(writer, max_parts=1, defer_cleanup=True)
    assert writer.part_dirs == []
    # a replayed micro-batch re-adopts its (still on-disk) part dir
    writer.adopt(part0)
    assert writer.part_dirs == []  # no resurrection
    snap = current_snapshot(writer.root)
    assert sorted(snap.paths) == ["compact.0"]
    assert read_snapshot(spark, writer.root).count() == 100  # not 150
