"""Sorted-Parquet write path + compaction (reference S5/S6).

The reference buffers <=256Ki rows, sorts by (`__name__`, `__mint`,
`__maxt`, labels...), and writes `part.N.parquet` with zstd, dictionary
encoding, a split-block bloom filter per label column, 8 KiB pages and page
statistics (`db/writer.go:44-58`, `169-216`, `198-208`); `Compact()` k-way
merges all parts into one globally sorted file (`db/writer.go:97-159`).

Spark-first translation:

- a *part* is one sorted Parquet file per shuffle partition:
  ``repartitionByRange(sort_cols)`` (range-partition so files tile the key
  space — the property the reference gets from buffering+sorting) then
  ``sortWithinPartitions`` — each output file is internally sorted AND
  files are disjoint in key range, which is what makes min/max pruning
  effective across a 100 TB table;
- *compaction* is the same job re-run over many part directories — Spark's
  shuffle-backed sort replaces the explicit k-way merge and spills to disk
  instead of OOMing;
- bloom filters / page size / statistics are plain parquet-hadoop writer
  options — no custom code, and the read side (Spark's vectorized reader)
  exploits them automatically, which covers the reference's whole pruning
  stack (P8-P13).

At 100 TB: ``target_partitions`` scales the file count (aim for ~512 MB-1 GB
files); range partitioning keeps every query's predicate on the sort prefix
touching a small, contiguous subset of files.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# Reference writer constants (`db/writer.go:19-22`): 8 KiB pages, 256Ki-row
# parts.  Small pages buy fine-grained zone-map pruning at the cost of
# metadata volume; both are configurable per table.
REFERENCE_PAGE_SIZE = 8 * 1024
REFERENCE_PART_ROWS = 256 * 1024


@dataclass
class WriterOptions:
    sort_columns: list[str]
    bloom_columns: list[str] = field(default_factory=list)
    compression: str = "zstd"
    page_size: int = REFERENCE_PAGE_SIZE
    dictionary: bool = True
    rows_per_part: int = REFERENCE_PART_ROWS
    max_files: int | None = None  # cap on output files (partitions)
    #: columns to force out of dictionary encoding.  parquet-java skips the
    #: bloom filter when a column chunk is fully dictionary-encoded (the
    #: dictionary is already an exact membership filter); at 100 TB high-
    #: cardinality label columns overflow the dictionary and blooms kick in
    #: automatically, but tests / known-high-cardinality columns can force it.
    no_dictionary_columns: list[str] = field(default_factory=list)
    #: hive-style partition columns (e.g. a derived day column): at 100 TB
    #: the driver prunes whole directories before any footer is read —
    #: coarser and cheaper than row-group zone maps
    partition_by: list[str] = field(default_factory=list)

    def apply(self, writer):
        writer = (
            writer.option("compression", self.compression)
            .option("parquet.page.size", str(self.page_size))
            .option("parquet.enable.dictionary", str(self.dictionary).lower())
            # page-level statistics for zone-map pruning
            # (`db/writer.go:205` parquet.DataPageStatistics(true))
            .option("parquet.page.write-checksum.enabled", "false")
        )
        for col in self.bloom_columns:
            # split-block bloom filter per label column
            # (`db/writer.go:55-58`, 10 bits/value)
            writer = writer.option(f"parquet.bloom.filter.enabled#{col}", "true")
        for col in self.no_dictionary_columns:
            writer = writer.option(f"parquet.enable.dictionary#{col}", "false")
        return writer


def _partition_count(
    df: DataFrame, opts: WriterOptions, n_rows: int | None = None
) -> int:
    # Estimate parts from the known row count (caller-provided) or the
    # plan's row-count statistic so a 100 TB input yields proportionally
    # many files; fall back to the session's shuffle parallelism.
    if n_rows is None:
        try:
            n_rows = int(
                df._jdf.queryExecution().optimizedPlan().stats().rowCount().get()
            )
        except Exception:
            n_rows = None
    if n_rows is not None:
        parts = max(1, (n_rows + opts.rows_per_part - 1) // opts.rows_per_part)
    else:
        parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if opts.max_files:
        parts = min(parts, opts.max_files)
    return parts


def write_sorted(
    df: DataFrame,
    out_dir: str,
    opts: WriterOptions,
    n_rows: int | None = None,
) -> str:
    """S5 — write ``df`` as range-partitioned, internally sorted parquet
    parts honoring the reference layout contract (`db/writer.go:169-216`).

    ``n_rows``: exact input size when the caller already knows it (e.g. a
    counted+cached micro-batch).  A batch that fits one part then skips the
    range shuffle entirely — ``coalesce(1)`` + in-partition sort produces
    the same single globally sorted file without an exchange.
    """
    n = _partition_count(df, opts, n_rows=n_rows)
    sort_cols = [c for c in opts.sort_columns if c in df.columns]
    shuffle_cols = [c for c in opts.partition_by if c in df.columns] + [
        c for c in sort_cols if c not in opts.partition_by
    ]
    if shuffle_cols and n == 1 and n_rows is not None and not opts.partition_by:
        df = df.coalesce(1).sortWithinPartitions(*shuffle_cols)
    elif shuffle_cols:
        df = df.repartitionByRange(n, *shuffle_cols).sortWithinPartitions(
            *shuffle_cols
        )
    writer = opts.apply(df.write.mode("overwrite"))
    if opts.partition_by:
        writer = writer.partitionBy(*opts.partition_by)
    writer.parquet(out_dir)
    return out_dir


def compact(
    spark: SparkSession,
    part_dirs: list[str] | str,
    out_dir: str,
    opts: WriterOptions,
) -> str:
    """S6 — merge many sorted part directories into one globally sorted
    dataset (`db/writer.go:97-159`).  Spark's range-shuffle sort subsumes
    the reference's k-way merge (`parquet.MergeRowGroups`) and spills
    instead of holding everything in memory."""
    paths = [part_dirs] if isinstance(part_dirs, str) else list(part_dirs)
    # read each part root separately and union: several hive-partitioned
    # roots in ONE read.parquet call trip partition discovery ("Suspicious
    # paths"), and per-root reads keep each part's partition column intact
    df = spark.read.parquet(paths[0])
    for p in paths[1:]:
        df = df.unionByName(spark.read.parquet(p))
    return write_sorted(df, out_dir, opts)


class SortedParquetWriter:
    """Buffered writer facade mirroring `db.Writer` (`db/writer.go:60-95`):
    ``write(df)`` appends a sorted part directory, ``compact()`` merges all
    parts written so far.  Parts live under ``root/part.N``; the compacted
    output under ``root/compact``."""

    def __init__(self, spark: SparkSession, root: str, opts: WriterOptions):
        self.spark = spark
        self.root = root
        self.opts = opts
        #: part dirs included in the most recent ``compact()`` merge.  A
        #: periodic cleanup job must delete exactly this list — re-listing
        #: ``part_dirs`` after the merge would also catch parts landed by a
        #: concurrent micro-batch *between* merge and delete, losing them.
        self.last_compacted_parts: list[str] = []
        os.makedirs(root, exist_ok=True)
        existing = [
            int(d.split(".", 1)[1])
            for d in os.listdir(root)
            if d.startswith("part.") and d.split(".", 1)[1].isdigit()
        ]
        self._next_part = max(existing) + 1 if existing else 0

    @property
    def part_dirs(self) -> list[str]:
        return [
            os.path.join(self.root, d)
            for d in sorted(os.listdir(self.root))
            if d.startswith("part.")
        ]

    def write(self, df: DataFrame) -> str:
        part_dir = os.path.join(self.root, f"part.{self._next_part}")
        self._next_part += 1
        return write_sorted(df, part_dir, self.opts)

    def compact(self) -> str:
        """Merge all current parts PLUS the previous compaction output (if
        any) into a fresh ``root/compact``.

        Including the prior compact dir makes repeated part->compact cycles
        lossless (a periodic ``maybe_compact`` job deletes parts after each
        merge — without this the next cycle would overwrite the survivors).
        The merge lands in a temp dir first and is swapped in by rename, so
        a failed merge leaves the previous compact output intact.  On an
        object store the swap would be a manifest pointer update instead of
        a rename; the single-writer maintenance job assumption is the same.
        """
        out = os.path.join(self.root, "compact")
        parts = self.part_dirs
        self.last_compacted_parts = parts
        inputs = parts
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            inputs = inputs + [out]
        tmp = os.path.join(self.root, ".compact.next")
        shutil.rmtree(tmp, ignore_errors=True)
        compact(self.spark, inputs, tmp, self.opts)
        shutil.rmtree(out, ignore_errors=True)
        os.rename(tmp, out)
        return out
