"""Store maintenance: compaction policy + time-based retention.

The reference compacts once, manually, at conversion end
(`cmd/convert/main.go:123-125`) and has no retention story.  A long-running
store needs both as periodic jobs:

- ``maybe_compact``: merge accumulated streaming parts once they exceed a
  threshold (keeps read amplification bounded without compacting after
  every micro-batch);
- ``retention_sweep``: drop whole day partitions older than the horizon —
  an O(1)-per-partition directory delete, which is the reason the store is
  day-partitioned in the first place (no rewrite, no tombstones).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

from tsdb_parquet_spark.sources.writer import SortedParquetWriter

DAY_MS = 86_400_000


def maybe_compact(
    writer: SortedParquetWriter,
    max_parts: int = 8,
    defer_cleanup: bool = False,
) -> str | None:
    """Compact when the part count exceeds ``max_parts``; returns the
    compact dir when compaction ran, else None.

    Safe to run periodically beside a live ingestor: ``compact`` folds the
    previous compaction output into the merge, and the cleanup below
    deletes exactly the parts that merge consumed
    (``writer.last_compacted_parts``) — never a re-listed set, so a part
    landed by a concurrent micro-batch between the merge and the delete
    survives for the next cycle.

    With ``defer_cleanup=True`` nothing is deleted here: consumed parts
    (and the retired ``compact.N-1``) stay on disk, dropped out of the
    published manifest, until a later ``manifest.vacuum_snapshots`` call —
    the mode to use when concurrent READERS may hold a pre-compaction
    snapshot open (they finish their scan on the retired files)."""
    if len(writer.part_dirs) <= max_parts:
        return None
    compact_dir = writer.compact()
    if not defer_cleanup:
        for part in writer.last_compacted_parts:
            shutil.rmtree(part, ignore_errors=True)
        # retire superseded compact versions (alias already moved on)
        current = os.path.basename(compact_dir)
        for entry in os.listdir(writer.root):
            if (
                entry.startswith("compact.")
                and entry != current
                and entry.split(".", 1)[1].isdigit()
            ):
                shutil.rmtree(
                    os.path.join(writer.root, entry), ignore_errors=True
                )
    return compact_dir


def retention_sweep(
    store_dir: str, now_ms: int, keep_days: int
) -> list[str]:
    """Delete ``__day=N`` partition directories entirely before the
    horizon.  Returns the removed partition names.  Only valid on stores
    written with ``WriterOptions.partition_by=["__day"]``."""
    cutoff_day = (now_ms // DAY_MS) - keep_days
    removed = []
    for entry in sorted(os.listdir(store_dir)):
        if not entry.startswith("__day="):
            continue
        try:
            day = int(entry.split("=", 1)[1])
        except ValueError:
            continue
        if day < cutoff_day:
            shutil.rmtree(os.path.join(store_dir, entry))
            removed.append(entry)
    return removed


def vacuum_store(
    spark: SparkSession, store_dir: str, now_ms: int, keep_days: int
) -> dict:
    """Retention sweep + a read-back sanity count; the periodic maintenance
    entry point."""
    removed = retention_sweep(store_dir, now_ms, keep_days)
    remaining = spark.read.parquet(store_dir).count() if _has_data(store_dir) else 0
    return {"removed_partitions": removed, "remaining_chunks": remaining}


def _has_data(store_dir: str) -> bool:
    for _root, _dirs, files in os.walk(store_dir):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False
