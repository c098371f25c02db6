"""Snapshot manifests: atomic publication of a store's live directory set.

The reference swaps its single compacted file in place at conversion end
(`cmd/convert/main.go:123-125`) — fine for a write-once store, but a store
that compacts *while being read* needs readers pinned to a consistent file
set.  The standard table-format answer (Iceberg/Delta, scaled down to the
reference's needs) is:

- every writer action publishes ``_snapshots/MANIFEST.<version>.json``
  listing the store directories that are live *after* the action;
- a one-file ``_snapshots/CURRENT`` pointer is swapped with an atomic
  rename (``os.replace``) — on an object store this is a single-object
  PUT, the only primitive the design needs;
- readers resolve CURRENT once and read exactly that directory set; a
  compaction that retires directories mid-scan cannot disturb them because
  retired directories are deleted only by ``vacuum_snapshots`` after a
  version grace window, never by the compaction itself.

Granularity is the *directory set* (part dirs, compact versions).  Day-
partition retention (`maintenance.retention_sweep`) deletes subtrees inside
a live directory and is NOT snapshot-isolated — it targets partitions past
the retention horizon, which no well-formed query scans; an object-store
deployment wanting full isolation would lift ``__day=`` partitions into the
manifest as separate entries.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SNAP_DIR = "_snapshots"
_CURRENT = "CURRENT"


@dataclass(frozen=True)
class Snapshot:
    version: int
    created_ms: int
    #: store-root-relative directory names, in read order
    paths: tuple[str, ...]

    def absolute(self, root: str) -> list[str]:
        return [os.path.join(root, p) for p in self.paths]


def _snap_dir(root: str) -> str:
    return os.path.join(root, SNAP_DIR)


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_snap_dir(root), f"MANIFEST.{version:08d}.json")


def publish_snapshot(
    root: str, rel_paths: list[str], version: int | None = None
) -> int:
    """Write the manifest for ``rel_paths`` and atomically repoint CURRENT.

    The manifest lands fully written *before* the pointer moves, so a crash
    between the two steps leaves CURRENT on the previous (still complete)
    snapshot — the half-published manifest is garbage that the next publish
    overwrites.  Returns the published version number."""
    snap = _snap_dir(root)
    os.makedirs(snap, exist_ok=True)
    # cross-PROCESS mutual exclusion on one node (live ingest + a CLI
    # vacuum are the real concurrent pair): version assignment and the
    # CURRENT repoint happen under an exclusive flock, so two publishers
    # can no longer mint the same version and silently clobber each
    # other's path set.  Multi-node writers over a shared object store
    # need an external catalog (the reference is single-writer too).
    import fcntl

    lock_fh = open(os.path.join(snap, ".lock"), "a+")
    fcntl.flock(lock_fh, fcntl.LOCK_EX)
    try:
        return _publish_locked(root, snap, rel_paths, version)
    finally:
        fcntl.flock(lock_fh, fcntl.LOCK_UN)
        lock_fh.close()


def _publish_locked(
    root: str, snap: str, rel_paths: list[str], version: int | None
) -> int:
    if version is None:
        version = latest_version(root) + 1
    body = {
        "version": version,
        "created_ms": int(time.time() * 1000),
        "paths": list(rel_paths),
    }
    mpath = _manifest_path(root, version)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(body, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, mpath)
    cur_tmp = os.path.join(snap, _CURRENT + ".tmp")
    with open(cur_tmp, "w") as fh:
        fh.write(str(version))
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(cur_tmp, os.path.join(snap, _CURRENT))
    return version


def latest_version(root: str) -> int:
    """Highest manifest version on disk (0 if none) — resilient to a crash
    that published a manifest but not the CURRENT pointer."""
    snap = _snap_dir(root)
    if not os.path.isdir(snap):
        return 0
    versions = [
        int(name.split(".")[1])
        for name in os.listdir(snap)
        if name.startswith("MANIFEST.") and name.endswith(".json")
    ]
    return max(versions, default=0)


def current_snapshot(root: str, version: int | None = None) -> Snapshot | None:
    """Resolve CURRENT (or a pinned ``version``) to its Snapshot; None when
    the store has never published."""
    snap = _snap_dir(root)
    if version is None:
        cur = os.path.join(snap, _CURRENT)
        if not os.path.exists(cur):
            return None
        with open(cur) as fh:
            version = int(fh.read().strip())
    mpath = _manifest_path(root, version)
    if not os.path.exists(mpath):
        return None
    with open(mpath) as fh:
        body = json.load(fh)
    return Snapshot(
        version=body["version"],
        created_ms=body["created_ms"],
        paths=tuple(body["paths"]),
    )


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """DataFrame over exactly the directories of one snapshot.  Per-root
    reads unioned (several hive-partitioned roots in one ``read.parquet``
    call trip partition discovery, same reason as ``writer.compact``)."""
    from tsdb_parquet_spark.sources.writer import read_roots

    snap = current_snapshot(root, version)
    if snap is None or not snap.paths:
        raise FileNotFoundError(f"no snapshot published under {root}")
    return read_roots(spark, snap.absolute(root))


def list_versions(root: str) -> list[int]:
    snap = _snap_dir(root)
    if not os.path.isdir(snap):
        return []
    return sorted(
        int(name.split(".")[1])
        for name in os.listdir(snap)
        if name.startswith("MANIFEST.") and name.endswith(".json")
    )


def vacuum_snapshots(root: str, keep_versions: int = 2) -> dict:
    """Delete store directories referenced only by retired snapshots.

    Keeps the newest ``keep_versions`` manifests (the grace window: any
    reader that resolved CURRENT within the last ``keep_versions`` writer
    actions still finds every file of its pinned snapshot).  A directory is
    removed only when *no kept manifest* references it.  Directories never
    referenced by any manifest (scratch, checkpoints, the snapshot dir
    itself) are untouched."""
    import shutil

    if keep_versions < 1:
        # keep_versions=0 would empty keep_paths and rmtree the LIVE
        # snapshot's directories — refuse rather than destroy the store
        raise ValueError("keep_versions must be >= 1 (the live snapshot)")
    versions = list_versions(root)
    if not versions:
        return {"removed_dirs": [], "removed_manifests": []}
    kept = versions[-keep_versions:]
    keep_paths: set[str] = set()
    for v in kept:
        snap = current_snapshot(root, v)
        if snap:
            keep_paths.update(snap.paths)
    referenced_ever: set[str] = set()
    removed_manifests: list[str] = []
    for v in versions:
        snap = current_snapshot(root, v)
        if snap:
            referenced_ever.update(snap.paths)
        if v not in kept:
            os.remove(_manifest_path(root, v))
            removed_manifests.append(f"MANIFEST.{v:08d}.json")
    removed_dirs: list[str] = []
    for rel in sorted(referenced_ever - keep_paths):
        target = os.path.join(root, rel)
        if os.path.islink(target) or not os.path.isdir(target):
            continue
        shutil.rmtree(target, ignore_errors=True)
        removed_dirs.append(rel)
    return {"removed_dirs": removed_dirs, "removed_manifests": removed_manifests}
