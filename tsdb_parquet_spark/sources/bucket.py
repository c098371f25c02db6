"""Object-store bucket abstraction with ranged reads (reference S2).

The reference reads parquet from GCS through three layers:

- ``objstore.Bucket`` — Get / GetRange / Attributes / Iter
  (`storage/bucket.go:12-52`, via thanos objstore);
- ``BucketReader.ReadAt`` — every parquet footer / page read becomes a
  ranged GET (`storage/bucket.go:36-44`);
- ``chunkedBucketReader`` — large ranges split into ``maxReadSize`` parts
  fetched by 16 concurrent goroutines (`storage/chunked_reader.go:9-44`).

This module re-expresses that stack in Python with the SAME split, plus a
Spark-scale read path the reference lacks:

- :class:`FilesystemBucket` — the local backend (the reference's own tests
  use ``filesystem.NewBucket`` the same way,
  `prometheus/querier_test.go:131-149`).
- :class:`HTTPBucket` — ranged GETs over real HTTP (RFC 7233 Range
  headers): any static file server / S3 website endpoint / CDN front.
  For s3a:// and gs:// prefer the Hadoop connectors configured in
  :mod:`tsdb_parquet_spark.sources.object_store` — Spark's own scan is
  already a ranged-GET reader per executor; HTTPBucket covers backends
  Spark has no connector for, and lets tests exercise the wire protocol
  against a loopback server (:mod:`.http_range_server`).
- :class:`BucketReader` / :class:`ChunkedBucketReader` — ReadAt over one
  object; the chunked variant fans a big range out over a thread pool
  (``concurrency=16`` like the reference).
- :class:`BucketFile` — a seekable file object over ``ReadAt`` so
  ``pyarrow.parquet.ParquetFile`` performs footer + column-chunk reads as
  ranged GETs (the reference's `db/file_reader.go` role).
- :func:`read_parquet_distributed` — the 100 TB shape: the DRIVER makes
  one tail ranged read to plan row groups from the footer; each EXECUTOR
  task opens the bucket itself and reads only its row group's byte ranges.
  Parallelism lives in Spark tasks across executors, not a driver thread
  pool — the chunked reader then parallelizes WITHIN a task's range.

Everything here is pure stdlib + pyarrow; tests touch no network beyond
the OS loopback (the range server binds 127.0.0.1 only).
"""

from __future__ import annotations

import io
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

#: default split size for chunked ranged reads — the reference's
#: ``SectionChunks=16`` divides a section; we fix the part size instead so
#: behavior is independent of request size (1 MiB parts, 16-way).
DEFAULT_MAX_READ_SIZE = 1 << 20
DEFAULT_CONCURRENCY = 16


@dataclass
class ObjectAttributes:
    """`objstore.ObjectAttributes` analog (`storage/bucket.go:31-33`)."""

    size: int
    last_modified: float


@dataclass
class ReadTelemetry:
    """Counts ranged GETs — the observable the reference prints on every
    ``ReadAt`` (`storage/bucket.go:37`).  Used by tests and the q87 gate
    to prove reads are ranged (many small GETs, bytes << object size)."""

    gets: int = 0
    bytes: int = 0
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def record(self, n: int) -> None:
        with self._lock:
            self.gets += 1
            self.bytes += n


class FilesystemBucket:
    """Local-directory object store — Get/GetRange/Iter/Upload/Attributes
    over files under ``root`` (the reference tests' ``filesystem.NewBucket``).

    Picklable (holds only the root path), so executor tasks can open their
    own handles — required by :func:`read_parquet_distributed`.
    """

    def __init__(self, root: str) -> None:
        self.root = os.path.abspath(root)

    def _path(self, name: str) -> str:
        p = os.path.abspath(os.path.join(self.root, name))
        if not p.startswith(self.root + os.sep) and p != self.root:
            raise ValueError(f"object name escapes bucket root: {name!r}")
        return p

    def get(self, name: str) -> bytes:
        with open(self._path(name), "rb") as fh:
            return fh.read()

    def get_range(self, name: str, off: int, length: int) -> bytes:
        if off < 0 or length < 0:
            raise ValueError("negative offset/length")
        with open(self._path(name), "rb") as fh:
            fh.seek(off)
            return fh.read(length)

    def attributes(self, name: str) -> ObjectAttributes:
        st = os.stat(self._path(name))
        return ObjectAttributes(size=st.st_size, last_modified=st.st_mtime)

    def exists(self, name: str) -> bool:
        return os.path.isfile(self._path(name))

    def iter(self, prefix: str = "") -> Iterator[str]:
        """Yield object names under ``prefix`` in sorted order."""
        for dirpath, _dirs, files in sorted(os.walk(self.root)):
            for f in sorted(files):
                rel = os.path.relpath(os.path.join(dirpath, f), self.root)
                if rel.startswith(prefix):
                    yield rel

    def upload(self, name: str, data: bytes) -> None:
        p = self._path(name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        # pid-suffixed temp: concurrent uploaders of the same object must
        # not interleave writes into a shared .tmp before the atomic PUT
        tmp = f"{p}.tmp-{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, p)  # atomic like object-store PUT

    def delete(self, name: str) -> None:
        os.remove(self._path(name))


class HTTPBucket:
    """HTTP(S) object-store backend: objects live under a base URL and
    every ranged read is an RFC 7233 ``Range: bytes=a-b`` GET — the same
    wire shape the reference's thanos-objstore GCS/S3 clients issue for
    ``GetRange`` (`storage/bucket.go:36-44`); any static file server,
    S3 website endpoint, or CDN front works unmodified.

    Pure stdlib (urllib).  Picklable — holds only the base URL — so
    executor tasks in :func:`read_parquet_distributed` open their own
    connections, exactly like S3 clients on a real cluster.

    HTTP has no standard listing, so ``iter`` reads an optional
    newline-separated ``index_object`` when configured (object-store
    listings are a control-plane call anyway; the data plane is GETs).
    ``upload``/``delete`` issue PUT/DELETE for servers that allow them.
    """

    def __init__(
        self,
        base_url: str,
        index_object: str | None = None,
        timeout: float = 30.0,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.index_object = index_object
        self.timeout = timeout

    def _url(self, name: str) -> str:
        from urllib.parse import quote

        if name.startswith("/") or ".." in name.split("/"):
            raise ValueError(f"object name escapes bucket: {name!r}")
        return f"{self.base_url}/{quote(name)}"

    def _request(self, name: str, method: str = "GET", headers=None):
        import urllib.request

        req = urllib.request.Request(
            self._url(name), method=method, headers=headers or {}
        )
        return urllib.request.urlopen(req, timeout=self.timeout)

    def get(self, name: str) -> bytes:
        with self._request(name) as resp:
            return resp.read()

    def get_range(self, name: str, off: int, length: int) -> bytes:
        if off < 0 or length < 0:
            raise ValueError("negative offset/length")
        if length == 0:
            return b""
        hdr = {"Range": f"bytes={off}-{off + length - 1}"}
        with self._request(name, headers=hdr) as resp:
            body = resp.read()
            if resp.status == 206:
                return body
            # server ignored Range (200 + full body): slice locally so
            # correctness never depends on server capability
            return body[off : off + length]

    def attributes(self, name: str) -> ObjectAttributes:
        from email.utils import parsedate_to_datetime

        with self._request(name, method="HEAD") as resp:
            size = int(resp.headers.get("Content-Length", "0"))
            lm = resp.headers.get("Last-Modified")
            ts = parsedate_to_datetime(lm).timestamp() if lm else 0.0
            return ObjectAttributes(size=size, last_modified=ts)

    def exists(self, name: str) -> bool:
        import urllib.error

        try:
            with self._request(name, method="HEAD"):
                return True
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return False
            raise

    def iter(self, prefix: str = "") -> Iterator[str]:
        if self.index_object is None:
            raise NotImplementedError(
                "HTTPBucket listing needs an index_object (HTTP has no "
                "standard listing API)"
            )
        for line in self.get(self.index_object).decode().splitlines():
            name = line.strip()
            if name and name.startswith(prefix):
                yield name

    def upload(self, name: str, data: bytes) -> None:
        import urllib.request

        req = urllib.request.Request(
            self._url(name), data=data, method="PUT"
        )
        with urllib.request.urlopen(req, timeout=self.timeout):
            pass

    def delete(self, name: str) -> None:
        with self._request(name, method="DELETE"):
            pass


class BucketReader:
    """ReadAt over one named object (`storage/bucket.go:21-52`): every
    read is a ranged GET against the bucket."""

    def __init__(
        self, bucket: FilesystemBucket, name: str, telemetry: ReadTelemetry | None = None
    ) -> None:
        self.bucket = bucket
        self.name = name
        self.telemetry = telemetry

    def size(self) -> int:
        return self.bucket.attributes(self.name).size

    def read_at(self, off: int, length: int) -> bytes:
        data = self.bucket.get_range(self.name, off, length)
        if self.telemetry is not None:
            self.telemetry.record(len(data))
        return data


class ChunkedBucketReader:
    """Split a large ranged read into ``max_read_size`` parts fetched
    concurrently (`storage/chunked_reader.go:23-44`, 16-way).  Small reads
    pass through without pool overhead."""

    def __init__(
        self,
        reader: BucketReader,
        max_read_size: int = DEFAULT_MAX_READ_SIZE,
        concurrency: int = DEFAULT_CONCURRENCY,
    ) -> None:
        if max_read_size <= 0:
            raise ValueError("max_read_size must be positive")
        self.reader = reader
        self.max_read_size = max_read_size
        self.concurrency = concurrency
        self._pool: ThreadPoolExecutor | None = None
        # serializes pool create/submit/teardown: close() racing a
        # concurrent read_at must not hand that read a shut-down
        # executor (RuntimeError on submit)
        self._pool_lock = threading.Lock()

    def read_at(self, off: int, length: int) -> bytes:
        if length <= self.max_read_size:
            return self.reader.read_at(off, length)
        parts = []
        for start in range(0, length, self.max_read_size):
            end = min(start + self.max_read_size, length)
            parts.append((off + start, end - start))
        # one persistent pool per reader, reused across read_at calls —
        # the analog of the reference's long-lived 16 goroutines; a
        # fresh pool per call pays thread spawn/join on every multi-part
        # read.  Lazily created so small-read-only consumers never spawn
        # threads.  The lock is held through SUBMISSION (Executor.map
        # submits all futures eagerly before returning) so a concurrent
        # close() can never shut the pool down between creation and
        # submit; result consumption happens outside the lock.
        with self._pool_lock:
            if self._pool is None:
                self._pool = ThreadPoolExecutor(max_workers=self.concurrency)
            results = self._pool.map(
                lambda p: self.reader.read_at(*p), parts
            )
        return b"".join(results)

    def close(self) -> None:
        """Release pool threads.  Without this a long-lived process that
        creates many readers accumulates up to ``concurrency`` idle
        threads per instance until interpreter exit.

        Safe against a concurrent ``read_at``: the lock covers the
        reader's create+submit critical section, so a read either has
        fully enqueued its work before shutdown (``shutdown(wait=False)``
        lets queued work finish, only rejecting NEW submissions) or
        re-creates a fresh pool afterwards."""
        with self._pool_lock:
            if self._pool is not None:
                self._pool.shutdown(wait=False)
                self._pool = None

    def __del__(self) -> None:  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass

    # a live ThreadPoolExecutor is unpicklable; drop it so an instance
    # captured in a Spark closure serializes (the pool is lazily rebuilt
    # on first multi-part read on the executor side)
    def __getstate__(self) -> dict:
        state = self.__dict__.copy()
        state["_pool"] = None
        state.pop("_pool_lock", None)  # locks are unpicklable
        return state

    def __setstate__(self, state: dict) -> None:
        self.__dict__.update(state)
        self._pool_lock = threading.Lock()


class BucketFile(io.RawIOBase):
    """Seekable read-only file over a (Chunked)BucketReader, so pyarrow's
    parquet reader issues footer / column-chunk reads as ranged GETs —
    the role `db/file_reader.go` plays over `storage.BucketReader`."""

    def __init__(self, reader: BucketReader | ChunkedBucketReader, size: int) -> None:
        super().__init__()
        self._reader = reader
        self._size = size
        self._pos = 0

    def readable(self) -> bool:  # pragma: no cover - io protocol
        return True

    def seekable(self) -> bool:  # pragma: no cover - io protocol
        return True

    def seek(self, offset: int, whence: int = io.SEEK_SET) -> int:
        if whence == io.SEEK_SET:
            self._pos = offset
        elif whence == io.SEEK_CUR:
            self._pos += offset
        elif whence == io.SEEK_END:
            self._pos = self._size + offset
        else:  # pragma: no cover - io protocol
            raise ValueError(f"bad whence {whence}")
        return self._pos

    def tell(self) -> int:
        return self._pos

    def read(self, length: int = -1) -> bytes:
        if length is None or length < 0:
            length = self._size - self._pos
        length = max(0, min(length, self._size - self._pos))
        if length == 0:
            return b""
        data = self._reader.read_at(self._pos, length)
        self._pos += len(data)
        return data

    def readinto(self, b) -> int:  # pragma: no cover - io protocol
        data = self.read(len(b))
        b[: len(data)] = data
        return len(data)


def open_parquet(
    bucket,
    name: str,
    telemetry: ReadTelemetry | None = None,
    max_read_size: int = DEFAULT_MAX_READ_SIZE,
):
    """Open ``name`` as a ``pyarrow.parquet.ParquetFile`` whose every read
    is a ranged GET (footer first — a tail range — then only the byte
    ranges of projected column chunks)."""
    import pyarrow.parquet as pq

    reader = BucketReader(bucket, name, telemetry)
    size = reader.size()
    chunked = ChunkedBucketReader(reader, max_read_size=max_read_size)
    return pq.ParquetFile(BucketFile(chunked, size))


def read_parquet_distributed(
    spark: SparkSession,
    bucket,
    name: str,
    columns: Sequence[str] | None = None,
    telemetry: ReadTelemetry | None = None,
) -> DataFrame:
    """Distributed parquet-over-bucket scan: the 100 TB shape of the
    reference's single-node reader.

    Driver: ONE ranged tail read plans row groups from the footer (the
    reference reads its `.metadata` sidecar for the same purpose,
    `db/writer.go:218-236`).  Executors: one task per row group; each task
    opens the bucket itself and reads ONLY its row group's column-chunk
    byte ranges through the chunked ranged reader — no full-object GET
    anywhere, column pruning reaches the byte level.

    For s3a:// / gs:// production paths prefer ``spark.read.parquet`` —
    Spark's own scan already does exactly this per executor; this function
    exists for bucket backends Spark has no connector for.
    """
    from pyspark.sql.pandas.types import from_arrow_schema

    pf = open_parquet(bucket, name, telemetry=telemetry)
    n_groups = pf.metadata.num_row_groups
    arrow_schema = pf.schema_arrow
    if columns is not None:
        import pyarrow as pa

        arrow_schema = pa.schema([arrow_schema.field(c) for c in columns])
    spark_schema = from_arrow_schema(arrow_schema)

    cols = list(columns) if columns is not None else None
    # backends are picklable config-only objects (FilesystemBucket: root
    # path; HTTPBucket: base URL) — each task deserializes its own copy
    # and opens its own connections, like S3 clients on a real cluster
    exec_bucket, obj = bucket, name

    def scan(batches):
        for pdf in batches:
            for rg in pdf["rg"]:
                part = open_parquet(exec_bucket, obj)
                table = part.read_row_group(int(rg), columns=cols)
                yield from (b.to_pandas() for b in table.to_batches())

    tasks = spark.createDataFrame([(i,) for i in range(n_groups)], "rg int")
    # one task per row group — repartition so groups don't serialize on one core
    tasks = tasks.repartition(max(1, n_groups))
    return tasks.mapInPandas(scan, schema=spark_schema)
