"""Ranged bucket reader tests (reference S2, `storage/bucket.go:21-52`,
`storage/chunked_reader.go:9-44`): the filesystem backend (the backend the
reference's own tests use), ReadAt semantics, the 16-way chunked reader,
parquet-over-bucket with byte-level column pruning, and the distributed
row-group fan-out read."""

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tsdb_parquet_spark.sources.bucket import (
    BucketFile,
    BucketReader,
    ChunkedBucketReader,
    FilesystemBucket,
    ReadTelemetry,
    open_parquet,
    read_parquet_distributed,
)


@pytest.fixture()
def bucket(tmp_path):
    return FilesystemBucket(str(tmp_path))


def test_upload_get_attributes_iter_delete(bucket):
    bucket.upload("a/x.bin", b"hello")
    bucket.upload("a/y.bin", b"world!")
    bucket.upload("b/z.bin", b"?")
    assert bucket.get("a/x.bin") == b"hello"
    assert bucket.attributes("a/y.bin").size == 6
    assert bucket.exists("a/x.bin") and not bucket.exists("a/missing")
    assert list(bucket.iter("a/")) == ["a/x.bin", "a/y.bin"]
    assert list(bucket.iter()) == ["a/x.bin", "a/y.bin", "b/z.bin"]
    bucket.delete("b/z.bin")
    assert not bucket.exists("b/z.bin")


def test_object_name_cannot_escape_root(bucket):
    with pytest.raises(ValueError):
        bucket.get("../../etc/passwd")


def test_get_range_matches_slice(bucket):
    blob = bytes(random.Random(7).randrange(256) for _ in range(10_000))
    bucket.upload("blob", blob)
    for off, length in [(0, 10), (9_990, 10), (5_000, 0), (9_995, 100), (123, 4_567)]:
        # short read past EOF truncates, like a ranged GET
        assert bucket.get_range("blob", off, length) == blob[off : off + length]


def test_chunked_reader_reassembles_exactly(bucket):
    """Big range → many part GETs, byte-identical reassembly
    (`storage/chunked_reader.go:23-44`)."""
    blob = bytes(random.Random(11).randrange(256) for _ in range(1 << 18))
    bucket.upload("blob", blob)
    tel = ReadTelemetry()
    chunked = ChunkedBucketReader(
        BucketReader(bucket, "blob", tel), max_read_size=1 << 12
    )
    got = chunked.read_at(100, 200_000)
    assert got == blob[100 : 100 + 200_000]
    # ceil(200000/4096)=49 part GETs, no full-object read
    assert tel.gets == 49
    assert tel.bytes == 200_000
    # small read passes through as a single GET
    assert chunked.read_at(5, 100) == blob[5:105]
    assert tel.gets == 50


def test_bucket_file_seek_read_protocol(bucket):
    blob = b"0123456789" * 100
    bucket.upload("blob", blob)
    reader = BucketReader(bucket, "blob")
    f = BucketFile(reader, len(blob))
    f.seek(-10, os.SEEK_END)
    assert f.read() == b"0123456789"
    f.seek(3)
    assert f.read(4) == b"3456"
    assert f.tell() == 7


def _write_parquet(bucket, name, n_rows=20_000, row_group_size=4_000):
    table = pa.table(
        {
            "k": pa.array(range(n_rows), pa.int64()),
            "v": pa.array([i * 0.5 for i in range(n_rows)], pa.float64()),
            "pad": pa.array([("x%06d" % i) * 8 for i in range(n_rows)]),
        }
    )
    import io as _io

    buf = _io.BytesIO()
    pq.write_table(table, buf, row_group_size=row_group_size)
    bucket.upload(name, buf.getvalue())
    return table


def test_parquet_over_bucket_projection_prunes_bytes(bucket):
    """Projecting one narrow column must read footer + that column's
    chunks only — bytes fetched ≪ object size (the reference's whole
    reason for ranged GETs, `storage/bucket.go:36-44`)."""
    _write_parquet(bucket, "t.parquet")
    size = bucket.attributes("t.parquet").size
    tel = ReadTelemetry()
    pf = open_parquet(bucket, "t.parquet", telemetry=tel)
    got = pf.read(columns=["k"])
    assert got.column("k").to_pylist() == list(range(20_000))
    assert tel.gets >= 2  # footer tail read + column chunk reads
    assert tel.bytes < size // 2, (tel.bytes, size)


def test_parquet_over_bucket_full_read_roundtrips(bucket):
    table = _write_parquet(bucket, "t.parquet")
    pf = open_parquet(bucket, "t.parquet", max_read_size=1 << 14)
    assert pf.read().equals(table)


def test_distributed_read_matches_native_scan(spark, bucket):
    _write_parquet(bucket, "t.parquet", n_rows=10_000, row_group_size=1_000)
    df = read_parquet_distributed(spark, bucket, "t.parquet", columns=["k", "v"])
    native = spark.read.parquet(
        os.path.join(bucket.root, "t.parquet")
    ).select("k", "v")
    assert df.schema == native.schema
    assert sorted(df.collect()) == sorted(native.collect())
    # fan-out really split by row group: 10 tasks worth of input
    assert df.rdd.getNumPartitions() == 10


# ---------------------------------------------------------------------------
# HTTP backend over a loopback range server
# ---------------------------------------------------------------------------

from tsdb_parquet_spark.sources.bucket import HTTPBucket  # noqa: E402
from tsdb_parquet_spark.sources.http_range_server import (  # noqa: E402
    RangeHTTPServer,
)


@pytest.fixture()
def http_env():
    srv = RangeHTTPServer().start()
    try:
        yield srv, HTTPBucket(srv.base_url, index_object="_index")
    finally:
        srv.stop()


def test_http_bucket_roundtrip(http_env):
    srv, bucket = http_env
    bucket.upload("a/x.bin", b"hello")
    bucket.upload("_index", b"a/x.bin\nb/y.bin\n")
    assert bucket.get("a/x.bin") == b"hello"
    assert bucket.attributes("a/x.bin").size == 5
    assert bucket.exists("a/x.bin") and not bucket.exists("missing")
    assert list(bucket.iter("a/")) == ["a/x.bin"]
    bucket.delete("a/x.bin")
    assert not bucket.exists("a/x.bin")


def test_http_bucket_name_cannot_escape(http_env):
    _, bucket = http_env
    with pytest.raises(ValueError):
        bucket.get("../secrets")


def test_http_get_range_is_true_partial_content(http_env):
    srv, bucket = http_env
    blob = bytes(random.Random(13).randrange(256) for _ in range(50_000))
    srv.objects["blob"] = blob
    for off, length in [(0, 10), (49_990, 10), (5_000, 0), (49_995, 100), (123, 4_567)]:
        assert bucket.get_range("blob", off, length) == blob[off : off + length]


def test_parquet_over_http_projection_prunes_bytes(http_env):
    """The full ranged-read stack over a REAL socket: footer tail GET +
    column-chunk GETs, each an RFC 7233 Range request; projected bytes
    ≪ object size just like the filesystem backend."""
    srv, bucket = http_env
    _write_parquet(bucket, "t.parquet")
    size = bucket.attributes("t.parquet").size
    tel = ReadTelemetry()
    pf = open_parquet(bucket, "t.parquet", telemetry=tel)
    got = pf.read(columns=["k"])
    assert got.column("k").to_pylist() == list(range(20_000))
    assert tel.gets >= 2
    assert tel.bytes < size // 2, (tel.bytes, size)


def test_distributed_read_over_http_matches_native(spark, http_env, tmp_path):
    """Executor-side Python workers (separate PROCESSES) fetch their row
    groups' byte ranges over loopback HTTP — the exact topology of a
    cluster scan against an object store."""
    srv, bucket = http_env
    _write_parquet(bucket, "t.parquet", n_rows=10_000, row_group_size=1_000)
    df = read_parquet_distributed(spark, bucket, "t.parquet", columns=["k", "v"])
    # write the same object to disk for the native comparison scan
    p = tmp_path / "t.parquet"
    p.write_bytes(srv.objects["t.parquet"])
    native = spark.read.parquet(str(p)).select("k", "v")
    assert df.schema == native.schema
    assert sorted(df.collect()) == sorted(native.collect())
    assert df.rdd.getNumPartitions() == 10


def test_http_bucket_range_ignoring_server_fallback(http_env):
    """A server that ignores Range (200 + full body) must still yield a
    correct slice — correctness never depends on server capability."""
    import http.server
    import threading

    class NoRange(http.server.BaseHTTPRequestHandler):
        blob = bytes(range(256)) * 4

        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)  # ignores any Range header
            self.send_header("Content-Length", str(len(self.blob)))
            self.end_headers()
            self.wfile.write(self.blob)

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), NoRange)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        bucket = HTTPBucket(f"http://127.0.0.1:{httpd.server_address[1]}")
        assert bucket.get_range("x", 10, 20) == NoRange.blob[10:30]
        assert bucket.get_range("x", 1000, 50) == NoRange.blob[1000:1050]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_bucket_iter_requires_index(http_env):
    srv, _ = http_env
    no_index = HTTPBucket(srv.base_url)  # no index_object configured
    with pytest.raises(NotImplementedError):
        list(no_index.iter())


def test_http_bucket_encoded_names_roundtrip(http_env):
    srv, bucket = http_env
    bucket.upload("dir with space/f+g.bin", b"enc")
    assert bucket.get("dir with space/f+g.bin") == b"enc"
    assert bucket.exists("dir with space/f+g.bin")
    # the server stores under the RAW name (handler unquotes)
    assert "dir with space/f+g.bin" in srv.objects


def test_chunked_reader_close_and_pickle(bucket):
    """The persistent worker pool must shut down on close() and must not
    ride along in pickles (a live ThreadPoolExecutor is unpicklable and
    would break a reader captured in a Spark closure)."""
    import pickle

    blob = bytes(range(256)) * 64
    bucket.upload("pkl", blob)
    chunked = ChunkedBucketReader(
        BucketReader(bucket, "pkl"), max_read_size=1 << 10
    )
    assert chunked.read_at(0, 8_000) == blob[:8_000]  # pool now live
    assert chunked._pool is not None
    state = pickle.loads(pickle.dumps(chunked))
    assert state._pool is None  # pool excluded from the pickle
    # the rebuilt reader works (pool lazily recreated on demand)
    assert state.read_at(100, 5_000) == blob[100:5_100]
    chunked.close()
    assert chunked._pool is None
    # close is idempotent and reads still work after (fresh pool)
    chunked.close()
    assert chunked.read_at(0, 3_000) == blob[:3_000]


def test_chunked_reader_close_race(bucket):
    """close() racing concurrent multi-part reads must never hand a
    reader a shut-down executor (RuntimeError on submit): the pool lock
    covers the create+submit critical section, so every read either
    fully enqueues before a shutdown or rebuilds a fresh pool."""
    import threading

    blob = bytes(range(256)) * 64
    bucket.upload("race", blob)
    chunked = ChunkedBucketReader(
        BucketReader(bucket, "race"), max_read_size=1 << 10
    )
    errors: list[BaseException] = []
    stop = threading.Event()

    def reader_loop():
        try:
            while not stop.is_set():
                assert chunked.read_at(0, 5_000) == blob[:5_000]
        except BaseException as exc:  # noqa: BLE001 - recorded for assert
            errors.append(exc)

    threads = [threading.Thread(target=reader_loop) for _ in range(4)]
    for t in threads:
        t.start()
    for _ in range(200):
        chunked.close()
    stop.set()
    for t in threads:
        t.join()
    chunked.close()
    assert not errors, errors
