"""S2 cloud-connector path (`storage/bucket.go:21-52`, `cmd/read/main.go:
44-55`): read parquet through Hadoop's s3a:// filesystem pointed at the
loopback RFC 7233 range server.

The server already speaks the GET/Range + HEAD surface S3A needs for
single-object reads; with path-style access and anonymous credentials
the hadoop-aws connector treats it as an S3 endpoint, so the SAME wire
protocol the ranged-GET bucket stack exercises is driven end-to-end by
Spark's own scan machinery.  The hadoop-aws + aws-sdk jars are not
bundled with PySpark; when they are absent (this sandbox — no network to
fetch them) every test here skip-marks, and `sources/object_store.py`'s
connector tuning remains config-only, exactly as documented.

Offline-jar probe (round 7, negative): searched the whole image —
pyspark/jars (only hadoop-client-api/runtime), every *.jar under /root
/opt /usr, the coursier cache (~/.cache/coursier), and ~/.m2 / ~/.ivy2
(absent) — for hadoop-aws*, aws-java-sdk*, or the v2 bundle-*.jar.
None exist, so this test CANNOT be un-skipped from local artifacts;
closing it needs a network fetch of hadoop-aws + aws-sdk-bundle
matching hadoop-client 3.4.x.
"""

from __future__ import annotations

import io

import pytest

from tsdb_parquet_spark.sources.http_range_server import RangeHTTPServer


def _s3a_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
        return True
    except Exception:
        return False


@pytest.fixture()
def parquet_bytes(spark, sf_smoke):
    df = spark.read.parquet(f"{sf_smoke}/region.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pandas(df.toPandas()), buf)
    return buf.getvalue()


def test_s3a_read_via_loopback_range_server(spark, parquet_bytes):
    if not _s3a_available(spark):
        pytest.skip(
            "hadoop-aws jar not on the classpath (no network in sandbox "
            "to fetch it); s3a path verified config-only"
        )
    # path-style access => GET /bucket/key on the endpoint host, which is
    # exactly the store-key layout the loopback server uses
    server = RangeHTTPServer(
        {"tsdb-test/region.parquet": parquet_bytes}
    ).start()
    try:
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        hconf.set("fs.s3a.endpoint", server.base_url())
        hconf.set("fs.s3a.path.style.access", "true")
        hconf.set("fs.s3a.connection.ssl.enabled", "false")
        hconf.set(
            "fs.s3a.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider",
        )
        # the loopback server serves no ETags; disable change detection
        hconf.set("fs.s3a.change.detection.mode", "none")
        df = spark.read.parquet("s3a://tsdb-test/region.parquet")
        assert df.count() == 5
        assert "r_name" in df.columns
    finally:
        server.stop()
