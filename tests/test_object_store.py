"""Object-store source tests (reference S2) — as far as a sandbox with no
network allows: the connector tuning must land in the Hadoop conf, and
``read_bucket_parquet`` must dispatch per URL scheme before building the
reader plan.  The read path itself is the same ``spark.read.parquet``
every local test exercises (the reference's own tests substitute a
filesystem bucket the same way, `prometheus/querier_test.go:131-149`)."""

import pytest

from tsdb_parquet_spark.sources.object_store import (
    GCS_DEFAULTS,
    S3A_DEFAULTS,
    configure_object_store,
    read_bucket_parquet,
)


def _hadoop_conf(spark):
    return spark.sparkContext._jsc.hadoopConfiguration()


def test_configure_sets_documented_s3a_keys(spark):
    configure_object_store(spark, "s3a")
    conf = _hadoop_conf(spark)
    for key, want in S3A_DEFAULTS.items():
        assert conf.get(key) == want, key
    # the tuning that replaces the reference's hand-rolled I/O layer is
    # present: prefetch (db/section.go:85-134), pooled parallel range
    # GETs (storage/chunked_reader.go:18), point-read fadvise
    assert int(conf.get("fs.s3a.readahead.range")) >= 1024 * 1024
    assert int(conf.get("fs.s3a.connection.maximum")) >= 16
    assert conf.get("fs.s3a.experimental.input.fadvise") == "random"


def test_configure_sets_documented_gcs_keys(spark):
    configure_object_store(spark, "gs")
    conf = _hadoop_conf(spark)
    for key, want in GCS_DEFAULTS.items():
        assert conf.get(key) == want, key


def test_read_bucket_parquet_local_path(spark, sf_smoke):
    df = read_bucket_parquet(spark, f"{sf_smoke}/region.parquet")
    assert df.count() > 0


def test_read_bucket_parquet_dispatches_scheme(spark):
    """An s3a:// URL must apply the s3a tuning BEFORE the read attempt;
    without network/credentials the read itself fails, but the conf
    proves the dispatch (the plan-construction half S2 can verify
    offline)."""
    conf = _hadoop_conf(spark)
    conf.unset("fs.s3a.readahead.range")
    with pytest.raises(Exception):
        read_bucket_parquet(spark, "s3a://no-such-bucket/x.parquet")
    assert (
        conf.get("fs.s3a.readahead.range")
        == S3A_DEFAULTS["fs.s3a.readahead.range"]
    )
