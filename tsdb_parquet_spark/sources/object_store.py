"""Object-store sources (reference S2, `storage/bucket.go:21-52`).

The reference implements its own ranged-GET reader, section cache, and
16-way chunked range reader over GCS (`storage/chunked_reader.go:9-52`,
`db/sections.go:17-123`).  In Spark every one of those concerns lives in
the Hadoop filesystem connector; this module only centralizes the tuning
that replaces the reference's hand-rolled I/O layer, so that
``spark.read.parquet("gs://...")`` / ``("s3a://...")`` behaves like the
reference's reader:

- ranged reads + readahead   = fs.gs.inputstream.* / fs.s3a.readahead.range
  (reference: `db/section.go:85-134` async prefetch)
- connection pooling / parallel range GETs = fs.s3a.connection.maximum etc.
  (reference: `storage/chunked_reader.go:18` SectionChunks=16)
- footer caching = Spark driver plans from footers once
  (reference's `.metadata` sidecar, `db/writer.go:218-236`, is unneeded)

No network access exists in this environment, so these helpers only set
configuration; the read path itself is the same `spark.read.parquet` used
everywhere else (local paths in tests stand in for bucket URLs,
mirroring `filesystem.NewBucket` in the reference's own tests,
`prometheus/querier_test.go:131-149`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: connector tuning equivalent to the reference's I/O services (X3-X6)
S3A_DEFAULTS = {
    "fs.s3a.readahead.range": str(4 * 1024 * 1024),  # 4MiB prefetch buffers
    "fs.s3a.connection.maximum": "64",
    "fs.s3a.threads.max": "32",
    "fs.s3a.experimental.input.fadvise": "random",  # parquet point reads
    "fs.s3a.vectored.read.max.merged.size": "4M",
}

GCS_DEFAULTS = {
    "fs.gs.inputstream.min.range.request.size": str(256 * 1024),
    "fs.gs.inputstream.fadvise": "RANDOM",
    "fs.gs.http.max.retry": "10",
}


def configure_object_store(spark: SparkSession, scheme: str = "s3a") -> None:
    """Apply connector tuning to the session's Hadoop conf."""
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    defaults = S3A_DEFAULTS if scheme == "s3a" else GCS_DEFAULTS
    for key, value in defaults.items():
        conf.set(key, value)


def read_bucket_parquet(spark: SparkSession, url: str) -> DataFrame:
    """Open a Parquet dataset by URL (``s3a://``, ``gs://`` or local path)
    — the Spark form of `NewBucketReader` (`storage/bucket.go:21-34`)."""
    if url.startswith("s3a://"):
        configure_object_store(spark, "s3a")
    elif url.startswith("gs://"):
        configure_object_store(spark, "gs")
    return spark.read.parquet(url)
