from tsdb_parquet_spark.sources.bucket import (
    ChunkedBucketReader,
    FilesystemBucket,
    HTTPBucket,
    read_parquet_distributed,
)
from tsdb_parquet_spark.sources.writer import (
    SortedParquetWriter,
    write_sorted,
    compact,
)

__all__ = [
    "SortedParquetWriter",
    "write_sorted",
    "compact",
    "FilesystemBucket",
    "HTTPBucket",
    "ChunkedBucketReader",
    "read_parquet_distributed",
]
