from tsdb_parquet_spark.sources.writer import (
    SortedParquetWriter,
    write_sorted,
    compact,
)

__all__ = ["SortedParquetWriter", "write_sorted", "compact"]
