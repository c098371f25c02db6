from tsdb_parquet_spark.streaming.ingest import StreamingChunkIngestor
from tsdb_parquet_spark.streaming.receiver import (
    remote_write_spool_ingestor,
    scrape_spool_ingestor,
)

__all__ = [
    "StreamingChunkIngestor",
    "remote_write_spool_ingestor",
    "scrape_spool_ingestor",
]
