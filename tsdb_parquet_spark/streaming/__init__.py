from tsdb_parquet_spark.streaming.ingest import StreamingChunkIngestor
from tsdb_parquet_spark.streaming.receiver import (
    otlp_spool_ingestor,
    remote_write_spool_ingestor,
    scrape_spool_ingestor,
)

__all__ = [
    "StreamingChunkIngestor",
    "otlp_spool_ingestor",
    "remote_write_spool_ingestor",
    "scrape_spool_ingestor",
]
