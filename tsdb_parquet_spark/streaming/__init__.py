from tsdb_parquet_spark.streaming.ingest import StreamingChunkIngestor

__all__ = ["StreamingChunkIngestor"]
