from tsdb_parquet_spark.functions import text, dedup, similarity, multimodal

__all__ = ["text", "dedup", "similarity", "multimodal"]
