from tsdb_parquet_spark.functions import (
    decontaminate,
    dedup,
    multimodal,
    ordering,
    pii,
    quality,
    similarity,
    text,
)

__all__ = [
    "decontaminate",
    "dedup",
    "multimodal",
    "ordering",
    "pii",
    "quality",
    "similarity",
    "text",
]
