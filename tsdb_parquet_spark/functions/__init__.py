from tsdb_parquet_spark.functions import (
    clusters,
    decontaminate,
    dedup,
    multimodal,
    ordering,
    pii,
    pipeline,
    quality,
    sampling,
    similarity,
    text,
)

__all__ = [
    "clusters",
    "decontaminate",
    "dedup",
    "multimodal",
    "ordering",
    "pii",
    "pipeline",
    "quality",
    "sampling",
    "similarity",
    "text",
]
