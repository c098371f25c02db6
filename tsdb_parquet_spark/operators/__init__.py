from tsdb_parquet_spark.operators.selection import (
    Matcher,
    equals,
    not_equals,
    regex_match,
    regex_not_match,
    gte,
    lte,
    conjunction,
    apply_matchers,
)
from tsdb_parquet_spark.operators.distinct import (
    distinct_rows,
    first_row_per_key,
    unique_by_column,
)
from tsdb_parquet_spark.operators.asof import asof_join
from tsdb_parquet_spark.operators.gapfill import gap_fill
from tsdb_parquet_spark.operators.replicas import dedup_replicas

__all__ = [
    "asof_join",
    "gap_fill",
    "dedup_replicas",
    "Matcher",
    "equals",
    "not_equals",
    "regex_match",
    "regex_not_match",
    "gte",
    "lte",
    "conjunction",
    "apply_matchers",
    "distinct_rows",
    "first_row_per_key",
    "unique_by_column",
]
