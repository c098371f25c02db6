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

__all__ = [
    "asof_join",
    "gap_fill",
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
