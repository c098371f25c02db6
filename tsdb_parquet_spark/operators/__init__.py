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

__all__ = [
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
