"""Local replica of the driver's t2 gate: every corpus entry with an oracle
must hash-match DuckDB at sf0.01 (column names, row count, canonical
order-insensitive values)."""

import pytest

import __spark_entry__ as entry_mod
from tsdb_parquet_spark.oracle import compare


def _oracle_names():
    return sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_match(spark, sf_oracle, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    result = compare(name, fn(spark, sf_oracle), sql, sf_oracle)
    assert result.columns_match, (
        f"columns differ: spark={result.spark_cols} oracle={result.oracle_cols}"
    )
    assert result.spark_rows == result.oracle_rows, (
        f"row count: spark={result.spark_rows} oracle={result.oracle_rows}"
    )
    assert result.hash_match, f"value mismatch: {result.sample_diff}"
    assert not result.dtype_skew, (
        "oracle dtype skew (driver's strict hasher would fail even if "
        f"values agree): {result.dtype_skew}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == [
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_price",
        "cnt",
    ]


def test_every_query_has_runnable_df(spark, sf_smoke):
    """Every queries() entry must build and execute at smoke scale."""
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_smoke)
        assert df.count() >= 0, name
