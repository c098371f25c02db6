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


def test_driver_window_round6_composition():
    """The driver hash-checks only the first 50 REGISTRY rows; pin the
    round-6 window so an accidental registry edit cannot silently push a
    due row (r03/r04 backlog, new, or changed-code) out of the window.
    Update this list ONLY together with the rotation comment in
    corpus.py (and the round-rotation memory note)."""
    from tsdb_parquet_spark.corpus import REGISTRY

    window = list(REGISTRY)[:50]
    must_be_in = {
        # oldest driver signal (r03)
        "q61_gap_fill_linear", "q62_simhash_near_dup", "q63_weighted_sample",
        # introduced this round
        "q101_png_pixel_pipeline", "q102_promql_sort_by_label",
        # code changed this round
        "q10_write_compact_roundtrip", "q29_multimodal_metadata",
        "q83_store_maintenance", "q92_semantic_dedup",
    }
    assert must_be_in <= set(window), sorted(must_be_in - set(window))
    # deferred rows (documented in the rotation comment) are NOT in it
    deferred = {
        "q05_distinct", "q06_first_per_key", "q07_groupby_agg",
        "q11_predicate_order", "q14_multi_projection", "q15_empty_result",
    }
    assert not (deferred & set(window))
    assert len(window) == len(set(window)) == 50
