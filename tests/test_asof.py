"""As-of join operator tests (`operators/asof.py`)."""

import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.operators.asof import asof_join


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [("a", 100, 1.0), ("a", 200, 2.0), ("a", 50, 0.5), ("b", 100, 9.0)],
        "k STRING, ts LONG, lv DOUBLE",
    )
    right = spark.createDataFrame(
        [("a", 90, 10.0), ("a", 100, 11.0), ("a", 150, 12.0), ("c", 1, 0.0)],
        "k STRING, ts LONG, rv DOUBLE",
    )
    return left, right


def _by_ts(rows):
    return {(r["k"], r["ts"]): (r["ts_asof"], r["rv_asof"]) for r in rows}


def test_backward_inclusive(frames):
    left, right = frames
    out = _by_ts(asof_join(left, right, on=["k"]).collect())
    assert out[("a", 100)] == (100, 11.0)  # equal ts matches (inclusive)
    assert out[("a", 200)] == (150, 12.0)  # latest at-or-before
    assert out[("a", 50)] == (None, None)  # nothing before -> left join
    assert out[("b", 100)] == (None, None)  # key absent from right


def test_forward(frames):
    left, right = frames
    out = _by_ts(asof_join(left, right, on=["k"], direction="forward").collect())
    assert out[("a", 50)] == (90, 10.0)
    assert out[("a", 100)] == (100, 11.0)  # inclusive
    assert out[("a", 200)] == (None, None)  # nothing later


def test_tolerance(frames):
    left, right = frames
    out = _by_ts(
        asof_join(left, right, on=["k"], tolerance_ms=20).collect()
    )
    assert out[("a", 100)] == (100, 11.0)  # gap 0 <= 20
    assert out[("a", 200)] == (None, None)  # gap 50 > 20 -> nulled


def test_null_right_payload_does_not_mix_rows(spark):
    """A NULL value in the matched right row must stay NULL — not fall
    back to an older right row's value."""
    left = spark.createDataFrame([("a", 200, 1.0)], "k STRING, ts LONG, lv DOUBLE")
    right = spark.createDataFrame(
        [("a", 100, 10.0), ("a", 150, None)], "k STRING, ts LONG, rv DOUBLE"
    )
    row = asof_join(left, right, on=["k"]).collect()[0]
    assert row["ts_asof"] == 150 and row["rv_asof"] is None


def test_single_shuffle_no_bnlj(frames):
    """The plan must be the merge formulation: no BroadcastNestedLoopJoin
    / CartesianProduct, and exactly one Exchange (the key shuffle)."""
    left, right = frames
    plan = (
        asof_join(left, right, on=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
