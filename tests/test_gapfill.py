"""Gap-fill operator tests (`operators/gapfill.py`)."""

import pytest

from tsdb_parquet_spark.operators.gapfill import gap_fill


@pytest.fixture()
def samples(spark):
    return spark.createDataFrame(
        [("a", 100, 10.0), ("a", 300, 30.0), ("b", 200, 5.0)],
        "k STRING, ts LONG, value DOUBLE",
    )


def _vals(rows, k):
    return {r["t"]: r["value"] for r in rows if r["k"] == k}


def test_locf(samples):
    out = gap_fill(samples, ["k"], 0, 400, 100, method="locf").collect()
    assert _vals(out, "a") == {0: None, 100: 10.0, 200: 10.0, 300: 30.0, 400: 30.0}
    assert _vals(out, "b") == {0: None, 100: None, 200: 5.0, 300: 5.0, 400: 5.0}


def test_locf_tolerance(samples):
    out = gap_fill(
        samples, ["k"], 0, 400, 100, method="locf", tolerance_ms=100
    ).collect()
    assert _vals(out, "a") == {0: None, 100: 10.0, 200: 10.0, 300: 30.0, 400: 30.0}
    assert _vals(out, "b")[300] == 5.0 and _vals(out, "b")[400] is None


def test_linear(samples):
    out = gap_fill(samples, ["k"], 0, 400, 100, method="linear").collect()
    a = _vals(out, "a")
    assert a[100] == 10.0 and a[300] == 30.0  # exact hits pass through
    assert a[200] == pytest.approx(20.0)  # interpolated
    assert a[0] is None and a[400] is None  # outside the observed span


def test_constant_fill(samples):
    out = gap_fill(
        samples, ["k"], 0, 200, 100, method="value", fill_value=0.0
    ).collect()
    assert _vals(out, "a") == {0: 0.0, 100: 10.0, 200: 0.0}


def test_off_grid_sample_interpolates(spark):
    # sample at 150 sits BETWEEN grid points: linear uses it as a knot
    df = spark.createDataFrame(
        [("a", 0, 0.0), ("a", 150, 15.0)], "k STRING, ts LONG, value DOUBLE"
    )
    out = gap_fill(df, ["k"], 0, 100, 100, method="linear").collect()
    v = {r["t"]: r["value"] for r in out}
    assert v[0] == 0.0
    assert v[100] == pytest.approx(10.0)  # 2/3 of the way 0 -> 15


def test_single_shuffle_plan(samples):
    plan = (
        gap_fill(samples, ["k"], 0, 400, 100, method="linear")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # both direction windows must share one sort: exactly one Sort node
    # above the union (plus no extra Exchange beyond grid-distinct + key)
    assert plan.count("WindowExec") <= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
