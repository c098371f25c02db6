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


# ---------------------------------------------------------------------------
# property test: random irregular samples vs a pure-python reference
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _ref_gapfill(pts, start, end, step, method, fill_value, tolerance):
    """Reference implementation written directly from the docstring:
    pts = sorted [(ts, value)] for ONE key."""
    out = []
    for t in range(start, end + 1, step):
        before = [(ts, v) for ts, v in pts if ts <= t]
        after = [(ts, v) for ts, v in pts if ts >= t]
        exact = [v for ts, v in pts if ts == t]
        if method == "locf":
            if not before:
                out.append((t, None))
                continue
            ts0, v0 = before[-1]
            if tolerance is not None and t - ts0 > tolerance:
                out.append((t, None))
            else:
                out.append((t, v0))
        elif method == "value":
            out.append((t, exact[0] if exact else fill_value))
        else:  # linear
            if exact:
                out.append((t, exact[0]))
            elif before and after:
                (ts0, v0), (ts1, v1) = before[-1], after[0]
                out.append((t, v0 + (v1 - v0) * (t - ts0) / (ts1 - ts0)))
            else:
                out.append((t, None))
    return out


@settings(max_examples=12, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # ts slot
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=0,
        max_size=12,
        unique_by=lambda p: p[0],
    ),
    method=st.sampled_from(["locf", "linear", "value"]),
    tol=st.sampled_from([None, 20, 70]),
)
def test_gap_fill_matches_reference(spark, data, method, tol):
    START, END, STEP = 0, 500, 50
    pts = sorted((slot * 17, float(v)) for slot, v in data)  # off-grid ts
    rows = [("k", ts, v) for ts, v in pts]
    df = spark.createDataFrame(rows, "key STRING, ts LONG, value DOUBLE")
    got = {
        r["t"]: r["value"]
        for r in gap_fill(
            df,
            ["key"],
            START,
            END,
            STEP,
            method=method,
            fill_value=-1.0,
            tolerance_ms=tol if method == "locf" else None,
        ).collect()
    }
    want = dict(
        _ref_gapfill(
            pts, START, END, STEP, method, -1.0,
            tol if method == "locf" else None,
        )
    )
    if not pts:
        # no samples for the key -> no grid marks exist at all
        assert got == {}
        return
    assert set(got) == set(want)
    for t in want:
        if want[t] is None:
            assert got[t] is None, (t, got[t])
        else:
            assert got[t] == pytest.approx(want[t], rel=1e-9), (t,)
