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


# ---------------------------------------------------------------------------
# property test: random series vs a pure-python reference
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _ref_asof(left_pts, right_pts, direction, tolerance):
    """Reference from the docstring: per left ts, the right row with the
    largest right_ts <= ts (backward) / smallest >= ts (forward), then
    the tolerance check."""
    out = []
    for lt in left_pts:
        if direction == "backward":
            cands = [(rt, v) for rt, v in right_pts if rt <= lt]
            pick = max(cands) if cands else None
        else:
            cands = [(rt, v) for rt, v in right_pts if rt >= lt]
            pick = min(cands) if cands else None
        if pick is not None and tolerance is not None and abs(
            pick[0] - lt
        ) > tolerance:
            pick = None
        out.append((lt, None if pick is None else pick[1]))
    return out


@settings(max_examples=12, deadline=None)
@given(
    left_ts=st.lists(
        st.integers(min_value=0, max_value=400), min_size=1, max_size=10,
        unique=True,
    ),
    right=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=0,
        max_size=10,
        unique_by=lambda p: p[0],
    ),
    direction=st.sampled_from(["backward", "forward"]),
    tol=st.sampled_from([None, 30, 150]),
)
def test_asof_matches_reference(spark, left_ts, right, direction, tol):
    left = spark.createDataFrame(
        [("k", int(t)) for t in left_ts], "key STRING, ts LONG"
    )
    right_df = spark.createDataFrame(
        [("k", int(t), float(v)) for t, v in right],
        "key STRING, ts LONG, price DOUBLE",
    )
    got = {
        r["ts"]: r["price_asof"]
        for r in asof_join(
            left,
            right_df,
            ["key"],
            right_cols=["price"],
            direction=direction,
            tolerance_ms=tol,
        ).collect()
    }
    want = dict(
        _ref_asof(
            sorted(left_ts),
            sorted((t, float(v)) for t, v in right),
            direction,
            tol,
        )
    )
    assert got == want
