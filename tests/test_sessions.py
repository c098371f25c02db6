"""Sessionization tests: batch gaps-and-islands vs hand-computed sessions,
streaming applyInPandasWithState vs the batch result."""

import os
import shutil

from pyspark.sql import Window
from pyspark.sql import functions as F

from tsdb_parquet_spark.streaming.sessions import (
    StreamingSessionizer,
    sessionize,
)

WORK = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    ".work", "session_tests")

MIN = 60_000


def _events(spark):
    rows = [
        # user a: two sessions (gap of 90 min between 3rd and 4th event)
        ("a", 0 * MIN, 1.0), ("a", 10 * MIN, 2.0), ("a", 20 * MIN, 3.0),
        ("a", 110 * MIN, 4.0), ("a", 115 * MIN, 5.0),
        # user b: one session
        ("b", 5 * MIN, 10.0), ("b", 6 * MIN, 20.0),
    ]
    return spark.createDataFrame(rows, "user STRING, ts LONG, value DOUBLE")


def test_batch_sessionize(spark):
    out = sessionize(_events(spark), ["user"], value_col="value",
                     gap_ms=30 * MIN)
    got = {(r["user"], r["session_id"]):
           (r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
           for r in out.collect()}
    assert got == {
        ("a", 0): (0, 20 * MIN, 3, 6.0),
        ("a", 1): (110 * MIN, 115 * MIN, 2, 9.0),
        ("b", 0): (5 * MIN, 6 * MIN, 2, 30.0),
    }


def test_batch_sessionize_single_shuffle(spark):
    """Both windows and the final groupBy share the key partitioning —
    exactly one Exchange in the plan."""
    out = sessionize(_events(spark), ["user"], gap_ms=30 * MIN)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_streaming_sessionizer_matches_batch(spark):
    """An AvailableNow replay through the EventTimeTimeout operator must
    DRAIN ON ITS OWN (awaitTermination, no poll-and-stop) and emit exactly
    the batch sessionize result: in-stream gaps close mid-stream sessions,
    and the final watermark advance fires event-time timeouts for every
    session whose gap deadline it passed.  A far-future flush event on a
    sentinel key pushes the watermark past all real deadlines; only the
    sentinel's own tail stays withheld in state."""
    # shift off ts=0: a row exactly AT the initial watermark (0) is
    # filtered as late by the stateful operator's <= boundary — an
    # artifact of epoch-0 test data, not of real streams
    events = _events(spark).withColumn("ts", F.col("ts") + F.lit(MIN))
    staging = os.path.join(WORK, "staging")
    shutil.rmtree(staging, ignore_errors=True)
    events.coalesce(1).write.mode("overwrite").parquet(staging)
    flush = spark.createDataFrame(
        [("zz", 300 * MIN, 0.0)], "user STRING, ts LONG, value DOUBLE"
    )
    flush.coalesce(1).write.mode("append").parquet(staging)

    out_dir = os.path.join(WORK, "out")
    ckpt = os.path.join(WORK, "ckpt")
    for d in (out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    stream = spark.readStream.schema(events.schema).parquet(staging)
    closed = StreamingSessionizer(gap_ms=30 * MIN).apply(
        stream, key_col="user"
    )
    q = (
        closed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "AvailableNow replay did not terminate"

    got = {
        (r["key"], r["session_start"], r["session_end"],
         r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    expect = {
        (r["user"], r["session_start"], r["session_end"], r["n_events"],
         r["sum_value"])
        for r in sessionize(events, ["user"], value_col="value",
                            gap_ms=30 * MIN).collect()
    }
    assert got == expect  # ALL real sessions, tails included
    assert len(got) == 3


# ---------------------------------------------------------------------------
# property test: random event streams vs a pure-python reference
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _ref_sessions(ts_list, gap_ms):
    """Reference gaps-and-islands: a new session starts when the gap
    from the previous event exceeds gap_ms (strictly)."""
    sessions = []
    for ts in sorted(ts_list):
        if not sessions or ts - sessions[-1][-1] > gap_ms:
            sessions.append([ts])
        else:
            sessions[-1].append(ts)
    return [
        (i, s[0], s[-1], len(s)) for i, s in enumerate(sessions)
    ]


@settings(max_examples=12, deadline=None)
@given(
    ts_list=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=25,
        unique=True,
    ),
    gap=st.sampled_from([100, 500, 2_000]),
)
def test_sessionize_matches_reference(spark, ts_list, gap):
    df = spark.createDataFrame(
        [("u", int(t)) for t in ts_list], "user STRING, ts LONG"
    )
    got = sorted(
        (
            r["session_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
        )
        for r in sessionize(df, ["user"], gap_ms=gap).collect()
    )
    assert got == _ref_sessions(ts_list, gap)
