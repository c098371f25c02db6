"""Replica dedup (`operators/replicas.py`): windowed vote semantics,
tie-break, no-interleave guarantee, plan shape."""

import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.operators.replicas import dedup_replicas

W = 1_000


@pytest.fixture(scope="module")
def replicated(spark):
    pts = {
        # bucket0: only a; bucket1: b denser; bucket2: only b;
        # bucket3: equal counts (tie)
        "a": [10, 20, 30, 1010, 3010],
        "b": [1020, 1040, 2010, 2020, 3020],
    }
    rows = [
        ("m", r, t, float(100 + t)) for r, ts in pts.items() for t in ts
    ]
    return spark.createDataFrame(
        rows, "`__name__` STRING, replica STRING, ts LONG, value DOUBLE"
    )


def test_windowed_vote(replicated):
    out = dedup_replicas(replicated, window_ms=W)
    assert sorted(r["ts"] for r in out.collect()) == [
        10, 20, 30,      # bucket0: a
        1020, 1040,      # bucket1: b wins 2-1 (a's 1010 dropped)
        2010, 2020,      # bucket2: b
        3010,            # bucket3 tie: min replica a wins
    ]
    assert "replica" not in out.columns


def test_no_interleaving_within_bucket(replicated):
    # every bucket's surviving samples come from ONE replica (checked
    # against the fixture's known ts->replica ownership; a tag COLUMN
    # would join the series identity and defeat the vote)
    owner = {
        r["ts"]: r["replica"] for r in replicated.collect()
    }
    out = dedup_replicas(replicated, window_ms=W)
    per_bucket: dict[int, set] = {}
    for r in out.collect():
        per_bucket.setdefault(r["ts"] // W, set()).add(owner[r["ts"]])
    assert per_bucket and all(len(v) == 1 for v in per_bucket.values())


def test_multiseries_independent(spark):
    rows = [
        ("m", "x", "a", 10, 1.0),
        ("m", "x", "b", 20, 2.0), ("m", "x", "b", 30, 3.0),
        ("m", "y", "a", 10, 4.0), ("m", "y", "a", 20, 5.0),
        ("m", "y", "b", 30, 6.0),
    ]
    df = spark.createDataFrame(
        rows,
        "`__name__` STRING, job STRING, replica STRING, ts LONG, "
        "value DOUBLE",
    )
    out = dedup_replicas(df, window_ms=W)
    got = sorted((r["job"], r["ts"]) for r in out.collect())
    # series x: b wins (2-1); series y: a wins (2-1)
    assert got == [("x", 20), ("x", 30), ("y", 10), ("y", 20)]


def test_missing_replica_column_raises(spark):
    df = spark.createDataFrame([("m", 1, 1.0)], "`__name__` STRING, ts LONG, value DOUBLE")
    with pytest.raises(ValueError, match="nothing to dedup"):
        dedup_replicas(df)


def test_no_forced_broadcast_hint(replicated):
    """The winner set grows as series x time-buckets, so the semi-join
    must NOT carry a broadcast hint (a hint overrides the size
    threshold and OOMs the driver at scale) — the join strategy is
    AQE's runtime call.  On this tiny fixture AQE still promotes the
    join to a broadcast, proving nothing was lost for small sets."""
    df = dedup_replicas(replicated, window_ms=W)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in optimized
    df.collect()  # finalize the adaptive plan
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in final
    assert "BatchEvalPython" not in final
    assert "BroadcastHashJoin" in final  # AQE-chosen, not forced


def test_ts_bounds_prunes_and_matches_unbounded(replicated):
    """ts_bounds must clip the output to the exact range while voting
    over whole edge buckets — identical survivors to filtering the
    unbounded result."""
    unbounded = dedup_replicas(replicated, window_ms=W)
    want = sorted(
        r["ts"] for r in unbounded.collect() if 1015 <= r["ts"] <= 2015
    )
    bounded = dedup_replicas(replicated, window_ms=W, ts_bounds=(1015, 2015))
    assert sorted(r["ts"] for r in bounded.collect()) == want
    # the whole-bucket-widened bound ([1000, 2999] for W=1000) reaches
    # below the vote aggregate, not just the output clip
    optimized = bounded._jdf.queryExecution().optimizedPlan().toString()
    assert "1000" in optimized and "2999" in optimized


def test_engine_samples_transform_bounded_vote(spark, tmp_path):
    """The serve path's per-REQUEST bounded vote (r13 verdict #5):
    `PromQLEngine(samples_transform=...)` applies the replica vote per
    selector evaluation with THAT query's ts bounds — the vote's scan
    reads only touched buckets (bounds pushed to EVERY parquet scan in
    the plan), the replica label never appears as a series label, and
    the answer equals deduping the whole store up front."""
    import re

    from tsdb_parquet_spark.plans.promql import PromQLEngine

    rows = [
        ("app", et, sh, rep, t * 60_000, float(t + ord(rep)))
        for et in ("click", "view")
        for sh in ("0", "1")
        for rep in ("a", "b")
        for t in range(1, 200)
        # replica a misses a stretch, b misses another
        if not (rep == "a" and 50 <= t < 80)
        and not (rep == "b" and 120 <= t < 140)
    ]
    path = str(tmp_path / "replicated")
    spark.createDataFrame(
        rows,
        "`__name__` STRING, event_type STRING, shard STRING, "
        "replica STRING, ts LONG, value DOUBLE",
    ).write.mode("overwrite").parquet(path)
    base = spark.read.parquet(path)

    def transform(df, lo, hi):
        bounds = (lo, hi) if lo is not None and hi is not None else None
        return dedup_replicas(df, "replica", window_ms=5 * 60_000,
                              ts_bounds=bounds)

    eng = PromQLEngine(base, samples_transform=transform)
    assert "replica" not in eng.label_columns
    assert "replica" not in eng.metadata_frame().columns

    t0, t1, step = 60 * 60_000, 90 * 60_000, 10 * 60_000
    out = eng.query_range("sum by (event_type) (app)", t0, t1, step)
    # every scan in the plan carries the query's ts bounds — the vote
    # aggregates only touched buckets, never unqueried history
    plan = out._jdf.queryExecution().executedPlan().toString()
    scans = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    assert scans and all("ts" in s for s in scans), scans

    # answer parity vs the startup whole-store dedup
    whole = PromQLEngine(dedup_replicas(base, "replica",
                                        window_ms=5 * 60_000))
    want = sorted(
        (r["t"], r["event_type"], r["value"])
        for r in whole.query_range(
            "sum by (event_type) (app)", t0, t1, step
        ).collect()
    )
    got = sorted(
        (r["t"], r["event_type"], r["value"]) for r in out.collect()
    )
    assert got == want and got


def test_api_server_hides_replica_with_transform(spark):
    """/series over a transform engine: the replica label is projected
    away (no winner vote on the metadata path) and the series set is
    the deduped one."""
    from tsdb_parquet_spark.api import series_result
    from tsdb_parquet_spark.plans.promql import PromQLEngine

    rows = [
        ("m", "x", rep, t, 1.0)
        for rep in ("a", "b")
        for t in (10, 20)
    ]
    base = spark.createDataFrame(
        rows,
        "`__name__` STRING, job STRING, replica STRING, ts LONG, "
        "value DOUBLE",
    )

    def transform(df, lo, hi):
        bounds = (lo, hi) if lo is not None and hi is not None else None
        return dedup_replicas(df, ts_bounds=bounds)

    eng = PromQLEngine(base, samples_transform=transform)
    series = series_result(eng, ["m"])
    assert series == [{"__name__": "m", "job": "x"}]


def test_federate_values_go_through_the_vote(spark):
    """/federate returns VALUES, not metadata: with a transform engine
    it must export the vote WINNER's latest sample — a losing replica's
    later stray sample must not leak (the metadata-only projection
    would have returned it)."""
    from tsdb_parquet_spark.api import render_federate
    from tsdb_parquet_spark.plans.promql import PromQLEngine
    from tsdb_parquet_spark.scrape import parse_exposition

    rows = [
        # bucket 0 (W=1000): replica a has 3 samples (wins);
        # replica b has 1 LATER sample that must not be exported
        ("m", "x", "a", 10, 1.0),
        ("m", "x", "a", 20, 2.0),
        ("m", "x", "a", 30, 3.0),
        ("m", "x", "b", 40, 99.0),
    ]
    base = spark.createDataFrame(
        rows,
        "`__name__` STRING, job STRING, replica STRING, ts LONG, "
        "value DOUBLE",
    )

    def transform(df, lo, hi):
        bounds = (lo, hi) if lo is not None and hi is not None else None
        return dedup_replicas(df, window_ms=W, ts_bounds=bounds)

    eng = PromQLEngine(base, samples_transform=transform)
    text = render_federate(eng, ["m"], time_ms=500, lookback_ms=1000)
    [(labels, value, ts_ms)] = list(parse_exposition(text))
    assert "replica" not in labels
    assert (ts_ms, value) == (30, 3.0)  # winner's latest, not b's 99.0
