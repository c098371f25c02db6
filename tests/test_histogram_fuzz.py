"""Seeded random fuzzing of histogram_quantile / histogram_fraction
against an independent pure-Python bucket-math evaluator.

Bucket data is generated from random underlying observations (so
cumulative counts are always well-formed), and the reference
implementations below are written directly from the semantics —
bucketQuantile's rank interpolation and the piecewise-linear CDF —
not from the engine's column expressions.  A divergence means one of
the two independent implementations is wrong."""

from __future__ import annotations

import math
import random

import pytest

from tsdb_parquet_spark.plans.promql import PromQLEngine

T0 = 60_000
JOBS = ("api", "web", "db")
EDGE_SETS = [
    (1.0, 2.0, 4.0, 8.0),
    (0.5, 1.0, 5.0, 25.0, 125.0),
    (2.0, 3.0),
    # negative / mixed-sign edges: native histograms with negative
    # observations expand to classic buckets with le < 0
    # (histograms.expand_to_classic), so the `le <= 0` lowest-bucket
    # rule and negative-start interpolation are reachable
    (-8.0, -4.0, -2.0, -1.0),
    (-4.0, -1.0, 0.0, 1.0, 4.0),
    (-2.0, 0.5, 8.0),
]


def _make_buckets(rng: random.Random, edges):
    """Random observations -> cumulative (le_str, count) incl. +Inf."""
    n = rng.randint(0, 40)
    span = edges[-1] - edges[0]
    lo = edges[0] - 0.25 * span - 1.0
    hi = edges[-1] + 0.5 * span + 1.0
    obs = [rng.uniform(lo, hi) for _ in range(n)]
    cum = []
    for e in edges:
        cum.append((repr(e), float(sum(1 for o in obs if o <= e))))
    cum.append(("+Inf", float(n)))
    return cum


def _dataset(seed: int):
    rng = random.Random(seed)
    per_job = {}
    rows = []
    for i, job in enumerate(JOBS):
        # job 0 always draws a negative/mixed-sign edge set so every
        # dataset exercises the le <= 0 rule; the rest are random
        if i == 0:
            edges = EDGE_SETS[3 + seed % 3]
        else:
            edges = EDGE_SETS[rng.randrange(len(EDGE_SETS))]
        buckets = _make_buckets(rng, edges)
        per_job[job] = buckets
        for le, cnt in buckets:
            rows.append(("hb_bucket", job, le, T0, cnt))
    return rows, per_job


# --------------------------------------------------------------------------
# independent reference math (from the spec, not the engine)
# --------------------------------------------------------------------------


def ref_quantile(q: float, buckets) -> float | None:
    bs = [
        (math.inf if le == "+Inf" else float(le), c) for le, c in buckets
    ]
    bs.sort()
    total = bs[-1][1]
    if total == 0:
        return None
    rank = q * total
    prev_le, prev_cnt = None, 0.0
    for le, cnt in bs:
        if cnt >= rank and (prev_cnt < rank or prev_le is None):
            if math.isinf(le):
                fins = [b for b, _ in bs if not math.isinf(b)]
                return max(fins) if fins else None
            if prev_le is None and le <= 0:
                # promql/quantile.go: the first bucket's implicit lower
                # bound is -Inf when its upper bound is <= 0 — return
                # the bound, never interpolate from 0
                return le
            start = prev_le if prev_le is not None else 0.0
            return start + (le - start) * (rank - prev_cnt) / (cnt - prev_cnt)
        prev_le, prev_cnt = le, cnt
    return None


def ref_fraction(lo: float, hi: float, buckets) -> float | None:
    bs = [
        (math.inf if le == "+Inf" else float(le), c) for le, c in buckets
    ]
    bs.sort()
    total = bs[-1][1]
    if total == 0:
        return None
    if lo >= hi:
        return 0.0

    def cdf(x: float) -> float:
        c = 0.0
        prev_le, prev_cnt = None, 0.0
        for le, cnt in bs:
            inc = cnt - prev_cnt
            if math.isinf(le):
                if math.isinf(x) and x > 0:
                    c += inc
            else:
                start = prev_le if prev_le is not None else 0.0
                width = le - start
                if width > 0:
                    c += inc * max(0.0, min(1.0, (x - start) / width))
                elif x >= le:
                    c += inc
            prev_le, prev_cnt = le, cnt
        return c

    return (cdf(hi) - cdf(lo)) / total


@pytest.fixture(scope="module")
def engines(spark):
    out = {}
    for seed in (7, 11, 13):
        rows, per_job = _dataset(seed)
        df = spark.createDataFrame(
            rows,
            "`__name__` STRING, job STRING, le STRING, ts LONG, "
            "value DOUBLE",
        )
        out[seed] = (PromQLEngine(df), per_job)
    return out


def _got(engine, expr):
    rows = engine.query_range(expr, T0, T0, 60_000).collect()
    return {r["job"]: r["value"] for r in rows}


def test_histogram_quantile_fuzz(engines):
    rng = random.Random(99)
    n_checked = 0
    for seed, (engine, per_job) in engines.items():
        for _ in range(8):
            q = rng.choice([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
            got = _got(engine, f"histogram_quantile({q}, hb_bucket)")
            for job, buckets in per_job.items():
                want = ref_quantile(q, buckets)
                if want is None:
                    assert job not in got or math.isnan(got[job]), (
                        seed, q, job
                    )
                    continue
                assert got[job] == pytest.approx(want, rel=1e-9), (
                    seed, q, job, buckets
                )
                n_checked += 1
    assert n_checked > 40


def test_histogram_fraction_fuzz(engines):
    rng = random.Random(101)
    n_checked = 0
    for seed, (engine, per_job) in engines.items():
        for _ in range(10):
            kind = rng.randrange(4)
            if kind == 0:
                lo, hi = sorted(
                    (rng.uniform(-10, 10), rng.uniform(-10, 10))
                )
            elif kind == 1:
                lo, hi = -math.inf, rng.uniform(-10, 12)
            elif kind == 2:
                lo, hi = rng.uniform(-10, 12), math.inf
            else:
                lo, hi = -math.inf, math.inf

            def fmt(x):
                if math.isinf(x):
                    return "+Inf" if x > 0 else "-Inf"
                return repr(x)

            got = _got(
                engine,
                f"histogram_fraction({fmt(lo)}, {fmt(hi)}, hb_bucket)",
            )
            for job, buckets in per_job.items():
                want = ref_fraction(lo, hi, buckets)
                if want is None:
                    got_v = got.get(job)
                    assert got_v is None or math.isnan(got_v), (
                        seed, lo, hi, job
                    )
                    continue
                assert got[job] == pytest.approx(want, abs=1e-9), (
                    seed, lo, hi, job, buckets
                )
                n_checked += 1
    assert n_checked > 50
