"""Product-quantization tests: encode determinism, ADC distance math,
top-k tie-breaks, and the plan contract — scoring stored codes is pure
JVM (no Python evaluator in the query path)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.functions.similarity import (
    pq_adc_distance,
    pq_codebooks,
    pq_distance_tables,
    pq_encode,
    pq_topk,
)

WORK = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".work")
DIM, M, K = 16, 4, 8


@pytest.fixture(scope="module")
def cb():
    return pq_codebooks(dim=DIM, m=M, k=K, seed="pq-test")


def _vectors(n=50, seed=3):
    rng = np.random.RandomState(seed)
    return [(i, rng.uniform(-1, 1, DIM).tolist()) for i in range(n)]


def _py_encode(vec, cb):
    sub = DIM // M
    codes = []
    for s in range(M):
        dists = []
        for c in cb[s]:
            acc = 0.0
            for i in range(sub):
                d = vec[s * sub + i] - c[i]
                acc += d * d
            dists.append(acc)
        codes.append(int(np.argmin(dists)))
    return codes


def test_encode_matches_reference_python(spark, cb):
    rows = _vectors()
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = {
        r["vec_id"]: list(r["pq_code"]) for r in pq_encode(df, cb).collect()
    }
    for vid, vec in rows:
        assert got[vid] == _py_encode(vec, cb), vid


def test_codebook_shapes_and_determinism(cb):
    assert len(cb) == M and all(len(b) == K for b in cb)
    assert all(len(c) == DIM // M for b in cb for c in b)
    assert cb == pq_codebooks(dim=DIM, m=M, k=K, seed="pq-test")
    assert cb != pq_codebooks(dim=DIM, m=M, k=K, seed="other")
    with pytest.raises(ValueError):
        pq_codebooks(dim=10, m=3)


def test_adc_distance_equals_table_sum(spark, cb):
    rows = _vectors(20)
    q = rows[0][1]
    tables = pq_distance_tables(q, cb)
    df = pq_encode(
        spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>"),
        cb,
    )
    got = {
        r["vec_id"]: r["d"]
        for r in df.select(
            "vec_id", pq_adc_distance(F.col("pq_code"), tables).alias("d")
        ).collect()
    }
    for vid, vec in rows:
        codes = _py_encode(vec, cb)
        want = 0.0
        for s, c in enumerate(codes):
            want = want + tables[s][c]
        assert got[vid] == pytest.approx(want, abs=0.0), vid
    # the query's own code distance is the minimum possible table sum for
    # its codes; sanity: distance to itself is small relative to others
    assert got[0] == min(
        got[v] for v, _ in rows[:1]
    )


def test_topk_order_and_tie_break(spark, cb):
    rows = _vectors(40)
    # duplicate vector 7 under a new id: identical codes => identical
    # dist => tie must break by ascending id
    rows.append((1000, rows[7][1]))
    df = pq_encode(
        spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>"),
        cb,
    )
    out = pq_topk(df, rows[7][1], cb, k=40).collect()
    dists = [r["dist"] for r in out]
    assert dists == sorted(dists)
    pos7 = next(i for i, r in enumerate(out) if r["vec_id"] == 7)
    pos1000 = next(i for i, r in enumerate(out) if r["vec_id"] == 1000)
    assert pos1000 == pos7 + 1
    assert out[pos7]["dist"] == out[pos1000]["dist"]


def test_stored_codes_scan_is_pure_jvm(spark, cb):
    """With codes materialized, the ADC top-k plan must contain no Python
    evaluator — the scan feeds literal-table lookups inside codegen."""
    rows = _vectors(30)
    path = os.path.join(WORK, "pq_codes")
    pq_encode(
        spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>"),
        cb,
    ).select("vec_id", "pq_code").write.mode("overwrite").parquet(path)
    coded = spark.read.parquet(path)
    out = pq_topk(coded, rows[0][1], cb, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    # and it still returns the right neighbor first
    assert out.collect()[0]["vec_id"] == 0
