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
    assert got[0] == min(got[v] for v, _ in rows)


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


def test_residual_encoding_reduces_quantization_error(spark, cb, tmp_path):
    """Residual codes (v - centroid) must reconstruct v more accurately
    than raw codes on a clustered corpus — the whole point of FAISS
    IVFPQ's residual step."""
    from tsdb_parquet_spark.functions.similarity import (
        build_ivfpq_store,
        ivf_centroids,
        ivfpq_topk,
    )

    rng = np.random.RandomState(11)
    cents = ivf_centroids(dim=DIM, n_centroids=4, seed="res-test")
    # clustered corpus: centroid + small noise
    rows = []
    for i in range(80):
        c = np.asarray(cents[i % 4], dtype=np.float64)
        rows.append((i, (c + rng.normal(0, 0.05, DIM)).tolist()))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    q = (np.asarray(cents[0]) + rng.normal(0, 0.05, DIM)).tolist()

    # codebooks are always trained on what they encode: the raw store
    # keeps the full-range books, the residual store gets books scaled
    # to the residual distribution (noise sigma 0.05 -> ~0.1 range)
    cb_res = [[[x * 0.1 for x in c] for c in book] for book in cb]
    raw_store = str(tmp_path / "raw")
    res_store = str(tmp_path / "res")
    build_ivfpq_store(df, raw_store, cents, cb)
    build_ivfpq_store(df, res_store, cents, cb_res, residual=True)
    raw = ivfpq_topk(spark, raw_store, q, cents, cb, k=80, nprobe=4)
    res = ivfpq_topk(
        spark, res_store, q, cents, cb_res, k=80, nprobe=4, residual=True
    )
    exact = {
        i: float(np.sum((np.asarray(v) - np.asarray(q)) ** 2))
        for i, v in rows
    }
    raw_err = sum(
        abs(r["dist"] - exact[r["vec_id"]]) for r in raw.collect()
    )
    res_err = sum(
        abs(r["dist"] - exact[r["vec_id"]]) for r in res.collect()
    )
    # residual ADC error must be materially lower than raw ADC error
    assert res_err < raw_err * 0.5, (res_err, raw_err)
