"""Deterministic sampling: engine-reproducibility (Spark draw == DuckDB
draw), rate accuracy, stratified rates, and split stability."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.functions.sampling import (
    deterministic_sample,
    hex_threshold,
    sample_draw_sql,
    stratified_sample,
    train_test_split,
)

DOCS = "/root/testdata/sf0.01/documents.parquet"


def test_hex_threshold_edges():
    assert hex_threshold(0.0) == "00000000"
    # keep-all must sort above EVERY 8-char hex draw (strict < against
    # "ffffffff" would drop a key whose md5 prefix is exactly ffffffff)
    assert hex_threshold(1.0) == "g"
    assert "ffffffff" < hex_threshold(1.0)
    assert hex_threshold(0.5) == "80000000"
    with pytest.raises(ValueError):
        hex_threshold(1.5)


def test_sample_matches_duckdb(spark):
    docs = spark.read.parquet(DOCS)
    got = sorted(
        r["doc_id"]
        for r in deterministic_sample(docs, "doc_id", 0.2, seed="t1")
        .select("doc_id").collect()
    )
    want = [
        r[0] for r in duckdb.sql(
            f"""SELECT doc_id FROM '{DOCS}'
                WHERE {sample_draw_sql('doc_id', 't1')} < '{hex_threshold(0.2)}'
                ORDER BY doc_id"""
        ).fetchall()
    ]
    assert got == want
    n = docs.count()
    assert 0.15 * n < len(got) < 0.25 * n  # rate is actually ~20%


def test_sample_is_scan_fused(spark):
    """The draw is a plain filter — no shuffle, no Python in the plan."""
    docs = spark.read.parquet(DOCS)
    plan = (
        deterministic_sample(docs, "doc_id", 0.1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_stratified_rates(spark):
    docs = spark.read.parquet(DOCS).withColumn(
        "bucket", (F.col("doc_id") % 2).cast("string")
    )
    out = stratified_sample(
        docs, "bucket", {"0": 1.0, "1": 0.0}, key_col="doc_id"
    )
    got = out.groupBy("bucket").count().collect()
    assert {r["bucket"] for r in got} == {"0"}  # stratum 1 fully dropped
    assert got[0]["count"] == docs.filter("doc_id % 2 = 0").count()


def test_split_stable_and_disjoint(spark):
    docs = spark.read.parquet(DOCS)
    s1 = train_test_split(docs, "doc_id", 0.25, seed="sp")
    frac = (
        s1.groupBy("split").count().toPandas().set_index("split")["count"]
    )
    total = int(frac.sum())
    assert 0.2 < frac["test"] / total < 0.3
    # stability: same key -> same split on a recomputed frame
    s2 = train_test_split(docs.orderBy(F.rand(7)), "doc_id", 0.25, seed="sp")
    joined = (
        s1.select("doc_id", F.col("split").alias("a"))
        .join(s2.select("doc_id", F.col("split").alias("b")), "doc_id")
    )
    assert joined.filter("a <> b").count() == 0


def test_weighted_sample_clamps_and_is_deterministic(spark):
    from tsdb_parquet_spark.functions.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate([0.0, 0.1, 0.5, 1e9])] * 1,
        "k LONG, w DOUBLE",
    )
    out1 = sorted(r["k"] for r in weighted_sample(df, "k", "w").collect())
    out2 = sorted(r["k"] for r in weighted_sample(df, "k", "w").collect())
    assert out1 == out2  # reproducible
    assert 0 not in out1  # zero weight never kept
    assert 3 in out1  # rate clamped to 1.0 -> always kept ('g' sentinel)
