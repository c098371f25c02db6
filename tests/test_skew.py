"""Salted-aggregation tests: results identical to the unsalted form, plan
spreads the hot key."""

from pyspark.sql import functions as F

from tsdb_parquet_spark.operators.skew import (
    salted_collect_set,
    salted_exact_distinct_count,
)


def _skewed_df(spark):
    # hot key "h" with 10k rows over 100 distinct values; cold keys tiny
    rows = [("h", f"v{i % 100}") for i in range(10_000)]
    rows += [(f"c{j}", f"v{j}") for j in range(20)]
    return spark.createDataFrame(rows, "k STRING, v STRING")


def test_salted_collect_set_matches_plain(spark):
    df = _skewed_df(spark)
    salted = {
        r["k"]: r["values"]
        for r in salted_collect_set(df, ["k"], "v", buckets=8).collect()
    }
    plain = {
        r["k"]: sorted(r["s"])
        for r in df.groupBy("k").agg(F.collect_set("v").alias("s")).collect()
    }
    assert salted == plain
    assert len(salted["h"]) == 100


def test_salted_distinct_count_matches_plain(spark):
    df = _skewed_df(spark)
    salted = {
        r["k"]: r["n_distinct"]
        for r in salted_exact_distinct_count(df, ["k"], "v", buckets=8).collect()
    }
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert salted == plain


def test_salt_is_deterministic(spark):
    df = _skewed_df(spark)
    a = salted_collect_set(df, ["k"], "v", buckets=8).collect()
    b = salted_collect_set(df, ["k"], "v", buckets=8).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_phase1_groups_by_salt(spark):
    df = _skewed_df(spark)
    plan = (
        salted_collect_set(df, ["k"], "v", buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # two aggregation levels: (k, __salt) then (k)
    assert plan.count("ObjectHashAggregate") + plan.count("SortAggregate") >= 2
