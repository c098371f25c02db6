"""Bucketed-table tests: the co-located join must plan without a shuffle."""

import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.sources.bucketed import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke):
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    customer = spark.read.parquet(f"{sf_smoke}/customer.parquet").withColumn(
        "o_custkey", F.col("c_custkey")
    )
    write_bucketed(orders, "b_orders", ["o_custkey"], num_buckets=8)
    write_bucketed(customer, "b_customer", ["o_custkey"], num_buckets=8)
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_colocated_join_has_no_shuffle(spark, bucketed_tables):
    """With broadcast disabled (at 100 TB neither fact side broadcasts),
    the co-bucketed join must be a SortMergeJoin with NO shuffle exchange
    on either side."""
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, left, right, on=["o_custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "ShuffleExchange" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_correct(spark, sf_smoke, bucketed_tables):
    left, right = bucketed_tables
    joined = colocated_join(spark, left, right, on=["o_custkey"])
    got = joined.count()
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    customer = spark.read.parquet(f"{sf_smoke}/customer.parquet")
    want = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).count()
    assert got == want


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_custkey").agg(F.sum("o_totalprice"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]


def test_register_bucketed_reattaches_without_rewrite(spark, sf_smoke, tmp_path):
    """Dropping the (in-memory) table metadata keeps the bucketed files;
    register_bucketed re-attaches them via DDL and the re-registered pair
    still plans a zero-Exchange SortMergeJoin with identical results."""
    from tsdb_parquet_spark.sources.bucketed import register_bucketed

    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = spark.read.parquet(f"{sf_smoke}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    opath, cpath = str(tmp_path / "orders"), str(tmp_path / "customer")
    # a fresh location has no data: register refuses, caller writes
    assert not register_bucketed(
        spark, "rb_orders", orders, ["o_custkey"], 8, path=opath
    )
    write_bucketed(orders, "rb_orders", ["o_custkey"], 8, path=opath)
    write_bucketed(customer, "rb_customer", ["o_custkey"], 8, path=cpath)
    want = (
        colocated_join(spark, "rb_orders", "rb_customer", ["o_custkey"])
        .groupBy("o_custkey")
        .count()
        .count()
    )
    # metadata dies (session restart analog); data files survive
    spark.sql("DROP TABLE rb_orders")
    spark.sql("DROP TABLE rb_customer")
    assert register_bucketed(
        spark, "rb_orders", orders, ["o_custkey"], 8, path=opath
    )
    assert register_bucketed(
        spark, "rb_customer", customer, ["o_custkey"], 8, path=cpath
    )
    joined = colocated_join(
        spark, "rb_orders", "rb_customer", ["o_custkey"], merge=True
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert joined.groupBy("o_custkey").count().count() == want
    spark.sql("DROP TABLE rb_orders")
    spark.sql("DROP TABLE rb_customer")
