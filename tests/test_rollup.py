"""Rollup-store tests (`sources/rollup.py`)."""

import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.sources.rollup import downsample_samples, rollup_store

_DAY = 86_400_000


@pytest.fixture()
def raw(spark):
    rows = [
        ("m", "a", 10_000, 1.0),
        ("m", "a", 20_000, 5.0),
        ("m", "a", 70_000, 2.0),
        ("m", "b", 15_000, 4.0),
    ]
    return spark.createDataFrame(
        rows, "`__name__` STRING, job STRING, ts LONG, value DOUBLE"
    )


def test_downsample_aggregates_and_names(raw):
    out = downsample_samples(raw, ["__name__", "job"], step_ms=60_000)
    rows = {
        (r["__name__"], r["job"], r["ts"]): r["value"] for r in out.collect()
    }
    # bucket end-stamps: samples at 10s/20s -> t=60s; 70s -> t=120s
    assert rows[("m:sum", "a", 60_000)] == 6.0
    assert rows[("m:count", "a", 60_000)] == 2.0
    assert rows[("m:min", "a", 60_000)] == 1.0
    assert rows[("m:max", "a", 60_000)] == 5.0
    assert rows[("m:last", "a", 60_000)] == 5.0  # latest ts wins
    assert rows[("m:sum", "a", 120_000)] == 2.0
    assert rows[("m:sum", "b", 60_000)] == 4.0


def test_rollup_store_roundtrip(spark, sf_smoke, tmp_path):
    """Build a daily rollup store from the events chunk store; the rolled
    `app_events:sum` series read back through the querier must equal the
    direct daily sums of the raw samples."""
    from tsdb_parquet_spark.corpus import _CHUNK_LABELS, events_chunk_store
    from tsdb_parquet_spark.operators.selection import Matcher
    from tsdb_parquet_spark.querier import ChunkQuerier

    src = events_chunk_store(spark, sf_smoke)
    dest = rollup_store(
        spark, src, str(tmp_path / "rollup"), _CHUNK_LABELS, step_ms=_DAY
    )

    rolled = (
        ChunkQuerier.from_parquet(spark, dest)
        .select_samples(
            matchers=[Matcher("__name__", "=", "app_events:sum")],
            labels=_CHUNK_LABELS,
        )
        .groupBy("event_type", "shard", "ts")
        .agg(F.round(F.sum("value"), 4).alias("v"))
    )
    raw = (
        ChunkQuerier.from_parquet(spark, src)
        .select_samples(labels=_CHUNK_LABELS)
        .withColumn(
            "t", F.expr(f"((ts + {_DAY - 1}L) div {_DAY}L) * {_DAY}L")
        )
        .groupBy("event_type", "shard", F.col("t").alias("ts"))
        .agg(F.round(F.sum("value"), 4).alias("v"))
    )
    assert rolled.count() > 0
    assert rolled.exceptAll(raw).count() == 0
    assert raw.exceptAll(rolled).count() == 0


def test_rollup_store_serves_promql(spark, sf_smoke, tmp_path):
    """The rollup store is a first-class store: the PromQL engine can
    range-query the recording-rule series directly."""
    from tsdb_parquet_spark.corpus import (
        _CHUNK_LABELS,
        _P_END,
        _P_START,
        _P_STEP,
        events_chunk_store,
    )
    from tsdb_parquet_spark.plans.promql import PromQLEngine
    from tsdb_parquet_spark.querier import ChunkQuerier

    src = events_chunk_store(spark, sf_smoke)
    dest = rollup_store(
        spark, src, str(tmp_path / "rollup2"), _CHUNK_LABELS, step_ms=_DAY,
        aggs=("count",),
    )
    engine = PromQLEngine(
        ChunkQuerier.from_parquet(spark, dest).select_samples(
            labels=_CHUNK_LABELS
        )
    )
    out = engine.query_range(
        "sum by (event_type) (sum_over_time(app_events:count[1d]))",
        _P_START, _P_END, _P_STEP,
    )
    assert out.count() > 0
