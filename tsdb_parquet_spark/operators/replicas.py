"""Replica deduplication — querying HA-pair (replicated) stores as one.

A high-availability Prometheus setup runs N identical scrapers whose
stores differ only in a replica label (``replica="a"|"b"``) and in
which samples each happened to miss (restarts, failed scrapes).  The
Thanos query layer presents them as ONE series set by choosing, per
series and per stretch of time, a replica to read — switching replicas
only across gaps so offset scrape timestamps never interleave
(interleaved replicas double samples inside rate windows).

This module implements that semantic with a WINDOWED vote instead of
Thanos's sequential penalty iterator (`thanos-io/thanos
pkg/dedup/iter.go` — inherently one-pass, order-dependent): time is cut
into ``window_ms`` buckets, and within each (series, bucket) the
replica with the MOST samples wins (ties to the smallest replica
value); only the winner's samples survive that bucket.  Deterministic,
two map-side-combined shuffles, and the same no-interleaving guarantee
at bucket granularity — the documented trade is that a replica switch
can only happen on a bucket boundary, so up to one bucket of the
sparser replica's extra samples is lost where Thanos's iterator would
have stitched mid-window.

Scale shape: the vote is a count over (series, bucket, replica) — one
aggregate — and the winner filter is a broadcast-eligible semi-join of
samples against the (tiny: series x buckets) winner set.  Nothing is
ever collected; selector pushdown happens BEFORE dedup, on the stores'
own matcher columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dedup_replicas"]


def dedup_replicas(
    samples: DataFrame,
    replica_label: str = "replica",
    window_ms: int = 5 * 60 * 1000,
    ts_col: str = "ts",
) -> DataFrame:
    """One logical series set from replicated samples: per (series,
    ``window_ms`` bucket), keep only the replica with the most samples
    (ties to the smallest replica value); the replica column is dropped
    from the output.  See the module docstring for the semantics vs the
    Thanos penalty iterator."""
    if replica_label not in samples.columns:
        raise ValueError(
            f"samples carry no {replica_label!r} column — nothing to dedup"
        )
    keys = [
        c
        for c in samples.columns
        if c not in (ts_col, "value", replica_label)
    ]
    bucket = (F.col(ts_col) / F.lit(int(window_ms))).cast("long")
    with_bucket = samples.withColumn("__bucket", bucket)
    votes = with_bucket.groupBy(
        *keys, "__bucket", replica_label
    ).agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy(*keys, "__bucket").orderBy(
        F.desc("__n"), F.col(replica_label)
    )
    winners = (
        votes.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(*keys, "__bucket", replica_label)
    )
    return (
        with_bucket.join(
            F.broadcast(winners),
            on=[*keys, "__bucket", replica_label],
            how="left_semi",
        )
        .drop("__bucket", replica_label)
    )
