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
map-side-combined aggregate — and the winner filter is a semi-join of
samples against the winner set.  The winner set is NOT constant-small:
it grows as series x time-buckets (a year of 5-minute buckets over 1M
series is ~10^11 rows), so the join strategy is deliberately left to
the optimizer — with AQE on, a small winner set still becomes a runtime
broadcast, while a large one degrades to a shuffled semi-join instead
of OOMing the driver on a forced broadcast hint.  Callers that know
their query's time range pass ``ts_bounds`` so the vote (and the winner
set) prunes to the touched buckets before any shuffle.  Nothing is ever
collected; selector pushdown happens BEFORE dedup, on the stores' own
matcher columns.
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
    ts_bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """One logical series set from replicated samples: per (series,
    ``window_ms`` bucket), keep only the replica with the most samples
    (ties to the smallest replica value); the replica column is dropped
    from the output.  See the module docstring for the semantics vs the
    Thanos penalty iterator.

    ``ts_bounds=(start_ms, end_ms)`` (inclusive) restricts the vote to
    the touched buckets up front and clips the output to the exact
    bounds — a plain ts filter applied above the returned frame only
    prunes the semi-join's left side (Catalyst cannot derive bucket
    bounds from a ts predicate through the aggregate), so bounded
    queries should pass it here.  The vote always sees WHOLE edge
    buckets, so the winner choice matches the unbounded computation.
    """
    if replica_label not in samples.columns:
        raise ValueError(
            f"samples carry no {replica_label!r} column — nothing to dedup"
        )
    if ts_bounds is not None:
        lo, hi = (int(b) for b in ts_bounds)
        step = int(window_ms)
        # widen to whole buckets so the vote inside the edge buckets
        # still sees every replica's samples (a vote over a partial
        # bucket could flip the winner vs the unbounded computation);
        # the exact [lo, hi] clip is re-applied on the output below
        samples = samples.filter(
            (F.col(ts_col) >= F.lit((lo // step) * step))
            & (F.col(ts_col) <= F.lit((hi // step) * step + step - 1))
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
    # no broadcast hint: the winner set scales with series x buckets, and
    # a forced hint overrides spark.sql.autoBroadcastJoinThreshold — AQE
    # promotes a genuinely small winner set to a broadcast at runtime
    # and keeps a large one as a shuffled semi-join
    out = (
        with_bucket.join(
            winners,
            on=[*keys, "__bucket", replica_label],
            how="left_semi",
        )
        .drop("__bucket", replica_label)
    )
    if ts_bounds is not None:
        lo, hi = (int(b) for b in ts_bounds)
        out = out.filter(
            (F.col(ts_col) >= F.lit(lo)) & (F.col(ts_col) <= F.lit(hi))
        )
    return out
