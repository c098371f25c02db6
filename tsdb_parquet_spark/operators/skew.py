"""Skew mitigation: salted two-phase aggregation.

Algebraic aggregates (sum/count/min/max/avg) don't need salting — Spark's
partial (map-side) aggregation already combines before the shuffle.  The
problem cases are *holistic* per-key operations (collect_list/collect_set,
exact distinct counts per key) where one hot key funnels its entire traffic
into a single reduce task.

``salted_collect_set`` splits each key into ``buckets`` sub-keys, collects
per (key, salt) — so even the hottest key spreads over ``buckets`` tasks —
then merges the small per-salt sets in a second, cheap aggregation.  The
salt is derived deterministically from row content (never rand(): a task
retry would re-salt differently and double-count).

Skewed *joins* are left to AQE (``spark.sql.adaptive.skewJoin.enabled``,
on in the session factory), which splits oversized partitions at runtime.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(cols: Sequence[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets): content-hash of the row's
    distributing columns (NOT rand() — retries must re-derive the same
    salt)."""
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_collect_set(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    buckets: int = 16,
) -> DataFrame:
    """collect_set(value) per key, skew-safe: phase 1 collects per
    (key, salt) — the hot key's rows spread across ``buckets`` tasks —
    phase 2 unions the per-salt sets.  Output: keys..., ``values`` array
    (sorted for determinism)."""
    keys = list(keys)
    salted = df.withColumn("__salt", salt_column([value_col], buckets))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.collect_set(value_col).alias("__partial")
    )
    merged = partial.groupBy(*keys).agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("__partial")))
        ).alias("values")
    )
    return merged


def salted_exact_distinct_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    buckets: int = 16,
) -> DataFrame:
    """count(DISTINCT value) per key without funneling a hot key into one
    task: dedup on (key, salt, value) first (spread), then count distinct
    values per key from the already-unique stream."""
    keys = list(keys)
    salted = df.withColumn("__salt", salt_column([value_col], buckets))
    deduped = salted.select(*keys, "__salt", value_col).dropDuplicates(
        keys + ["__salt", value_col]
    )
    # values are unique within (key, salt); salts partition the value space
    # disjointly (salt is a function of the value), so a plain count is an
    # exact distinct count
    return deduped.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_distinct"))
