"""Dedup operators (reference A1-A2).

The reference's `Unique` keeps the FIRST row seen for each distinct value of
one key column, with all projected columns passing through
(`compute/distinct.go:16-69`); because its input is globally sorted, "first"
is deterministic.  Spark's `dropDuplicates` keeps an *arbitrary* row, so
where first-by-order matters we use a window `row_number` (or `min_by`),
which shuffles once on the key — the scalable equivalent of the reference's
unbounded in-memory hash set (`compute/distinct.go:22-23`) that would OOM at
100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distinct_rows(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Plain distinct over a column subset — hash-aggregate, partial
    (map-side) dedup before the shuffle."""
    return df.select(*columns).distinct()


def first_row_per_key(
    df: DataFrame, key: Sequence[str], order: Sequence[str]
) -> DataFrame:
    """Deterministic first-row-per-key: the row with the smallest ``order``
    tuple within each ``key`` group (reference A1 semantics on sorted input,
    `compute/distinct.go:27-55`).

    Implemented as a window row_number — a single shuffle on the key, no
    driver state.
    """
    w = Window.partitionBy(*key).orderBy(*[F.col(c).asc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def unique_by_column(df: DataFrame, key: str, projected: Sequence[str]) -> DataFrame:
    """A2 — distinct series enumeration (`prometheus/querier.go:80-88`):
    one row per distinct ``key``, projecting ``projected`` columns.

    Output row choice is arbitrary-but-single like the reference when the
    projected columns are functionally dependent on the key (the series-id
    case); uses dropDuplicates so Spark can do partial aggregation.
    """
    cols = [key] + [c for c in projected if c != key]
    return df.select(*cols).dropDuplicates([key])
