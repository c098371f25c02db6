"""Gap filling / interpolation onto a regular time grid.

TimescaleDB's ``time_bucket_gapfill`` + ``locf``/``interpolate`` for
Spark: project each key's irregular samples onto a fixed step grid,
filling holes by carry-forward, linear interpolation, or a constant.

Same merge-window shape as :mod:`tsdb_parquet_spark.operators.asof` — no
range join, no per-step recompute:

    grid marks (key x step axis)  UNION  samples
      -> one window per direction over (key ORDER BY ts, side)
      -> keep grid rows

Both windows share one sort (same partitioning AND ordering; only the
frame differs), so the whole operator is a single shuffle on the key,
linear in |samples| + |keys| * steps.  PromQL's lookback staleness is the
locf special case with a bound; ``tolerance_ms`` reproduces that bound.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    samples: DataFrame,
    keys: Sequence[str],
    start_ms: int,
    end_ms: int,
    step_ms: int,
    ts_col: str = "ts",
    value_col: str = "value",
    method: str = "locf",
    fill_value: float | None = None,
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Return one row per (key, grid point t) for t = start, start+step,
    ..., <= end.

    - ``method='locf'``: last observed value at-or-before t (NULL before
      the first sample); ``tolerance_ms`` nulls carries older than it.
    - ``method='linear'``: straight line between the neighbouring
      samples; a sample exactly on t passes through; NULL outside the
      observed span.
    - ``method='value'``: holes become ``fill_value``; exact hits keep
      the sample.

    Samples should be unique per (key, ts) — pre-aggregate otherwise.
    """
    if method not in ("locf", "linear", "value"):
        raise ValueError(f"bad method {method!r}")
    keys = list(keys)

    marks = (
        samples.select(*keys)
        .distinct()
        .select(
            *keys,
            F.explode(
                F.sequence(F.lit(start_ms), F.lit(end_ms), F.lit(step_ms))
            ).alias("__ts"),
            F.lit(None).cast("double").alias("__v"),
            F.lit(1).alias("__side"),
        )
    )
    s = samples.select(
        *keys,
        F.col(ts_col).cast("long").alias("__ts"),
        F.col(value_col).cast("double").alias("__v"),
        F.lit(0).alias("__side"),
    )
    u = s.unionByName(marks)

    # samples sort BEFORE the grid mark at equal ts (side 0 < 1): an
    # exact hit is visible to the backward window
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    sample_struct = F.when(
        F.col("__side") == 0, F.struct(F.col("__ts"), F.col("__v"))
    )
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev = F.last(sample_struct, ignorenulls=True).over(w_prev)
    t = F.col("__ts")

    if method == "locf":
        val = prev["__v"]
        if tolerance_ms is not None:
            val = F.when(t - prev["__ts"] <= F.lit(int(tolerance_ms)), val)
    elif method == "value":
        val = F.when(prev["__ts"] == t, prev["__v"]).otherwise(
            F.lit(fill_value).cast("double")
        )
    else:  # linear
        nxt = F.first(sample_struct, ignorenulls=True).over(w_next)
        ratio = (t - prev["__ts"]) / (nxt["__ts"] - prev["__ts"])
        val = F.when(prev["__ts"] == t, prev["__v"]).otherwise(
            F.when(
                prev["__ts"].isNotNull() & nxt["__ts"].isNotNull(),
                prev["__v"] + (nxt["__v"] - prev["__v"]) * ratio,
            )
        )

    return (
        u.select(*keys, t.alias("t"), val.alias(value_col), "__side")
        .filter(F.col("__side") == 1)
        .drop("__side")
    )
