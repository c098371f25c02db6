"""As-of (nearest-sample) join — the time-series join Spark lacks natively.

The reference engine has no join operator at all (its surface is series
selection; joins happen in the PromQL layer, `prometheus/promql_test.go`),
but every metrics/trading/feature-store user of a TSDB needs "for each left
row, the latest right row at or before its timestamp".

Spark-first plan — the MERGE formulation, not a range join:

    union(left tagged 1, right tagged 0)
      -> window over (key ORDER BY ts, side): last(right payload, ignorenulls)
      -> keep left rows

One shuffle on the join key, linear in rows.  The naive alternative — a
range-predicate join ``l.ts >= r.ts`` + per-left-row max — is a broadcast
nested loop (O(|L| x |R|) per key) that dies at scale; this plan's window
state is O(1) per key and AQE handles skewed keys.  DuckDB's native
``ASOF JOIN`` gives the corpus oracle the same semantics in one keyword.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_ms: int | None = None,
) -> DataFrame:
    """For each left row, attach the single right row with the largest
    ``right_ts <= left_ts`` (direction='backward', inclusive) or smallest
    ``right_ts >= left_ts`` ('forward') sharing the ``on`` key.

    Left rows with no match keep NULL right columns (left-join
    semantics).  ``tolerance_ms`` nulls the match when the timestamp gap
    exceeds it.  Right rows should be unique per (key, ts) — with
    duplicates the window's (ts, side) order makes the LAST one in
    (ts, payload) order win deterministically, which may differ from
    other engines' pick.

    Output: every left column, plus ``<right_col><suffix>`` for each of
    ``right_cols`` (default: right's non-key, non-ts columns) and
    ``<right_ts><suffix>`` for the matched timestamp.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"bad direction {direction!r}")
    keys = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, right_ts)]
    payload = {f"{c}{suffix}": c for c in right_cols}
    ts_out = f"{right_ts}{suffix}"

    # the matched right row travels as ONE struct (null on left rows), so
    # last(ignorenulls) can never mix columns from different right rows
    # even when a right payload value is itself NULL
    r_struct = F.struct(
        F.col(right_ts).cast("long").alias(ts_out),
        *[F.col(src).alias(dst) for dst, src in payload.items()],
    )
    r = right.select(
        *keys,
        F.col(right_ts).cast("long").alias("__ts"),
        F.lit(0).alias("__side"),
        r_struct.alias("__r"),
    )
    l_cols = left.columns
    l = left.select(
        *l_cols,
        F.col(left_ts).cast("long").alias("__ts"),
        F.lit(1).alias("__side"),
    )
    merged = l.unionByName(r, allowMissingColumns=True)

    # right rows sort BEFORE left rows at equal ts (side 0 < 1), making
    # the match inclusive; 'forward' scans time backwards so the nearest
    # later right row is the last seen
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__r", ignorenulls=True).over(w)
    if tolerance_ms is not None:
        gap = (
            (F.col("__ts") - matched[ts_out])
            if direction == "backward"
            else (matched[ts_out] - F.col("__ts"))
        )
        matched = F.when(gap <= F.lit(int(tolerance_ms)), matched)
    return (
        merged.select(*l_cols, "__side", matched.alias("__m"))
        .filter(F.col("__side") == 1)
        .select(
            *l_cols,
            F.col("__m")[ts_out].alias(ts_out),
            *[F.col("__m")[dst].alias(dst) for dst in payload],
        )
    )
