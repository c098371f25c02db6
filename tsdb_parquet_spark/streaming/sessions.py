"""Sessionization: gap-based event sessions, batch and streaming.

The reference has no session concept at all (its only streaming-adjacent
surface is the one-shot block converter, `cmd/convert/main.go:23-126`);
sessionization is a standard requirement of the event-analytics /
training-data pipelines this engine targets (e.g. grouping user activity
into interaction episodes before building training sequences).

Two implementations with identical semantics (a new session starts when
the gap to the previous event of the same key exceeds ``gap_ms``):

- :func:`sessionize` — batch, pure Catalyst: lag -> gap flag -> running
  sum (the classic gaps-and-islands plan).  One shuffle on the key; the
  running sum is a per-key window, so parallelism is bounded by key
  cardinality, never by total rows — at 100 TB with millions of users
  that is exactly the partitioning you want (no global window).
- :class:`StreamingSessionizer` — Structured Streaming with
  ``applyInPandasWithState``: per-key session state with an EVENT-TIME
  timeout (watermark passes ``session_end + gap``), emitting a session
  row when the gap closes it.  This is the custom *stateful* operator
  Spark's built-in session_window cannot fully express when per-session
  aggregates need custom merge logic.

Batch output: one row per session
``(key, session_id, session_start, session_end, n_events, sum_value)``
where ``session_id`` is the per-key session ordinal (0-based in event
order) — deterministic, so the batch form is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str | None = None,
    gap_ms: int = 1_800_000,
) -> DataFrame:
    """Batch gaps-and-islands sessionization.

    Plan shape: ONE shuffle (hash partition by key for the two stacked
    windows — Catalyst reuses the exchange since both windows share the
    partitioning), no join, no Python.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    starts = F.when(gap.isNull() | (gap > F.lit(int(gap_ms))), 1).otherwise(0)
    with_id = (
        events.withColumn("__new", starts)
        .withColumn("session_id", F.sum("__new").over(w) - F.lit(1))
        .drop("__new")
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return with_id.groupBy(*keys, "session_id").agg(*aggs)


def sql_sessionize(
    key_cols: Sequence[str],
    table: str = "events",
    ts_expr: str = "ts",
    value_expr: str | None = None,
    gap_ms: int = 1_800_000,
    where: str = "",
) -> str:
    """The DuckDB-oracle twin of :func:`sessionize` (same island logic)."""
    keys = ", ".join(key_cols)
    val_sel = f", {value_expr} AS v" if value_expr else ""
    val_agg = ", sum(v) AS sum_value" if value_expr else ""
    flt = f"WHERE {where}" if where else ""
    return f"""
WITH e AS (
  SELECT {keys}, {ts_expr} AS ts{val_sel}
  FROM {table} {flt}
),
flagged AS (
  SELECT *, CASE WHEN ts - lag(ts) OVER (PARTITION BY {keys} ORDER BY ts)
                      > {int(gap_ms)}
                 OR lag(ts) OVER (PARTITION BY {keys} ORDER BY ts) IS NULL
            THEN 1 ELSE 0 END AS new_s
  FROM e
),
ids AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY {keys} ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) - 1
                 AS BIGINT) AS session_id
  FROM flagged
)
SELECT {keys}, session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events{val_agg}
FROM ids GROUP BY {keys}, session_id
"""


# ---------------------------------------------------------------------------
# streaming stateful sessionization
# ---------------------------------------------------------------------------

_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("session_start", T.LongType()),
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


class StreamingSessionizer:
    """Custom stateful streaming operator: per-key open-session state,
    closed either by an in-stream gap or by the event-time watermark
    passing the session's gap deadline (``session_end + gap``).

    Built on ``applyInPandasWithState`` — the escape hatch for stateful
    logic ``session_window`` can't express (here: emitting CLOSED sessions
    only, with custom per-session aggregates carried in state).  State per
    key is O(1) (4 numbers), so executor state stores stay bounded by
    |active keys| regardless of stream length.

    Timeouts are ``EventTimeTimeout`` keyed on the watermark: a session
    closes deterministically from STREAM time, so a bounded replay under
    ``Trigger.AvailableNow`` drains and terminates on its own (the
    engine's final no-data micro-batch fires every timeout the last
    watermark advance unlocked) and the output is oracle-checkable
    against the batch :func:`sessionize` — only sessions whose gap
    deadline exceeds the final watermark (each key's live tail) remain
    withheld in state.  ProcessingTimeTimeout, by contrast, never
    terminates under AvailableNow (wall-clock timeouts stay potentially
    pending forever).
    """

    def __init__(self, gap_ms: int = 1_800_000):
        self.gap_ms = int(gap_ms)

    def _update(self, key, pdfs: Iterable[pd.DataFrame], state):
        gap = self.gap_ms
        if state.hasTimedOut:
            start, end, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {"key": [key[0]], "session_start": [start],
                 "session_end": [end], "n_events": [n], "sum_value": [s]}
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        out = []
        if state.exists:
            start, end, n, s = state.get
        else:
            start, end, n, s = None, None, 0, 0.0
        for ts, v in zip(rows["ts"].to_numpy(), rows["value"].to_numpy()):
            ts = int(ts)
            if start is None:
                start, end, n, s = ts, ts, 1, float(v)
            elif ts - end > gap:
                out.append((start, end, n, s))
                start, end, n, s = ts, ts, 1, float(v)
            else:
                end, n, s = ts, n + 1, s + float(v)
        deadline = end + gap
        if deadline <= state.getCurrentWatermarkMs():
            # the gap already elapsed in event time (no newer event for
            # this key arrived in later batches): close immediately rather
            # than set a timeout in the past (which Spark rejects)
            out.append((start, end, n, s))
            state.remove()
        else:
            state.update((start, end, n, s))
            state.setTimeoutTimestamp(deadline)
        if out:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(out),
                    "session_start": [o[0] for o in out],
                    "session_end": [o[1] for o in out],
                    "n_events": [o[2] for o in out],
                    "sum_value": [o[3] for o in out],
                }
            )

    def apply(
        self,
        stream: DataFrame,
        key_col: str,
        watermark_delay: str = "10 seconds",
    ) -> DataFrame:
        """``stream`` needs columns (``key_col`` string, ``ts`` long ms,
        ``value`` double).  Returns the closed-sessions stream.
        ``watermark_delay`` is the late-data allowance: a session only
        closes by timeout once the watermark (max event time minus this
        delay) passes its gap deadline."""
        from pyspark.sql.streaming.state import GroupStateTimeout

        withevt = (
            stream.select(
                F.col(key_col).cast("string").alias("key"), "ts", "value"
            )
            .withColumn("__evt", F.timestamp_millis(F.col("ts")))
            .withWatermark("__evt", watermark_delay)
        )
        return withevt.groupBy("key").applyInPandasWithState(
            self._update,
            outputStructType=_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
