"""Prometheus rule groups: recording rules and alerting rules.

The reference delegates ALL evaluation to an embedded Prometheus
(`prometheus/querier.go:80-88`); the rules engine is the half of that
delegated surface the query API doesn't cover — the background loop
that materializes recording-rule series and tracks alert ``for``-state.
Semantics from the public Prometheus docs (recording_rules.md /
alerting_rules.md):

* a RECORDING rule evaluates its expression at each step and stores the
  result as a new series named ``record`` with the rule's extra labels
  merged in (rule labels overwrite result labels on collision, like
  ``lb.Set`` in the Prometheus rule eval);
* an ALERTING rule's expression yields "active" label sets per step; an
  alert is ``pending`` from its first active step and turns ``firing``
  once it has been CONTINUOUSLY active for ``for_ms`` (``for: 0`` fires
  immediately); a step with no output resets the clock.  Active alerts
  surface as the synthetic ``ALERTS{alertname=..., alertstate=...}``
  series with value 1, exactly the series a real Prometheus writes;
* rules in one GROUP evaluate sequentially — each rule sees the output
  of the rules before it (Prometheus evaluates a group in order against
  the same storage, so ``record: a`` then ``expr: a * 2`` works).

Execution shape: a recording rule is ONE ``query_range`` plan plus a
literal-column rename — no new shuffles beyond the query's own.  Alert
``for``-state is the classic gaps-and-islands: one window pass over the
alert's own (tiny, grid-bounded) active set, partitioned BY SERIES and
ordered by step — parallel across series, never a global sort.  Feeding
recording output back into the engine is a ``unionByName`` of the new
series onto the samples frame — the next rule's selector pushdown still
reaches the original store scan underneath the union.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsdb_parquet_spark.plans.promql import DEFAULT_LOOKBACK_MS, PromQLEngine

__all__ = [
    "RecordingRule",
    "AlertingRule",
    "RuleGroup",
    "evaluate_recording_rule",
    "evaluate_alerting_rule",
    "evaluate_rule_group",
    "alerts_series",
    "alerts_for_state_series",
    "read_for_state",
    "run_rule_group_to_store",
    "parse_rule_file",
]


def parse_rule_file(text: str) -> list[RuleGroup]:
    """Parse a Prometheus rule file (the ``groups:`` YAML every
    deployment already has — promtool's schema) into :class:`RuleGroup`
    objects.  Also accepts this engine's single-group JSON shape
    (``{"name": ..., "rules": [...]}``) so existing specs keep working.
    ``for:`` / ``keep_firing_for:`` take PromQL durations ("5m") or raw
    milliseconds; ``annotations:`` are accepted and ignored (no
    notification pipeline here); ``interval:`` lands on
    ``RuleGroup.interval_ms`` (used by the /api/v1/rules state
    evaluation; the store write-back grid stays the caller's
    start/end/step)."""
    import json

    from tsdb_parquet_spark.plans.promql import parse_duration_ms

    def duration_ms(raw) -> int:
        if raw is None:
            return 0
        if isinstance(raw, str):
            return parse_duration_ms(raw)
        return int(raw)

    def build_rules(specs) -> tuple:
        rules = []
        for r in specs:
            if "record" in r:
                rules.append(
                    RecordingRule(
                        r["record"], r["expr"], dict(r.get("labels", {}))
                    )
                )
            elif "alert" in r:
                rules.append(
                    AlertingRule(
                        r["alert"],
                        r["expr"],
                        duration_ms(r.get("for")),
                        dict(r.get("labels", {})),
                        duration_ms(r.get("keep_firing_for")),
                    )
                )
            else:
                raise ValueError(f"rule needs 'record' or 'alert': {r}")
        return tuple(rules)

    try:
        doc = json.loads(text)
    except ValueError:
        import yaml

        doc = yaml.safe_load(text)
    if not isinstance(doc, dict):
        raise ValueError("rule file must be a mapping")
    if "groups" in doc:
        return [
            RuleGroup(
                g.get("name", "group"),
                build_rules(g["rules"]),
                interval_ms=duration_ms(g.get("interval")) or 60_000,
            )
            for g in doc["groups"]
        ]
    return [
        RuleGroup(
            doc.get("name", "group"),
            build_rules(doc["rules"]),
            interval_ms=duration_ms(doc.get("interval")) or 60_000,
        )
    ]


@dataclass(frozen=True)
class RecordingRule:
    """``record: <name>`` / ``expr:`` / optional ``labels:``."""

    record: str
    expr: str
    labels: dict[str, str] = field(default_factory=dict)


@dataclass(frozen=True)
class AlertingRule:
    """``alert: <name>`` / ``expr:`` / ``for:`` (ms) /
    ``keep_firing_for:`` (ms) / ``labels:``.

    ``keep_firing_for_ms``: once FIRING, the alert stays firing for
    this long after its expression stops producing the series
    (Prometheus ``keep_firing_for``, rules/alerting.go) — flap
    damping; pending alerts still resolve immediately."""

    alert: str
    expr: str
    for_ms: int = 0
    labels: dict[str, str] = field(default_factory=dict)
    keep_firing_for_ms: int = 0


@dataclass(frozen=True)
class RuleGroup:
    name: str
    rules: tuple = ()
    #: the group's evaluation interval (Prometheus ``interval:``,
    #: default 1m) — the step /api/v1/rules state evaluation uses
    interval_ms: int = 60_000


def _result_series(
    out: DataFrame, name_label: str, name: str, labels: dict[str, str]
) -> DataFrame:
    """A query_range result ``(t, group-labels..., value)`` as a samples
    frame ``(ts, value, <name_label>, labels...)`` named ``name`` with
    rule labels merged (rule labels WIN on collision)."""
    df = out.withColumnRenamed("t", "ts")
    keep = [c for c in df.columns if c not in ("ts", "value")]
    df = df.withColumn(name_label, F.lit(name))
    for k, v in labels.items():
        df = df.withColumn(k, F.lit(v))
    cols = ["ts", "value", name_label]
    cols += [c for c in keep if c != name_label and c not in labels]
    cols += [k for k in labels if k != name_label]
    return df.select(*dict.fromkeys(cols))


def evaluate_recording_rule(
    engine: PromQLEngine,
    rule: RecordingRule,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
) -> DataFrame:
    """The rule's new series as a samples frame: ``(ts, value,
    __name__=record, result labels..., rule labels...)``."""
    out = engine.query_range(
        rule.expr, start_ms, end_ms, step_ms, lookback_ms=lookback_ms
    )
    return _result_series(out, engine.metric_label, rule.record, rule.labels)


def evaluate_alerting_rule(
    engine: PromQLEngine,
    rule: AlertingRule,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
    restored_active_at: DataFrame | None = None,
) -> DataFrame:
    """Alert state per active (series, step): ``(t, alertname, result
    labels..., rule labels..., alertstate, value, active_at)``.
    ``active_at`` is the alert's ActiveAt timestamp (ms) — the
    ``ALERTS_FOR_STATE`` payload a real Prometheus persists so ``for``
    state survives restarts (:func:`alerts_for_state_series`).

    ``keep_firing_for == 0`` (the default): pure-JVM gaps-and-islands
    over the rule's active set — a new island starts where the previous
    active step is more than one ``step_ms`` back; the alert fires at
    step t when ``t - island_start >= for_ms`` (Prometheus:
    "continuously active for at least <for>"), else it is pending.  One
    window pass, partitioned by the alert's identity labels — the
    active set is grid-bounded (steps x series), so this costs one
    small shuffle regardless of store size.

    ``keep_firing_for > 0``: the hold makes the state sequential (a
    step's state depends on whether the CHAIN had fired before the
    gap), which no windowed closed form expresses — so the exact
    Prometheus state machine (rules/alerting.go) runs per series via
    ``applyInPandas``: a firing alert whose expression stops producing
    the series stays firing while ``t - last_active - step <
    keep_firing_for`` (value carried from the last evaluation, like
    ``a.Value``); re-activating during the hold keeps it firing with
    its original ActiveAt (no new pending phase); PENDING alerts still
    resolve immediately.  Same partitioning, same grid-bounded input —
    the Python hop is per active-set row, never per store row.

    ``restored_active_at``: optional ``(identity labels..., active_at
    ms)`` frame — the Prometheus restart-restore: a series active at
    the FIRST grid step adopts the restored (earlier) ActiveAt instead
    of starting a fresh ``for`` clock, exactly what a real rule manager
    does by reading ``ALERTS_FOR_STATE`` back
    (:func:`read_for_state`).  Series not active at the first step
    ignore their restored state (the alert resolved across the
    restart, like upstream)."""
    out = engine.query_range(
        rule.expr, start_ms, end_ms, step_ms, lookback_ms=lookback_ms
    )
    label_cols = [c for c in out.columns if c not in ("t", "value")]
    join_cols = (
        [c for c in label_cols if c in restored_active_at.columns]
        if restored_active_at is not None
        else []
    )
    if join_cols:
        # min() collapses store rows that differ only in labels the
        # rule's output does not carry — earliest ActiveAt wins, the
        # conservative restore
        rest = (
            restored_active_at.select(
                *join_cols, F.col("active_at").alias("_restored")
            )
            .groupBy(*join_cols)
            .agg(F.min("_restored").alias("_restored"))
        )
        out = out.join(rest, on=join_cols, how="left")
    else:
        out = out.withColumn("_restored", F.lit(None).cast("long"))
    if rule.keep_firing_for_ms > 0:
        result = _alert_state_machine(
            out, label_cols, start_ms, end_ms, step_ms,
            rule.for_ms, rule.keep_firing_for_ms,
        )
    else:
        w = Window.partitionBy(
            *[F.col(c) for c in label_cols] if label_cols else [F.lit(1)]
        ).orderBy("t")
        prev_t = F.lag("t").over(w)
        new_island = (
            prev_t.isNull() | (F.col("t") - prev_t > F.lit(int(step_ms)))
        ).cast("long")
        df = out.withColumn(
            "_island", F.sum(new_island).over(w)
        )
        w_island = Window.partitionBy(
            *([F.col(c) for c in label_cols] if label_cols else [F.lit(1)]),
            F.col("_island"),
        )
        island_start = F.min("t").over(w_island)
        # restart-restore: only the island already active at the first
        # grid step may adopt an earlier restored ActiveAt
        active_at = F.when(
            (island_start == F.lit(int(start_ms)))
            & F.col("_restored").isNotNull()
            & (F.col("_restored") < island_start),
            F.col("_restored"),
        ).otherwise(island_start)
        state = F.when(
            F.col("t") - active_at >= F.lit(int(rule.for_ms)),
            F.lit("firing"),
        ).otherwise(F.lit("pending"))
        result = (
            df.withColumn("alertstate", state)
            .withColumn("active_at", active_at)
            .drop("_island", "_restored")
        )
    result = result.withColumn("alertname", F.lit(rule.alert))
    for k, v in rule.labels.items():
        result = result.withColumn(k, F.lit(v))
    cols = ["t", "alertname"]
    cols += [c for c in label_cols if c != "alertname" and c not in rule.labels]
    cols += [k for k in rule.labels if k != "alertname"]
    cols += ["alertstate", "value", "active_at"]
    return result.select(*dict.fromkeys(cols))


def _alert_state_machine(
    out: DataFrame,
    label_cols: list[str],
    start_ms: int,
    end_ms: int,
    step_ms: int,
    for_ms: int,
    keep_firing_for_ms: int,
) -> DataFrame:
    """Per-series Prometheus alert state machine (the
    ``keep_firing_for`` path of :func:`evaluate_alerting_rule`) —
    ``applyInPandas`` over the grid-bounded active set."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("t", T.LongType(), False)]
        + [T.StructField(c, T.StringType(), True) for c in label_cols]
        + [
            T.StructField("value", T.DoubleType(), True),
            T.StructField("alertstate", T.StringType(), False),
            T.StructField("active_at", T.LongType(), False),
        ]
    )
    start, end, step = int(start_ms), int(end_ms), int(step_ms)
    for_d, keep_d = int(for_ms), int(keep_firing_for_ms)

    def walk(pdf):
        import pandas as pd

        labels = (
            {c: pdf[c].iloc[0] for c in label_cols} if len(pdf) else {}
        )
        active = dict(zip(pdf["t"], pdf["value"]))
        restored = None
        if len(pdf) and "_restored" in pdf.columns:
            r = pdf["_restored"].iloc[0]
            restored = None if pd.isna(r) else int(r)
        rows = []
        active_at = last_active_t = None
        last_value = None
        firing = False
        for t in range(start, end + 1, step):
            if t in active:
                if active_at is None:
                    # becomes pending; a series active at the FIRST
                    # grid step adopts its restart-restored ActiveAt
                    active_at = (
                        min(restored, t)
                        if t == start and restored is not None
                        else t
                    )
                if not firing and t - active_at >= for_d:
                    firing = True
                last_active_t, last_value = t, active[t]
                rows.append(
                    (t, last_value,
                     "firing" if firing else "pending", active_at)
                )
            elif active_at is not None:
                # rules/alerting.go: a FIRING alert is held while
                # now - keepFiringSince < keep_firing_for, where
                # keepFiringSince is the first missing evaluation
                # (last_active + step); pending resolves immediately
                if firing and t - last_active_t - step < keep_d:
                    rows.append((t, last_value, "firing", active_at))
                else:
                    active_at = last_active_t = None
                    firing = False
        return pd.DataFrame(
            [
                {"t": t, **labels, "value": v,
                 "alertstate": s, "active_at": a}
                for t, v, s, a in rows
            ],
            columns=["t", *label_cols, "value", "alertstate", "active_at"],
        )

    grouped = (
        out.groupBy(*label_cols) if label_cols else out.groupBy(F.lit(1))
    )
    return grouped.applyInPandas(walk, schema)


def alerts_series(
    alert_frame: DataFrame, name_label: str = "__name__"
) -> DataFrame:
    """The synthetic ``ALERTS{alertname, alertstate, ...}`` samples a
    real Prometheus writes for active alerts (value 1 at each active
    step)."""
    df = alert_frame
    if "active_at" in df.columns:
        df = df.drop("active_at")
    return (
        df.withColumn(name_label, F.lit("ALERTS"))
        .withColumn("value", F.lit(1.0))
        .withColumnRenamed("t", "ts")
    )


def alerts_for_state_series(
    alert_frame: DataFrame, name_label: str = "__name__"
) -> DataFrame:
    """The ``ALERTS_FOR_STATE{alertname, ...}`` samples a real
    Prometheus persists alongside ``ALERTS``: value = the alert's
    ActiveAt timestamp in SECONDS (rules/alerting.go
    ``a.ActiveAt.Unix()``), one sample per active (series, step), NO
    ``alertstate`` label.  On restart the rule manager reads this
    series back to restore ``for`` state so a long ``for`` clock is not
    reset by a server bounce."""
    df = alert_frame
    if "alertstate" in df.columns:
        df = df.drop("alertstate")
    return (
        df.withColumn(name_label, F.lit("ALERTS_FOR_STATE"))
        .withColumn(
            "value", (F.col("active_at") / F.lit(1000.0)).cast("double")
        )
        .drop("active_at")
        .withColumnRenamed("t", "ts")
    )


def read_for_state(
    samples: DataFrame, alertname: str, name_label: str = "__name__"
) -> DataFrame:
    """The restart-restore read: latest ``ALERTS_FOR_STATE`` sample per
    series for ``alertname`` from a samples frame, as the ``(identity
    labels..., active_at ms)`` shape
    ``evaluate_alerting_rule(restored_active_at=...)`` takes.  One
    window over the (tiny) restore series — the selector pushes down to
    the store scan underneath."""
    df = samples.filter(
        (F.col(name_label) == F.lit("ALERTS_FOR_STATE"))
        & (F.col("alertname") == F.lit(alertname))
    )
    label_cols = [
        c
        for c in df.columns
        if c not in ("ts", "value", name_label, "alertname", "alertstate")
    ]
    w = Window.partitionBy(
        *([F.col(c) for c in label_cols] if label_cols else [F.lit(1)])
    ).orderBy(F.desc("ts"))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            *label_cols,
            # round, don't truncate: active_at was stored as ms/1000.0
            # and the double round-trip often lands at x-1e-4 ms —
            # a bare cast would restore x-1 ms and flip boundary-exact
            # `for` decisions (upstream persists integral Unix seconds)
            F.round(F.col("value") * 1000).cast("long").alias("active_at"),
        )
    )


def evaluate_rule_group(
    engine: PromQLEngine,
    group: RuleGroup,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
    restored: dict[str, DataFrame] | None = None,
) -> tuple[dict[str, DataFrame], PromQLEngine]:
    """Evaluate the group's rules IN ORDER, each seeing its
    predecessors' recording output (sequential group semantics).

    Returns ``(results, engine')``: results maps rule name ->
    recording-samples frame or alert-state frame; ``engine'`` wraps the
    samples frame with every recording rule's output unioned on (absent
    labels filled ``""``, the store convention), ready for the next
    evaluation interval or ad-hoc queries over rule output."""
    results: dict[str, DataFrame] = {}
    current = engine
    for rule in group.rules:
        if isinstance(rule, RecordingRule):
            rec = evaluate_recording_rule(
                current, rule, start_ms, end_ms, step_ms, lookback_ms
            )
            results[rule.record] = rec
            base = current.samples
            for c in base.columns:
                if c not in rec.columns:
                    rec = rec.withColumn(
                        c,
                        F.lit("") if dict(base.dtypes)[c] == "string"
                        else F.lit(None).cast(dict(base.dtypes)[c]),
                    )
            new_cols = [c for c in rec.columns if c not in base.columns]
            extended = base
            for c in new_cols:
                extended = extended.withColumn(c, F.lit(""))
            merged = extended.unionByName(rec.select(*extended.columns))
            current = PromQLEngine(
                merged,
                metric_label=current.metric_label,
                extrapolate=current.extrapolate,
                # a per-query transform (e.g. replica dedup) carries
                # over; recording rows ""-fill any transform-only
                # column, so e.g. a replica="" rule series trivially
                # wins its own vote — semantics unchanged
                samples_transform=getattr(
                    current, "samples_transform", None
                ),
            )
        elif isinstance(rule, AlertingRule):
            results[rule.alert] = evaluate_alerting_rule(
                current, rule, start_ms, end_ms, step_ms, lookback_ms,
                restored_active_at=(restored or {}).get(rule.alert),
            )
        else:  # pragma: no cover - config error
            raise TypeError(f"not a rule: {rule!r}")
    return results, current


def run_rule_group_to_store(
    spark,
    engine: PromQLEngine,
    group: RuleGroup,
    root: str,
    label_names: Sequence[str],
    start_ms: int,
    end_ms: int,
    step_ms: int,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
    include_alerts: bool = True,
    chunk_span_ms: int = 24 * 3600 * 1000,
    options=None,
    restore_for_state: bool = False,
):
    """One rule-evaluation interval, persisted: evaluate the group and
    append its recording series — plus the synthetic ``ALERTS`` +
    ``ALERTS_FOR_STATE`` series when ``include_alerts`` — to the sorted
    chunk store at ``root`` as ONE new part (the real Prometheus rule
    manager's write-back loop; `maybe_compact`/`vacuum_store` then
    apply to rule output exactly as to scraped data, and a
    `ChunkQuerier`/`PromQLEngine` over the store serves the recorded
    series back).

    ``restore_for_state=True`` reads each alert's ``ALERTS_FOR_STATE``
    series back from the OUT store before evaluating — chained one-shot
    intervals (`cli rules` on a cron) then carry ``for`` state across
    process restarts exactly like a real rule manager recovering after
    a bounce.  A first run against an empty root skips the restore.

    ``label_names`` is the store's label schema: every rule-output
    label must be in it (raising beats silently dropping a label the
    rule asked for); absent labels land as ``""``, the store
    convention.  Returns ``(rows_per_rule, writer)`` — callers call
    ``writer.maybe_compact()``-style maintenance on their own schedule.
    """
    from tsdb_parquet_spark.chunks import samples_to_chunks
    from tsdb_parquet_spark.schema import sort_columns
    from tsdb_parquet_spark.sources.writer import (
        SortedParquetWriter,
        WriterOptions,
    )

    labels = list(label_names)
    restored: dict[str, DataFrame] = {}
    if restore_for_state and include_alerts:
        import os as _os

        # restore only from something that IS a store already (first
        # interval: no root / empty dir -> fresh state, cleanly); a
        # root that exists but fails to OPEN surfaces its error — a
        # swallowed read failure would silently reset every `for` clock
        looks_like_store = _os.path.isdir(root) and any(
            e == "_snapshots" or e.startswith(("part.", "compact"))
            for e in _os.listdir(root)
        )
        if looks_like_store:
            from tsdb_parquet_spark.querier import ChunkQuerier

            prior = ChunkQuerier.from_store(spark, root).select_samples(
                labels=labels
            )
            for rule in group.rules:
                if isinstance(rule, AlertingRule):
                    restored[rule.alert] = read_for_state(
                        prior, rule.alert, engine.metric_label
                    )
    results, _ = evaluate_rule_group(
        engine, group, start_ms, end_ms, step_ms, lookback_ms,
        restored=restored or None,
    )
    frames: list[tuple[str, DataFrame]] = []
    for rule in group.rules:
        if isinstance(rule, RecordingRule):
            frames.append((rule.record, results[rule.record]))
        elif include_alerts:
            frames.append(
                (rule.alert, alerts_series(results[rule.alert],
                                           engine.metric_label))
            )
            # the restore-state twin a real Prometheus persists with
            # every ALERTS sample (value = ActiveAt seconds)
            frames.append(
                (
                    f"{rule.alert}:for_state",
                    alerts_for_state_series(
                        results[rule.alert], engine.metric_label
                    ),
                )
            )
    counts: dict[str, int] = {}
    union = None
    persisted: list[DataFrame] = []
    for name, df in frames:
        extra = [
            c for c in df.columns
            if c not in ("ts", "value", *labels)
        ]
        if extra:
            raise ValueError(
                f"rule {name!r} emits labels {extra} absent from the "
                f"store schema {labels} — widen label_names"
            )
        for c in labels:
            if c not in df.columns:
                df = df.withColumn(c, F.lit(""))
        # persist before counting: the count below materializes the
        # rule's query_range plan (the expensive part) into the cache,
        # and the union write re-reads the cache instead of evaluating
        # every rule a second time.  One group-interval's output is
        # small — bounded by series x steps, nowhere near scan scale.
        df = df.select("ts", "value", *labels).persist()
        persisted.append(df)
        counts[name] = df.count()
        union = df if union is None else union.unionByName(df)
    if union is None:
        raise ValueError("group has no rules to persist")
    try:
        opts = options or WriterOptions(
            sort_columns=sort_columns(labels),
            bloom_columns=[c for c in labels if c != engine.metric_label],
        )
        writer = SortedParquetWriter(spark, root, opts)
        chunks = samples_to_chunks(
            union,
            labels,
            chunk_span_ms=chunk_span_ms,
            assign_series_ids=False,  # ids are assigned at compaction
        )
        writer.write(chunks)
    finally:
        for df in persisted:
            df.unpersist()
    return counts, writer
