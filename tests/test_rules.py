"""Rule groups (`rules.py`): recording rename/label merge, alert
``for``-state islands, group sequencing, and the ALERTS series shape."""

import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.plans.promql import PromQLEngine
from tsdb_parquet_spark.rules import (
    AlertingRule,
    RecordingRule,
    RuleGroup,
    alerts_series,
    evaluate_alerting_rule,
    evaluate_recording_rule,
    evaluate_rule_group,
)

MIN = 60_000


@pytest.fixture(scope="module")
def engine(spark):
    # per-minute samples; job=a goes high for 3 steps, dips, high 2 more
    vals = {"a": [1, 9, 9, 9, 1, 9, 9], "b": [9, 9, 1, 1, 1, 1, 1]}
    rows = [
        ("m", job, (i + 1) * MIN, float(v))
        for job, vs in vals.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "`__name__` STRING, job STRING, ts LONG, value DOUBLE"
    )
    return PromQLEngine(df)


def _states(df):
    return sorted(
        (r["job"], r["t"] // MIN, r["alertstate"]) for r in df.collect()
    )


def test_alert_for_state_islands(engine):
    rule = AlertingRule("HighM", "m > 5", for_ms=2 * MIN)
    out = evaluate_alerting_rule(engine, rule, MIN, 7 * MIN, MIN)
    # a: active 2,3,4 (fires at 4: 2 minutes after activation), then a
    # reset at 5 and a fresh pending island 6,7; b: active 1,2 only
    assert _states(out) == [
        ("a", 2, "pending"),
        ("a", 3, "pending"),
        ("a", 4, "firing"),
        ("a", 6, "pending"),
        ("a", 7, "pending"),
        ("b", 1, "pending"),
        ("b", 2, "pending"),
    ]


def test_alert_for_zero_fires_immediately(engine):
    rule = AlertingRule("AnyM", "m > 5", for_ms=0)
    out = evaluate_alerting_rule(engine, rule, MIN, 7 * MIN, MIN)
    assert {r["alertstate"] for r in out.collect()} == {"firing"}


def test_alert_labels_and_name(engine):
    rule = AlertingRule(
        "HighM", "m > 5", for_ms=0, labels={"severity": "page"}
    )
    out = evaluate_alerting_rule(engine, rule, MIN, 2 * MIN, MIN)
    row = out.collect()[0]
    assert row["alertname"] == "HighM" and row["severity"] == "page"
    assert row["value"] == 9.0


def test_alert_empty_active_set(engine):
    rule = AlertingRule("Never", "m > 100", for_ms=0)
    out = evaluate_alerting_rule(engine, rule, MIN, 7 * MIN, MIN)
    assert out.count() == 0


def test_alerts_series_shape(engine):
    rule = AlertingRule("HighM", "m > 5", for_ms=0)
    out = alerts_series(
        evaluate_alerting_rule(engine, rule, MIN, 2 * MIN, MIN)
    )
    row = out.collect()[0]
    assert row["__name__"] == "ALERTS"
    assert row["value"] == 1.0
    assert row["alertstate"] == "firing"
    assert "ts" in out.columns and "t" not in out.columns


def test_recording_rename_and_label_merge(engine):
    rule = RecordingRule(
        "job:m:max", "max by (job) (m)", labels={"tier": "gold"}
    )
    out = evaluate_recording_rule(engine, rule, MIN, 2 * MIN, MIN)
    rows = {(r["job"], r["ts"]): r for r in out.collect()}
    r = rows[("a", 2 * MIN)]
    assert r["__name__"] == "job:m:max" and r["tier"] == "gold"
    assert r["value"] == 9.0


def test_recording_rule_labels_overwrite(engine):
    # a rule label colliding with a result label wins (Prometheus
    # lb.Set semantics)
    rule = RecordingRule("job:m:max", "max by (job) (m)", labels={"job": "z"})
    out = evaluate_recording_rule(engine, rule, MIN, MIN, MIN)
    assert {r["job"] for r in out.collect()} == {"z"}


def test_group_sequencing(engine):
    group = RuleGroup(
        "g",
        (
            RecordingRule("job:m:sum", "sum by (job) (m)"),
            RecordingRule("job:m:sum:x2", "job:m:sum * 2"),
            AlertingRule("BigSum", "job:m:sum:x2 > 17", for_ms=0),
        ),
    )
    results, engine2 = evaluate_rule_group(engine, group, MIN, 2 * MIN, MIN)
    doubled = {
        (r["job"], r["ts"]): r["value"]
        for r in results["job:m:sum:x2"].collect()
    }
    assert doubled[("a", MIN)] == 2.0 and doubled[("b", MIN)] == 18.0
    alerts = {(r["job"], r["t"] // MIN) for r in results["BigSum"].collect()}
    assert alerts == {("b", 1), ("b", 2), ("a", 2)}
    # the returned engine serves the recorded series to ad-hoc queries
    chk = engine2.query_range("job:m:sum:x2", MIN, MIN, MIN).collect()
    assert {(r["job"], r["value"]) for r in chk} == {("a", 2.0), ("b", 18.0)}
    # and the ORIGINAL series still resolve through the union
    base = engine2.query_range("sum(m)", MIN, MIN, MIN).collect()
    assert base[0]["value"] == 10.0


def test_rule_group_to_store_lifecycle(spark, engine, tmp_path):
    """The write-back loop: two evaluation intervals append parts, the
    store compacts, and a ChunkQuerier/PromQLEngine over it serves both
    the recorded series and the ALERTS series back."""
    from tsdb_parquet_spark.plans.promql import PromQLEngine
    from tsdb_parquet_spark.querier import ChunkQuerier
    from tsdb_parquet_spark.rules import run_rule_group_to_store

    labels = ["__name__", "job", "alertname", "alertstate"]
    group = RuleGroup(
        "g",
        (
            RecordingRule("job:m:sum", "sum by (job) (m)"),
            AlertingRule("BigM", "m > 5", for_ms=MIN),
        ),
    )
    root = str(tmp_path / "rules_store")
    counts, writer = run_rule_group_to_store(
        spark, engine, group, root, labels, MIN, 3 * MIN, MIN
    )
    assert counts["job:m:sum"] == 6  # 2 jobs x 3 steps
    assert counts["BigM"] > 0
    # second interval appends another part; then compact
    counts2, writer = run_rule_group_to_store(
        spark, engine, group, root, labels, 4 * MIN, 7 * MIN, MIN
    )
    writer.compact()
    q = ChunkQuerier.from_parquet(spark, writer.compact_path
                                  if hasattr(writer, "compact_path")
                                  else f"{root}/compact")
    served = PromQLEngine(q.select_samples(labels=labels))
    rec = served.query_range("job:m:sum", MIN, 7 * MIN, MIN)
    got = {(r["job"], r["t"]) for r in rec.collect()}
    assert ("a", MIN) in got and ("b", 7 * MIN) in got
    alerts = served.query_range(
        'ALERTS{alertstate="firing"}', MIN, 7 * MIN, MIN
    ).collect()
    assert alerts and all(r["value"] == 1.0 for r in alerts)


def test_rule_store_rejects_unknown_label(spark, engine, tmp_path):
    from tsdb_parquet_spark.rules import run_rule_group_to_store

    group = RuleGroup(
        "g", (RecordingRule("job:m:sum", "sum by (job) (m)"),)
    )
    with pytest.raises(ValueError, match="widen label_names"):
        run_rule_group_to_store(
            spark, engine, group, str(tmp_path / "s"),
            ["__name__"], MIN, 2 * MIN, MIN,
        )


def test_keep_firing_for_holds_and_rejoins(engine):
    """Prometheus ``keep_firing_for``: a FIRING alert whose expression
    stops producing the series stays firing through the hold (value
    carried from the last evaluation) and re-activation during the hold
    keeps the ORIGINAL ActiveAt — no new pending phase."""
    rule = AlertingRule(
        "HighM", "m > 5", for_ms=2 * MIN, keep_firing_for_ms=MIN
    )
    out = evaluate_alerting_rule(engine, rule, MIN, 7 * MIN, MIN)
    assert _states(out) == [
        ("a", 2, "pending"),
        ("a", 3, "pending"),
        ("a", 4, "firing"),
        ("a", 5, "firing"),  # hold: expr inactive, alert kept firing
        ("a", 6, "firing"),  # rejoin during hold: still firing, no
        ("a", 7, "firing"),  # pending restart
        ("b", 1, "pending"),
        ("b", 2, "pending"),  # pending resolves immediately at 3
    ]
    rows = {(r["job"], r["t"] // MIN): r for r in out.collect()}
    # the hold row carries the last evaluated value (a.Value)
    assert rows[("a", 5)]["value"] == 9.0
    # ActiveAt never reset across the hold
    assert {r["active_at"] for k, r in rows.items() if k[0] == "a"} == {
        2 * MIN
    }
    assert rows[("b", 1)]["active_at"] == MIN


def test_keep_firing_for_expires(spark):
    """The hold resolves once now - keepFiringSince >= keep_firing_for
    (keepFiringSince = the first missing evaluation); a later
    re-activation starts a fresh alert with a new ActiveAt."""
    rows = [("m", "a", i * MIN, 9.0) for i in (1, 2, 3, 7)]
    eng = PromQLEngine(spark.createDataFrame(
        rows, "`__name__` STRING, job STRING, ts LONG, value DOUBLE"
    ))
    rule = AlertingRule("A", "m > 5", for_ms=0, keep_firing_for_ms=MIN)
    # one-step lookback so the gap minutes are really inactive (the
    # default 5m staleness lookback would keep the series alive)
    out = evaluate_alerting_rule(
        eng, rule, MIN, 7 * MIN, MIN, lookback_ms=MIN
    )
    got = sorted(
        (r["t"] // MIN, r["alertstate"], r["active_at"] // MIN)
        for r in out.collect()
    )
    # held at 4 (first missing eval), resolved at 5 (60s >= 60s), and
    # minute 7 is a NEW alert (for=0 -> firing) with ActiveAt=7
    assert got == [
        (1, "firing", 1),
        (2, "firing", 1),
        (3, "firing", 1),
        (4, "firing", 1),
        (7, "firing", 7),
    ]


def test_alerts_for_state_series(engine):
    """ALERTS_FOR_STATE: value = ActiveAt seconds, no alertstate
    label, same identity labels as ALERTS."""
    from tsdb_parquet_spark.rules import alerts_for_state_series

    rule = AlertingRule("HighM", "m > 5", for_ms=2 * MIN)
    out = evaluate_alerting_rule(engine, rule, MIN, 7 * MIN, MIN)
    fs = alerts_for_state_series(out)
    assert "alertstate" not in fs.columns
    assert "active_at" not in fs.columns
    rows = {(r["job"], r["ts"] // MIN): r for r in fs.collect()}
    assert rows[("a", 4)]["__name__"] == "ALERTS_FOR_STATE"
    # job a's first island activates at minute 2 -> 120 seconds
    assert rows[("a", 4)]["value"] == 120.0
    assert rows[("b", 1)]["value"] == 60.0


def test_parse_rule_file_yaml_and_json():
    from tsdb_parquet_spark.rules import parse_rule_file

    yaml_text = """
groups:
  - name: example
    interval: 30s
    rules:
      - record: job:m:sum
        expr: sum by (job) (m)
        labels:
          team: infra
      - alert: HighM
        expr: m > 5
        for: 10m
        keep_firing_for: 5m
        labels:
          severity: page
        annotations:
          summary: "m is high"
  - name: second
    rules:
      - alert: AnyM
        expr: m > 0
"""
    groups = parse_rule_file(yaml_text)
    assert [g.name for g in groups] == ["example", "second"]
    rec, alert = groups[0].rules
    assert rec == RecordingRule(
        "job:m:sum", "sum by (job) (m)", {"team": "infra"}
    )
    assert alert.alert == "HighM"
    assert alert.for_ms == 600_000
    assert alert.keep_firing_for_ms == 300_000
    assert alert.labels == {"severity": "page"}
    assert groups[1].rules[0].for_ms == 0
    # the engine's legacy single-group JSON shape still parses
    import json

    [g] = parse_rule_file(json.dumps({
        "name": "j",
        "rules": [{"alert": "A", "expr": "m > 1", "for": "90s"}],
    }))
    assert g.name == "j" and g.rules[0].for_ms == 90_000


def test_store_writeback_includes_for_state(spark, engine, tmp_path):
    """run_rule_group_to_store persists ALERTS and ALERTS_FOR_STATE."""
    from tsdb_parquet_spark.querier import ChunkQuerier
    from tsdb_parquet_spark.rules import run_rule_group_to_store

    group = RuleGroup(
        "g", (AlertingRule("HighM", "m > 5", for_ms=2 * MIN),)
    )
    labels = ["__name__", "alertname", "alertstate", "job"]
    counts, writer = run_rule_group_to_store(
        spark, engine, group, str(tmp_path / "store"), labels,
        MIN, 7 * MIN, MIN,
    )
    writer.compact()
    assert counts["HighM"] == counts["HighM:for_state"] == 7
    q = ChunkQuerier.from_store(spark, str(tmp_path / "store"))
    samples = q.select_samples(labels=labels)
    names = {
        r["__name__"]
        for r in samples.select("__name__").distinct().collect()
    }
    assert names == {"ALERTS", "ALERTS_FOR_STATE"}
    fs = samples.filter(F.col("__name__") == "ALERTS_FOR_STATE")
    # ActiveAt seconds, alertstate blank (not a label of this series)
    assert {r["alertstate"] for r in fs.collect()} == {""}
    # job a's two islands activate at minutes 2 and 6
    assert {r["value"] for r in fs.filter(F.col("job") == "a").collect()} == {
        120.0,
        360.0,
    }


def test_restore_active_at_jvm_path(spark, engine):
    """Restart-restore: a series active at the FIRST grid step adopts
    its restored (earlier) ActiveAt, so a long `for` clock survives a
    bounce; islands starting later ignore the restored state."""
    rule = AlertingRule("HighM", "m > 5", for_ms=MIN)
    restored = spark.createDataFrame(
        [("a", 0), ("b", 0)], "job STRING, active_at LONG"
    )
    out = evaluate_alerting_rule(
        engine, rule, MIN, 7 * MIN, MIN, lookback_ms=MIN,
        restored_active_at=restored,
    )
    rows = {(r["job"], r["t"] // MIN): r for r in out.collect()}
    # b is active at the first grid step: restored ActiveAt=0 makes
    # minute 1 already `for`-mature -> firing immediately
    assert rows[("b", 1)]["alertstate"] == "firing"
    assert rows[("b", 1)]["active_at"] == 0
    assert rows[("b", 2)]["alertstate"] == "firing"
    # a's first island starts at minute 2 (NOT the first grid step):
    # the restored state is ignored, normal pending->firing
    assert rows[("a", 2)]["alertstate"] == "pending"
    assert rows[("a", 2)]["active_at"] == 2 * MIN
    assert rows[("a", 3)]["alertstate"] == "firing"


def test_restore_active_at_state_machine_path(spark, engine):
    """Same restore semantics through the keep_firing_for
    (applyInPandas) path."""
    rule = AlertingRule(
        "HighM", "m > 5", for_ms=MIN, keep_firing_for_ms=MIN
    )
    restored = spark.createDataFrame(
        [("a", 0), ("b", 0)], "job STRING, active_at LONG"
    )
    out = evaluate_alerting_rule(
        engine, rule, MIN, 7 * MIN, MIN, lookback_ms=MIN,
        restored_active_at=restored,
    )
    rows = {(r["job"], r["t"] // MIN): r for r in out.collect()}
    assert rows[("b", 1)]["alertstate"] == "firing"
    assert rows[("b", 1)]["active_at"] == 0
    assert rows[("a", 2)]["alertstate"] == "pending"
    assert rows[("a", 2)]["active_at"] == 2 * MIN


def test_store_chained_intervals_restore(spark, engine, tmp_path):
    """Two chained run_rule_group_to_store intervals with
    restore_for_state: the second interval reads the first's
    ALERTS_FOR_STATE back, so the alert fires at the second interval's
    first step instead of restarting pending — the cron-chained
    `cli rules --restore` loop."""
    from tsdb_parquet_spark.querier import ChunkQuerier
    from tsdb_parquet_spark.rules import run_rule_group_to_store

    group = RuleGroup(
        "g", (AlertingRule("HighM", "m > 5", for_ms=2 * MIN),)
    )
    labels = ["__name__", "alertname", "alertstate", "job"]
    root = str(tmp_path / "store")
    run_rule_group_to_store(
        spark, engine, group, root, labels, MIN, 3 * MIN, MIN,
        lookback_ms=MIN, restore_for_state=True,  # empty root: no-op
    )
    _, writer = run_rule_group_to_store(
        spark, engine, group, root, labels, 4 * MIN, 4 * MIN, MIN,
        lookback_ms=MIN, restore_for_state=True,
    )
    writer.compact()
    q = ChunkQuerier.from_store(spark, root)
    samples = q.select_samples(labels=labels)
    alerts = samples.filter(
        (F.col("__name__") == "ALERTS") & (F.col("job") == "a")
    )
    states = {
        (r["ts"] // MIN, r["alertstate"]) for r in alerts.collect()
    }
    # interval 1 ([1..3], a active 2,3): pending both; interval 2
    # ([4..4]): restored ActiveAt=2min -> 4-2 >= 2min -> FIRING at 4,
    # which a fresh pending restart could never produce
    assert (2, "pending") in states and (3, "pending") in states
    assert (4, "firing") in states
    assert (4, "pending") not in states


def test_cli_check_rules(tmp_path, capsys):
    """promtool `check rules` analog: good file passes, broken file
    reports every error and exits 1 — no Spark session involved."""
    import json

    from tsdb_parquet_spark.cli import main

    good = tmp_path / "good.yml"
    good.write_text(
        "groups:\n"
        "  - name: ok\n"
        "    rules:\n"
        "      - record: job:m:sum\n"
        "        expr: sum by (job) (m)\n"
        "      - alert: HighM\n"
        "        expr: m > 5\n"
        "        for: 10m\n"
    )
    bad = tmp_path / "bad.yml"
    bad.write_text(
        "groups:\n"
        "  - name: broken\n"
        "    rules:\n"
        "      - record: '0bad name'\n"
        "        expr: sum by (job) (m)\n"
        "      - alert: A\n"
        "        expr: 'sum by ((m)'\n"
        "      - alert: A\n"
        "        expr: m > 1\n"
    )
    assert main(["check-rules", str(good)]) == 0
    report = json.loads(capsys.readouterr().out.strip())
    assert report["ok"] and report["rules"] == 2
    assert main(["check-rules", str(bad)]) == 1
    report = json.loads(capsys.readouterr().out.strip())
    assert not report["ok"] and len(report["errors"]) == 3
