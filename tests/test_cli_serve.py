"""`cli rules` + `cli serve`: the rule write-back loop and the query-API
server as subprocess CLIs (each owns its Spark session, like the other
CLI tests)."""

import json
import os
import subprocess
import sys
import time
import urllib.request

import pytest

_P_START = 1704153600000
_P_END = 1704153600000 + 3 * 86_400_000
_STEP = 86_400_000
_LOOK = 6 * 3600 * 1000


@pytest.fixture(scope="module")
def repo_cwd():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def rule_store(spark, repo_cwd, tmp_path_factory):
    """cli rules over the cached sf0.01 events chunk store -> a rule
    output store with recording + ALERTS series."""
    from tsdb_parquet_spark.corpus import events_chunk_store

    compact = events_chunk_store(spark, "/root/testdata/sf0.01")
    out = str(tmp_path_factory.mktemp("cli_rules") / "out")
    spec = tmp_path_factory.mktemp("cli_rules_spec") / "group.json"
    spec.write_text(json.dumps({
        "name": "events",
        "rules": [
            {"record": "app_events:sum",
             "expr": "sum by (event_type) (app_events)"},
            {"alert": "HighEvents",
             "expr": "sum by (event_type) (app_events) > 350",
             "for": "1d", "labels": {"severity": "page"}},
        ],
    }))
    proc = subprocess.run(
        [sys.executable, "-m", "tsdb_parquet_spark.cli", "rules",
         "--store", compact, "--rules", str(spec), "--out", out,
         "--out-labels",
         "__name__,event_type,severity,alertname,alertstate",
         "--start", str(_P_START), "--end", str(_P_END),
         "--step", str(_STEP), "--lookback", str(_LOOK), "--compact"],
        capture_output=True, text=True, timeout=600, cwd=repo_cwd,
        env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    counts = dict(
        line.split("\t") for line in proc.stdout.strip().splitlines()
    )
    # counts are group-prefixed since multi-group rule files landed
    assert int(counts["events/app_events:sum"]) == 20  # 5 types x 4 steps
    return out


def test_cli_serve_over_rule_store(rule_store, repo_cwd):
    proc = subprocess.Popen(
        [sys.executable, "-m", "tsdb_parquet_spark.cli", "serve",
         "--store", rule_store,
         "--labels", "__name__,event_type,severity,alertname,alertstate",
         "--max-seconds", "150"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=repo_cwd, env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
    )
    try:
        url = proc.stdout.readline().strip()
        assert url.startswith("http://127.0.0.1:"), url
        with urllib.request.urlopen(f"{url}/api/v1/labels", timeout=120) as r:
            labels = json.loads(r.read())["data"]
        assert labels == [
            "__name__", "alertname", "alertstate", "event_type", "severity"
        ]
        qs = (
            "query=app_events:sum"
            f"&start={_P_START // 1000}&end={_P_END // 1000}"
            f"&step={_STEP // 1000}"
        )
        with urllib.request.urlopen(
            f"{url}/api/v1/query_range?{qs}", timeout=120
        ) as r:
            body = json.loads(r.read())
        series = body["data"]["result"]
        assert len(series) == 5  # one per event_type
        assert all(len(s["values"]) == 4 for s in series)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_cli_serve_multi_store_replica_dedup(spark, repo_cwd, tmp_path):
    """Thanos-Query shape: two HA replica stores fan into one API with
    --replica-label dedup; the deduped series set carries each bucket's
    winning replica only."""
    from pyspark.sql import functions as F

    from tsdb_parquet_spark.chunks import samples_to_chunks
    from tsdb_parquet_spark.schema import sort_columns
    from tsdb_parquet_spark.sources.writer import WriterOptions, write_sorted

    labels = ["__name__", "job", "replica"]
    day = 86_400_000
    # replica a: buckets 0,1 sparse; replica b: bucket 1 dense + bucket 2
    data = {
        "a": [(0, 1.0), (10_000, 2.0), (day, 3.0)],
        "b": [(day, 4.0), (day + 10_000, 5.0), (2 * day, 6.0)],
    }
    stores = []
    for rep, pts in data.items():
        df = spark.createDataFrame(
            [("m", "api", rep, ts, v) for ts, v in pts],
            "`__name__` STRING, job STRING, replica STRING, "
            "ts LONG, value DOUBLE",
        )
        chunks = samples_to_chunks(df, labels, chunk_span_ms=day)
        out = str(tmp_path / f"store_{rep}")
        write_sorted(chunks, out, WriterOptions(sort_columns=sort_columns(labels)))
        stores.append(out)

    proc = subprocess.Popen(
        [sys.executable, "-m", "tsdb_parquet_spark.cli", "serve",
         "--store", stores[0], "--store", stores[1],
         "--replica-label", "replica", "--dedup-window", str(day),
         "--max-seconds", "150"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=repo_cwd, env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
    )
    try:
        url = proc.stdout.readline().strip()
        assert url.startswith("http://127.0.0.1:"), url
        qs = f"query=m&start=0&end={3 * day // 1000}&step={day // 1000}"
        with urllib.request.urlopen(
            f"{url}/api/v1/query_range?{qs}", timeout=120
        ) as r:
            body = json.loads(r.read())
        series = body["data"]["result"]
        # replica label deduped away: ONE series
        assert len(series) == 1
        assert "replica" not in series[0]["metric"]
        vals = dict(series[0]["values"])
        # instant steps see the latest sample within the 5m lookback:
        # t=0 -> a's ts=0 (1); t=day -> bucket1's vote drops a's ts=day
        # sample (b wins 2-1), so b's ts=day (4); t=2day -> b's 6
        assert vals[0.0] == "1"
        assert vals[float(day // 1000)] == "4"
        assert vals[float(2 * day // 1000)] == "6"
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_wal_serve_metadata_derivation(spark, tmp_path):
    """serve --wal auto-surfaces the head's metric metadata: WAL
    Metadata records join to metric names and dedupe into the
    (metric, type, help, unit) entries the API consumes."""
    from tsdb_parquet_spark.cli import _wal_serve_metadata
    from tsdb_parquet_spark.tsdb_wal import WalWriter

    wal = str(tmp_path / "wal")
    w = WalWriter(wal)
    w.log_series([
        (1, {"__name__": "req_total", "job": "a"}),
        (2, {"__name__": "req_total", "job": "b"}),  # same metric
        (3, {"__name__": "mem_bytes", "job": "a"}),
    ])
    w.log_metadata([
        (1, "counter", "", "Requests."),
        (2, "counter", "", "Requests."),
        (3, "gauge", "bytes", "Resident memory."),
    ])
    w.log_samples([(1, 1000, 1.0), (2, 1000, 2.0), (3, 1000, 3.0)])
    w.close()
    assert _wal_serve_metadata(spark, wal) == [
        ("mem_bytes", "gauge", "Resident memory.", "bytes"),
        ("req_total", "counter", "Requests.", ""),
    ]
    # an empty/missing WAL dir serves without metadata, loudly not fatally
    assert _wal_serve_metadata(spark, str(tmp_path / "nope")) == []
