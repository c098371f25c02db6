"""Prometheus 3.x UTF-8 names END-TO-END: OTLP ingest with
``translation="no_utf8_escaping"`` keeps dotted attribute names
losslessly (U__ value-encoded columns, `names.py`), the quoted
selector / grouping syntax resolves them, and the API render boundary
reports the raw dotted names back out."""

import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.names import escape_name
from tsdb_parquet_spark.otlp import (
    decode_export_samples,
    encode_export_request,
    otlp_frame,
)
from tsdb_parquet_spark.plans.promql import (
    PromQLEngine,
    parse_promql,
    to_api_instant_response,
)


def _payload() -> bytes:
    return encode_export_request(
        [
            (
                {
                    "service.name": "checkout",
                    "service.version": "1.2",
                    "deploy.env": "prod",
                },
                [
                    {
                        "name": "http.server.active_requests",
                        "kind": "gauge",
                        "points": [
                            ({"http.route": "/cart"}, 60_000, 7.0),
                            ({"http.route": "/pay"}, 60_000, 3.0),
                        ],
                    }
                ],
            ),
            (
                {
                    "service.name": "checkout",
                    "service.version": "2.0",
                    "deploy.env": "prod",
                },
                [
                    {
                        "name": "http.server.active_requests",
                        "kind": "gauge",
                        "points": [
                            ({"http.route": "/cart"}, 60_000, 5.0),
                        ],
                    }
                ],
            ),
        ]
    )


def test_decode_no_utf8_escaping_keeps_raw_names():
    rows = decode_export_samples(_payload(), translation="no_utf8_escaping")
    names = {r[0] for r in rows}
    assert names == {"http.server.active_requests"}
    labels = rows[0][1]
    # identifying triple still maps to job; the rest stay dotted
    assert labels["job"] == "checkout"
    assert "service.version" in labels
    assert "deploy.env" in labels
    assert "http.route" in labels
    # default translation still underscores the same payload
    classic = decode_export_samples(_payload())
    assert {r[0] for r in classic} == {"http_server_active_requests"}
    assert "service_version" in classic[0][1]


@pytest.fixture(scope="module")
def utf8_engine(spark):
    payloads = spark.createDataFrame([(_payload(),)], "payload binary")
    frame = otlp_frame(
        payloads,
        label_names=[
            "__name__", "job", "service.version", "deploy.env",
            "http.route",
        ],
        translation="no_utf8_escaping",
    )
    assert set(frame.columns) == {
        "__name__", "job", escape_name("service.version"),
        escape_name("deploy.env"), escape_name("http.route"),
        "ts", "value",
    }
    return PromQLEngine(frame)


def test_quoted_matcher_selects_dotted_label(spark, utf8_engine):
    out = utf8_engine.query_range(
        '{"http.server.active_requests", "service.version"="1.2"}',
        60_000, 60_000, 60_000,
    )
    rows = out.collect()
    assert sorted(r["value"] for r in rows) == [3.0, 7.0]
    # the U__ column carries the selector — visible pushdown
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "U__service_2e_version" in plan


def test_quoted_grouping_and_api_render(spark, utf8_engine):
    out = utf8_engine.query_range(
        'sum by ("service.version") '
        '({"http.server.active_requests", "deploy.env"="prod"})',
        60_000, 60_000, 60_000,
    )
    resp = to_api_instant_response(out)
    result = resp["data"]["result"]
    got = {
        e["metric"]["service.version"]: e["value"][1] for e in result
    }
    assert got == {"1.2": "10", "2.0": "5"}
    # raw dotted name in the metric object, never the U__ form
    assert all(
        not k.startswith("U__") for e in result for k in e["metric"]
    )


def test_label_endpoints_round_trip(spark, utf8_engine):
    from tsdb_parquet_spark.api import (
        label_values_result,
        labels_result,
        series_result,
    )

    names = labels_result(utf8_engine)
    assert "service.version" in names
    assert "http.route" in names
    assert all(not n.startswith("U__") for n in names)
    vals = label_values_result(utf8_engine, "service.version")
    assert vals == ["1.2", "2.0"]
    series = series_result(
        utf8_engine,
        ['{"http.server.active_requests", "http.route"="/pay"}'],
        None, None,
    )
    assert len(series) == 1
    assert series[0]["service.version"] == "1.2"


def test_federate_quotes_utf8_names(spark, utf8_engine):
    from tsdb_parquet_spark.api import render_federate

    text = render_federate(
        utf8_engine, ['{"http.server.active_requests"}'], 60_000
    )
    # Prometheus 3.x exposition: non-legacy label names arrive quoted
    assert '"service.version"="1.2"' in text


def test_bad_translation_rejected(spark):
    payloads = spark.createDataFrame([(_payload(),)], "payload binary")
    with pytest.raises(ValueError, match="translation"):
        otlp_frame(payloads, ["__name__"], translation="dots").count()


def test_scrape_utf8_round_trip(spark):
    """Prometheus 3.x text syntax both ways: format_exposition quotes
    non-legacy names, BOTH parsers read them back, and scrape_samples
    pivots them to U__ columns."""
    from tsdb_parquet_spark.scrape import (
        exposition_samples,
        format_exposition,
        parse_exposition,
        scrape_samples,
    )

    samples = [
        ({"__name__": "my.metric", "service.version": "1.2",
          "job": "a"}, 4.0, 100),
        ({"__name__": "plain_metric", "job": "b"}, 2.5, 200),
    ]
    text = format_exposition(samples)
    assert text.startswith('{"my.metric","job"') or text.startswith(
        '{"my.metric",job='
    )
    back = parse_exposition(text)
    assert [(l, v, t) for l, v, t in back] == samples
    df = spark.createDataFrame([(text,)], "body string")
    got = sorted(
        (r["__name__"], dict(r["labels"]), r["value"], r["ts"])
        for r in exposition_samples(df).collect()
    )
    assert got == sorted(
        (l["__name__"],
         {k: v for k, v in l.items() if k != "__name__"}, v, t)
        for l, v, t in samples
    )
    piv = scrape_samples(
        df, ["__name__", "job", "service.version"]
    )
    assert escape_name("service.version") in piv.columns
    row = piv.filter(F.col("__name__") == "my.metric").collect()[0]
    assert row[escape_name("service.version")] == "1.2"


def test_scrape_metadata_quoted_metric(spark):
    from tsdb_parquet_spark.scrape import scrape_metadata

    text = (
        '# HELP "my.metric" dotted help\n'
        '# TYPE "my.metric" gauge\n'
        "# TYPE classic counter\n"
    )
    df = spark.createDataFrame([(text,)], "body string")
    rows = {r["metric"]: (r["type"], r["help"])
            for r in scrape_metadata(df).collect()}
    assert rows["my.metric"] == ("gauge", "dotted help")
    assert rows["classic"][0] == "counter"


def test_otlp_spool_ingestor_utf8_store(spark, tmp_path):
    """`cli ingest --format otlp --otlp-translation no_utf8_escaping`:
    the spool-drain path lands dotted attribute names as U__ columns
    in a REAL chunk store, and a PromQL engine over the querier frame
    answers quoted selectors."""
    import os

    from tsdb_parquet_spark.querier import ChunkQuerier
    from tsdb_parquet_spark.streaming import otlp_spool_ingestor

    spool = os.path.join(str(tmp_path), "spool")
    root = os.path.join(str(tmp_path), "store")
    os.makedirs(spool)
    with open(os.path.join(spool, "otlp-0.bin"), "wb") as fh:
        fh.write(_payload())

    labels = ["__name__", "job", "service.version", "http.route"]
    ingestor, stream = otlp_spool_ingestor(
        spark, spool, root, labels,
        translation="no_utf8_escaping",
    )
    ingestor.ingest(stream)
    q = ChunkQuerier.from_parquet(spark, ingestor.finalize())
    frame = q.select_samples(
        labels=["__name__", "job", escape_name("service.version"),
                escape_name("http.route")]
    )
    assert escape_name("service.version") in frame.columns
    engine = PromQLEngine(frame)
    out = engine.query_range(
        'sum by ("service.version") ({"http.server.active_requests"})',
        60_000, 60_000, 60_000,
    ).collect()
    assert sorted((r["U__service_2e_version"], r["value"]) for r in out) \
        == [("1.2", 10.0), ("2.0", 5.0)]


def test_block_export_round_trips_utf8_names(spark, tmp_path):
    """export_block writes RAW UTF-8 label names into the TSDB index
    (a real Prometheus 3.x reader sees dotted names); re-ingesting the
    block brings them back as U__ columns."""
    import os

    from tsdb_parquet_spark.chunks import samples_to_chunks
    from tsdb_parquet_spark.tsdb_block import (
        blocks_to_chunk_frame,
        export_block,
        read_index,
    )

    samples = spark.createDataFrame(
        [("m", "1.2", 1000, 1.0), ("m", "2.0", 2000, 2.0)],
        f"`__name__` STRING, `{escape_name('service.version')}` STRING, "
        "ts LONG, value DOUBLE",
    )
    chunks = samples_to_chunks(
        samples, ["__name__", escape_name("service.version")]
    )
    block = os.path.join(str(tmp_path), "block")
    export_block(chunks, block)
    names = {n for labels, _ in read_index(block) for n in labels}
    assert "service.version" in names
    assert not any(n.startswith("U__") for n in names)
    back = blocks_to_chunk_frame(
        spark, [block], ["__name__", "service.version"]
    )
    assert escape_name("service.version") in back.columns


def test_quoted_names_in_all_label_lists():
    """Quoted UTF-8 names escape at the parse boundary in every label
    list position: by/without, on/ignoring, group_left carry,
    label_replace/label_join dst+src."""
    esc = escape_name

    node = parse_promql('sum without ("a.b") (m)')
    assert node.without == [esc("a.b")]
    node = parse_promql('m1 * on ("svc.x") group_left ("c.d") m2')
    assert node.matching == [esc("svc.x")]
    assert node.group_carry == [esc("c.d")]
    node = parse_promql(
        'label_replace(m, "dst.x", "$1", "src.y", "(.*)")'
    )
    assert node.dst == esc("dst.x") and node.src == esc("src.y")
    node = parse_promql('label_join(m, "out.z", "-", "a.b", "job")')
    assert node.dst == esc("out.z")
    assert node.srcs == [esc("a.b"), "job"]


def test_absent_synthesizes_quoted_utf8_label(spark):
    """absent() synthesizes labels from EQ matchers: a quoted UTF-8
    matcher must come back as the RAW dotted name in the API render."""
    df = spark.createDataFrame(
        [("m", "1.2", 60_000, 1.0)],
        f"`__name__` STRING, `{escape_name('service.version')}` STRING, "
        "ts LONG, value DOUBLE",
    )
    eng = PromQLEngine(df)
    out = eng.query_range(
        'absent({"m", "service.version"="9.9"})',
        60_000, 60_000, 60_000,
    )
    resp = to_api_instant_response(out)
    assert resp["data"]["result"] == [
        {"metric": {"service.version": "9.9"}, "value": [60.0, "1"]}
    ]
