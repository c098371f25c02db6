"""Prometheus text exposition parsing (scrape.py): the pure-python
reference parser and the JVM-side distributed plan must agree, against
the public format spec (exposition_formats.md)."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tsdb_parquet_spark.scrape import (
    escape_label_value,
    exposition_samples,
    format_exposition,
    parse_exposition,
    scrape_metadata,
    scrape_samples,
)

NASTY = 'Cannot find file:\n"FILE.TXT" in C:\\DIR{a,b} }x{'


def test_format_parse_roundtrip_nasty_values():
    samples = [
        ({"__name__": "m", "path": NASTY, "ok": ""}, 1.5, 123),
        ({"__name__": "m"}, -0.25, None),
        ({"__name__": "up", "job": "a b,c"}, float("inf"), 5),
        ({"__name__": "up", "job": "{}"}, float("-inf"), None),
    ]
    text = format_exposition(samples, [("m", "gauge", 'help with "quotes"\nand\\slash')])
    back = parse_exposition(text)
    assert [(l, v, t) for l, v, t in back] == samples


def test_parse_nan():
    (labels, value, ts), = parse_exposition("m NaN 7\n")
    assert labels == {"__name__": "m"} and math.isnan(value) and ts == 7


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_exposition("1bad_metric 1\n")
    with pytest.raises(ValueError):
        parse_exposition("m 1 2 3\n")


def test_distributed_matches_reference(spark):
    samples = [
        ({"__name__": "m", "path": NASTY}, 1.5, 123),
        ({"__name__": "m", "q": 'a"b'}, 2.0, None),
        ({"__name__": "m_no_labels"}, 3e-7, 42),
        ({"__name__": "inf_m", "s": "x"}, float("inf"), None),
    ]
    text = format_exposition(samples, [("m", "counter", "doc")])
    df = spark.createDataFrame([("t1", text)], "target string, body string")
    rows = exposition_samples(df).collect()
    got = sorted(
        (r["target"], r["__name__"], tuple(sorted(r["labels"].items())),
         r["value"], r["ts"])
        for r in rows
    )
    want = sorted(
        ("t1", l["__name__"],
         tuple(sorted((k, v) for k, v in l.items() if k != "__name__")),
         v, t)
        for l, v, t in samples
    )
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.dictionaries(
                # classic names OR Prometheus 3.x UTF-8 names (quoted on
                # the wire; no raw " or \\ per the documented parse bound)
                st.one_of(
                    st.from_regex(r"[a-zA-Z_][a-zA-Z0-9_]{0,5}",
                                  fullmatch=True),
                    st.text(
                        alphabet=st.characters(
                            blacklist_categories=("Cs", "Cc"),
                            blacklist_characters='"\\',
                            max_codepoint=0x2FF,
                        ),
                        min_size=1,
                        max_size=8,
                    ).filter(lambda n: n != "__name__"),
                ),
                st.text(
                    alphabet=st.characters(
                        blacklist_categories=("Cs",), max_codepoint=0x2FF
                    ),
                    max_size=12,
                ),
                max_size=3,
            ),
            st.floats(allow_nan=False, width=64),
            st.one_of(st.none(), st.integers(-(2**40), 2**40)),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_format_parse_property(entries):
    samples = [
        ({"__name__": "metric_x", **labels}, value, ts)
        for labels, value, ts in entries
    ]
    back = parse_exposition(format_exposition(samples))
    assert [(l, v, t) for l, v, t in back] == samples


def test_spark_python_agreement_on_property_corpus(spark):
    # one representative adversarial corpus through BOTH parsers
    cases = [
        {"a": "\\"}, {"a": '\\"'}, {"a": "\\n"}, {"a": "\n"},
        {"a": "}{"}, {"a": ","}, {"a": ' = "'}, {"a": "\\\\n"},
        {"a": "tab\there"}, {"a": ""},
        # Prometheus 3.x quoted UTF-8 label names (values still nasty)
        {"svc.ver": "1,2"}, {"a b": "}x{"}, {"x=y": 'esc\\"q'},
    ]
    samples = [
        ({"__name__": "m", **labels}, float(i), i * 10)
        for i, labels in enumerate(cases)
    ]
    text = format_exposition(samples)
    df = spark.createDataFrame([(text,)], "body string")
    got = sorted(
        [
            (dict(r["labels"]), r["value"], r["ts"])
            for r in exposition_samples(df).collect()
        ],
        key=lambda x: x[1],
    )
    want = [(
        {k: v for k, v in l.items() if k != "__name__"}, v2, t)
        for l, v2, t in samples
    ]
    assert got == want


def test_scrape_samples_pivot_missing_label_empty(spark):
    text = format_exposition(
        [
            ({"__name__": "m", "job": "j1", "extra": "zzz"}, 1.0, 1),
            ({"__name__": "m"}, 2.0, 2),
        ]
    )
    df = spark.createDataFrame([(text,)], "body string")
    out = scrape_samples(df, ["__name__", "job"])
    rows = sorted((r["__name__"], r["job"], r["ts"], r["value"])
                  for r in out.collect())
    assert rows == [("m", "", 2, 2.0), ("m", "j1", 1, 1.0)]
    assert out.columns == ["__name__", "job", "ts", "value"]


def test_scrape_metadata(spark):
    text = format_exposition(
        [({"__name__": "m"}, 1.0, None)],
        [("m", "histogram", 'docs "quoted"\nline2\\end'),
         ("n", "gauge", "")],
    )
    # an OpenMetrics UNIT line joins the same metadata frame
    text += '# UNIT m seconds\n# UNIT "u.s" bytes\n'
    df = spark.createDataFrame([(text,)], "body string")
    rows = {r["metric"]: (r["type"], r["help"], r["unit"])
            for r in scrape_metadata(df).collect()}
    assert rows["m"] == ("histogram", 'docs "quoted"\nline2\\end',
                         "seconds")
    assert rows["n"] == ("gauge", None, None)
    assert rows["u.s"] == (None, None, "bytes")
    # writer round-trip: a dotted metric's metadata (incl. unit) is
    # QUOTED on the way out and parses back to the raw name
    text2 = format_exposition(
        [({"__name__": "req.dur"}, 1.0, None)],
        [("req.dur", "histogram", "dotted docs", "seconds")],
    )
    assert '# TYPE "req.dur" histogram' in text2
    assert '# UNIT "req.dur" seconds' in text2
    df2 = spark.createDataFrame([(text2,)], "body string")
    rows2 = {r["metric"]: (r["type"], r["help"], r["unit"])
             for r in scrape_metadata(df2).collect()}
    assert rows2["req.dur"] == ("histogram", "dotted docs", "seconds")


def test_exposition_samples_is_jvm_only(spark):
    # the parse plan must contain no Python evaluation (BatchEvalPython
    # / ArrowEvalPython / FlatMapsInPandas) — the whole point of the
    # built-in formulation
    df = spark.createDataFrame([("m 1 2",)], "body string")
    plan = exposition_samples(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Pandas" not in plan


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_parse_exposition_never_crashes(text):
    # arbitrary junk either parses or raises ValueError — no other
    # failure class (the distributed plan inherits the same grammar)
    try:
        parse_exposition(text)
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# OpenMetrics: exemplars, seconds timestamps, # EOF
# ---------------------------------------------------------------------------


def test_exemplar_format_parse_roundtrip():
    from tsdb_parquet_spark.scrape import parse_exemplars

    samples = [
        ({"__name__": "h_bucket", "le": "0.01"}, 0.0, 123,
         ({"trace_id": "KOO5S4vxi0o"}, 0.67, 1520879607.789)),
        ({"__name__": "h_bucket", "le": "+Inf"}, 17.0, None,
         ({"trace_id": 'x"y\\z', "span": "s}1"}, 9.8, None)),
        ({"__name__": "plain"}, 1.0, 5, None),  # no exemplar
    ]
    text = format_exposition(samples)
    # the sample values/timestamps parse as if no exemplar were present
    back = parse_exposition(text)
    assert [(l, v, t) for l, v, t in back] == [
        (s[0], s[1], s[2]) for s in samples
    ]
    ex = parse_exemplars(text)
    assert ex == [
        (samples[0][0], {"trace_id": "KOO5S4vxi0o"}, 0.67, 1520879607.789),
        (samples[1][0], {"trace_id": 'x"y\\z', "span": "s}1"}, 9.8, None),
    ]


def test_exemplar_suffix_cannot_be_spoofed_by_label_value():
    from tsdb_parquet_spark.scrape import parse_exemplars

    # a label VALUE that looks like an exemplar arrives with escaped
    # quotes, so the anchored pattern must not fire
    evil = ' # {trace_id="fake"} 1 2'
    text = format_exposition([({"__name__": "m", "a": evil}, 5.0, 7)])
    assert parse_exemplars(text) == []
    (labels, value, ts), = parse_exposition(text)
    assert labels == {"__name__": "m", "a": evil}
    assert (value, ts) == (5.0, 7)


def test_exposition_exemplars_distributed(spark):
    from tsdb_parquet_spark.scrape import exposition_exemplars

    samples = [
        ({"__name__": "h_bucket", "le": "0.01"}, 0.0, 123,
         ({"trace_id": "abc"}, 0.67, 1520879607.789)),
        ({"__name__": "h_bucket", "le": "0.1"}, 2.0, 124,
         ({"trace_id": 'q"z'}, 1.5, None)),
        ({"__name__": "plain"}, 1.0, 5, None),
    ]
    text = format_exposition(samples)
    df = spark.createDataFrame([("t0", text)], "target string, body string")
    rows = sorted(
        [
            (r["target"], r["__name__"], dict(r["labels"]),
             dict(r["exemplar"]), r["value"], r["ts"])
            for r in exposition_exemplars(df).collect()
        ],
        key=lambda x: x[4],
    )
    assert rows == [
        ("t0", "h_bucket", {"le": "0.01"}, {"trace_id": "abc"}, 0.67,
         1520879607.789),
        ("t0", "h_bucket", {"le": "0.1"}, {"trace_id": 'q"z'}, 1.5, None),
    ]
    # and the SAMPLE parse on the same body ignores the suffixes
    got = sorted(
        (r["__name__"], r["value"], r["ts"])
        for r in exposition_samples(df).collect()
    )
    assert got == [("h_bucket", 0.0, 123), ("h_bucket", 2.0, 124),
                   ("plain", 1.0, 5)]


def test_openmetrics_seconds_timestamps(spark):
    text = "# TYPE m gauge\nm{a=\"x\"} 1.5 1520879607.789\nm 2 3\n# EOF\n"
    df = spark.createDataFrame([(text,)], "body string")
    rows = sorted(
        (r["__name__"], r["value"], r["ts"])
        for r in exposition_samples(df, openmetrics=True).collect()
    )
    assert rows == [("m", 1.5, 1520879607789), ("m", 2.0, 3000)]
