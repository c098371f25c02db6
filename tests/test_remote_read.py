"""Remote-read protocol (`remote_read.py`): wire round-trips from the
public prompb spec, matcher-op fidelity, and the served path over a
real socket vs direct frame evaluation."""

import math
import urllib.request

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tsdb_parquet_spark.operators.selection import Matcher
from tsdb_parquet_spark.plans.promql import PromQLEngine
from tsdb_parquet_spark.remote_read import (
    decode_read_request,
    decode_read_response,
    encode_read_request,
    encode_read_response,
    serve_read_request,
)
from tsdb_parquet_spark.remote_write import frame_payload, unframe_payload


def test_request_roundtrip_all_ops():
    qs = [
        (
            1_000,
            5_000,
            [
                Matcher("__name__", "=", "m"),
                Matcher("job", "!=", "x"),
                Matcher("inst", "=~", "a.*"),
                Matcher("env", "!~", "d.*"),
            ],
        ),
        (0, 10, []),
    ]
    assert decode_read_request(encode_read_request(qs)) == [
        (1_000, 5_000, qs[0][2]),
        (0, 10, []),
    ]


def test_response_roundtrip_specials():
    results = [
        [
            (
                {"__name__": "m", "job": "a"},
                [(1, 1.5), (2, float("inf")), (3, -0.0)],
            ),
            ({"__name__": "m"}, []),
        ],
        [],
    ]
    out = decode_read_response(encode_read_response(results))
    assert out[0][0][0] == {"__name__": "m", "job": "a"}
    assert out[0][0][1] == [(1, 1.5), (2, float("inf")), (3, -0.0)]
    assert out[0][1] == ({"__name__": "m"}, [])
    assert out[1] == []


def test_response_nan():
    out = decode_read_response(
        encode_read_response([[({"__name__": "m"}, [(7, float("nan"))])]])
    )
    (ts, v), = out[0][0][1]
    assert ts == 7 and math.isnan(v)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.integers(min_value=-(2**62), max_value=2**62),
            st.lists(
                st.tuples(
                    st.sampled_from(["=", "!=", "=~", "!~"]),
                    st.text(min_size=1, max_size=8),
                    st.text(max_size=8),
                ),
                max_size=4,
            ),
        ),
        max_size=4,
    )
)
def test_request_roundtrip_fuzz(qs):
    queries = [
        (s, e, [Matcher(n, op, v) for op, n, v in ms]) for s, e, ms in qs
    ]
    assert decode_read_request(encode_read_request(queries)) == queries


@pytest.fixture(scope="module")
def engine(spark):
    rows = [
        ("app_events", "click", "1", 1_000_000, 1.0),
        ("app_events", "click", "1", 1_060_000, 3.0),
        ("app_events", "view", "2", 1_000_000, 2.0),
        ("app_events", "view", "2", 1_120_000, 5.0),
        ("other", "x", "", 1_000_000, 9.0),
    ]
    df = spark.createDataFrame(
        rows,
        "`__name__` STRING, event_type STRING, shard STRING, "
        "ts LONG, value DOUBLE",
    )
    return PromQLEngine(df)


def test_serve_read_request(engine):
    body = frame_payload(
        encode_read_request(
            [
                (1_000_000, 1_100_000, [Matcher("__name__", "=", "app_events")]),
                (0, 1, [Matcher("__name__", "=", "nope")]),
                (0, 2_000_000, [Matcher("nolabel", "=", "x")]),
                (0, 2_000_000, [Matcher("event_type", "=~", "cli.*")]),
            ]
        )
    )
    out = decode_read_response(unframe_payload(serve_read_request(engine, body)))
    assert out[0] == [
        (
            {"__name__": "app_events", "event_type": "click", "shard": "1"},
            [(1_000_000, 1.0), (1_060_000, 3.0)],
        ),
        (
            {"__name__": "app_events", "event_type": "view", "shard": "2"},
            [(1_000_000, 2.0)],
        ),
    ]
    assert out[1] == []  # no such metric
    assert out[2] == []  # equality on an absent label: statically empty
    # regex matcher narrows to the click series; "" labels omitted
    assert out[3] == [
        (
            {"__name__": "app_events", "event_type": "click", "shard": "1"},
            [(1_000_000, 1.0), (1_060_000, 3.0)],
        )
    ]


def test_http_read_endpoint(engine):
    from tsdb_parquet_spark.api import PromApiServer

    body = frame_payload(
        encode_read_request(
            [(0, 2_000_000, [Matcher("__name__", "=", "other")])]
        )
    )
    with PromApiServer(engine) as url:
        req = urllib.request.Request(
            f"{url}/api/v1/read",
            data=body,
            headers={
                "Content-Type": "application/x-protobuf",
                "Content-Encoding": "snappy",
            },
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.headers["Content-Type"] == "application/x-protobuf"
            assert resp.headers["Content-Encoding"] == "snappy"
            out = decode_read_response(unframe_payload(resp.read()))
    assert out == [
        [({"__name__": "other", "event_type": "x"}, [(1_000_000, 9.0)])]
    ]


def test_absent_label_matcher_semantics(engine):
    """A matcher naming a label the store never materialized resolves
    statically via absent-label == "": keep-none unless it matches ""
    (then it is a no-op).  `{nolabel!=""}` — "series that have the
    label" — must match NOTHING here, not everything."""
    cases = [
        (Matcher("nolabel", "=", ""), 5),
        (Matcher("nolabel", "=", "x"), 0),
        (Matcher("nolabel", "!=", ""), 0),
        (Matcher("nolabel", "!=", "x"), 5),
        (Matcher("nolabel", "=~", ".*"), 5),
        (Matcher("nolabel", "=~", ".+"), 0),
        (Matcher("nolabel", "!~", ".*"), 0),
        (Matcher("nolabel", "!~", ".+"), 5),
    ]
    body = frame_payload(
        encode_read_request([(0, 2_000_000, [m]) for m, _ in cases])
    )
    out = decode_read_response(
        unframe_payload(serve_read_request(engine, body))
    )
    for (m, want_samples), series in zip(cases, out):
        got = sum(len(samples) for _, samples in series)
        assert got == want_samples, (m, got)
