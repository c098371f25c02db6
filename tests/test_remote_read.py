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


# -- STREAMED_XOR_CHUNKS ----------------------------------------------------


def test_chunked_response_codec_roundtrip():
    from tsdb_parquet_spark.remote_read import (
        decode_chunked_read_response,
        encode_chunked_read_response,
        frame_chunked_message,
        iter_chunked_messages,
    )

    series = [
        ({"__name__": "m", "job": "a"}, [(0, 1000, b"\x01\x02"), (1001, 2000, b"\x03")]),
        ({"__name__": "m", "job": "b"}, [(5, 7, b"\xff" * 40)]),
    ]
    msg = encode_chunked_read_response(series, 3)
    assert decode_chunked_read_response(msg) == (3, series)
    # framing: two messages survive the CRC'd stream
    body = frame_chunked_message(msg) + frame_chunked_message(
        encode_chunked_read_response([], 0)
    )
    msgs = list(iter_chunked_messages(body))
    assert msgs[0] == msg
    assert decode_chunked_read_response(msgs[1]) == (0, [])
    # a flipped byte must be caught by the CRC
    corrupt = bytearray(body)
    corrupt[7] ^= 0xFF
    import pytest as _pytest

    with _pytest.raises(ValueError, match="CRC"):
        list(iter_chunked_messages(bytes(corrupt)))


def test_accepted_types_negotiation_encoding():
    from tsdb_parquet_spark.remote_read import (
        STREAMED_XOR_CHUNKS,
        read_request_accepted_types,
    )

    q = [(0, 1, [Matcher("__name__", "=", "m")])]
    assert read_request_accepted_types(encode_read_request(q)) == []
    proto = encode_read_request(q, accepted=[STREAMED_XOR_CHUNKS])
    assert read_request_accepted_types(proto) == [STREAMED_XOR_CHUNKS]
    # queries decode identically with the accepted field present
    assert decode_read_request(proto) == q


def test_streamed_serve_matches_samples_path(engine):
    """The streamed response, decoded client-side (XOR chunks ->
    samples), must equal the SAMPLES response for the same request —
    including the statically-empty and regex-matcher queries."""
    from tsdb_parquet_spark.remote_read import (
        decode_streamed_read_body,
        serve_read_request_streamed,
    )

    queries = [
        (1_000_000, 1_100_000, [Matcher("__name__", "=", "app_events")]),
        (0, 1, [Matcher("__name__", "=", "nope")]),
        (0, 2_000_000, [Matcher("nolabel", "=", "x")]),
        (0, 2_000_000, [Matcher("event_type", "=~", "cli.*")]),
    ]
    body = frame_payload(encode_read_request(queries))
    want = decode_read_response(
        unframe_payload(serve_read_request(engine, body))
    )
    stream = b"".join(serve_read_request_streamed(engine, body))
    got = decode_streamed_read_body(stream, len(queries))
    assert got == want


def test_streamed_frame_flush_bound(engine):
    """A tiny max_frame_bytes forces multiple frames; the merged result
    must still be complete and identical."""
    from tsdb_parquet_spark.remote_read import (
        decode_streamed_read_body,
        iter_chunked_messages,
        serve_read_request_streamed,
    )

    queries = [(0, 2_000_000, [Matcher("__name__", "=", "app_events")])]
    body = frame_payload(encode_read_request(queries))
    stream = b"".join(
        serve_read_request_streamed(engine, body, max_frame_bytes=1)
    )
    assert len(list(iter_chunked_messages(stream))) > 1
    want = decode_read_response(
        unframe_payload(serve_read_request(engine, body))
    )
    assert decode_streamed_read_body(stream, 1) == want


def test_http_streamed_negotiation(engine):
    from tsdb_parquet_spark.api import PromApiServer
    from tsdb_parquet_spark.remote_read import (
        CONTENT_TYPE_STREAMED,
        STREAMED_XOR_CHUNKS,
        decode_streamed_read_body,
    )

    queries = [
        (1_000_000, 1_100_000, [Matcher("__name__", "=", "app_events")])
    ]
    body = frame_payload(
        encode_read_request(queries, accepted=[STREAMED_XOR_CHUNKS])
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
            assert resp.headers["Content-Type"] == CONTENT_TYPE_STREAMED
            assert resp.headers.get("Content-Length") is None
            raw = resp.read()  # to EOF — connection close terminates
    got = decode_streamed_read_body(raw, 1)
    want = decode_read_response(
        unframe_payload(
            serve_read_request(
                engine, frame_payload(encode_read_request(queries))
            )
        )
    )
    assert got == want
