"""Prometheus remote-READ protocol: serve the store TO a Prometheus.

The pull twin of `remote_write.py` and the integration point that lets
a REAL Prometheus query this engine directly (``remote_read:`` in
prometheus.yml): ``POST /api/v1/read`` carries a snappy-compressed
``prompb.ReadRequest`` (time range + label matchers per query) and the
response is a snappy-compressed ``prompb.ReadResponse`` of labeled
sample streams.  Everything here is hand-rolled from the PUBLIC
protobuf spec (``prompb/remote.proto`` / ``prompb/types.proto``) on the
same wire primitives `remote_write.py` already uses — field layout:

* ``ReadRequest { repeated Query queries = 1;
  repeated ResponseType accepted_response_types = 2 }``
* ``Query { int64 start_timestamp_ms = 1; int64 end_timestamp_ms = 2;
  repeated LabelMatcher matchers = 3 }``
* ``LabelMatcher { Type(EQ=0, NEQ=1, RE=2, NRE=3) type = 1;
  string name = 2; string value = 3 }``
* ``ReadResponse { repeated QueryResult results = 1 }``;
  ``QueryResult { repeated TimeSeries timeseries = 1 }`` — TimeSeries
  is the SAME message remote-write v1 uses, so its encoder/decoder is
  shared outright.

Only the ``SAMPLES`` response type is implemented (the default every
client accepts); ``STREAMED_XOR_CHUNKS`` negotiation falls back to
SAMPLES, which the protocol permits.  The response materializes
matched samples driver-side — that is the remote-read CONTRACT (the
serving Prometheus does the same into one response body), so callers
bound it the way Prometheus does: matchers + a closed time range.  The
DISTRIBUTED path for bulk data stays `remote_write` / block export;
remote read exists so a live Prometheus can federate queries into the
store without converting anything.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import functions as F

from tsdb_parquet_spark.operators.selection import EQ, NEQ, NRE, RE, Matcher
from tsdb_parquet_spark.remote_write import (
    _as_i64,
    _decode_v1_timeseries,
    _encode_v1,
    _fields,
    _put_i64,
    _put_key,
    _put_len_delim,
    frame_payload,
    unframe_payload,
)

__all__ = [
    "encode_read_request",
    "decode_read_request",
    "encode_read_response",
    "decode_read_response",
    "serve_read_request",
]

#: prompb.LabelMatcher.Type <-> the engine's matcher op strings
_TYPE_TO_OP = {0: EQ, 1: NEQ, 2: RE, 3: NRE}
_OP_TO_TYPE = {op: t for t, op in _TYPE_TO_OP.items()}


def encode_read_request(
    queries: Sequence[tuple[int, int, Sequence[Matcher]]],
) -> bytes:
    """``[(start_ms, end_ms, matchers), ...]`` as an UNCOMPRESSED
    ``prompb.ReadRequest`` (wrap with `remote_write.frame_payload` for
    the wire)."""
    req = bytearray()
    for start_ms, end_ms, matchers in queries:
        q = bytearray()
        _put_key(q, 1, 0)
        _put_i64(q, int(start_ms))
        _put_key(q, 2, 0)
        _put_i64(q, int(end_ms))
        for m in matchers:
            lm = bytearray()
            mtype = _OP_TO_TYPE[m.op]
            if mtype:  # EQ=0 is the proto default, omitted on the wire
                _put_key(lm, 1, 0)
                _put_i64(lm, mtype)
            _put_len_delim(lm, 2, m.name.encode("utf-8"))
            _put_len_delim(lm, 3, m.value.encode("utf-8"))
            _put_len_delim(q, 3, bytes(lm))
        _put_len_delim(req, 1, bytes(q))
    # accepted_response_types: SAMPLES(0) only — also the proto default,
    # so an empty list means the same thing; emit nothing
    return bytes(req)


def _decode_matcher(data: bytes, pos: int, end: int) -> Matcher:
    mtype, name, value = 0, "", ""
    for field, wire, a, b in _fields(data, pos, end):
        if field == 1 and wire == 0:
            mtype = a
        elif field == 2 and wire == 2:
            name = data[a:b].decode("utf-8")
        elif field == 3 and wire == 2:
            value = data[a:b].decode("utf-8")
    try:
        op = _TYPE_TO_OP[mtype]
    except KeyError:
        raise ValueError(f"unknown LabelMatcher.Type {mtype}") from None
    return Matcher(name, op, value)


def _decode_query(data: bytes, pos: int, end: int):
    start_ms = end_ms = 0
    matchers: list[Matcher] = []
    for field, wire, a, b in _fields(data, pos, end):
        if field == 1 and wire == 0:
            start_ms = _as_i64(a)  # int64 varints ride two's complement
        elif field == 2 and wire == 0:
            end_ms = _as_i64(a)
        elif field == 3 and wire == 2:
            matchers.append(_decode_matcher(data, a, b))
        # hints (4) are advisory; skipped structurally
    return start_ms, end_ms, matchers


def decode_read_request(
    proto: bytes,
) -> list[tuple[int, int, list[Matcher]]]:
    queries = []
    for field, wire, a, b in _fields(proto, 0, len(proto)):
        if field == 1 and wire == 2:
            queries.append(_decode_query(proto, a, b))
        # accepted_response_types (2): we always answer SAMPLES, which
        # every client must accept per the spec
    return queries


def encode_read_response(
    results: Sequence[Sequence[tuple[dict, Sequence[tuple[int, float]]]]],
) -> bytes:
    """One ``QueryResult`` per input query: ``[[(labels, [(ts_ms, v),
    ...]), ...], ...]`` — TimeSeries bytes come from remote-write's v1
    encoder (same message)."""
    resp = bytearray()
    for series in results:
        _put_len_delim(resp, 1, _encode_v1(series))
    return bytes(resp)


def decode_read_response(
    proto: bytes,
) -> list[list[tuple[dict, list[tuple[int, float]]]]]:
    results = []
    for field, wire, a, b in _fields(proto, 0, len(proto)):
        if field == 1 and wire == 2:
            series = []
            for f2, w2, a2, b2 in _fields(proto, a, b):
                if f2 == 1 and w2 == 2:
                    series.append(_decode_v1_timeseries(proto, a2, b2))
            results.append(series)
    return results


def serve_read_request(engine, body: bytes) -> bytes:
    """Snappy-framed ReadRequest body -> snappy-framed ReadResponse.

    Per query: matchers compile onto the engine's samples frame (full
    predicate + ts-range pushdown — a matcher naming a label the store
    does not carry resolves statically via the ""-is-absent convention:
    keep-none unless it matches "", in which case it is a no-op),
    samples group per series via ``collect_list`` (one
    shuffle), and series sort by label set like Prometheus's response
    writer.  Matched-sample materialization is the protocol's own
    contract — see the module docstring."""
    queries = decode_read_request(unframe_payload(body))
    cols = list(engine.label_columns)
    results = []
    for start_ms, end_ms, matchers in queries:
        df = engine.samples
        dead = False
        for m in matchers:
            if m.name in df.columns:
                df = df.filter(m.to_column())
            elif not m.matches_empty():
                # absent label == "" on every series: keep-none unless
                # the matcher matches "" (then it is a no-op)
                dead = True
                break
        if dead:
            results.append([])
            continue
        df = df.filter(
            (F.col("ts") >= F.lit(int(start_ms)))
            & (F.col("ts") <= F.lit(int(end_ms)))
        )
        grouped = df.groupBy(*cols).agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "value"))
            ).alias("samples")
        )
        series = []
        for row in grouped.collect():
            d = row.asDict()
            labels = {c: d[c] for c in cols if d[c] not in ("", None)}
            series.append(
                (labels, [(s["ts"], s["value"]) for s in d["samples"]])
            )
        series.sort(key=lambda s: sorted(s[0].items()))
        results.append(series)
    return frame_payload(encode_read_response(results))
