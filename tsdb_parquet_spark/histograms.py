"""Prometheus native (sparse exponential) histograms.

The reference's chunk data model has no histogram representation
(`schema/chunk.go:25-37` — float samples only), and until this module
the engine documented native histograms as excluded.  The Spark-first
answer is a REDUCTION, not a new chunk type: a native histogram is
decoded from its wire forms (WAL record types 7/8, remote-write v1/v2
``Histogram`` messages) and EXPANDED to the classic-histogram series
the whole engine already serves —

    <name>_bucket{le="<upper>"}  (cumulative counts, le-ascending)
    <name>_count                 (observation count)
    <name>_sum                   (observation sum)

so storage layout, predicate pushdown, PromQL ``histogram_quantile`` /
``histogram_count`` / ``histogram_sum`` (via the classic idioms), and
every maintenance path work unchanged.  What the reduction trades
away: (a) the native chunks' compression — acceptable for a store
whose unit of compression is parquet, not chunkenc; (b) quantile
precision in a series' LOWEST occupied bucket, where classic
``histogram_quantile`` interpolates from 0 (Prometheus's own classic
rule) instead of the native bucket's true lower bound — everywhere
else the bucket boundaries are identical, so quantiles agree.

Bucket schema math (Prometheus data model, standard exponential
schemas -4..8): ``base = 2 ** 2**-schema``; positive bucket index
``i`` covers ``(base**(i-1), base**i]`` so its classic upper bound is
``le = base**i = 2**(i * 2**-schema)``.  Negative bucket index ``i``
covers ``[-base**i, -base**(i-1))`` — upper bound ``-base**(i-1)``.
The zero bucket covers ``[-zero_threshold, zero_threshold]`` with
``le = zero_threshold``.  Spans are (offset, length) runs of occupied
bucket indexes; integer histograms store bucket values as deltas
(cumulative inside each sign), float histograms store absolutes.

WAL record layout (prometheus/tsdb/record/record.go,
``Encoder.HistogramSamples`` / ``Encoder.FloatHistogramSamples``):
type byte, base ``(ref BE64, ts BE64)`` from the first entry, then per
entry ``varint ref delta, varint ts delta`` followed by the histogram:
counter-reset-hint byte, ``varint schema``, ``float64 zero_threshold``,
zero-count / count (uvarint for integer histograms, float64 bits for
float ones), ``float64 sum``, positive spans (uvarint count; varint
offset + uvarint length each), negative spans, positive buckets
(uvarint count; varint delta each for integer, float64 each for
float), negative buckets.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field
from typing import Sequence

from tsdb_parquet_spark.tsdb_wal import (
    FLOAT_HISTOGRAM_SAMPLES,
    HISTOGRAM_SAMPLES,
    _put_uvarint,
    _put_varint,
    _read_uvarint,
    _read_varint,
)

__all__ = [
    "NativeHistogram",
    "bucket_upper_bound",
    "expand_to_classic",
    "encode_histogram_samples_record",
    "decode_histogram_samples_record",
    "format_le",
]


@dataclass(frozen=True)
class NativeHistogram:
    """One sparse exponential histogram observation set.  Bucket values
    are ABSOLUTE floats here (integer histograms' on-disk deltas are
    resolved at decode); ``spans`` are (offset, length) pairs."""

    schema: int
    count: float
    sum: float
    zero_threshold: float = 0.0
    zero_count: float = 0.0
    positive_spans: tuple = field(default=())
    positive_buckets: tuple = field(default=())
    negative_spans: tuple = field(default=())
    negative_buckets: tuple = field(default=())
    counter_reset_hint: int = 0

    def bucket_indexes(self, sign: int) -> list[int]:
        """Absolute bucket indexes for the positive (+1) or negative
        (-1) side, expanded from the span runs."""
        spans = self.positive_spans if sign > 0 else self.negative_spans
        idx = 0
        out: list[int] = []
        for off, length in spans:
            idx += off
            for _ in range(length):
                out.append(idx)
                idx += 1
        return out


def bucket_upper_bound(schema: int, index: int, sign: int = 1) -> float:
    """Classic ``le`` upper bound of native bucket ``index``: positive
    bucket i covers ``(base**(i-1), base**i]`` -> ``2**(i * 2**-schema)``;
    negative bucket i covers ``[-base**i, -base**(i-1))`` ->
    ``-2**((i-1) * 2**-schema)``."""
    if not -4 <= schema <= 8:
        raise ValueError(f"unsupported histogram schema {schema}")
    # a wire-legal but extreme index (e.g. index >= 1024*2**schema at
    # schema 0) overflows float pow; that mass belongs to the classic
    # +Inf (/-Inf) bucket, not a task failure
    try:
        if sign > 0:
            return 2.0 ** (index * 2.0 ** -schema)
        return -(2.0 ** ((index - 1) * 2.0 ** -schema))
    except OverflowError:
        return math.inf if sign > 0 else -math.inf


def format_le(v: float) -> str:
    """The ``le`` label string, Go ``strconv.FormatFloat(v, 'g', -1,
    64)``-compatible: shortest round-trip digits, ``%e`` form only when
    the decimal exponent is ``< -4`` or ``>= 6`` — so integral bounds
    render ``"1"``/``"2"`` (never ``"1.0"``) and merge with the ``le``
    strings genuinely scraped classic histograms carry (client_golang
    formats bucket bounds exactly this way).  Shortest digits keep
    engine-side ``CAST(le AS DOUBLE)`` bit-exact."""
    v = float(v)
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if math.isnan(v):
        return "NaN"
    if v == 0.0:
        return "-0" if math.copysign(1.0, v) < 0 else "0"
    from decimal import Decimal

    sign, digits, dexp = Decimal(repr(v)).as_tuple()
    # normalize repr's artifacts ("100.0" -> digits (1,0,0,0)) to the
    # shortest significant digit string
    ds = "".join(map(str, digits)).rstrip("0") or "0"
    dexp += len(digits) - len(ds)
    dp = len(ds) + dexp  # value = 0.<ds> * 10**dp
    neg = "-" if sign else ""
    exp10 = dp - 1
    if exp10 < -4 or exp10 >= 6:
        mant = ds[0] + ("." + ds[1:] if len(ds) > 1 else "")
        return f"{neg}{mant}e{exp10:+03d}"
    if dp <= 0:
        return f"{neg}0.{'0' * -dp}{ds}"
    if dp >= len(ds):
        return f"{neg}{ds}{'0' * (dp - len(ds))}"
    return f"{neg}{ds[:dp]}.{ds[dp:]}"


def expand_to_classic(
    name: str,
    labels: dict,
    ts_ms: int,
    h: NativeHistogram,
) -> list[tuple[str, dict, int, float]]:
    """One native histogram observation -> classic-histogram sample
    rows ``(metric_name, labels, ts_ms, value)``: cumulative
    ``<name>_bucket{le=...}`` in le-ascending order (negative buckets,
    zero bucket, positive buckets, ``+Inf``), plus ``<name>_count`` and
    ``<name>_sum``.  The +Inf bucket always equals ``count`` — sparse
    buckets cover only occupied ranges, the remainder is mass the
    classic representation books at infinity, exactly like a scraped
    classic histogram."""
    # collect (le, increment) pairs, SORT by le, merge duplicates, then
    # cumulate — total by construction: a pathological input (e.g. a
    # positive bucket whose upper bound sits below the zero threshold,
    # which a conforming producer never emits) still yields a
    # well-formed classic series, because cumulative-by-le IS the
    # classic histogram definition regardless of source bucket kind
    incs: list[tuple[float, float]] = []
    for idx, cnt in zip(h.bucket_indexes(-1), h.negative_buckets):
        incs.append((bucket_upper_bound(h.schema, idx, sign=-1), cnt))
    if h.zero_count or h.zero_threshold:
        incs.append((float(h.zero_threshold), float(h.zero_count)))
    for idx, cnt in zip(h.bucket_indexes(+1), h.positive_buckets):
        incs.append((bucket_upper_bound(h.schema, idx, sign=+1), cnt))
    merged: dict[float, float] = {}
    for le, cnt in incs:
        merged[le] = merged.get(le, 0.0) + cnt
    rows: list[tuple[str, dict, int, float]] = []
    cum = 0.0
    for le in sorted(merged):
        cum += merged[le]
        rows.append(
            (f"{name}_bucket", {**labels, "le": format_le(le)}, ts_ms, cum)
        )
    rows.append(
        (f"{name}_bucket", {**labels, "le": "+Inf"}, ts_ms, float(h.count))
    )
    rows.append((f"{name}_count", dict(labels), ts_ms, float(h.count)))
    rows.append((f"{name}_sum", dict(labels), ts_ms, float(h.sum)))
    return rows


# ---------------------------------------------------------------------------
# WAL record codec (types 7/8)
# ---------------------------------------------------------------------------


def _put_f64(out: bytearray, v: float) -> None:
    out += struct.pack(">d", v)


def _read_f64(data: bytes, pos: int) -> tuple[float, int]:
    (v,) = struct.unpack_from(">d", data, pos)
    return v, pos + 8


def _encode_one(out: bytearray, h: NativeHistogram, float_kind: bool) -> None:
    out.append(h.counter_reset_hint & 0xFF)
    _put_varint(out, h.schema)
    _put_f64(out, h.zero_threshold)
    if float_kind:
        _put_f64(out, h.zero_count)
        _put_f64(out, h.count)
    else:
        _put_uvarint(out, int(h.zero_count))
        _put_uvarint(out, int(h.count))
    _put_f64(out, h.sum)
    for spans in (h.positive_spans, h.negative_spans):
        _put_uvarint(out, len(spans))
        for off, length in spans:
            _put_varint(out, off)
            _put_uvarint(out, length)
    for buckets in (h.positive_buckets, h.negative_buckets):
        _put_uvarint(out, len(buckets))
        if float_kind:
            for b in buckets:
                _put_f64(out, b)
        else:
            prev = 0
            for b in buckets:
                _put_varint(out, int(b) - prev)  # delta coding
                prev = int(b)


def _decode_one(
    data: bytes, pos: int, float_kind: bool
) -> tuple[NativeHistogram, int]:
    hint = data[pos]
    pos += 1
    schema, pos = _read_varint(data, pos)
    zt, pos = _read_f64(data, pos)
    if float_kind:
        zc, pos = _read_f64(data, pos)
        count, pos = _read_f64(data, pos)
    else:
        zc_i, pos = _read_uvarint(data, pos)
        count_i, pos = _read_uvarint(data, pos)
        zc, count = float(zc_i), float(count_i)
    total, pos = _read_f64(data, pos)
    spans: list[tuple] = []
    for _ in range(2):
        n, pos = _read_uvarint(data, pos)
        run = []
        for _ in range(n):
            off, pos = _read_varint(data, pos)
            length, pos = _read_uvarint(data, pos)
            run.append((off, length))
        spans.append(tuple(run))
    buckets: list[tuple] = []
    for _ in range(2):
        n, pos = _read_uvarint(data, pos)
        vals = []
        if float_kind:
            for _ in range(n):
                v, pos = _read_f64(data, pos)
                vals.append(v)
        else:
            acc = 0
            for _ in range(n):
                d, pos = _read_varint(data, pos)
                acc += d
                vals.append(float(acc))
        buckets.append(tuple(vals))
    return (
        NativeHistogram(
            schema=schema,
            count=count,
            sum=total,
            zero_threshold=zt,
            zero_count=zc,
            positive_spans=spans[0],
            negative_spans=spans[1],
            positive_buckets=buckets[0],
            negative_buckets=buckets[1],
            counter_reset_hint=hint,
        ),
        pos,
    )


def encode_histogram_samples_record(
    entries: Sequence[tuple[int, int, NativeHistogram]],
    float_kind: bool = False,
) -> bytes:
    """``record.HistogramSamples`` (type 7) / ``record.
    FloatHistogramSamples`` (type 8) payload: base (ref, ts) BE64s from
    the first entry, then per entry varint deltas + the histogram body
    (see the module docstring for the field walk)."""
    if not entries:
        raise ValueError("empty histogram samples record")
    out = bytearray(
        [FLOAT_HISTOGRAM_SAMPLES if float_kind else HISTOGRAM_SAMPLES]
    )
    base_ref, base_ts, _ = entries[0]
    out += struct.pack(">Q", base_ref)
    out += struct.pack(">q", base_ts)
    for ref, ts, h in entries:
        _put_varint(out, ref - base_ref)
        _put_varint(out, ts - base_ts)
        _encode_one(out, h, float_kind)
    return bytes(out)


def decode_histogram_samples_record(
    data: bytes,
) -> list[tuple[int, int, NativeHistogram]]:
    """Decode a type-7/8 record into ``[(ref, ts_ms, NativeHistogram)]``
    (integer histograms surface with float bucket values — deltas
    resolved)."""
    if not data or data[0] not in (
        HISTOGRAM_SAMPLES,
        FLOAT_HISTOGRAM_SAMPLES,
    ):
        raise ValueError("not a histogram samples record")
    float_kind = data[0] == FLOAT_HISTOGRAM_SAMPLES
    if len(data) == 1:
        return []
    pos = 1
    (base_ref,) = struct.unpack_from(">Q", data, pos)
    pos += 8
    (base_ts,) = struct.unpack_from(">q", data, pos)
    pos += 8
    out: list[tuple[int, int, NativeHistogram]] = []
    end = len(data)
    while pos < end:
        dref, pos = _read_varint(data, pos)
        dts, pos = _read_varint(data, pos)
        h, pos = _decode_one(data, pos, float_kind)
        out.append((base_ref + dref, base_ts + dts, h))
    return out
