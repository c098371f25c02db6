"""Property tests for the WAL codec: arbitrary records round-trip
through the page/fragment framing, and truncation at ANY byte yields a
clean prefix of the log — never corrupt or reordered data."""

import math
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from tsdb_parquet_spark.tsdb_wal import (
    PAGE_SIZE,
    SAMPLES,
    SERIES,
    WalWriter,
    decode_samples_record,
    decode_series_record,
    encode_samples_record,
    encode_series_record,
    iter_segment_records,
)

label_str = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FF),
    min_size=0,
    max_size=12,
)
labels_st = st.dictionaries(label_str, label_str, max_size=4)
series_st = st.lists(
    st.tuples(st.integers(0, 2**63 - 1), labels_st), min_size=1, max_size=5
)
finite_or_special = st.one_of(
    st.floats(allow_nan=False, allow_infinity=True),
    st.just(float("nan")),
)
samples_st = st.lists(
    st.tuples(
        st.integers(0, 2**62),
        st.integers(-(2**53), 2**53),
        finite_or_special,
    ),
    min_size=1,
    max_size=300,
)


def _eq_sample(a, b):
    (ra, ta, va), (rb, tb, vb) = a, b
    if (ra, ta) != (rb, tb):
        return False
    if math.isnan(va) or math.isnan(vb):
        # bit-exact: payloads must survive the record codec
        return struct.pack(">d", va) == struct.pack(">d", vb)
    return va == vb


@settings(max_examples=200, deadline=None)
@given(series=series_st)
def test_series_payload_roundtrip(series):
    assert decode_series_record(encode_series_record(series)) == series


@settings(max_examples=200, deadline=None)
@given(samples=samples_st)
def test_samples_payload_roundtrip(samples):
    got = decode_samples_record(encode_samples_record(samples))
    assert len(got) == len(samples)
    assert all(_eq_sample(a, b) for a, b in zip(got, samples))


@settings(max_examples=50, deadline=None)
@given(
    batches=st.lists(samples_st, min_size=1, max_size=8),
    series=series_st,
)
def test_segment_framing_roundtrip(tmp_path_factory, batches, series):
    """Whole-writer property: any sequence of records survives the
    page/fragment framing, in order, whatever the page boundaries."""
    d = tmp_path_factory.mktemp("walprop")
    w = WalWriter(str(d))
    w.log_series(series)
    for b in batches:
        w.log_samples(b)
    w.close()
    import os

    seg = open(os.path.join(str(d), "00000000"), "rb").read()
    assert len(seg) % PAGE_SIZE == 0
    recs = list(iter_segment_records(seg))
    assert recs[0][0] == SERIES
    assert decode_series_record(recs[0]) == series
    assert len(recs) == 1 + len(batches)
    for rec, want in zip(recs[1:], batches):
        assert rec[0] == SAMPLES
        got = decode_samples_record(rec)
        assert all(_eq_sample(a, b) for a, b in zip(got, want))


@settings(max_examples=60, deadline=None)
@given(
    batches=st.lists(samples_st, min_size=1, max_size=6),
    cut=st.floats(0.0, 1.0),
)
def test_truncation_yields_clean_prefix(tmp_path_factory, batches, cut):
    """Crash-recovery property: truncating the segment at ANY byte and
    reading with tolerate_tail=True yields an exact prefix of the
    record log — a partially-written record disappears entirely, and no
    record is ever corrupted or reordered."""
    d = tmp_path_factory.mktemp("walcut")
    w = WalWriter(str(d))
    for b in batches:
        w.log_samples(b)
    w.close()
    import os

    seg = open(os.path.join(str(d), "00000000"), "rb").read()
    full = list(iter_segment_records(seg))
    cut_at = int(len(seg) * cut)
    got = list(iter_segment_records(seg[:cut_at], tolerate_tail=True))
    assert len(got) <= len(full)
    assert got == full[: len(got)]


@settings(max_examples=200, deadline=None)
@given(blob=st.binary(max_size=4096))
def test_snappy_roundtrip_property(blob):
    from tsdb_parquet_spark.tsdb_wal import (
        snappy_compress,
        snappy_decompress,
    )

    assert snappy_decompress(snappy_compress(blob)) == blob


@settings(max_examples=30, deadline=None)
@given(batches=st.lists(samples_st, min_size=1, max_size=5))
def test_compressed_framing_roundtrip(tmp_path_factory, batches):
    """Snappy-flagged records survive fragmentation across pages."""
    d = tmp_path_factory.mktemp("walsnappy")
    w = WalWriter(str(d), compression="snappy")
    for b in batches:
        w.log_samples(b)
    w.close()
    import os

    seg = open(os.path.join(str(d), "00000000"), "rb").read()
    recs = list(iter_segment_records(seg))
    assert len(recs) == len(batches)
    for rec, want in zip(recs, batches):
        got = decode_samples_record(rec)
        assert all(_eq_sample(a, b) for a, b in zip(got, want))
