"""Property-based tests for the chunk codec (hypothesis) — the moral
equivalent of the reference's writer round-trip test
(`db/writer_test.go:21-63`) but randomized."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tsdb_parquet_spark.chunks import decode_samples, encode_samples

ts_strategy = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=500
)
val_strategy = st.floats(
    allow_nan=False, allow_infinity=True, width=64
)


@settings(max_examples=200, deadline=None)
@given(ts=ts_strategy, data=st.data())
def test_codec_roundtrip(ts, data):
    vals = [
        data.draw(val_strategy) for _ in ts
    ]
    ts_arr = np.array(ts, dtype=np.int64)
    val_arr = np.array(vals, dtype=np.float64)
    blob = encode_samples(ts_arr, val_arr)
    t2, v2 = decode_samples(blob)
    assert list(t2) == list(ts_arr)
    assert all(
        (a == b) or (np.isnan(a) and np.isnan(b)) for a, b in zip(v2, val_arr)
    )


@settings(max_examples=50, deadline=None)
@given(ts=ts_strategy)
def test_codec_length_contract(ts):
    ts_arr = np.array(ts, dtype=np.int64)
    vals = np.zeros(len(ts))
    blob = encode_samples(ts_arr, vals)
    assert len(blob) == 4 + 16 * len(ts)


def test_nan_payload_preserved():
    blob = encode_samples(np.array([1], dtype=np.int64), np.array([float("nan")]))
    _, v = decode_samples(blob)
    assert np.isnan(v[0])
