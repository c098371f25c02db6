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


# ---------------------------------------------------------------------------
# PNG codec properties (functions/multimodal.py) — same moral as above:
# the pure-stdlib codec must be lossless over its whole declared domain
# (8-bit, 1/2/3/4 channels, any dims), under every encoder filter cycle.
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_pixel_roundtrip_property(w, h, c, seed):
    import numpy as np

    from tsdb_parquet_spark.functions import multimodal as MM

    px = np.random.RandomState(seed).randint(0, 256, (h, w, c), np.uint8)
    blob = MM._encode_png_pixels(px)
    back = MM._decode_png_pixels(blob)
    assert back.shape == (h, w, c)
    assert (back == px).all()
    gw, gh, depth, _ctype, interlace = MM._png_ihdr(blob)
    assert (gw, gh, depth, interlace) == (w, h, 8, 0)


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=16, max_size=16))
def test_png_digest_encode_decode_property(data):
    """_encode_png (mixed None/Sub/Up filters) and the decoder agree on
    every digest: dims from bytes 0/1, pixels the repeated digest."""
    import numpy as np

    from tsdb_parquet_spark.functions import multimodal as MM

    blob = MM._encode_png(data)
    px = MM._decode_png_pixels(blob)
    w, h = data[0] % 64 + 1, data[1] % 64 + 1
    assert px.shape == (h, w, 3)
    n = 3 * w * h
    want = (data * (n // 16 + 1))[:n]
    assert px.reshape(-1).tobytes() == want
