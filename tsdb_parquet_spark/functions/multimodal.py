"""Multimodal (binary) column handling for training-data pipelines.

Media assets are opaque ``binary`` columns plus a typed metadata struct —
the layout that keeps Spark's scan/shuffle machinery effective at 100 TB
(no decode in the scan path; blobs prune away under column projection,
exactly like the reference's `__chunk_bytes` payload column,
`schema/chunk.go:35-36`).

Two decode paths through the same Arrow ``mapInPandas`` plumbing:

- **Real container decode** (``decode_stub=False``): parses actual BMP
  (BITMAPFILEHEADER + BITMAPINFOHEADER) and WAV (RIFF/fmt ) headers with
  pure ``struct`` — no Pillow/ffmpeg.  :func:`synthesize_media` builds
  genuinely valid files of both kinds from a text column, so the
  encode → binary → header-decode round-trip is exercised end to end.
  Pixel/sample DECODING of compressed formats (JPEG/PNG/MP3/H.264) still
  needs codec libraries absent from this environment and raises
  ``NotImplementedError`` on unknown magic.
- **Deterministic stub** (``decode_stub=True``): pseudo-metadata from the
  blob's leading bytes, for plumbing tests on arbitrary binary columns.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("format", T.StringType(), False),
        # audio-only fields; 0 for images (and in the stub path)
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
    ]
)


def attach_fake_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Derive a deterministic binary 'media asset' per row (md5 of the text,
    as bytes) — the stand-in for a real image/audio payload column."""
    return df.select(
        F.col(id_col), F.unhex(F.md5(F.col(text_col))).alias("media")
    )


def _encode_bmp(d: bytes) -> bytes:
    """A valid 24-bit uncompressed BMP whose dimensions derive from the
    first digest bytes; pixel rows are digest bytes with standard 4-byte
    row padding."""
    w, h = d[0] % 64 + 1, d[1] % 64 + 1
    row_bytes = (w * 3 + 3) // 4 * 4
    pixels = (d * (row_bytes * h // len(d) + 1))[: row_bytes * h]
    file_header = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_header + dib + pixels


def _encode_wav(d: bytes) -> bytes:
    """A valid PCM WAV (RIFF/WAVE + fmt + data) with rate/channels/length
    derived from the digest; 16-bit samples are digest bytes."""
    channels = d[0] % 2 + 1
    rate = 8000 + (d[1] % 8) * 1000
    n_samples = d[2] % 64 + 1
    data = (d * (n_samples * channels * 2 // len(d) + 1))[
        : n_samples * channels * 2
    ]
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH",
            16,
            1,
            channels,
            rate,
            rate * channels * 2,
            channels * 2,
            16,
        )
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def synthesize_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic REAL media blobs: each row becomes a byte-valid BMP
    or WAV file (alternating on a digest byte) whose every parameter is a
    pure function of ``md5(text_col)`` — so a SQL oracle can predict the
    decoded metadata analytically while Spark takes the honest
    encode → bytes → header-parse path through :func:`extract_media_metadata`.

    Arrow ``mapInPandas`` (never row-pickling); at 100 TB this is the
    ingest-side shape too — blobs built/ingested per Arrow batch, metadata
    derived once, then carried as a struct column the optimizer can prune.
    """
    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [id_field, T.StructField("media", T.BinaryType(), False)]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [
                hashlib.md5(t.encode("utf-8")).digest() for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media": [
                        _encode_bmp(d) if d[2] % 2 == 0 else _encode_wav(d)
                        for d in digests
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(encode, schema=out_schema)


def _decode_one(blob: bytes, stub: bool) -> dict:
    if stub:
        # deterministic fake: dimensions from the first two bytes, format
        # from the third — reproducible from md5 hex by the SQL oracle
        return {
            "n_bytes": len(blob),
            "width": blob[0] % 64 + 1,
            "height": blob[1] % 64 + 1,
            "format": ["png", "jpeg", "webp"][blob[2] % 3],
            "sample_rate": 0,
            "channels": 0,
        }
    if blob[:2] == b"BM" and len(blob) >= 54:
        # BITMAPINFOHEADER: width at offset 18 (LE i32), height at 22
        # (negative height = top-down row order)
        w, h = struct.unpack_from("<ii", blob, 18)
        return {
            "n_bytes": len(blob),
            "width": w,
            "height": abs(h),
            "format": "bmp",
            "sample_rate": 0,
            "channels": 0,
        }
    if blob[:4] == b"RIFF" and blob[8:16] == b"WAVEfmt " and len(blob) >= 44:
        # canonical fmt chunk: channels at 22 (LE u16), rate at 24 (LE u32)
        channels, rate = struct.unpack_from("<HI", blob, 22)
        return {
            "n_bytes": len(blob),
            "width": 0,
            "height": 0,
            "format": "wav",
            "sample_rate": rate,
            "channels": channels,
        }
    # compressed containers (JPEG/PNG/MP3/H.264...) need real codec
    # libraries that are not in this environment
    raise NotImplementedError(
        "unrecognized media container: only BMP and WAV headers decode "
        "without codec libraries; run with decode_stub=True for opaque blobs"
    )


def extract_media_metadata(
    df: DataFrame,
    media_col: str = "media",
    decode_stub: bool = True,
) -> DataFrame:
    """mapInPandas decode: batches arrive via Arrow, blobs never pass
    through Python row-by-row pickling.  Output adds a ``meta`` struct.
    ``decode_stub=False`` performs REAL header parsing (BMP/WAV)."""
    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField("meta", MEDIA_META_SCHEMA, False)]
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["meta"] = [
                _decode_one(bytes(b), decode_stub) for b in pdf[media_col]
            ]
            yield pdf

    return df.mapInPandas(decode_batches, schema=out_schema)


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    every_nth_byte: int = 4,
) -> DataFrame:
    """'Frame sampling' plumbing demo: emit one row per sampled offset of
    each blob (what a video pipeline does per keyframe).  The sampling is
    real Spark fan-out (posexplode); the 'frame' is a byte slice stub."""
    n = F.length(F.col(media_col))
    offsets = F.sequence(F.lit(0), n - 1, F.lit(every_nth_byte))
    exploded = df.select(
        "*", F.posexplode(offsets).alias("frame_idx", "byte_offset")
    )
    return exploded.withColumn(
        "frame", F.expr(f"substring({media_col}, byte_offset + 1, 1)")
    )


# ---------------------------------------------------------------------------
# Real pixel/sample kernels (pure numpy/struct — BMP and PCM WAV are simple
# enough that "decode" does not need Pillow/ffmpeg)
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_crossings", T.IntegerType(), False),
    ]
)


def _decode_bmp_pixels(blob: bytes) -> "np.ndarray":
    """24-bit uncompressed BMP -> (h, w, 3) uint8 BGR, rows top-to-bottom
    (handles the standard bottom-up row order and 4-byte row padding)."""
    off = struct.unpack_from("<I", blob, 10)[0]
    w, h = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    if bpp != 24:
        raise NotImplementedError(f"only 24-bit BMP decodes here, got {bpp}")
    top_down, h = h < 0, abs(h)
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        blob, np.uint8, count=row_bytes * h, offset=off
    ).reshape(h, row_bytes)
    px = rows[:, : w * 3].reshape(h, w, 3)
    return px if top_down else px[::-1]


def _encode_bmp_pixels(px: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 BGR -> a valid bottom-up 24-bit BMP."""
    h, w = px.shape[:2]
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, row_bytes), np.uint8)
    rows[:, : w * 3] = px.reshape(h, w * 3)
    pixels = rows[::-1].tobytes()
    file_header = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_header + dib + pixels


def _resize_nn(px: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Nearest-neighbor: source index floor(i * src / dst) per axis."""
    h, w = px.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return px[ri][:, ci]


def _decode_wav_samples(blob: bytes) -> tuple["np.ndarray", int]:
    """Canonical PCM WAV -> ((n, channels) int16 array, sample_rate)."""
    channels, rate = struct.unpack_from("<HI", blob, 22)
    bits = struct.unpack_from("<H", blob, 34)[0]
    if bits != 16:
        raise NotImplementedError(f"only 16-bit PCM decodes here, got {bits}")
    n_bytes = struct.unpack_from("<I", blob, 40)[0]
    samples = np.frombuffer(blob, "<i2", count=n_bytes // 2, offset=44)
    return samples.reshape(-1, channels), rate


def resize_media(
    df: DataFrame,
    media_col: str = "media",
    out_w: int = 8,
    out_h: int = 8,
) -> DataFrame:
    """REAL image resize, no Pillow: decode 24-bit BMP pixel rows with
    numpy, nearest-neighbor to (out_w, out_h), re-encode a valid BMP.
    Non-BMP blobs pass through as NULL.  Arrow ``mapInPandas`` — the
    100 TB shape for any per-asset transform: blobs stream through
    executors batch-wise, nothing ever collects."""
    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField("resized", T.BinaryType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["resized"] = [
                _encode_bmp_pixels(
                    _resize_nn(_decode_bmp_pixels(bytes(b)), out_w, out_h)
                )
                if bytes(b)[:2] == b"BM"
                else None
                for b in pdf[media_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def audio_features(
    df: DataFrame, media_col: str = "media"
) -> DataFrame:
    """REAL audio feature extraction, no ffmpeg: PCM WAV samples decoded
    with numpy; emits per-channel sample count, duration, RMS, and
    channel-0 zero-crossing count as an ``audio`` struct (NULL for
    non-WAV blobs)."""
    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField("audio", AUDIO_FEATURES_SCHEMA, True)]
    )

    def feats(blob: bytes) -> dict | None:
        if not (blob[:4] == b"RIFF" and blob[8:16] == b"WAVEfmt "):
            return None
        samples, rate = _decode_wav_samples(blob)
        n, channels = samples.shape
        x = samples.astype(np.float64)
        ch0 = np.sign(x[:, 0])
        return {
            "n_samples": int(n),
            "sample_rate": int(rate),
            "channels": int(channels),
            "duration_ms": int(n * 1000 // rate),
            "rms": float(np.sqrt(np.mean(x * x))) if n else 0.0,
            "zero_crossings": int(np.count_nonzero(np.diff(ch0))),
        }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["audio"] = [feats(bytes(b)) for b in pdf[media_col]]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("out_bytes", T.LongType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("duration_ms", T.LongType(), False),
    ]
)


def media_features(
    df: DataFrame,
    media_col: str = "media",
    out_w: int = 8,
    out_h: int = 8,
) -> DataFrame:
    """One-pass decode + transform: each blob is parsed ONCE per batch —
    BMPs are pixel-decoded, nearest-neighbor resized, and re-encoded
    (``out_bytes`` is the real re-encoded size); WAVs get sample-level
    features.  The fused pass is the scale-correct shape: one Arrow
    round-trip instead of one per feature family."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != media_col]
        + list(MEDIA_FEATURES_SCHEMA.fields)
    )

    def one(blob: bytes) -> dict:
        if blob[:2] == b"BM":
            resized = _encode_bmp_pixels(
                _resize_nn(_decode_bmp_pixels(blob), out_w, out_h)
            )
            return {
                "format": "bmp",
                "out_w": out_w,
                "out_h": out_h,
                "out_bytes": len(resized),
                "n_samples": 0,
                "sample_rate": 0,
                "channels": 0,
                "duration_ms": 0,
            }
        if blob[:4] == b"RIFF" and blob[8:16] == b"WAVEfmt ":
            samples, rate = _decode_wav_samples(blob)
            n, channels = samples.shape
            return {
                "format": "wav",
                "out_w": 0,
                "out_h": 0,
                "out_bytes": 0,
                "n_samples": int(n),
                "sample_rate": int(rate),
                "channels": int(channels),
                "duration_ms": int(n * 1000 // rate),
            }
        raise NotImplementedError("unrecognized media container")

    carried = [f.name for f in df.schema.fields if f.name != media_col]

    feature_cols = [f.name for f in MEDIA_FEATURES_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(bytes(b)) for b in pdf[media_col]]
            # explicit column list: a zero-row batch must still yield a
            # frame with every schema column or Arrow conversion fails
            out = pd.DataFrame(rows, columns=feature_cols)
            for name in reversed(carried):
                out.insert(0, name, pdf[name].values)
            yield out

    return df.mapInPandas(run, schema=out_schema)
