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
