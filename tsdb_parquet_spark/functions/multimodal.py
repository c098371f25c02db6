"""Multimodal (binary) column handling for training-data pipelines.

Media assets are opaque ``binary`` columns plus a typed metadata struct —
the layout that keeps Spark's scan/shuffle machinery effective at 100 TB
(no decode in the scan path; blobs prune away under column projection,
exactly like the reference's `__chunk_bytes` payload column,
`schema/chunk.go:35-36`).

Two decode paths through the same Arrow ``mapInPandas`` plumbing:

- **Real container decode** (``decode_stub=False``): parses actual BMP
  (BITMAPFILEHEADER + BITMAPINFOHEADER), PNG (IHDR + zlib'd IDAT with
  full scanline-filter reconstruction) and WAV (RIFF/fmt ) containers
  with pure ``struct``/``zlib`` — no Pillow/ffmpeg.
  :func:`synthesize_media` builds genuinely valid files from a text
  column, so the encode → binary → decode round-trip is exercised end
  to end.  Pixel/sample DECODING of lossy formats (JPEG/MP3/H.264)
  still needs codec libraries absent from this environment and raises
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _encode_png(d: bytes, filter_cycle: tuple[int, ...] = (0, 1, 2)) -> bytes:
    """A valid 8-bit truecolor (RGB) PNG whose dimensions derive from the
    digest exactly like :func:`_encode_bmp` (w = d[0]%64+1, h = d[1]%64+1)
    so a SQL oracle predicts the decoded metadata analytically.  Pixel
    rows are digest bytes; scanline y takes filter ``filter_cycle[y %
    len]`` — the default cycles None/Sub/Up, so decoding this file
    genuinely exercises filter reconstruction, not just zlib.  PNG
    filter PREDICTORS read original (unfiltered) neighbor bytes, so
    encoding vectorizes fully; only decode carries the sequential
    dependency.  Pure stdlib/numpy — no Pillow."""
    import numpy as np
    import zlib

    w, h = d[0] % 64 + 1, d[1] % 64 + 1
    row = w * 3
    pixels = (d * (row * h // len(d) + 1))[: row * h]
    body = np.frombuffer(pixels, np.uint8).reshape(h, row).astype(np.int32)
    out = bytearray()
    for y in range(h):
        line = body[y]
        prev = body[y - 1] if y > 0 else np.zeros(row, np.int32)
        f = filter_cycle[y % len(filter_cycle)]
        if f == 0:
            filt = line
        elif f == 1:  # Sub: left neighbor, per channel lane
            left = np.concatenate([np.zeros(3, np.int32), line[:-3]])
            filt = (line - left) & 0xFF
        elif f == 2:  # Up
            filt = (line - prev) & 0xFF
        else:
            raise NotImplementedError(f"encoder filter {f} not wired")
        out += bytes([f]) + filt.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def _png_ihdr(blob: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, bit_depth, color_type, interlace) from the IHDR
    chunk (always first after the 8-byte signature per the spec)."""
    if blob[12:16] != b"IHDR":
        raise ValueError("PNG missing IHDR as first chunk")
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack_from(
        ">IIBBBBB", blob, 16
    )
    return w, h, depth, ctype, interlace


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
    if blob[:8] == _PNG_SIG and len(blob) >= 33:
        w, h, _depth, _ctype, _il = _png_ihdr(blob)
        return {
            "n_bytes": len(blob),
            "width": w,
            "height": h,
            "format": "png",
            "sample_rate": 0,
            "channels": 0,
        }
    # compressed containers (JPEG/MP3/H.264...) need real codec
    # libraries that are not in this environment; PNG is zlib-only and
    # decodes above with pure stdlib
    raise NotImplementedError(
        "unrecognized media container: only BMP, PNG and WAV decode "
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


def _decode_png_pixels(blob: bytes) -> "np.ndarray":
    """8-bit non-interlaced PNG -> (h, w, c) uint8 (c = 1 grayscale,
    2 gray+alpha, 3 RGB, 4 RGBA).  Pure stdlib: concatenated IDAT zlib stream + the
    five scanline filters (None/Sub/Up/Average/Paeth) reconstructed per
    the spec.  Up is vectorized; Sub/Average/Paeth carry an intra-row
    left-neighbor dependency, so those rows walk columns — fine for the
    thumbnail-scale assets this kernel sees per Arrow batch."""
    import zlib

    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    w, h, depth, ctype, interlace = _png_ihdr(blob)
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNG decodes here "
            f"(depth={depth}, interlace={interlace})"
        )
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise NotImplementedError(f"unsupported PNG color type {ctype}")
    idat = []
    off = 8
    while off + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, off)
        chunk_type = blob[off + 4 : off + 8]
        if chunk_type == b"IDAT":
            idat.append(blob[off + 8 : off + 8 + length])
        if chunk_type == b"IEND":
            break
        off += 12 + length
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    bpp = channels  # bytes per pixel at 8-bit depth
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(
            stride, np.int32
        )
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 1:  # Sub: rec[x] = line[x] + rec[x-bpp] — a running
            # sum per channel lane, so cumsum mod 256 vectorizes it
            rec = (np.cumsum(line.reshape(-1, bpp), axis=0) & 0xFF).reshape(
                -1
            )
        else:
            if ftype not in (3, 4):
                raise ValueError(f"bad PNG filter type {ftype}")
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 3:  # Average
                    pred = (a + b) >> 1
                else:  # Paeth
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c
                    )
                rec[x] = (line[x] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, channels)


def _encode_png_pixels(px: "np.ndarray") -> bytes:
    """(h, w, c) uint8 -> a valid 8-bit non-interlaced PNG (c = 1/2/3/4);
    scanlines use filter 0 — zlib does the compressing."""
    import zlib

    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if ctype is None:
        raise NotImplementedError(f"unsupported channel count {c}")
    body = px.reshape(h, w * c)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


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
    """REAL image resize, no Pillow: decode 24-bit BMP or 8-bit
    non-interlaced PNG pixel rows (pure numpy/zlib), nearest-neighbor to
    (out_w, out_h), re-encode in the SAME container.  Anything the codec
    cannot round-trip — non-image blobs, palette/16-bit/interlaced PNG —
    passes through as NULL: one exotic asset must not fail a 100 TB job.
    Arrow ``mapInPandas`` — the scale shape for any per-asset transform:
    blobs stream through executors batch-wise, nothing ever collects."""
    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField("resized", T.BinaryType(), True)]
    )

    def one(blob: bytes | None) -> bytes | None:
        if blob is None:
            return None
        try:
            if blob[:2] == b"BM":
                return _encode_bmp_pixels(
                    _resize_nn(_decode_bmp_pixels(blob), out_w, out_h)
                )
            if blob[:8] == _PNG_SIG:
                return _encode_png_pixels(
                    _resize_nn(_decode_png_pixels(blob), out_w, out_h)
                )
        except Exception:
            # anything the pure-stdlib codec cannot round-trip — a
            # sub-format it doesn't speak (palette/16-bit/interlaced PNG,
            # non-24-bit BMP -> NotImplementedError) OR a corrupt /
            # truncated blob behind a valid magic (struct.error,
            # zlib.error, ValueError, numpy buffer errors): NULL per the
            # pass-through contract, never a job kill
            return None
        return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["resized"] = [
                one(None if b is None else bytes(b))
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


PNG_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("px_sum", T.LongType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
    ]
)


def synthesize_png(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic REAL PNG blobs: each row becomes a byte-valid 8-bit
    RGB PNG whose dimensions and pixel bytes are a pure function of
    ``md5(text_col)`` (same digest convention as :func:`synthesize_media`)
    with scanline filters cycling None/Sub/Up — so decoding proves zlib
    inflate AND per-filter reconstruction, while a SQL oracle predicts
    dimensions and the raw pixel-byte sum analytically.

    The input is spread first: testdata parquet is single-row-group, and
    without widening the encode (and every downstream pixel kernel,
    which inherits this partitioning) serializes onto one core."""
    from tsdb_parquet_spark.catalog import spread

    df = spread(df)
    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [id_field, T.StructField("media", T.BinaryType(), False)]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media": [
                        _encode_png(
                            hashlib.md5(t.encode("utf-8")).digest()
                        )
                        for t in pdf[text_col]
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(encode, schema=out_schema)


def png_features(
    df: DataFrame,
    media_col: str = "media",
    out_w: int = 8,
    out_h: int = 8,
) -> DataFrame:
    """Fused PNG pipeline, one Arrow pass per blob: IHDR parse -> zlib
    inflate + filter reconstruction (``px_sum`` is the int sum of every
    reconstructed RGB byte — wrong filter math would shift it) ->
    nearest-neighbor resize -> re-encode -> re-parse the new header for
    (out_w, out_h).  The round-trip through a fresh container proves the
    encoder emits files the decoder accepts."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != media_col]
        + list(PNG_FEATURES_SCHEMA.fields)
    )
    carried = [f.name for f in df.schema.fields if f.name != media_col]
    feature_cols = [f.name for f in PNG_FEATURES_SCHEMA.fields]

    def one(blob: bytes) -> dict:
        px = _decode_png_pixels(blob)
        resized = _encode_png_pixels(_resize_nn(px, out_w, out_h))
        rw, rh, _, _, _ = _png_ihdr(resized)
        return {
            "format": "png",
            "width": int(px.shape[1]),
            "height": int(px.shape[0]),
            "px_sum": int(px.astype(np.int64).sum()),
            "out_w": int(rw),
            "out_h": int(rh),
        }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(bytes(b)) for b in pdf[media_col]]
            out = pd.DataFrame(rows, columns=feature_cols)
            for name in reversed(carried):
                out.insert(0, name, pdf[name].values)
            yield out

    return df.mapInPandas(run, schema=out_schema)
