"""Multimodal (binary) column handling for training-data pipelines.

Media assets are opaque ``binary`` columns plus a typed metadata struct —
the layout that keeps Spark's scan/shuffle machinery effective at 100 TB
(no decode in the scan path; blobs prune away under column projection,
exactly like the reference's `__chunk_bytes` payload column,
`schema/chunk.go:35-36`).

Real decoding (image/audio/video) needs codec libraries that are not in
this container, so the decode kernel is STUBBED: ``decode_stub=True``
derives deterministic pseudo-metadata from the blob's leading bytes, and
``decode_stub=False`` raises ``NotImplementedError`` where Pillow/ffmpeg
would be called.  Everything around the stub — schema, Arrow batch flow,
``mapInPandas`` signature, partition sizing — is real and tested.
"""

from __future__ import annotations

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


def _decode_one(blob: bytes, stub: bool) -> dict:
    if not stub:
        # Real path: Pillow / torchaudio / PyAV decode. Not available here.
        raise NotImplementedError(
            "real media decode requires codec libraries not present in this "
            "environment; run with decode_stub=True"
        )
    # deterministic fake: dimensions from the first two bytes, format from
    # the third — reproducible from md5 hex by the SQL oracle
    return {
        "n_bytes": len(blob),
        "width": blob[0] % 64 + 1,
        "height": blob[1] % 64 + 1,
        "format": ["png", "jpeg", "webp"][blob[2] % 3],
    }


def extract_media_metadata(
    df: DataFrame,
    media_col: str = "media",
    decode_stub: bool = True,
) -> DataFrame:
    """mapInPandas decode: batches arrive via Arrow, blobs never pass
    through Python row-by-row pickling.  Output adds a ``meta`` struct."""
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
