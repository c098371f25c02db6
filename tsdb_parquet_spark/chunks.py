"""Chunk encode/decode + ingestion from a samples table (reference S4 + M3).

The reference converts a Prometheus TSDB block into one Parquet row per
chunk (`cmd/convert/main.go:23-126`): series labels, file-local
``__series__id``, ``__mint``/``__maxt``, and the raw chunk bytes.  Its chunk
payload is a Prometheus XOR chunk of ~120 samples (`db/writer_test.go:
145-150`); its sample decoder was never implemented
(`prometheus/chunks_iterator.go:8-41`).

We define our own deterministic chunk encoding (we go further than the
reference: decode is real):

    uint32 LE sample count, then count * (int64 LE ts_ms, float64 LE value)

Encoding runs as ``applyInPandas`` over (series, time-bucket) groups — one
shuffle on the chunk key, arbitrarily parallel, no driver state.  Decoding
is a vectorized pandas UDF returning ``array<struct<ts,value>>`` + an
``explode`` — the Spark-native late materialization of sample data.
"""

from __future__ import annotations

import struct
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tsdb_parquet_spark.schema import CHUNK_BYTES, MAX_T, MIN_T, SERIES_ID

#: default chunk span: one day of samples per chunk (the reference targets
#: ~120 samples/chunk; span is the knob at ingest time)
DEFAULT_CHUNK_SPAN_MS = 24 * 3600 * 1000

SAMPLE_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("ts", T.LongType(), False),
            T.StructField("value", T.DoubleType(), False),
        ]
    )
)


def encode_samples(ts_ms: np.ndarray, values: np.ndarray) -> bytes:
    """Pack sorted samples into the chunk byte format."""
    n = len(ts_ms)
    out = bytearray(struct.pack("<I", n))
    buf = np.empty(2 * n, dtype=np.int64)
    buf[0::2] = ts_ms.astype(np.int64)
    buf[1::2] = values.astype(np.float64).view(np.int64)
    out += buf.tobytes()
    return bytes(out)


def decode_samples(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    (n,) = struct.unpack_from("<I", blob, 0)
    buf = np.frombuffer(blob, dtype=np.int64, offset=4, count=2 * n)
    return buf[0::2].copy(), buf[1::2].copy().view(np.float64)


@F.pandas_udf(SAMPLE_STRUCT)
def decode_chunk_udf(blobs: pd.Series) -> pd.Series:
    """Vectorized chunk decode (Arrow-batched; the reference's equivalent
    sample iterator is a stub — `prometheus/chunks_iterator.go:12-24`)."""
    out = []
    for blob in blobs:
        ts, vals = decode_samples(blob)
        out.append([{"ts": int(t), "value": float(v)} for t, v in zip(ts, vals)])
    return pd.Series(out)


@F.pandas_udf(T.BinaryType())
def encode_chunk_udf(samples: pd.Series) -> pd.Series:
    """Vectorized chunk encode: each input cell is a ts-sorted
    array<struct<ts,value>>; one Arrow batch covers thousands of chunks
    (NOT one Python call per chunk group — that is ~10x slower)."""
    out = []
    for chunk in samples:
        ts = np.fromiter((s["ts"] for s in chunk), dtype=np.int64,
                         count=len(chunk))
        vals = np.fromiter((s["value"] for s in chunk), dtype=np.float64,
                           count=len(chunk))
        out.append(encode_samples(ts, vals))
    return pd.Series(out)


def samples_to_chunks(
    samples: DataFrame,
    label_columns: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    chunk_span_ms: int = DEFAULT_CHUNK_SPAN_MS,
    assign_series_ids: bool = True,
) -> DataFrame:
    """Convert a samples DataFrame (int64 ms ``ts_col``, double
    ``value_col``, string label columns) into the chunk table.

    Mirrors the converter (`cmd/convert/main.go:79-117`): chunks carry the
    exact [min ts, max ts] of their samples; ``__series__id`` is dense
    0..N-1 in sorted-label order (`cmd/convert/main.go:84-91`,
    `schema/chunk.go:28-30` — file-local identity).

    Scale: ONE shuffle — the groupBy on (series, bucket) — with the sample
    collection, sort, and min/max all JVM-side (hash aggregate +
    array_sort); Python only packs bytes, vectorized over whole Arrow
    batches.  The dense_rank for series ids runs over the distinct-series
    reduction, so its window input is |series|, not |chunks|.
    """
    labels = list(label_columns)
    bucket = F.expr(f"{ts_col} div {int(chunk_span_ms)}").alias("__bucket")
    grouped = samples.select(
        *labels, F.col(ts_col).alias("ts"), F.col(value_col).alias("value"), bucket
    )

    agg = grouped.groupBy(*labels, "__bucket").agg(
        F.min("ts").alias(MIN_T),
        F.max("ts").alias(MAX_T),
        # array_sort on struct orders by ts (first field) — the chunk's
        # sample order contract
        F.array_sort(F.collect_list(F.struct("ts", "value"))).alias("__samples"),
    )
    chunks = agg.withColumn(CHUNK_BYTES, encode_chunk_udf(F.col("__samples"))).drop(
        "__samples"
    )

    if not assign_series_ids:
        # streaming parts defer id assignment to compaction —
        # `__series__id` is file-local identity (`schema/chunk.go:28-30`)
        return chunks.select(MIN_T, MAX_T, CHUNK_BYTES, *sorted(labels))

    series_ids = dense_series_ids(chunks.select(*labels).distinct(), labels)
    return chunks.join(F.broadcast(series_ids), on=labels, how="inner").select(
        SERIES_ID, MIN_T, MAX_T, CHUNK_BYTES, *sorted(labels)
    )


def dense_series_ids(series: DataFrame, label_columns: Sequence[str]) -> DataFrame:
    """Assign dense ids 0..N-1 to distinct series in sorted-label order
    (`cmd/convert/main.go:84-91` assigns monotonically over sorted
    postings).

    NOT a global Window (``Window.orderBy`` with no partition key pulls
    every row into one task — a hard wall at 100M+ series).  Instead:
    distributed range-sort, count rows per partition (one light job), then
    add per-partition offsets — every stage is parallel and the result is
    identical to the global dense rank because range partitions are
    ordered and series are distinct.
    """
    labels_sorted = [c for c in sorted(label_columns)]
    n_parts = int(
        series.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ordered = series.repartitionByRange(n_parts, *labels_sorted).sortWithinPartitions(
        *labels_sorted
    )

    counts = ordered.rdd.mapPartitions(
        lambda it: iter([sum(1 for _ in it)])
    ).collect()
    offsets = [0]
    for c in counts[:-1]:
        offsets.append(offsets[-1] + c)

    field_names = ordered.columns

    def tag(part_idx: int, rows):
        base = offsets[part_idx]
        for i, row in enumerate(rows):
            yield (*[row[f] for f in field_names], base + i)

    schema = T.StructType(
        list(ordered.schema.fields)
        + [T.StructField(SERIES_ID, T.LongType(), False)]
    )
    return ordered.sparkSession.createDataFrame(
        ordered.rdd.mapPartitionsWithIndex(tag), schema
    )


def chunks_to_samples(chunks: DataFrame, label_columns: Sequence[str]) -> DataFrame:
    """Inverse of :func:`samples_to_chunks`: decode + explode back to
    (labels..., ts, value) rows."""
    labels = list(label_columns)
    decoded = chunks.select(
        *labels, F.explode(decode_chunk_udf(F.col(CHUNK_BYTES))).alias("s")
    )
    return decoded.select(*labels, F.col("s.ts").alias("ts"),
                          F.col("s.value").alias("value"))
