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
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import arrow_udf

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


@arrow_udf(SAMPLE_STRUCT)
def decode_chunk_udf(blobs: pa.Array) -> pa.Array:
    """Arrow-native chunk decode (the reference's equivalent sample
    iterator is a stub — `prometheus/chunks_iterator.go:12-24`).

    The hot kernel of every sample query: builds the whole batch's
    ``array<struct<ts,value>>`` column as ONE pyarrow ListArray over flat
    numpy buffers — zero per-sample Python objects (a dict-per-sample
    formulation is ~10x slower and dominated every scan at 100 TB scale).
    The only Python loop is per-chunk (copying each blob's payload into
    the flat buffer), not per-sample.

    Codec auto-detection per blob: the engine's raw layout is
    self-describing by exact length (``xorchunk.is_raw_chunk``);
    anything else decodes as a Prometheus/Gorilla XOR chunk — so a
    parquet file written by the reference's ``cmd/convert``
    (`schema/chunk.go:35-36`, real XOR payloads per
    `db/writer_test.go:145-150`) reads through the same scan plan,
    which the reference itself never could (its iterator is the stub
    above)."""
    from tsdb_parquet_spark.xorchunk import decode_xor_chunk

    if isinstance(blobs, pa.ChunkedArray):
        blobs = blobs.combine_chunks()
    # explicit buffer math (BinaryArray has no .offsets accessor):
    # buffers() = [validity, byte-offsets, data]; honor the slice offset
    # and both 32-bit (binary) and 64-bit (large_binary) offset widths
    off_dtype = np.int64 if pa.types.is_large_binary(blobs.type) else np.int32
    off_buf = np.frombuffer(blobs.buffers()[1], dtype=off_dtype)
    bounds = off_buf[blobs.offset : blobs.offset + len(blobs) + 1]
    starts = bounds[:-1]
    mem = memoryview(blobs.buffers()[2])
    counts = np.empty(len(blobs), dtype=np.int64)
    flat_parts = []
    for i in range(len(blobs)):
        base = starts[i]
        blob_len = bounds[i + 1] - base
        if blob_len >= 4:
            (n,) = struct.unpack_from("<I", mem, base)
        else:
            n = -1
        if blob_len == 4 + 16 * n:  # raw layout: zero-copy slice
            counts[i] = n
            flat_parts.append(
                np.frombuffer(mem, dtype=np.int64, count=2 * n, offset=base + 4)
            )
            continue
        ts, vals = decode_xor_chunk(bytes(mem[base : base + blob_len]))
        counts[i] = len(ts)
        interleaved = np.empty(2 * len(ts), dtype=np.int64)
        interleaved[0::2] = ts
        interleaved[1::2] = vals.view(np.int64)
        flat_parts.append(interleaved)
    flat = (
        np.concatenate(flat_parts) if flat_parts else np.empty(0, np.int64)
    )
    ts = flat[0::2]
    vals = flat[1::2].view(np.float64)
    offsets = np.zeros(len(blobs) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    struct_arr = pa.StructArray.from_arrays(
        [pa.array(ts, pa.int64()), pa.array(vals, pa.float64())],
        fields=[
            pa.field("ts", pa.int64(), nullable=False),
            pa.field("value", pa.float64(), nullable=False),
        ],
    )
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct_arr)


@arrow_udf(T.BinaryType())
def recode_chunk_udf(blobs: pa.Array) -> pa.Array:
    """Chunk-bytes -> chunk-bytes: re-encode any XOR (Gorilla) blob into
    the engine's raw batch-decodable layout; raw blobs pass through
    untouched.

    This is the "rewrite on ingest" pass the XOR migration-economics
    guidance prescribes: pay the pure-Python XOR decode ONCE at convert
    time, and every later scan of the store decodes at Arrow/memcpy
    speed instead of ~0.43 Msamples/s/core.  Used by ``cli convert
    --recode raw`` and ``sync_blocks(recode="raw")``; lossless by
    construction (decode -> interleave -> length-prefixed raw bytes,
    the same layout ``encode_samples`` emits), asserted round-trip in
    tests."""
    from tsdb_parquet_spark.xorchunk import decode_xor_chunk, is_raw_chunk

    if isinstance(blobs, pa.ChunkedArray):
        blobs = blobs.combine_chunks()
    out = []
    for i in range(len(blobs)):
        blob = blobs[i].as_py()
        if blob is None or is_raw_chunk(blob):
            out.append(blob)
            continue
        ts, vals = decode_xor_chunk(blob)
        out.append(encode_samples(ts, vals))
    return pa.array(out, pa.binary())


@arrow_udf(T.BinaryType())
def encode_chunk_udf(samples: pa.Array) -> pa.Array:
    """Arrow-native chunk encode: the input is the Arrow list<struct>
    column itself; ts/value land in flat numpy buffers via zero-copy
    ``.field().to_numpy()`` and each blob is one interleaved-buffer slice.
    One Arrow batch covers thousands of chunks; no per-sample Python."""
    if isinstance(samples, pa.ChunkedArray):
        samples = samples.combine_chunks()
    counts = pa.compute.list_value_length(samples).to_numpy().astype(np.int64)
    flat = samples.flatten()  # StructArray, slice-safe
    ts = flat.field("ts").to_numpy(zero_copy_only=False).astype(np.int64)
    vals = flat.field("value").to_numpy(zero_copy_only=False)
    interleaved = np.empty(2 * len(ts), dtype=np.int64)
    interleaved[0::2] = ts
    interleaved[1::2] = vals.astype(np.float64).view(np.int64)
    ends = np.cumsum(counts)
    blobs = []
    for i in range(len(counts)):
        s, e = ends[i] - counts[i], ends[i]
        blobs.append(
            struct.pack("<I", int(counts[i])) + interleaved[2 * s : 2 * e].tobytes()
        )
    return pa.array(blobs, pa.binary())


@arrow_udf(T.BinaryType())
def encode_xor_chunk_udf(samples: pa.Array) -> pa.Array:
    """Prometheus/Gorilla XOR encode (`xorchunk.py`): per-chunk Python
    over the Arrow batch's flat buffers — the interop write path for
    producing stores byte-compatible with the reference's converter
    output (`cmd/convert/main.go:107`).  Use :func:`encode_chunk_udf`
    (memcpy-speed raw layout) for engine-native stores."""
    from tsdb_parquet_spark.xorchunk import encode_xor_chunk

    if isinstance(samples, pa.ChunkedArray):
        samples = samples.combine_chunks()
    counts = pa.compute.list_value_length(samples).to_numpy().astype(np.int64)
    flat = samples.flatten()
    ts = flat.field("ts").to_numpy(zero_copy_only=False).astype(np.int64)
    vals = flat.field("value").to_numpy(zero_copy_only=False).astype(np.float64)
    ends = np.cumsum(counts)
    blobs = []
    for i in range(len(counts)):
        s, e = ends[i] - counts[i], ends[i]
        blobs.append(encode_xor_chunk(ts[s:e], vals[s:e]))
    return pa.array(blobs, pa.binary())


def samples_to_chunks(
    samples: DataFrame,
    label_columns: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    chunk_span_ms: int = DEFAULT_CHUNK_SPAN_MS,
    assign_series_ids: bool = True,
    encoding: str = "raw",
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

    ``encoding``: ``"raw"`` (default, the engine's batch-decodable
    layout) or ``"xor"`` (Prometheus/Gorilla bytes, interop with the
    reference's converted blocks — readers auto-detect per blob).
    """
    if encoding not in ("raw", "xor"):
        raise ValueError(f"unknown chunk encoding {encoding!r}")
    encoder = encode_chunk_udf if encoding == "raw" else encode_xor_chunk_udf
    labels = list(label_columns)
    bucket = F.expr(f"{ts_col} div {int(chunk_span_ms)}").alias("__bucket")
    # missing-label convention enforced at WRITE time (`schema/chunk.go:
    # 109-112`): a NULL label becomes "" here, so stores built through this
    # path never contain NULL labels and `ChunkQuerier.from_stores` can
    # safely skip the read-side coalesce for columns every store has —
    # keeping parquet predicate pushdown live on the merged scan
    grouped = samples.select(
        *[F.coalesce(F.col(c), F.lit("")).alias(c) for c in labels],
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
        bucket,
    )

    agg = grouped.groupBy(*labels, "__bucket").agg(
        F.min("ts").alias(MIN_T),
        F.max("ts").alias(MAX_T),
        # array_sort on struct orders by ts (first field) — the chunk's
        # sample order contract
        F.array_sort(F.collect_list(F.struct("ts", "value"))).alias("__samples"),
    )
    chunks = agg.withColumn(CHUNK_BYTES, encoder(F.col("__samples"))).drop(
        "__samples"
    )

    if not assign_series_ids:
        # streaming parts defer id assignment to compaction —
        # `__series__id` is file-local identity (`schema/chunk.go:28-30`)
        return chunks.select(MIN_T, MAX_T, CHUNK_BYTES, *sorted(labels))

    series_ids = dense_series_ids(chunks.select(*labels).distinct(), labels)
    # no broadcast hint: one row per distinct series can exceed driver
    # memory at 100M+ series — AQE broadcasts only when actually small
    return chunks.join(series_ids, on=labels, how="inner").select(
        SERIES_ID, MIN_T, MAX_T, CHUNK_BYTES, *sorted(labels)
    )


def dense_series_ids(series: DataFrame, label_columns: Sequence[str]) -> DataFrame:
    """Assign dense ids 0..N-1 to distinct series in sorted-label order
    (`cmd/convert/main.go:84-91` assigns monotonically over sorted
    postings).

    NOT a global Window (``Window.orderBy`` with no partition key pulls
    every row into one task — a hard wall at 100M+ series), and NOT an RDD
    pass (every series row would round-trip through Python pickling).
    All-JVM single-cache plan:

    1. range-sort the distinct series (ordered partitions, sorted rows);
    2. tag each row with its partition id and its dense in-partition index
       (``monotonically_increasing_id`` assigns ``pid << 33 + row#`` in
       iteration order, which IS the sorted order after the local sort —
       mask off the partition bits to get the local index);
    3. per-partition counts -> running-sum offsets (a window over ONE row
       per partition — |partitions| rows, trivially single-task);
    4. broadcast the offset table back onto the tagged rows:
       ``id = offset[pid] + local_index``.

    The tagged frame is persisted because the range sort is NOT safe to
    recompute (``repartitionByRange`` samples its boundaries from shuffle
    iteration order, so a recompute can re-bucket rows and shift every
    (pid, idx) pair); the returned id table is pinned by an eager
    ``localCheckpoint`` — one (labels, id) row per series, spilled via
    MEMORY_AND_DISK — which lets the fat tagged cache be dropped
    explicitly before returning instead of waiting on the ContextCleaner.
    """
    from pyspark.sql.window import Window

    labels_sorted = [c for c in sorted(label_columns)]
    n_parts = int(
        series.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ordered = series.repartitionByRange(n_parts, *labels_sorted).sortWithinPartitions(
        *labels_sorted
    )
    tagged = ordered.select(
        "*",
        F.spark_partition_id().alias("__pid"),
        (
            F.monotonically_increasing_id()
            - F.shiftleft(F.spark_partition_id().cast("long"), 33)
        ).alias("__idx"),
    ).persist()

    counts = tagged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    running = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(running), F.lit(0)).alias("__offset"),
    )

    out = (
        tagged.join(F.broadcast(offsets), on="__pid", how="inner")
        .select(
            *[F.col(c) for c in ordered.columns],
            (F.col("__offset") + F.col("__idx")).alias(SERIES_ID),
        )
        .localCheckpoint(eager=True)
    )
    tagged.unpersist()
    return out


def chunks_to_samples(chunks: DataFrame, label_columns: Sequence[str]) -> DataFrame:
    """Inverse of :func:`samples_to_chunks`: decode + explode back to
    (labels..., ts, value) rows."""
    labels = list(label_columns)
    decoded = chunks.select(
        *labels, F.explode(decode_chunk_udf(F.col(CHUNK_BYTES))).alias("s")
    )
    return decoded.select(*labels, F.col("s.ts").alias("ts"),
                          F.col("s.value").alias("value"))
