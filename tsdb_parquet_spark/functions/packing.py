"""Sequence packing for LLM pretraining pipelines: concat-and-chunk.

The standard pretraining data layout concatenates every document's
tokens in a fixed corpus order and slices the stream into fixed-length
training sequences (GPT-style "packing"); a document whose tokens cross
a boundary contributes spans to two (or more) chunks.  This module
computes that layout as SPANS — ``(chunk_id, doc, doc_offset,
chunk_offset, span_len)`` — so a downstream tokenizer job can assemble
each training sequence by slicing its source documents, without ever
materializing the token stream itself.

Scale shape (the whole point): the global token offset is a
DISTRIBUTED PREFIX SUM, not a single-partition window —

1. bucket the corpus order key by EXPLICIT quantile boundaries
   (``approxQuantile`` once, boundaries embedded as literals) — the
   bucket id is a pure function of the key, so every recomputation,
   retry, and AQE replan assigns identical buckets (a
   ``repartitionByRange`` + ``spark_partition_id`` formulation would
   hinge on the range sampler re-drawing identical bounds);
2. per-bucket token totals: one map-side-combined aggregate whose
   result is ``num_buckets`` rows — the only driver materialization,
   O(buckets), never O(docs);
3. driver-side running total -> per-bucket base offsets, embedded as a
   literal map;
4. per-bucket cumulative sum (window PARTITIONED by bucket — parallel,
   no global sort) + base offset = exact global offset;
5. span arithmetic + ``explode(sequence(first_chunk, last_chunk))`` —
   pure Catalyst expressions, whole-stage codegen, no Python.

A 100 TB corpus on 1000 executors pays one quantile scan, one tiny
aggregate, and ONE shuffle (the per-bucket window); the naive
``Window.orderBy(order)`` form would serialize the entire corpus
through one task.

Token counting uses the repo-wide contract from `functions.text`
(non-empty pieces of ``lower(trim(text))`` split on ``\\s+``) so the
DuckDB oracle recomputes identical counts; any integer column works via
``n_tokens=``.

Relationship to `functions.pipeline.pack_sequences` (q58), which also
packs concat-and-chunk: that operator shards docs by ``id % shards``
and packs each shard's stream INDEPENDENTLY — zero cross-shard
coordination, doc-level offsets only — the right shape when any
deterministic packing will do.  This module computes the ONE global
corpus-order stream (training runs that pin a global data order) and
emits explicit per-chunk spans ready for sequence assembly; the
distributed prefix sum is the price of global exactness, and it costs
one quantile scan + one tiny collect more than the sharded form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tsdb_parquet_spark.functions.text import SQL_TOKENS, token_count

__all__ = [
    "pack_token_chunks",
    "assemble_chunks",
    "sql_pack_token_chunks",
]


def pack_token_chunks(
    docs: DataFrame,
    seq_len: int,
    order_col: str = "doc_id",
    text_col: str = "text",
    n_tokens: Column | None = None,
    num_buckets: int = 64,
    quantile_error: float = 0.001,
    pin_counts: bool = True,
) -> DataFrame:
    """Spans of the concat-and-chunk packing of ``docs`` into
    ``seq_len``-token training sequences, in ``order_col`` order.

    Output: ``(chunk_id, <order_col>, doc_offset, chunk_offset,
    span_len)`` — chunk ``c`` holds tokens ``[doc_offset, doc_offset +
    span_len)`` of the document at positions ``[chunk_offset, ...)``;
    zero-token documents occupy no stream positions and emit no span.
    The final partial chunk is emitted as-is (callers drop or pad it).

    ``order_col`` must be NUMERIC and unique per document (it is the
    corpus order, the bucket key, and the window tie-break).
    ``num_buckets`` bounds prefix-sum parallelism: size it so one
    bucket's docs fit one task comfortably (~corpus/1000 at cluster
    scale).  The quantile boundaries need not be balanced for
    correctness — only for parallelism — so ``quantile_error`` is a
    skew knob, not a correctness knob."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    n = (
        n_tokens
        if n_tokens is not None
        else token_count(F.col(text_col))
    ).cast("long")
    # the counts frame is consumed THREE ways — the quantile probe, the
    # O(buckets) totals collect, and the exec-time window plan — and
    # each would otherwise re-run the full tokenize pass over the
    # corpus.  It is the lightweight proxy of the packing decision
    # (order key + token count, ~16 bytes/doc regardless of text size),
    # so pin it once: lazy localCheckpoint, materialized by the
    # quantile probe, self-cleaned by the ContextCleaner when the
    # result frame is dropped.  ``pin_counts=False`` opts out (same
    # contract as otlp_frame's pin_decoded): a localCheckpoint is not
    # fault-tolerant — on long-running large clusters where executor
    # loss must recompute via lineage, trade the triple tokenize pass
    # for recoverability.
    toks = docs.select(F.col(order_col), n.alias("_n")).where(
        F.col("_n") > 0
    )
    if pin_counts:
        toks = toks.localCheckpoint(eager=False)

    # (1) content-deterministic buckets: interior quantile boundaries of
    # the order key, embedded as LITERALS — bucket id is then a pure
    # function of the key, immune to recomputation/AQE replans
    if num_buckets > 1:
        probs = [i / num_buckets for i in range(1, num_buckets)]
        bounds = sorted(set(toks.approxQuantile(order_col, probs, quantile_error)))
    else:
        bounds = []
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col(order_col) > F.lit(b)).cast("int")
    toks = toks.withColumn("_bucket", bucket)

    # (2) O(buckets) driver materialization — the ONLY collect
    totals = {
        r["_bucket"]: r["_t"]
        for r in toks.groupBy("_bucket").agg(F.sum("_n").alias("_t")).collect()
    }
    # (3) running total in bucket order -> literal base-offset map
    bases, acc = {}, 0
    for bid in sorted(totals):
        bases[bid] = acc
        acc += totals[bid]
    base_expr = (
        F.element_at(
            F.create_map(
                *[F.lit(x) for bid in sorted(bases) for x in (bid, bases[bid])]
            ),
            F.col("_bucket"),
        )
        if bases
        else F.lit(0)
    )

    # (4) parallel per-bucket cumsum + literal base = global offset
    w = Window.partitionBy("_bucket").orderBy(order_col)
    off = (F.sum("_n").over(w) - F.col("_n") + base_expr).alias("_off")
    offs = toks.select(order_col, "_n", off)

    # (5) span arithmetic, all-JVM.  `div` is exact integer division —
    # `/` on longs yields a double, which for global token offsets near
    # 2^53/seq_len rounds and can misplace a chunk id by one at the
    # 100 TB corpus scale this module advertises
    first = F.expr(f"_off div {int(seq_len)}")
    last = F.expr(f"(_off + _n - 1) div {int(seq_len)}")
    L = F.lit(int(seq_len))
    spans = offs.select(
        order_col,
        "_n",
        "_off",
        F.explode(F.sequence(first, last)).alias("chunk_id"),
    )
    lo = F.greatest(F.col("chunk_id") * L, F.col("_off"))
    hi = F.least((F.col("chunk_id") + 1) * L, F.col("_off") + F.col("_n"))
    return spans.select(
        "chunk_id",
        order_col,
        (lo - F.col("_off")).alias("doc_offset"),
        (lo - F.col("chunk_id") * L).alias("chunk_offset"),
        (hi - lo).alias("span_len"),
    )


def sql_pack_token_chunks(
    seq_len: int,
    table: str = "documents",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`pack_token_chunks` (single-process window
    prefix sum — the oracle is allowed the global sort the distributed
    plan avoids)."""
    toks = SQL_TOKENS.format(col=text_col)
    return f"""
WITH toks AS (
  SELECT {order_col}, len({toks}) AS n FROM {table}
),
nz AS (SELECT * FROM toks WHERE n > 0),
o AS (
  SELECT {order_col}, n,
         coalesce(sum(n) OVER (ORDER BY {order_col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM nz
),
spans AS (
  SELECT o.{order_col}, o.n, o.off, cs.chunk_id
  FROM o, LATERAL (
    SELECT unnest(generate_series(
               CAST(o.off // {seq_len} AS BIGINT),
               CAST((o.off + o.n - 1) // {seq_len} AS BIGINT)))
           AS chunk_id) cs
)
SELECT chunk_id, {order_col},
       greatest(chunk_id * {seq_len} - off, 0) AS doc_offset,
       greatest(off - chunk_id * {seq_len}, 0) AS chunk_offset,
       least((chunk_id + 1) * {seq_len}, off + n)
           - greatest(chunk_id * {seq_len}, off) AS span_len
FROM spans"""


def assemble_chunks(
    spans: DataFrame,
    docs: DataFrame,
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize the training sequences: join the spans back to the
    documents and slice each doc's token array — ``(chunk_id, tokens
    array<string>)``, every chunk's array in stream order.

    Plan shape: spans join docs on the order key (both sides carry it;
    Catalyst picks broadcast when spans are small, sort-merge
    otherwise), ``slice()`` extracts each span's tokens JVM-side, and
    one groupBy per chunk concatenates spans in ``chunk_offset`` order
    via ``array_sort`` on (offset, tokens) structs — one shuffle keyed
    on chunk_id, no Python.  The output row for a chunk is ~seq_len
    tokens regardless of corpus size."""
    from tsdb_parquet_spark.functions.text import tokens

    toks = docs.select(
        F.col(order_col), tokens(F.col(text_col)).alias("__toks")
    )
    sliced = spans.join(toks, on=order_col).select(
        "chunk_id",
        "chunk_offset",
        F.slice(
            F.col("__toks"),
            F.col("doc_offset") + 1,  # slice() is 1-based
            F.col("span_len"),
        ).alias("__piece"),
    )
    return (
        sliced.groupBy("chunk_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_offset", "__piece"))
            ).alias("__parts")
        )
        .select(
            "chunk_id",
            F.flatten(F.col("__parts.__piece")).alias("tokens"),
        )
    )
