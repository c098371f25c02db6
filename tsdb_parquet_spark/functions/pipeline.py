"""Composed training-data pipeline operators.

The C4/RefinedWeb-style cleaning chain — quality filter, language filter,
exact dedup, near-dup removal, then splitting into fixed-token training
chunks — expressed as one lazy DataFrame pipeline: Catalyst fuses the
filters into the scan, the only shuffles are the dedup groupBys, and the
chunker is a JVM explode (no Python).  Each stage is also usable alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tsdb_parquet_spark.functions import dedup as D
from tsdb_parquet_spark.functions import text as TX


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    languages: tuple[str, ...] = ("en",),
    drop_near_dups: bool = False,
    eager: bool = True,
) -> DataFrame:
    """Quality gate -> language gate -> exact dedup (keep smallest id) ->
    optional MinHash-LSH near-dup removal (keep smaller id of each pair).

    ``eager`` (default) materializes the gated set and releases the
    tokenized cache before returning — the same storage-bounding trade
    as `lsh_candidate_pairs`; pass False for single-shot consumers that
    prefer a fully lazy pipeline (the cache is then reclaimed by the
    ContextCleaner when the result goes out of scope)."""
    t = F.col(text_col)
    toks = F.col("__toks")
    from tsdb_parquet_spark.catalog import spread

    # persist the tokenized projection before the quality/language
    # filters: the cache boundary keeps the heavy score expressions from
    # being predicate-pushed beneath spread's exchange onto the serial
    # scan task, and the cached tokens feed both filters plus the dedup
    # fingerprint downstream.  Three-projection shape (same as corpus
    # q30): tokens once, then the four stopword-hit counts once —
    # interpreted HOFs get no common-subexpression elimination, so the
    # language-ID CASE would otherwise re-run each array filter up to
    # 6x per row (~20 HOF evaluations instead of 4; guide §1.2 step 2).
    hits = {lang: F.col(f"__hit_{lang}") for lang in TX.STOPWORDS}
    base = (
        spread(docs)
        .select(F.col(id_col), t, TX.tokens(t).alias("__toks"))
        .select(
            "*",
            *[
                TX.stopword_hits(t, lang, toks).alias(f"__hit_{lang}")
                for lang in TX.STOPWORDS
            ],
        )
        .persist()
    )
    gated = (
        base.filter(
            TX.quality_score(t, toks, stop_hits=hits["en"])
            >= F.lit(min_quality)
        )
        .filter(TX.language_id(t, toks, hits=hits).isin(*languages))
        .drop("__toks", *[f"__hit_{lang}" for lang in TX.STOPWORDS])
    )
    if eager:
        gated = gated.localCheckpoint(eager=True)
        base.unpersist()
    kept = D.drop_exact_duplicates(gated, id_col, text_col)
    if drop_near_dups:
        pairs = D.lsh_candidate_pairs(kept, id_col, text_col)
        losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
        kept = kept.join(losers, on=id_col, how="left_anti")
    return kept


def training_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 40,
    stride: int = 32,
) -> DataFrame:
    """Split documents into overlapping fixed-token training chunks:
    chunk i covers tokens [i*stride, i*stride + chunk_tokens).

    Pure JVM: tokenize once, build (chunk_id, text) structs with
    sequence/transform/slice, posexplode — the fan-out runs inside the
    scan stage, no shuffle at all."""
    t = F.col(text_col)
    toks = F.col("__toks")
    n = F.size(toks)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), F.floor((n - 1) / F.lit(stride)).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.concat_ws(
                " ", F.slice(toks, i * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), n - i * stride).alias("n_tokens"),
        ),
    )
    return (
        docs.select(F.col(id_col), t, TX.tokens(t).alias("__toks"))
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    len_col: str | None = None,
    shards: int = 32,
) -> DataFrame:
    """Concat-and-chunk sequence packing: place documents end-to-end in a
    deterministic order and cut the token stream every ``budget_tokens``
    — the standard way training batches are packed from variable-length
    documents.

    Deterministic and shard-parallel: docs are streamed in ``id`` order
    WITHIN ``id % shards`` shards (never a global single-task window —
    the round-1 `Window.orderBy`-without-partition trap), so parallelism
    is ``shards`` and each shard's packing is independent of every other
    shard's data.  One shuffle on the shard key.  When the GLOBAL
    corpus-order stream is required (pinned data order) with exact
    per-chunk spans, use `functions.packing.pack_token_chunks` — its
    distributed prefix sum buys global exactness for one extra quantile
    scan.

    Output per doc: ``shard``, ``n_tokens``, ``start_offset`` (position
    in the shard's token stream), ``first_seq``/``last_seq`` (the
    budget-sized sequences the doc lands in; docs spanning a boundary
    continue into the next sequence) and ``offset_in_seq``.
    """
    n = (
        F.col(len_col).cast("long")
        if len_col
        else F.size(TX.tokens(F.col(text_col))).cast("long")
    )
    from pyspark.sql import Window

    shard = (F.col(id_col) % shards).cast("long")
    base = docs.select(
        F.col(id_col), shard.alias("shard"), n.alias("n_tokens")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    b = F.lit(int(budget_tokens)).cast("long")
    out = base.withColumn("start_offset", start)
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {int(budget_tokens)}").alias("first_seq"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr(
                f"(start_offset + n_tokens - 1) div {int(budget_tokens)}"
            ),
        )
        .otherwise(F.expr(f"start_offset div {int(budget_tokens)}"))
        .alias("last_seq"),
        (F.col("start_offset") % b).alias("offset_in_seq"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle fragments
# ---------------------------------------------------------------------------


def sql_pack_sequences(
    table: str,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shards: int = 32,
) -> str:
    """Oracle twin of :func:`pack_sequences` (CAST guards: DuckDB window
    sums of integers return HUGEINT, which a pandas fetch renders as
    float64 and breaks the cross-engine hash)."""
    toks = TX.SQL_TOKENS.format(col=text_col)
    b = int(budget_tokens)
    return f"""
WITH tok AS (
  SELECT {id_col}, {id_col} % {shards} AS shard,
         CAST(len({toks}) AS BIGINT) AS n_tokens
  FROM {table}
),
w AS (
  SELECT {id_col}, shard, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (
             PARTITION BY shard ORDER BY {id_col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS BIGINT) AS start_offset
  FROM tok
)
SELECT {id_col}, shard, n_tokens, start_offset,
       start_offset // {b} AS first_seq,
       CASE WHEN n_tokens > 0
            THEN (start_offset + n_tokens - 1) // {b}
            ELSE start_offset // {b} END AS last_seq,
       start_offset % {b} AS offset_in_seq
FROM w"""


def sql_training_chunks(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 40,
    stride: int = 32,
) -> str:
    toks = TX.SQL_TOKENS.format(col=text_col)
    return f"""
WITH tok AS (
  SELECT {id_col}, {toks} AS toks FROM {table}
), fan AS (
  SELECT {id_col},
         unnest(list_transform(
           range(0, CASE WHEN len(toks) > 0
                         THEN (len(toks) - 1) // {stride} + 1 ELSE 0 END),
           i -> {{'chunk_id': i,
                 'chunk_text': array_to_string(
                     toks[i*{stride}+1 : i*{stride}+{chunk_tokens}], ' '),
                 'n_tokens': least({chunk_tokens},
                                   len(toks) - i*{stride})}}),
           recursive := true)
  FROM tok
)
SELECT {id_col}, chunk_id, chunk_text, n_tokens FROM fan"""
