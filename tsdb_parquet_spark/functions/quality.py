"""Gopher-style repetition quality signals for corpus filtering.

Excessively repetitive documents (boilerplate, SEO spam, templated pages)
are a standard pre-training removal target (Rae et al., "Scaling Language
Models: ... Gopher", §A1.1 repetition filters).  We compute the n-gram
repetition signals that family uses:

- ``dup_ngram_frac``  — 1 - distinct/total n-grams: how much of the doc is
  repeated phrasing;
- ``top_ngram_share`` — occurrences of the single most frequent n-gram over
  total n-grams.

Scale shape: explode n-grams → two-level aggregation.  Both groupBys
map-side combine; the shuffle key (doc_id, gram) is near-unique so no
skew.  No Python in the plan — ``shingles`` is a Catalyst HOF.  Docs with
fewer than ``ngram`` tokens have no n-grams and drop out (callers treat
absent = not-repetitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsdb_parquet_spark.functions.dedup import shingles, sql_shingles
from tsdb_parquet_spark.functions.text import tokens

__all__ = [
    "repetition_stats",
    "repetitive_docs",
    "sql_repetition_stats",
    "remove_repeated_lines",
    "sql_remove_repeated_lines",
]


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 2,
    zero_shuffle: bool = False,
) -> DataFrame:
    """Per-doc repetition metrics; fractions rounded to 4dp so the DuckDB
    oracle's float arithmetic hashes identically.

    Two physical shapes, measured trade-off (r08 probe, min-of-3 warm,
    local[32]; BENCH_local_sf1.json "q70_shapes"):

    - default (``zero_shuffle=False``): explode -> groupBy(doc, gram) ->
      groupBy(doc).  Two exchanges, but every operator is whole-stage
      codegen.  Measured: sf1 3.4 s / sf3 7.5 s — growth exponent 0.72
      (r08 q70_shapes capture; the r12 re-probe of the corpus row
      measured 0.98 over the same step with all 32 cores saturated —
      the shape's floor on fixed hardware, see BENCH_local_sf1.json
      ``analysis.rows_over_target.q70_repetition_stats``).
    - ``zero_shuffle=True``: sort each doc's gram array and derive
      distinct-count/max-run from run boundaries with higher-order
      functions — a pure scan+project with NO exchange; costs
      interpreted-lambda CPU per gram.  Measured: sf1 7.3 s / sf3
      12.2 s — growth exponent 0.47 (meets the probe's <=3.0-per-10x
      target where the default extrapolates 5.2x).

    **Crossover rule (from those numbers).**  On fixed cores the walls
    equal where 3.42·r^0.72 = 7.28·r^0.47 -> r = (2.13)^(1/0.25) ~ 20x
    sf1 (~4M docs of this size distribution per 32 cores).  Below that,
    codegen CPU wins despite shuffling ~10x the text volume; above it —
    or on a real cluster where the exchange becomes network/disk IO
    rather than an in-memory local pass, which moves the crossover
    sharply earlier — flip ``zero_shuffle=True``.  Rule of thumb for a
    1000-executor job: estimate exploded-gram shuffle bytes (~10x input
    text); if that exceeds the cluster's comfortable shuffle budget,
    take the zero-shuffle shape; its worse constant is per-core CPU,
    which wide clusters have, while shuffle IO is the contended
    resource.

    Both return identical values (asserted in tests)."""
    if not zero_shuffle:
        from tsdb_parquet_spark.catalog import spread

        grams = spread(df).select(
            F.col(id_col),
            F.explode(shingles(F.col(text_col), ngram)).alias("gram"),
        )
        per_gram = grams.groupBy(id_col, "gram").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        total = F.sum("cnt")
        return per_gram.groupBy(id_col).agg(
            total.alias("n_grams"),
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.max("cnt").alias("top_gram_count"),
            F.round(
                F.lit(1.0) - F.count(F.lit(1)) / total.cast("double"), 4
            ).alias("dup_ngram_frac"),
            F.round(F.max("cnt") / total.cast("double"), 4).alias(
                "top_ngram_share"
            ),
        )
    gs = F.array_sort(shingles(F.col(text_col), ngram))
    # run starts in the sorted array: positions whose element differs from
    # its predecessor (element_at is 1-based, so element_at(gs, i) IS the
    # predecessor of 0-based position i).  Lambdas return primitives only;
    # the heavy lifting (sort, distinct-by-runs, max) stays in native
    # expressions — no per-element struct allocation.
    starts = F.expr(
        """filter(
             transform(__gs, (x, i) ->
               IF(i = 0 OR x != element_at(__gs, i), i, -1)),
             p -> p >= 0)"""
    )
    # each run ends where the next begins; the last run ends at n
    maxrun = F.expr(
        """array_max(zip_with(
             concat(slice(__starts, 2, greatest(size(__starts) - 1, 0)),
                    array(size(__gs))),
             __starts,
             (e, s) -> CAST(e - s AS BIGINT)))"""
    )
    n = F.size("__gs").cast("long")
    nd = F.size("__starts").cast("long")
    return (
        df.select(F.col(id_col), gs.alias("__gs"))
        # docs with no n-grams vanish, matching the explode-based shape
        .filter(F.size("__gs") > 0)
        .withColumn("__starts", starts)
        .select(
            id_col,
            n.alias("n_grams"),
            nd.alias("n_distinct_grams"),
            maxrun.alias("top_gram_count"),
            F.round(F.lit(1.0) - nd / n.cast("double"), 4).alias(
                "dup_ngram_frac"
            ),
            F.round(maxrun / n.cast("double"), 4).alias("top_ngram_share"),
        )
    )


def repetitive_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 2,
    max_dup_frac: float = 0.3,
) -> DataFrame:
    """Doc ids whose duplicate-n-gram fraction exceeds the cutoff (the
    removal set; anti-join it against the corpus to clean)."""
    return (
        repetition_stats(df, id_col, text_col, ngram)
        .filter(F.col("dup_ngram_frac") > max_dup_frac)
        .select(id_col, "dup_ngram_frac")
    )


def sql_repetition_stats(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 2,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of :func:`repetition_stats` for the oracle gate."""
    gs = sql_shingles(text_col, ngram)
    return f"""
WITH grams AS (
  SELECT {id_col}, unnest({gs}) AS gram FROM {table} WHERE {where}
),
per_gram AS (
  SELECT {id_col}, gram, count(*) AS cnt FROM grams GROUP BY {id_col}, gram
)
SELECT {id_col},
       CAST(sum(cnt) AS BIGINT) AS n_grams,
       count(*) AS n_distinct_grams,
       CAST(max(cnt) AS BIGINT) AS top_gram_count,
       round(1.0 - count(*) / CAST(sum(cnt) AS DOUBLE), 4) AS dup_ngram_frac,
       round(max(cnt) / CAST(sum(cnt) AS DOUBLE), 4) AS top_ngram_share
FROM per_gram GROUP BY {id_col}
"""


def remove_repeated_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_docs: int = 10,
) -> DataFrame:
    """C4/RefinedWeb-style line-level boilerplate removal: drop every
    line that appears (exactly) in at least ``min_docs`` DISTINCT
    documents — cookie banners, nav bars, "subscribe" footers — and
    reassemble each document's surviving lines in their original order.
    Documents whose every line is boilerplate disappear from the output.

    Scale shape: posexplode -> one map-side-combining groupBy on the
    line (near-unique key, no skew) -> anti-join of the exploded lines
    against the (small) boilerplate set, which AQE broadcasts -> one
    groupBy per document to reassemble.  No Python anywhere; order
    restoration is an array_sort over the (pos, line) structs, bounded
    by lines-per-document.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= F.lit(int(min_docs)))
        .select("line")
    )
    kept = lines.join(boiler, on="line", how="left_anti")
    return kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias(text_col)
    )


def sql_remove_repeated_lines(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 10,
) -> str:
    """DuckDB twin of :func:`remove_repeated_lines` (oracle use)."""
    return f"""
WITH __split AS (
  SELECT {id_col}, string_split({text_col}, chr(10)) AS __ls FROM {table}
),
__lines AS (
  SELECT {id_col}, unnest(__ls) AS line,
         unnest(range(1, len(__ls) + 1)) AS ord
  FROM __split
),
__boiler AS (
  SELECT line FROM __lines
  GROUP BY line HAVING count(DISTINCT {id_col}) >= {int(min_docs)}
),
__kept AS (
  SELECT * FROM __lines WHERE line NOT IN (SELECT line FROM __boiler)
)
SELECT {id_col}, string_agg(line, chr(10) ORDER BY ord) AS {text_col}
FROM __kept GROUP BY {id_col}"""


# ---------------------------------------------------------------------------
# Bigram-LM perplexity scoring (CCNet-style quality filtering)
# ---------------------------------------------------------------------------


def lm_score(
    corpus: DataFrame,
    train: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Language-model quality scores (the CCNet recipe, arXiv:1911.00359:
    score text by an n-gram LM trained on a reference corpus; low
    log-likelihood = out-of-domain / low quality).  Here an add-alpha
    smoothed word-BIGRAM model:

        log P(w2 | w1) = ln( (c(w1,w2) + alpha) / (c(w1) + alpha * V) )

    trained on ``train`` and applied to ``corpus``; returns one row per
    scored doc: ``(id_col, n_bigrams, avg_logprob)`` (docs with no
    bigram are omitted — perplexity = exp(-avg_logprob)).

    Scale shape: the model IS the small side — unigram/bigram count
    tables are vocabulary-bounded regardless of corpus size, so both
    probability lookups are broadcast hash joins and the corpus never
    shuffles except the final per-doc aggregation (map-side combined).
    The vocabulary size V is a 1-row aggregate cross-joined in-plan (no
    driver collect), like the SQ8 range training.
    """
    from tsdb_parquet_spark.catalog import spread

    def bigrams(df: DataFrame) -> DataFrame:
        toks = tokens(F.col(text_col))
        pairs = F.when(
            F.size(toks) >= 2,
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        return df.select(
            F.col(id_col), F.explode(pairs).alias("__bg")
        ).select(
            F.col(id_col),
            F.col("__bg.w1").alias("w1"),
            F.col("__bg.w2").alias("w2"),
        )

    train_w = spread(train)
    # the unigram table feeds BOTH the broadcast probability lookup and
    # the 1-row vocabulary aggregate below; without the lineage cut the
    # two consumers each re-run the full tokenize+explode+shuffle over
    # the training corpus (Catalyst does not reuse the exchange across
    # the two subtrees).  The checkpoint is vocabulary-bounded — |V|
    # rows — so pinning it is free at any corpus size.
    uni = (
        train_w.select(F.explode(tokens(F.col(text_col))).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("cu"))
        .localCheckpoint(eager=False)
    )
    bi = (
        bigrams(train_w)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("__V"))

    scored = (
        bigrams(spread(corpus))
        .join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(F.broadcast(uni), ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(float(alpha)))
                / (
                    F.coalesce(F.col("cu"), F.lit(0))
                    + F.lit(float(alpha)) * F.col("__V")
                )
            ).alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("__lp"), 4).alias("avg_logprob"),
    )


def sql_lm_score(
    corpus_pred: str,
    train_pred: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> str:
    """DuckDB oracle twin of :func:`lm_score` over predicate-selected
    train/corpus splits of one table."""
    from tsdb_parquet_spark.functions.text import SQL_TOKENS

    toks = SQL_TOKENS.format(col=text_col)
    return f"""
WITH tr AS (SELECT {id_col}, {toks} AS toks FROM {table} WHERE {train_pred}),
co AS (SELECT {id_col}, {toks} AS toks FROM {table} WHERE {corpus_pred}),
uni AS (
  SELECT w1, count(*) AS cu
  FROM (SELECT unnest(toks) AS w1 FROM tr) GROUP BY w1
),
bi AS (
  SELECT w1, w2, count(*) AS cb FROM (
    SELECT toks[i] AS w1, toks[i + 1] AS w2
    FROM tr, unnest(range(1, len(toks))) AS u(i)
    WHERE len(toks) >= 2
  ) GROUP BY w1, w2
),
v AS (SELECT count(*) AS V FROM uni),
cbg AS (
  SELECT {id_col}, toks[i] AS w1, toks[i + 1] AS w2
  FROM co, unnest(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2
),
lp AS (
  SELECT cbg.{id_col},
         ln((coalesce(bi.cb, 0) + {alpha!r})
            / (coalesce(uni.cu, 0) + {alpha!r} * v.V)) AS lp
  FROM cbg
  LEFT JOIN bi ON bi.w1 = cbg.w1 AND bi.w2 = cbg.w2
  LEFT JOIN uni ON uni.w1 = cbg.w1
  CROSS JOIN v
)
SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(lp), 4) AS avg_logprob
FROM lp GROUP BY {id_col}
"""
