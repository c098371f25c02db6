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

__all__ = ["repetition_stats", "repetitive_docs", "sql_repetition_stats"]


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 2,
) -> DataFrame:
    """Per-doc repetition metrics; fractions rounded to 4dp so the DuckDB
    oracle's float arithmetic hashes identically."""
    grams = df.select(
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
