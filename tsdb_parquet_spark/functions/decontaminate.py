"""Benchmark decontamination: drop training documents that share word
n-grams with an evaluation/benchmark set.

The standard LLM-pipeline hygiene step (n-gram collision check between the
training corpus and held-out benchmarks).  The reference engine has no
analog — this extends the pipeline surface the same way `functions/dedup.py`
does (SURVEY.md §2.3 note on pipeline operators).

Scale shape: a benchmark set is tiny (thousands of docs) next to a 100 TB
corpus, so the exploded benchmark n-gram table is deduplicated and
**broadcast**; the corpus side computes per-document distinct n-grams with
``array_distinct`` *before* exploding (no shuffle to dedup), probes the
broadcast map, and aggregates per document — the only corpus shuffle is the
final doc_id aggregation, which map-side-combines.  No all-pairs join
anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tsdb_parquet_spark.functions.dedup import shingles, sql_shingles

__all__ = [
    "benchmark_ngrams",
    "contamination_report",
    "decontaminate",
    "sql_contamination_report",
]


def _doc_grams(text: Column, ngram: int) -> Column:
    return F.array_distinct(shingles(text, ngram))


def benchmark_ngrams(
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 4,
) -> DataFrame:
    """(bench_id, gram) pairs, distinct n-grams per benchmark doc.

    Small by construction; callers broadcast it.  Kept per-doc (not a
    global gram set) so reports can attribute hits to benchmark docs.
    """
    return benchmark.select(
        F.col(id_col).alias("bench_id"),
        F.explode(_doc_grams(F.col(text_col), ngram)).alias("gram"),
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 4,
    min_overlap: int = 1,
) -> DataFrame:
    """Per contaminated corpus doc: how many distinct n-grams collide with
    the benchmark set (``n_gram_hits``) and how many distinct benchmark
    docs are touched (``n_bench_docs``).

    Only docs with ``n_gram_hits >= min_overlap`` are returned.
    """
    bench = F.broadcast(
        benchmark_ngrams(benchmark, id_col, text_col, ngram)
    )
    from tsdb_parquet_spark.catalog import spread

    grams = spread(corpus).select(
        F.col(id_col),
        F.explode(_doc_grams(F.col(text_col), ngram)).alias("gram"),
    )
    return (
        grams.join(bench, on="gram", how="inner")
        .groupBy(id_col)
        .agg(
            F.countDistinct("gram").alias("n_gram_hits"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .filter(F.col("n_gram_hits") >= min_overlap)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 4,
    min_overlap: int = 1,
) -> DataFrame:
    """Corpus minus contaminated docs (left-anti join on the report ids).

    The anti join's right side is the (small) report, so AQE broadcasts
    it; corpus rows never shuffle.
    """
    flagged = contamination_report(
        corpus, benchmark, id_col, text_col, ngram, min_overlap
    ).select(id_col)
    return corpus.join(F.broadcast(flagged), on=id_col, how="left_anti")


def sql_contamination_report(
    corpus_pred: str,
    benchmark_pred: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 4,
    min_overlap: int = 1,
) -> str:
    """DuckDB twin of :func:`contamination_report` for the oracle gate.

    ``corpus_pred`` / ``benchmark_pred`` split one table into the two
    roles (the driver's fixtures have a single ``documents`` table).
    """
    gs = sql_shingles(text_col, ngram)
    return f"""
WITH grams AS (
  SELECT {id_col}, {gs} AS gs FROM {table}
),
bench AS (
  SELECT {id_col} AS bench_id, unnest(list_distinct(gs)) AS gram
  FROM grams WHERE {benchmark_pred}
),
corpus AS (
  SELECT {id_col}, unnest(list_distinct(gs)) AS gram
  FROM grams WHERE {corpus_pred}
)
SELECT c.{id_col},
       count(DISTINCT c.gram) AS n_gram_hits,
       count(DISTINCT b.bench_id) AS n_bench_docs
FROM corpus c JOIN bench b USING (gram)
GROUP BY c.{id_col}
HAVING count(DISTINCT c.gram) >= {min_overlap}
"""
