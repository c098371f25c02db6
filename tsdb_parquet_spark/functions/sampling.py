"""Deterministic sampling for training-data pipelines.

The reference engine has no sampling surface (its scan is exhaustive,
`compute/scan.go:24-45`); sampling is table stakes for a 100 TB corpus
pipeline — you never train on the whole crawl, you train on a governed
mixture of per-source / per-language rates, and the sample must be
REPRODUCIBLE across runs and engines (re-running the pipeline, or
auditing it from another system, must select the same rows).

So none of this uses ``rand()`` / ``df.sample()`` (non-deterministic
across retries, partitionings, and engines).  Selection is a pure
function of the row key: a row is kept iff

    substr(md5(seed || key), 1, 8) < hex_threshold(fraction)

md5 is bit-identical everywhere (the one hash Spark and DuckDB share —
see the corpus conventions), the first 8 hex chars are a uniform 32-bit
draw, and comparing hex STRINGS lexicographically equals comparing the
integers, so no integer conversion is needed on either engine.  Keep
probability is ``floor(fraction * 16^8) / 16^8`` — exact to ~2.3e-10.

Scale: every operator here is a stateless per-row Catalyst expression —
no shuffle, no sort, no global pass; the filter fuses into the scan and
pushes nothing to Python.  At 100 TB the sample IS the scan cost.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8


def hex_threshold(fraction: float) -> str:
    """Lowercase threshold for a keep-``fraction`` Bernoulli draw;
    comparing ``substr(md5(...),1,8) < threshold`` keeps a
    ``floor(fraction * 16^8) / 16^8`` share of a uniform key space.

    ``fraction == 1.0`` returns ``"g"``, which sorts above every 8-char
    hex draw in both engines, so keep-all really keeps ALL rows —
    ``"ffffffff"`` under strict ``<`` would drop a key whose md5 prefix
    is exactly ``ffffffff`` (~2.3e-10 per row: real at corpus scale)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction == 1.0:
        return "g"
    return format(int(fraction * _HEX_SPACE), "08x")


def _draw(key: Column, seed: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 8)


def sample_draw_sql(key_expr: str, seed: str) -> str:
    """DuckDB twin of the per-row draw (same md5 bytes, same substring)."""
    return f"substr(md5('{seed}' || CAST({key_expr} AS VARCHAR)), 1, 8)"


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "s0"
) -> DataFrame:
    """Keep a reproducible ``fraction`` of rows, keyed on ``key_col``.

    Engine-independent: the same (seed, key) set is selected by the SQL
    twin ``sample_draw_sql(key, seed) < '{hex_threshold(fraction)}'``.
    """
    return df.filter(_draw(F.col(key_col), seed) < F.lit(hex_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    seed: str = "s0",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. per-language mixture
    governance: keep 100% of low-resource languages, 10% of English).

    Strata missing from ``fractions`` get ``default_fraction``.  One
    CASE expression per stratum — still a stateless scan-fused filter,
    no per-stratum pass, no shuffle (contrast ``df.sampleBy``, which is
    seed-stable but engine-private)."""
    thr: Column = F.lit(hex_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value,
                     F.lit(hex_threshold(frac))).otherwise(thr)
    return df.filter(_draw(F.col(key_col), seed) < thr)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    scale: float = 1.0,
    seed: str = "s0",
) -> DataFrame:
    """Weighted Bernoulli sample: keep probability
    ``min(1, weight * scale)`` PER ROW (e.g. length-proportional or
    quality-proportional training mixtures).

    Same zero-shuffle scan-fused contract as the other samplers, but the
    threshold is now a row expression: ``printf('%08x', floor(rate *
    16^8))`` — printf-style hex is lowercase in both engines, so the
    lexicographic compare against the md5 draw still equals the integer
    compare.  Rates >= 1.0 use the ``'g'`` keep-all sentinel (the
    ``hex_threshold(1.0)`` edge, found in round 2's review)."""
    rate = F.least(
        F.lit(1.0), F.col(weight_col).cast("double") * F.lit(float(scale))
    )
    thr = F.when(rate >= 1.0, F.lit("g")).otherwise(
        F.format_string(
            "%08x",
            F.floor(rate * F.lit(float(_HEX_SPACE))).cast("bigint"),
        )
    )
    return df.filter(_draw(F.col(key_col), seed) < thr)


def weighted_sample_sql(
    key_expr: str, weight_expr: str, scale: float = 1.0, seed: str = "s0"
) -> str:
    """DuckDB twin of :func:`weighted_sample`'s filter predicate."""
    rate = f"least(1.0, CAST({weight_expr} AS DOUBLE) * {float(scale)!r})"
    return (
        f"({sample_draw_sql(key_expr, seed)} < "
        f"CASE WHEN {rate} >= 1.0 THEN 'g' "
        f"ELSE printf('%08x', CAST(floor({rate} * {float(_HEX_SPACE)!r})"
        f" AS BIGINT)) END)"
    )


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float, seed: str = "s0"
) -> DataFrame:
    """Tag every row with a stable ``split`` column (``train``/``test``)
    instead of filtering — holdout membership is a function of the key,
    so a document can never migrate between splits across runs or
    engines (the property that prevents train/test leakage when the
    corpus is re-ingested)."""
    return df.withColumn(
        "split",
        F.when(_draw(F.col(key_col), seed) < F.lit(hex_threshold(test_fraction)),
               F.lit("test")).otherwise(F.lit("train")),
    )
