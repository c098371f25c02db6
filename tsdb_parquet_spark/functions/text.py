"""Text-analysis operators for large-scale training-data pipelines.

All functions are pure Catalyst ``Column`` expressions (JVM-side, inside
whole-stage codegen — no Python in the hot path), so they run at full scan
speed over a 100 TB documents table.  Each has an exact DuckDB-SQL
equivalent used by the oracle corpus; the cross-engine contract is:

- tokens  = non-empty pieces of lower(trim(text)) split on ``\\s+``
- md5 is the only hash primitive (identical across engines)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# compact deterministic stopword lists (top function words)
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "est", "pour", "que", "dans", "ce"],
}

#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of the lowercased text, empties dropped."""
    arr = F.split(F.lower(F.trim(text)), r"\s+")
    return F.filter(arr, lambda t: t != F.lit(""))


def token_count(text: Column, toks: Column | None = None) -> Column:
    return F.size(tokens(text) if toks is None else toks)


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / punct)."""
    return F.size(_bpe_tokens(text))


def _bpe_tokens(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_PATTERN), F.lit(0))


def stopword_hits(text: Column, lang: str, toks: Column | None = None) -> Column:
    stoplist = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    t = tokens(text) if toks is None else toks
    return F.size(F.filter(t, lambda tok: F.array_contains(stoplist, tok)))


def language_id(
    text: Column,
    toks: Column | None = None,
    hits: dict[str, Column] | None = None,
) -> Column:
    """Heuristic language ID: highest stopword-hit ratio wins, fixed
    priority order (en > de > es > fr) breaks ties, 'und' when no list
    matches (mirrors CLD-style unknown).

    Pass a pre-tokenized ``toks`` column in hot paths: interpreted HOFs get
    no common-subexpression elimination, so the inline form re-tokenizes
    once per stopword list.  For the same reason, pass ``hits`` (per-lang
    stopword-hit counts materialized ONCE in a prior projection): the
    CASE tree below references each ratio up to 6 times, and without the
    pre-materialization every reference re-runs its array filter per row
    — ~20 interpreted HOF evaluations per row instead of 4."""
    n = token_count(text, toks).cast("double")
    if hits is None:
        hits = {lang: stopword_hits(text, lang, toks) for lang in STOPWORDS}
    r = {
        lang: F.when(n > 0, hits[lang] / n).otherwise(F.lit(0.0))
        for lang in STOPWORDS
    }
    return (
        F.when(n == 0, F.lit("und"))
        .when(
            (r["en"] >= r["de"]) & (r["en"] >= r["es"]) & (r["en"] >= r["fr"])
            & (r["en"] > 0),
            F.lit("en"),
        )
        .when((r["de"] >= r["es"]) & (r["de"] >= r["fr"]) & (r["de"] > 0),
              F.lit("de"))
        .when((r["es"] >= r["fr"]) & (r["es"] > 0), F.lit("es"))
        .when(r["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def punct_ratio(text: Column) -> Column:
    """Non-alphanumeric, non-space characters / total characters."""
    low = F.lower(text)
    n_chars = F.length(low).cast("double")
    stripped = F.length(F.regexp_replace(low, "[^a-z0-9\\s]", ""))
    return F.when(n_chars > 0, (F.length(low) - stripped) / n_chars).otherwise(
        F.lit(0.0)
    )


def avg_token_len(text: Column, toks: Column | None = None) -> Column:
    t = tokens(text) if toks is None else toks
    n = F.size(t).cast("double")
    total = F.length(F.concat_ws("", t)).cast("double")
    return F.when(n > 0, total / n).otherwise(F.lit(0.0))


def quality_score(
    text: Column,
    toks: Column | None = None,
    stop_hits: Column | None = None,
) -> Column:
    """Composite quality heuristic in [0, 1]: enough tokens, natural
    stopword density, low punctuation noise.  Fixed weights; rounded to 4
    decimals for cross-engine hash stability.  ``stop_hits``: optional
    pre-materialized English stopword-hit count (see ``language_id`` —
    shares the single evaluation instead of re-filtering the array)."""
    n = token_count(text, toks).cast("double")
    if stop_hits is None:
        stop_hits = stopword_hits(text, "en", toks)
    stop_r = F.when(n > 0, stop_hits / n).otherwise(F.lit(0.0))
    score = (
        F.least(F.lit(1.0), n / F.lit(50.0)) * 0.5
        + F.least(F.lit(1.0), stop_r * 5.0) * 0.3
        + (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio(text) * 10.0)) * 0.2
    )
    # explicit half-up rounding: engines disagree on round() at exact .5
    # boundaries, floor(x*1e4 + 0.5) is the same IEEE ops everywhere
    return F.floor(score * 10000.0 + 0.5) / 10000.0


def fingerprint(text: Column, toks: Column | None = None) -> Column:
    """64-bit document fingerprint: md5 of the whitespace-normalized
    lowercase text, first 16 hex chars.  Whitespace-insensitive, so
    reformatted copies collide (the exact-dedup key)."""
    normalized = F.concat_ws(" ", tokens(text) if toks is None else toks)
    return F.substring(F.md5(normalized), 1, 16)


# ---------------------------------------------------------------------------
# DuckDB oracle fragments (same contract, same names)
# ---------------------------------------------------------------------------

SQL_TOKENS = (
    "list_filter(string_split_regex(lower(trim({col})), '\\s+'), t -> t <> '')"
)


def sql_stopword_hits(col: str, lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter({SQL_TOKENS.format(col=col)},"
        f" t -> list_contains([{lst}], t)))"
    )


def sql_language_id(col: str) -> str:
    toks = SQL_TOKENS.format(col=col)
    n = f"len({toks})"
    r = {
        lang: f"(CASE WHEN {n} > 0 THEN {sql_stopword_hits(col, lang)}"
        f" / CAST({n} AS DOUBLE) ELSE 0.0 END)"
        for lang in STOPWORDS
    }
    return f"""CASE WHEN {n} = 0 THEN 'und'
        WHEN {r['en']} >= {r['de']} AND {r['en']} >= {r['es']}
             AND {r['en']} >= {r['fr']} AND {r['en']} > 0 THEN 'en'
        WHEN {r['de']} >= {r['es']} AND {r['de']} >= {r['fr']}
             AND {r['de']} > 0 THEN 'de'
        WHEN {r['es']} >= {r['fr']} AND {r['es']} > 0 THEN 'es'
        WHEN {r['fr']} > 0 THEN 'fr' ELSE 'und' END"""


def sql_quality_score(col: str) -> str:
    toks = SQL_TOKENS.format(col=col)
    n = f"CAST(len({toks}) AS DOUBLE)"
    stop = sql_stopword_hits(col, "en")
    stop_r = f"(CASE WHEN {n} > 0 THEN {stop} / {n} ELSE 0.0 END)"
    punct = (
        f"(CASE WHEN length(lower({col})) > 0 THEN "
        f"(length(lower({col})) - length(regexp_replace(lower({col}),"
        f" '[^a-z0-9\\s]', '', 'g'))) / CAST(length(lower({col})) AS DOUBLE)"
        f" ELSE 0.0 END)"
    )
    return (
        f"floor((least(1.0, {n} / 50.0) * 0.5"
        f" + least(1.0, {stop_r} * 5.0) * 0.3"
        f" + (1.0 - least(1.0, {punct} * 10.0)) * 0.2) * 10000.0 + 0.5)"
        f" / 10000.0"
    )


def sql_fingerprint(col: str) -> str:
    toks = SQL_TOKENS.format(col=col)
    return f"substr(md5(array_to_string({toks}, ' ')), 1, 16)"


def sql_bpe_token_count(col: str) -> str:
    return f"len(regexp_extract_all(lower({col}), '{BPE_PATTERN}'))"
