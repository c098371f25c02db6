"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the point of each implementation):

- **exact**: hash-groupBy on a fingerprint — one shuffle keyed by a 64-bit
  digest, map-side partial aggregation; never materializes full texts on
  the reduce side beyond one representative per group.
- **MinHash+LSH**: per-doc signature (embarrassingly parallel) -> explode
  into (band, bucket) keys -> self-equi-join on the bucket.  The join key
  space grows with corpus size so the shuffle stays balanced; no O(n^2)
  pair enumeration ever happens.
- **SimHash**: explode tokens, one groupBy(doc) with 16 conditional sums —
  all JVM-side arithmetic.
- **n-gram Jaccard**: exact verification for candidate pairs (the refine
  step after LSH's coarse recall).

Cross-engine determinism contract (DuckDB oracle must reproduce bit-for-bit):
tokens = non-empty splits of lower(trim(text)) on \\s+; all hashing is md5
on strings; MinHash minimizes the md5 hex string lexicographically (a valid
uniform total order available identically in both engines).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tsdb_parquet_spark.functions.text import SQL_TOKENS, fingerprint, tokens

HEX = "0123456789abcdef"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per distinct normalized text: the kept (minimum) id and the
    number of copies.  ``fingerprint`` is whitespace-insensitive md5."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def drop_exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the smallest-id representative of each duplicate group."""
    keep = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="inner")


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------


def shingles(text: Column, size: int = 3) -> Column:
    """Word w-shingles as space-joined strings; empty when the document has
    fewer than ``size`` tokens."""
    toks = tokens(text)
    n = F.size(toks)
    return F.when(
        n >= size,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(size - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, size)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _seeded_hash(k: int):
    # NB: must be a closure factory — a `lambda s, k=k` default would make
    # PySpark treat it as an (element, index) two-arg HOF lambda
    prefix = F.lit(f"{k}|")
    return lambda s: F.md5(F.concat(prefix, s))


def minhash_from_shingles(sh: Column, num_hashes: int = 8) -> Column:
    """Signature from a pre-computed shingles column.  Keep the shingles in
    their own projection (an aliased column) when calling this: higher-order
    functions are interpreted without common-subexpression elimination, so
    embedding the shingle expression here would recompute it num_hashes
    times per row (~8x slower)."""
    return F.when(
        F.size(sh) > 0,
        F.array(
            *[
                F.array_min(F.transform(sh, _seeded_hash(k)))
                for k in range(num_hashes)
            ]
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signature(
    text: Column, num_hashes: int = 8, shingle_size: int = 3
) -> Column:
    """Array of ``num_hashes`` MinHash values: for seed k, the
    lexicographic minimum of md5(k || '|' || shingle).  Null-free; docs
    with no shingles get an empty signature.  (Single-expression form —
    prefer the two-projection shape of :func:`lsh_candidate_pairs` in hot
    paths, see :func:`minhash_from_shingles`.)"""
    return minhash_from_shingles(shingles(text, shingle_size), num_hashes)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_size: int = 3,
    eager: bool = True,
) -> DataFrame:
    """MinHash-LSH candidate pairs (doc_a < doc_b).

    rows_per_band = num_hashes / bands; a pair collides when one band's
    minhashes all agree.  The plan is: signature (no shuffle) -> explode to
    (band, bucket) -> repartition by bucket via the self-join -> distinct.

    ``eager=True`` (the default, right for long-lived / repeated-call
    sessions) materializes the small pair set via ``localCheckpoint`` and
    drops the bucket cache before returning, bounding executor storage.
    ``eager=False`` skips that upfront materialization — faster for a
    single-shot caller that consumes the result once; the bucket cache is
    then released by the ContextCleaner when the result goes out of scope.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    # two projections on purpose: shingles materialize once per row, the 8
    # min-hash folds read the materialized array (see minhash_from_shingles)
    from tsdb_parquet_spark.catalog import spread

    sh = spread(df).select(
        F.col(id_col), shingles(F.col(text_col), shingle_size).alias("__sh")
    )
    # persist BEFORE the size(sig) > 0 filter: the cache boundary stops
    # predicate pushdown, which would otherwise drag the whole
    # shingle+minhash expression beneath the repartition exchange onto
    # the serial scan task (and re-evaluate it post-exchange); the
    # cached signatures also feed both self-join sides
    sig_all = sh.select(
        F.col(id_col),
        minhash_from_shingles(F.col("__sh"), num_hashes).alias("sig"),
    ).persist()
    sig = sig_all.filter(F.size("sig") > 0)
    band_cols = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.md5(F.concat_ws("", F.slice(F.col("sig"), j * rows + 1, rows))
                      ).alias("bucket"),
            )
            for j in range(bands)
        ]
    )
    buckets = sig.select(id_col, F.explode(band_cols).alias("b")).select(
        id_col, F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket")
    )
    left = buckets.alias("l")
    right = buckets.alias("r")
    pairs = left.join(
        right,
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("doc_a"), F.col(f"r.{id_col}").alias("doc_b")
    )
    out = pairs.distinct()
    if eager:
        # eagerly materialize the (small) pair set so the signature cache
        # can be dropped before returning — without this, repeated
        # pipeline calls leak cached blocks into executor storage for the
        # session's lifetime
        out = out.localCheckpoint(eager=True)
        sig_all.unpersist()
    return out


def sql_shingles(col: str, size: int = 3) -> str:
    toks = SQL_TOKENS.format(col=col)
    return (
        f"(CASE WHEN len({toks}) >= {size} THEN "
        f"list_transform(range(1, len({toks}) - {size - 2}),"
        f" i -> array_to_string(({toks})[i:i+{size - 1}], ' '))"
        f" ELSE [] END)"
    )


def sql_minhash_from_shingles(shingles_col: str, num_hashes: int = 8) -> str:
    """Signature expression over an (already computed) shingles column —
    meant for use inside a CTE pipeline mirroring lsh_candidate_pairs."""
    mins = ", ".join(
        f"list_min(list_transform({shingles_col}, s -> md5('{k}|' || s)))"
        for k in range(num_hashes)
    )
    return f"[{mins}]"


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16  # md5 hex nibbles 1..4


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """16-bit SimHash per document: bit b is 1 when the majority of token
    hashes have bit b set (md5 nibble arithmetic; ties -> 0).  Tokens are
    weighted by occurrence (duplicates vote repeatedly).

    Plan: explode tokens -> one hash + 16 conditional sums in a single
    hash-aggregate -> recombine.  All codegen'd, one shuffle on the id.
    """
    from tsdb_parquet_spark.catalog import spread

    toks = spread(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t")
    )
    h = F.md5(F.col("t"))
    sums = []
    for b in range(SIMHASH_BITS):
        nib = F.substring(h, b // 4 + 1, 1)
        val = F.instr(F.lit(HEX), nib) - 1
        bit = (val / F.lit(2 ** (3 - b % 4))).cast("int") % 2
        sums.append(
            F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"s{b}")
        )
    voted = toks.groupBy(id_col).agg(*sums)
    out = F.lit(0)
    for b in range(SIMHASH_BITS):
        out = out + F.when(F.col(f"s{b}") > 0,
                           F.lit(1 << (SIMHASH_BITS - 1 - b))).otherwise(0)
    return voted.select(F.col(id_col), out.cast("long").alias("simhash"))


def simhash_near_duplicates(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
    eager: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance, banded.

    The 16-bit signature splits into ``bands`` equal slices; a pair
    becomes a candidate when ANY slice matches exactly, then the exact
    Hamming distance (``bit_count(xor)``) filters to ``<= max_hamming``.
    By pigeonhole, any pair within ``bands - 1`` differing bits shares at
    least one identical band — so for ``max_hamming < bands`` the
    candidate generation is COMPLETE, not probabilistic (the classic
    Manku/Jain/Sarma web-dedup construction).

    Plan shape mirrors the other pair generators: explode to (band,
    band-bits) buckets, bucket self-equi-join, distinct, integer verify
    — never all-pairs.  Output: (doc_a, doc_b, hamming), doc_a < doc_b.
    """
    if SIMHASH_BITS % bands:
        raise ValueError(f"{bands} bands do not split {SIMHASH_BITS} bits")
    width = SIMHASH_BITS // bands
    sigs = simhash(docs, id_col=id_col, text_col=text_col)
    mask = (1 << width) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.expr(
                    f"(simhash div {1 << ((bands - 1 - j) * width)}) % {mask + 1}"
                ).alias("bits"),
            )
            for j in range(bands)
        ]
    )
    buckets = (
        sigs.select(id_col, "simhash", F.explode(band_structs).alias("b"))
        .select(
            id_col,
            "simhash",
            F.col("b.band").alias("band"),
            F.col("b.bits").alias("bits"),
        )
        .persist()
    )
    left = buckets.select(
        F.col(id_col).alias("doc_a"),
        F.col("simhash").alias("__ha"),
        "band",
        "bits",
    )
    right = buckets.select(
        F.col(id_col).alias("doc_b"),
        F.col("simhash").alias("__hb"),
        "band",
        "bits",
    )
    pairs = (
        left.join(right, ["band", "bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(
                F.expr("cast(__ha as long) ^ cast(__hb as long)")
            ).cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    if eager:
        # bound executor storage for repeated calls (same trade as
        # lsh_candidate_pairs): materialize the small pair set, drop the
        # bucket cache
        pairs = pairs.localCheckpoint(eager=True)
        buckets.unpersist()
    return pairs


def sql_simhash_near_duplicates(
    table: str,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
) -> str:
    """Oracle twin of :func:`simhash_near_duplicates` (pure integer ops —
    no float hazard anywhere)."""
    width = SIMHASH_BITS // bands
    mask = (1 << width) - 1
    band_rows = " UNION ALL ".join(
        f"SELECT {id_col}, simhash, {j} AS band,"
        f" (simhash // {1 << ((bands - 1 - j) * width)}) % {mask + 1} AS bits"
        " FROM sigs"
        for j in range(bands)
    )
    return f"""
WITH sigs AS ({sql_simhash(table, id_col, text_col)}),
buckets AS ({band_rows}),
pairs AS (
  SELECT DISTINCT a.{id_col} AS doc_a, b.{id_col} AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bits = b.bits AND a.{id_col} < b.{id_col}
)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= {max_hamming}"""


def sql_simhash(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    toks = SQL_TOKENS.format(col=text_col)
    bit_sums = []
    for b in range(SIMHASH_BITS):
        nib = f"substr(md5(t), {b // 4 + 1}, 1)"
        val = f"(strpos('{HEX}', {nib}) - 1)"
        bit = f"(({val} // {2 ** (3 - b % 4)}) % 2)"
        bit_sums.append(
            f"sum(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS s{b}"
        )
    terms = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << (SIMHASH_BITS - 1 - b)} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({toks}) AS t FROM {table}
), voted AS (
  SELECT {id_col}, {', '.join(bit_sums)} FROM toks GROUP BY {id_col}
)
SELECT {id_col}, CAST({terms} AS BIGINT) AS simhash FROM voted"""


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def jaccard_similarity(text_a: Column, text_b: Column, size: int = 3) -> Column:
    """Exact Jaccard over distinct word w-shingles (|A∩B| / |A∪B|)."""
    a = F.array_distinct(shingles(text_a, size))
    b = F.array_distinct(shingles(text_b, size))
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def verify_pairs_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Refine LSH candidates with exact Jaccard (two broadcast-able joins
    against the docs table keyed by id — no O(n^2) stage).  Distinct
    shingle sets are materialized per doc BEFORE the join so the expensive
    shingling runs once per document, not four times per pair."""
    from tsdb_parquet_spark.catalog import spread

    sh = spread(docs).select(
        F.col(id_col),
        F.array_distinct(shingles(F.col(text_col), size)).alias("__sh"),
    )
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("__sh").alias("__sa"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("__sh").alias("__sb"))
    joined = pairs.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = F.size(F.array_union("__sa", "__sb")).cast("double")
    out = joined.select(
        "doc_a",
        "doc_b",
        F.round(
            F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 4
        ).alias("jaccard"),
    )
    return out.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# Exact-substring (repeated n-gram span) dedup
# ---------------------------------------------------------------------------


def _window_hash_expr(text_col: str, size: int) -> Column:
    """``array<bigint>`` of xxhash64 over every ``size``-token window —
    THE window rule, shared by the ExactSubstr stats and removal
    operators so it can never diverge between them (their oracles both
    assume the same rule over raw window strings)."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    return F.when(
        n >= size,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(size - 1)),
            lambda i: F.xxhash64(F.slice(toks, i, size)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def _shared_windows(ex: DataFrame, id_col: str) -> DataFrame:
    """Window hashes occurring in >= 2 docs: min(doc) != max(doc) —
    map-side-combining folds, never a count(distinct)."""
    return (
        ex.groupBy("__g")
        .agg(F.min(id_col).alias("__lo"), F.max(id_col).alias("__hi"))
        .filter(F.col("__lo") != F.col("__hi"))
        .select("__g")
    )


def duplicated_ngram_spans(
    docs: DataFrame,
    size: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    eager: bool = True,
) -> DataFrame:
    """Exact-substring duplication stats (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499): for
    every document, how many of its ``size``-token windows also occur in
    ANOTHER document — the signal their suffix-array ExactSubstr pass
    uses to cut repeated spans out of training text.

    Returns ``(id_col, n_shingles, n_dup_shingles, dup_ratio)`` for every
    doc with >= ``size`` tokens; each OCCURRENCE of a shared window
    counts, so ``dup_ratio`` approximates the fraction of the doc covered
    by text that exists elsewhere in the corpus.

    Scale shape: instead of a distributed suffix array, one explode +
    one groupBy on the window key: a window is "shared" iff
    min(doc) != max(doc) over its occurrences — min/max fold map-side
    (partial aggregation), unlike a count(distinct doc).  Window keys
    are ``xxhash64`` of the token-array slice (exact_dedup's digest
    trick): the exploded/shuffled/joined rows carry 8-byte longs, never
    window strings — at 100 TB that is ~5× less shuffle IO, and the
    concat of window text is never materialized at all.  (The DuckDB
    oracle groups the raw window strings; results agree absent a 64-bit
    collision, ~1e-7 at a billion distinct windows.)
    """
    # NO filter anywhere before the exchange: a deterministic filter on
    # the hash arrays gets predicate-pushed below the repartition,
    # dragging the whole tokenize+hash expression into the narrow scan
    # stage (serial) and re-evaluating it post-exchange — measured 4x
    # slower.  Both consumers (occurrences AND totals) derive from the
    # explode, which drops empty arrays on its own, so no size filter
    # exists to push down in either eager mode.
    from tsdb_parquet_spark.catalog import spread

    sh = spread(docs).select(
        F.col(id_col), _window_hash_expr(text_col, size).alias("__sh")
    )
    if eager:
        # the window arrays feed multiple consumers; truncating lineage
        # here hashes each doc once and keeps downstream plans small
        sh = sh.localCheckpoint(eager=True)
    ex = sh.select(F.col(id_col), F.explode("__sh").alias("__g"))
    shared = _shared_windows(ex, id_col)
    dup_counts = (
        ex.join(shared, "__g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_shingles"))
    )
    totals = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    return (
        totals.join(dup_counts, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_shingles"),
            F.coalesce(F.col("n_dup_shingles"), F.lit(0)).cast("long").alias(
                "n_dup_shingles"
            ),
            F.round(
                F.coalesce(F.col("n_dup_shingles"), F.lit(0))
                / F.col("n_shingles"),
                4,
            ).alias("dup_ratio"),
        )
    )


def sql_duplicated_ngram_spans(
    table: str = "documents",
    size: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle twin of :func:`duplicated_ngram_spans` — identical
    tokenize/shingle expressions, identical shared-window rule."""
    sh = sql_shingles(text_col, size)
    return f"""
WITH t AS (
  SELECT {id_col}, {sh} AS sh FROM {table}
),
docs AS (SELECT {id_col}, sh FROM t WHERE len(sh) > 0),
ex AS (SELECT {id_col}, unnest(sh) AS g FROM docs),
shared AS (
  SELECT g FROM ex GROUP BY g HAVING min({id_col}) <> max({id_col})
),
dupc AS (
  SELECT {id_col}, count(*) AS n_dup FROM ex JOIN shared USING (g)
  GROUP BY {id_col}
)
SELECT d.{id_col},
       CAST(len(d.sh) AS BIGINT) AS n_shingles,
       CAST(coalesce(dupc.n_dup, 0) AS BIGINT) AS n_dup_shingles,
       round(coalesce(dupc.n_dup, 0) * 1.0 / len(d.sh), 4) AS dup_ratio
FROM docs d LEFT JOIN dupc USING ({id_col})
"""


def remove_duplicated_spans(
    docs: DataFrame,
    size: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ExactSubstr REMOVAL (arXiv:2107.06499 §4.2): cut every token run
    covered by a ``size``-token window that also occurs in another
    document, and rebuild the text from the surviving tokens.

    Returns ``(id_col, clean_text, n_tokens, n_removed)`` for every doc
    (docs shorter than ``size`` tokens pass through untouched).

    Scale shape: same explode + min/max-groupBy skeleton as
    :func:`duplicated_ngram_spans` (8-byte window hashes, map-side
    combine), then covered window STARTS aggregate per doc (a
    collect_set of ints, bounded by tokens-per-doc) and the rebuild is
    one codegen filter over the token array — coverage membership is an
    exists() over starts per token, O(tokens x covered) inside the JVM;
    documents never concatenate through Python.
    """
    from tsdb_parquet_spark.catalog import spread

    base = (
        spread(docs)
        .select(
            F.col(id_col),
            tokens(F.col(text_col)).alias("__toks"),
            _window_hash_expr(text_col, size).alias("__sh"),
        )
        .localCheckpoint(eager=True)
    )
    ex = base.select(
        F.col(id_col), F.posexplode("__sh").alias("__p", "__g")
    )
    shared = _shared_windows(ex, id_col)
    covered = (
        ex.join(shared, "__g")
        .groupBy(id_col)
        .agg(F.collect_set("__p").alias("__starts"))
    )
    joined = base.join(covered, id_col, "left").select(
        F.col(id_col),
        F.col("__toks"),
        F.coalesce(F.col("__starts"), F.array().cast("array<int>")).alias(
            "__starts"
        ),
    )
    keep = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(
            F.col("__starts"),
            lambda p: (i >= p) & (i < p + F.lit(size)),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", keep).alias("clean_text"),
        F.size("__toks").cast("long").alias("n_tokens"),
        (F.size("__toks") - F.size(keep)).cast("long").alias("n_removed"),
    )


def sql_remove_duplicated_spans(
    table: str = "documents",
    size: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle twin of :func:`remove_duplicated_spans`: windows as
    raw strings (vs the engine's 64-bit hashes), same 0-based starts,
    same coverage rule, same rebuild."""
    toks_expr = SQL_TOKENS.format(col=text_col)
    return f"""
WITH t AS (
  SELECT {id_col}, {toks_expr} AS toks FROM {table}
),
w AS (
  SELECT {id_col},
         CASE WHEN len(toks) >= {size} THEN
           list_transform(range(1, len(toks) - {size - 2}),
             i -> struct_pack(p := i - 1,
                              g := array_to_string(toks[i:i+{size - 1}], ' ')))
         ELSE [] END AS wins
  FROM t
),
ex AS (SELECT {id_col}, unnest(wins, recursive := true) FROM w),
shared AS (
  SELECT g FROM ex GROUP BY g HAVING min({id_col}) <> max({id_col})
),
cov AS (
  SELECT {id_col}, list(DISTINCT p) AS starts
  FROM ex JOIN shared USING (g) GROUP BY {id_col}
),
j AS (
  SELECT t.{id_col}, t.toks, coalesce(cov.starts, []) AS starts
  FROM t LEFT JOIN cov USING ({id_col})
),
r AS (
  SELECT {id_col}, toks, starts,
         list_filter(
           list_transform(range(1, len(toks) + 1),
             i -> CASE WHEN len(list_filter(starts,
                        p -> i - 1 >= p AND i - 1 < p + {size})) > 0
                  THEN NULL ELSE toks[i] END),
           x -> x IS NOT NULL) AS kept
  FROM j
)
SELECT {id_col},
       coalesce(array_to_string(kept, ' '), '') AS clean_text,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(toks) - len(kept) AS BIGINT) AS n_removed
FROM r
"""
