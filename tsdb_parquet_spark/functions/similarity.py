"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring how ANN is deployed over huge corpora:

- **brute-force cosine top-k** — the exact baseline: one scan, the dot
  product evaluated JVM-side with higher-order functions (zip_with +
  aggregate, inside codegen), a single top-k sort of scalar scores.  At
  100 TB this is the per-partition inner loop of any IVF/LSH refine step.
- **random-hyperplane LSH buckets** — the scale path: each vector gets a
  b-bit signature (sign of dot with b fixed hyperplanes); candidates are
  vectors sharing the query's bucket, then exact cosine re-ranks the
  bucket.  The hyperplanes are deterministic +-1 matrices derived from md5
  in Python, embedded as literals, so the DuckDB oracle reproduces the
  bucketing exactly.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (same accumulation order as the
    oracle's list_sum over the zipped products)."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_scores_udf(query_vec: Sequence[float]):
    """Arrow-batched cosine against a fixed query: ``udf(vec) ->
    double``.  Bit-identical to the interpreted
    ``dot(v,q)/(norm(v)*norm(q))`` fold (and so to the SQL oracle): the
    dimension-axis Python loop preserves the fold's left-assoc
    accumulation for both the cross-dot and the self-dot, and IEEE-754
    sqrt / multiply / divide are correctly rounded in every engine.  One
    Arrow pass replaces three interpreted folds per row."""
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    qn_acc = 0.0
    for x in q:  # left-assoc, matching norm(q)'s fold
        qn_acc = qn_acc + x * x
    qn = float(np.sqrt(qn_acc))

    @pandas_udf("double")
    def _scores(v: pd.Series) -> pd.Series:
        n = len(v)
        if n == 0:
            return pd.Series([], dtype="float64")
        mat = np.asarray(
            [np.asarray(x, dtype=np.float64) for x in v], dtype=np.float64
        )
        dot_acc = np.zeros(n, dtype=np.float64)
        self_acc = np.zeros(n, dtype=np.float64)
        for i in range(q.shape[0]):
            col = mat[:, i]
            dot_acc += col * q[i]
            self_acc += col * col
        denom = np.sqrt(self_acc) * qn
        out = np.where(denom > 0, dot_acc / np.where(denom > 0, denom, 1.0), 0.0)
        return pd.Series(out)

    return _scores


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: Sequence[int] = (),
) -> DataFrame:
    """Exact top-k by cosine against a fixed query vector.  Scores are
    rounded to 4 decimals BEFORE ranking and ties break on the id, making
    the result deterministic across engines and partitionings."""
    score = cosine_scores_udf(query_vec)
    scored = df.select(
        F.col(id_col), F.round(score(F.col(vec_col)), 4).alias("cos_sim")
    )
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(*[int(i) for i in exclude_ids]))
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


#: Default occupancy target for :func:`near_duplicate_pairs` — the
#: operating point the sf1 growth probe measured flat (1.13x wall per
#: 10x data) where the fixed-8-bit configuration measured ~n^2 (4.55x).
NEAR_DUP_TARGET_BUCKET_ROWS = 16


def derived_bits_per_band(
    n_rows: int,
    target_bucket_rows: int,
    floor: int = 8,
    cap: int = 28,
) -> int:
    """Bucket width that keeps expected occupancy ~``target_bucket_rows``:
    ``ceil(log2(n / target))`` clamped to [floor, cap].  Shared by the
    engine and the DuckDB oracle (:func:`sql_derived_bits`) so both sides
    bucket identically at any corpus size."""
    import math

    derived = math.ceil(
        math.log2(max(2.0, n_rows / float(target_bucket_rows)))
    )
    return min(cap, max(floor, derived))


def near_duplicate_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eager: bool = True,
    bands: int = 4,
    bits_per_band: int = 8,
    seed: str = "ann-lsh",
    target_bucket_rows: int | None = NEAR_DUP_TARGET_BUCKET_ROWS,
    n_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b).

    Multi-band LSH: each vector gets ``bands`` independent signatures of
    ``bits_per_band`` hyperplane sign bits; a pair becomes a candidate
    when ANY band's signature matches, then exact cosine re-ranks (so
    precision is exact, banding only governs recall).  Versus a single
    full-signature bucket this fixes two 100 TB problems:

    - **boundary under-recall**: one near-boundary hyperplane flips one
      bit and a true near-dup silently vanishes from a single bucket —
      at cos 0.99 a 32-bit exact-match bucket misses ~1-sign_agree^32 of
      true pairs, while 4-of-32 banding misses ~(1-p^8)^4 ≈ 1e-4;
    - **hot-bucket skew**: a dense region maps to one giant bucket; with
      bands the join key is (band, 8-bit content hash), so density
      spreads over bands x 2^bits_per_band keys.

    Plan: signature (no shuffle, per-row fold) -> explode to (band, sig)
    -> self-equi-join per bucket -> distinct pair ids -> two id-keyed
    joins back to the vectors for the exact re-rank.  Never all-pairs.

    ``eager`` trades like :func:`~tsdb_parquet_spark.functions.dedup.
    lsh_candidate_pairs`: True bounds executor storage for repeated calls
    (checkpoint + unpersist), False is faster for single-shot consumers.

    **Scaling the bucket width — the DEFAULT.** At FIXED
    ``bits_per_band`` the expected bucket occupancy is n / 2^bits, so
    the per-band candidate pair count grows ~n²/2^bits — quadratic in
    corpus size (the sf1 growth probe measures 4.5x wall per 10x data
    at pinned 8 bits, vs 1.13x with occupancy targeting).  The default
    ``target_bucket_rows=NEAR_DUP_TARGET_BUCKET_ROWS`` therefore derives
    ``bits_per_band = clamp(ceil(log2(n / target)), floor=bits_per_band,
    cap=28)`` so occupancy — and with it per-bucket pair work per row —
    stays constant as the corpus grows.  Wider bands trade a little
    recall (p^bits per band, compensated by the OR over bands; at
    cos>=0.99, 4 bands of 16 bits still catch ~98.7% of true pairs) for
    linear scaling.  Plane generation is prefix-stable in the plane
    index, so a SQL oracle can carry the cap-width plane matrix and
    slice per the same derived width (:func:`sql_derived_bits` /
    :func:`sql_sign_bits`).  Pass ``target_bucket_rows=None`` to pin
    ``bits_per_band`` exactly (recall experiments, tiny corpora).

    Deriving the width needs ``n``: pass ``n_rows`` if the caller
    already knows it (avoids re-running an expensive upstream lineage
    just to count — the size only tunes bucketing, so a cheap upper
    bound is fine).  Otherwise, with ``eager=True`` (default) the input
    is persisted FIRST, the count warms that cache, and the cache is
    dropped before returning — lineage runs once, nothing leaks.  With
    ``eager=False`` nothing is ever left persisted: the count runs on a
    column-pruned projection instead (one extra pass over the pruned
    input; pass ``n_rows`` to skip it).
    """
    from tsdb_parquet_spark.catalog import spread

    df = spread(df)
    df_cached: DataFrame | None = None
    if target_bucket_rows is not None:
        if n_rows is None:
            if eager:
                df = df_cached = df.persist()
                n_rows = df.count()
            else:
                # single-shot mode must not leak executor storage, so
                # no persist: count a pruned projection (id only)
                n_rows = df.select(id_col).count()
        bits_per_band = derived_bits_per_band(
            n_rows, target_bucket_rows, floor=bits_per_band
        )
    planes = hyperplanes(
        dim=_dim_hint(df, vec_col), bits=bands * bits_per_band, seed=seed
    )
    sig_udf = band_signature_udf(planes, bands)
    # persist the exploded buckets: the self-join would otherwise evaluate
    # the Arrow signature kernel once per join side
    buckets = (
        df.select(
            F.col(id_col),
            F.posexplode(sig_udf(F.col(vec_col))).alias("band", "sig"),
        )
        .persist()
    )
    left = buckets.select(
        F.col(id_col).alias("id_a"),
        F.col("band").alias("band_a"),
        F.col("sig").alias("sig_a"),
    )
    right = buckets.select(
        F.col(id_col).alias("id_b"),
        F.col("band").alias("band_b"),
        F.col("sig").alias("sig_b"),
    )
    pairs = (
        left.join(
            right,
            (F.col("band_a") == F.col("band_b"))
            & (F.col("sig_a") == F.col("sig_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # norms are precomputed per VECTOR (n rows), so the per-PAIR re-rank
    # needs one cross-dot fold instead of three — the pair set is the
    # larger side at any scale
    normed = df.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("__n")
    )
    va = normed.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__n").alias("__na"),
    )
    vb = normed.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    denom = F.col("__na") * F.col("__nb")
    out = (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.when(denom > 0, dot(F.col("__va"), F.col("__vb")) / denom)
                .otherwise(F.lit(0.0)),
                4,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    if eager:
        # materialize the (small) pair set, then drop the bucket cache so
        # repeated calls don't leak storage memory
        out = out.localCheckpoint(eager=True)
        buckets.unpersist()
        if df_cached is not None:
            df_cached.unpersist()
    return out


# ---------------------------------------------------------------------------
# random-hyperplane LSH
# ---------------------------------------------------------------------------


def hyperplanes(dim: int, bits: int = 8, seed: str = "ann-lsh") -> list[list[int]]:
    """Deterministic +-1 hyperplanes from md5 — engine-independent (pure
    Python, embedded as literals on both sides)."""
    planes = []
    for j in range(bits):
        row = []
        for i in range(dim):
            digest = hashlib.md5(f"{seed}|{j}|{i}".encode()).hexdigest()
            row.append(1 if int(digest[0], 16) % 2 == 0 else -1)
        planes.append(row)
    return planes


def signature_column(vec: Column, planes: list[list[int]]) -> Column:
    """b-bit LSH signature as an integer: bit j = sign(vec . plane_j).

    Reference semantics (and the oracle's SQL twin) — per element the
    interpreted HOF fold costs ~1 µs, so for the hot bucketing path use
    :func:`band_signature_udf`, which is bit-identical (asserted in
    ``tests/test_functions.py``) but Arrow-batched."""
    sig = F.lit(0).cast("long")
    bits = len(planes)
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        sig = sig + F.when(dot(vec, p) > 0, F.lit(1 << (bits - 1 - j))).otherwise(0)
    return sig.cast("long")


def band_signature_udf(
    planes: list[list[int]], bands: int
) -> Callable[[Column], Column]:
    """Arrow-batched twin of :func:`signature_column`, all bands at once:
    ``udf(vec) -> array<bigint>`` of ``bands`` signatures.

    The kernel accumulates each dot product in the SAME left-associative
    element order as the HOF fold and the oracle's ``list_sum`` (a Python
    loop over the dimension axis, vectorized across rows and planes), so
    every sign bit — and therefore every bucket assignment — is
    bit-identical to the interpreted version while the per-row cost drops
    from bits*dim interpreted ops to dim numpy AXPYs per batch.  This is
    the scale path: signatures for a 100 TB corpus are one Arrow pass,
    no shuffle."""
    bits = len(planes)
    if bits % bands:
        raise ValueError(f"{bits} plane rows do not split into {bands} bands")
    bpb = bits // bands
    P = np.asarray(planes, dtype=np.float64)  # (bits, dim)
    weights = (1 << np.arange(bpb - 1, -1, -1)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def _sigs(v: pd.Series) -> pd.Series:
        n = len(v)
        if n == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray(
            [np.asarray(x, dtype=np.float64) for x in v], dtype=np.float64
        )  # (n, dim)
        acc = np.zeros((n, bits), dtype=np.float64)
        for i in range(P.shape[1]):  # sequential in i == the fold's order
            acc += mat[:, i : i + 1] * P[np.newaxis, :, i]
        sig_bits = (acc > 0).astype(np.int64).reshape(n, bands, bpb)
        sigs = sig_bits @ weights  # (n, bands)
        return pd.Series([row.tolist() for row in sigs])

    return _sigs


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    exclude_ids: Sequence[int] = (),
) -> DataFrame:
    """ANN: filter to the query's LSH bucket, exact-cosine re-rank inside
    it.  The bucket predicate prunes ~2^-bits of the corpus before any
    arithmetic-heavy work."""
    planes = hyperplanes(dim=len(query_vec), bits=bits)
    qsig = _py_signature(query_vec, planes)
    sig = F.element_at(band_signature_udf(planes, bands=1)(F.col(vec_col)), 1)
    candidates = df.filter(sig == F.lit(qsig))
    return brute_force_topk(
        candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col,
        exclude_ids=exclude_ids,
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer -> inverted lists -> nprobe
# ---------------------------------------------------------------------------


def ivf_centroids(
    dim: int, n_centroids: int = 8, seed: str = "ivf"
) -> list[list[float]]:
    """Deterministic pseudo-random centroids in [-1, 1) from md5 — the
    coarse quantizer is a shared constant, so the DuckDB oracle can
    reproduce every assignment (a data-learned k-means codebook would be
    a driver-side artifact with exactly the same plan shape)."""
    cents = []
    for j in range(n_centroids):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}|{j}|{i}".encode()).hexdigest()[:8]
            row.append(int(h, 16) / 16**8 * 2.0 - 1.0)
        cents.append(row)
    return cents


def _inv_norms(centroids: list[list[float]]) -> list[float]:
    """1/|c_j| computed with the same left-assoc accumulation as every
    other dot in this module."""
    out = []
    for c in centroids:
        acc = 0.0
        for x in c:
            acc = acc + x * x
        out.append(1.0 / acc**0.5 if acc > 0 else 0.0)
    return out


def centroid_assign_udf(centroids: list[list[float]]):
    """Arrow-batched coarse-quantizer assignment: ``udf(vec) -> int``
    index of the centroid with the highest scaled dot
    ``dot(v, c_j) / |c_j|`` (argmax of cosine — |v| is a positive
    per-row constant), ties to the lowest index.  The dimension-axis
    Python loop keeps the accumulation order identical to the SQL
    twin (:func:`sql_centroid_assign`), so assignments are bit-exact
    across engines."""
    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    inv = np.asarray(_inv_norms(centroids), dtype=np.float64)

    @pandas_udf(LongType())
    def _assign(v: pd.Series) -> pd.Series:
        n = len(v)
        if n == 0:
            return pd.Series([], dtype="int64")
        mat = np.asarray(
            [np.asarray(x, dtype=np.float64) for x in v], dtype=np.float64
        )
        acc = np.zeros((n, C.shape[0]), dtype=np.float64)
        for i in range(C.shape[1]):  # sequential == the fold's order
            acc += mat[:, i : i + 1] * C[np.newaxis, :, i]
        acc *= inv[np.newaxis, :]
        return pd.Series(np.argmax(acc, axis=1))  # first max on ties

    return _assign


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 5,
    nprobe: int = 2,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "ivf",
    exclude_ids: Sequence[int] = (),
) -> DataFrame:
    """IVF ANN search: assign every vector to its nearest centroid
    (inverted lists), probe the ``nprobe`` centroids nearest the query,
    exact-cosine re-rank inside the probed lists.

    Scale path: the assignment is one Arrow pass (in a real deployment
    it is precomputed and the store is partitioned by it, so a probe
    prunes ~(1 - nprobe/n_centroids) of the corpus BEFORE any scan via
    partition pruning); the re-rank touches only the probed lists."""
    cents = ivf_centroids(dim=len(query_vec), n_centroids=n_centroids, seed=seed)
    probes = query_probes(query_vec, cents, nprobe)
    assign = centroid_assign_udf(cents)
    cand = df.filter(assign(F.col(vec_col)).isin(probes))
    return brute_force_topk(
        cand, query_vec, k=k, id_col=id_col, vec_col=vec_col,
        exclude_ids=exclude_ids,
    )


def build_ivf_store(
    df: DataFrame,
    dest_dir: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Materialize the inverted-file layout `ivf_topk`'s docstring
    promises: one Arrow assignment pass, then parquet hive-partitioned
    by ``centroid=`` — each inverted list is a partition DIRECTORY, so a
    probe never reads (or even lists the footers of) non-probed lists.
    At 100 TB this is the difference between 'filter after scan' and
    'scan 2/8 of the corpus': driver-side directory pruning before any
    IO.  The codebook is the caller's (learned via
    :func:`train_ivf_centroids` or the deterministic
    :func:`ivf_centroids` init)."""
    assign = centroid_assign_udf(centroids)
    (
        df.select(id_col, vec_col, assign(F.col(vec_col)).alias("centroid"))
        # one file per inverted list: lists are read whole by probes, and
        # a shuffle by centroid makes each output partition one list
        .repartition(len(centroids), "centroid")
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(dest_dir)
    )
    return dest_dir


def ivf_store_topk(
    spark,
    store_dir: str,
    query_vec: Sequence[float],
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: Sequence[int] = (),
) -> DataFrame:
    """ANN top-k over a :func:`build_ivf_store` layout: the probe set is
    computed driver-side from constants, lands as a partition filter
    (``centroid IN (...)`` on the hive partition column — visible as
    PartitionFilters in the scan, zero data files touched outside the
    probed lists), then exact cosine re-ranks the survivors."""
    probes = query_probes(query_vec, centroids, nprobe)
    cand = spark.read.parquet(store_dir).filter(
        F.col("centroid").isin([int(p) for p in probes])
    )
    return brute_force_topk(
        cand.select(id_col, vec_col),
        query_vec,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        exclude_ids=exclude_ids,
    )


def query_probes(
    query_vec: Sequence[float], centroids: list[list[float]], nprobe: int
) -> list[int]:
    """The nprobe centroid ids nearest the query (driver-side, O(k*dim));
    a pure function of constants, so both engines receive the same
    literal probe set."""
    scored = []
    for j, (c, iv) in enumerate(zip(centroids, _inv_norms(centroids))):
        acc = 0.0
        for x, y in zip(query_vec, c):
            acc = acc + float(x) * y
        scored.append((-(acc * iv), j))
    return [j for _, j in sorted(scored)[:nprobe]]


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "first",
    eager: bool = True,
    max_cluster_rows: int | None = 1_000_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings by nearest centroid, then drop
    near-identical vectors WITHIN clusters only.

    Returns one row per input vector: ``(id_col, cluster, dropped)``.
    Two deterministic keep policies:

    - ``keep="first"``: a vector is dropped when a LOWER-id vector in
      the same cluster has cosine >= ``threshold`` — the simplest
      deterministic rule, and fully SQL-oracle-expressible.
    - ``keep="farthest"``: the paper's default — within each ε-ball
      keep the example with LOW similarity to its cluster centroid
      (arXiv:2303.09540 §3: "keep examples with low cosine similarity
      to cluster centroids").  A vector is dropped when a neighbor at
      >= ``threshold`` has a strictly lower centroid-cosine (ties fall
      back to lower id), so exactly the boundary examples survive.

    Scale shape: the O(n²) pairwise cosine never materializes globally —
    the self-join key is the int cluster id, so exact arithmetic runs
    only inside clusters.  k is chosen proportional to corpus size (the
    paper uses k = 11,000 for LAION-440M, keeping clusters ~40k vectors)
    so per-cluster pair counts stay bounded; each side shuffles once on
    the cluster key, and the assignment itself is the IVF coarse pass
    (:func:`centroid_assign_udf`, one Arrow map, no shuffle).  Cosine is
    the same codegen zip_with/aggregate fold as the ANN paths, with
    per-vector norms precomputed so each pair costs one cross-dot.

    ``max_cluster_rows`` enforces that shape: the within-cluster join is
    O(max_cluster²) pairs PER cluster, so a fixed small centroid list on
    a grown corpus silently goes quadratic.  Before the join runs, a
    1-row aggregate checks the largest cluster and raises ``ValueError``
    (naming the offending cluster, its size, and the k ≈ n/40_000 the
    paper's 40k-vector clusters imply) when it exceeds the bound.  Pass
    ``None`` to skip the check (one extra cheap job) on inputs whose
    clustering is already validated.
    """
    if keep not in ("first", "farthest"):
        raise ValueError(f"keep must be 'first' or 'farthest', got {keep!r}")
    from tsdb_parquet_spark.catalog import spread

    assign = centroid_assign_udf(centroids)
    cols = [
        F.col(id_col),
        F.col(vec_col),
        assign(F.col(vec_col)).alias("cluster"),
        norm(F.col(vec_col)).alias("__n"),
    ]
    if keep == "farthest":
        # cosine to own centroid: rank within the ε-ball so the example
        # FARTHEST from the centroid survives (paper default)
        cents_l = F.array(
            *[
                F.array(*[F.lit(float(x)) for x in c])
                for c in centroids
            ]
        )
        own = F.element_at(cents_l, F.col("cluster").cast("int") + 1)
        cols.append(
            F.when(
                F.col("__n") * norm(own) > 0,
                dot(F.col(vec_col), own) / (F.col("__n") * norm(own)),
            )
            .otherwise(F.lit(0.0))
            .alias("__ccos")
        )
    # persist: the frame feeds both self-join sides AND the output, so
    # without it the Arrow assign kernel would run three times
    base = spread(df).select(*cols).persist()
    if max_cluster_rows is not None:
        # guard the O((n/k)²) inner join: a 2-row driver aggregate over
        # the already-persisted frame (no extra scan of the input)
        stats = base.groupBy("cluster").count().agg(
            F.max_by("cluster", "count").alias("cluster"),
            F.max("count").alias("n"),
            F.sum("count").alias("total"),
        ).collect()[0]
        if stats["n"] is not None and stats["n"] > max_cluster_rows:
            base.unpersist()
            want_k = max(len(centroids), int(stats["total"]) // 40_000 + 1)
            raise ValueError(
                f"semantic_dedup: cluster {stats['cluster']} holds "
                f"{stats['n']} vectors (> max_cluster_rows="
                f"{max_cluster_rows}); the within-cluster pairwise join "
                f"would generate ~{int(stats['n']) ** 2:.0e} pairs. "
                f"Re-train with more centroids (k ≈ n/40_000 ≈ {want_k} "
                f"for this corpus, per arXiv:2303.09540) or raise "
                f"max_cluster_rows explicitly."
            )
    rank_cols = ["cluster", id_col, "__n", vec_col] + (
        ["__ccos"] if keep == "farthest" else []
    )
    a = base.select(
        *[F.col(c).alias(f"__a_{c}") for c in rank_cols]
    ).withColumnRenamed("__a_cluster", "cluster")
    b = base.select(
        *[F.col(c).alias(f"__b_{c}") for c in rank_cols]
    ).withColumnRenamed("__b_cluster", "cluster")
    denom = F.col(f"__a___n") * F.col(f"__b___n")
    cos = F.when(
        denom > 0,
        dot(F.col(f"__a_{vec_col}"), F.col(f"__b_{vec_col}")) / denom,
    ).otherwise(F.lit(0.0))
    if keep == "first":
        b_loses = F.col(f"__a_{id_col}") < F.col(f"__b_{id_col}")
    else:
        b_loses = (F.col("__a___ccos") < F.col("__b___ccos")) | (
            (F.col("__a___ccos") == F.col("__b___ccos"))
            & (F.col(f"__a_{id_col}") < F.col(f"__b_{id_col}"))
        )
    dropped = (
        a.join(b, ["cluster"])
        .filter(F.col(f"__a_{id_col}") != F.col(f"__b_{id_col}"))
        .filter(b_loses)
        .filter(cos >= F.lit(float(threshold)))
        .select(F.col(f"__b_{id_col}").alias(id_col))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    out = (
        base.select(id_col, "cluster")
        .join(dropped, id_col, "left")
        .select(
            F.col(id_col),
            F.col("cluster"),
            F.coalesce(F.col("__dropped"), F.lit(False)).alias("dropped"),
        )
    )
    if eager:
        # one verdict row per vector — small; materialize it and drop
        # the assigned-vectors cache so repeated calls don't accumulate
        # executor storage (same trade as near_duplicate_pairs)
        out = out.localCheckpoint(eager=True)
        base.unpersist()
    return out


def _py_signature(vec: Sequence[float], planes: list[list[int]]) -> int:
    bits = len(planes)
    sig = 0
    for j, plane in enumerate(planes):
        if sum(float(x) * p for x, p in zip(vec, plane)) > 0:
            sig |= 1 << (bits - 1 - j)
    return sig


def _dim_hint(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("d")).head(1)
    return int(row[0]["d"]) if row else 0


# ---------------------------------------------------------------------------
# DuckDB oracle fragments
# ---------------------------------------------------------------------------


def sql_dot(a: str, b: str, dim: int) -> str:
    return (
        f"list_sum(list_transform(range(1, {dim + 1}),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def sql_cosine(a: str, b: str, dim: int) -> str:
    d = sql_dot(a, b, dim)
    na = f"sqrt({sql_dot(a, a, dim)})"
    nb = f"sqrt({sql_dot(b, b, dim)})"
    return f"(CASE WHEN {na} * {nb} > 0 THEN {d} / ({na} * {nb}) ELSE 0.0 END)"


def sql_vector_literal(vec: Sequence[float]) -> str:
    return "[" + ", ".join(repr(float(x)) for x in vec) + "]"


def sql_band_signatures(
    vec_col: str, planes: list[list[int]], bands: int
) -> list[str]:
    """One signature expression per band (the oracle twin of the banded
    bucketing in :func:`near_duplicate_pairs`)."""
    bpb = len(planes) // bands
    return [
        sql_signature(vec_col, planes[j * bpb : (j + 1) * bpb])
        for j in range(bands)
    ]


def sql_derived_bits(
    count_expr: str,
    target_bucket_rows: int,
    floor: int = 8,
    cap: int = 28,
) -> str:
    """Oracle twin of :func:`derived_bits_per_band`: the same
    clamp(ceil(log2(n/target))) computed by DuckDB from a COUNT(*)
    expression, so the oracle's bucket width tracks the engine's at any
    corpus size instead of being pinned at authoring time."""
    return (
        f"LEAST({cap}, GREATEST({floor}, CAST(ceil(log2(GREATEST(2.0, "
        f"{count_expr} / {float(target_bucket_rows)!r}))) AS INTEGER)))"
    )


def sql_sign_bits(vec_col: str, planes: list[list[int]]) -> str:
    """Per-vector hyperplane sign bits as a DuckDB list (one 0/1 element
    per plane, plane order = generation order).  Because
    :func:`hyperplanes` is prefix-stable in the plane index, an oracle
    can emit this list at CAP width once and let
    :func:`sql_dynamic_band_signature` slice band j's bits out at the
    runtime-derived width — the bit for plane k is signs[k+1] regardless
    of how many planes the engine actually used.

    Emitted as ONE nested lambda over a single plane-matrix literal
    (not len(planes) separate CASE expressions): DuckDB evaluates the
    matrix literal once and the fold stays in one vectorized expression
    — measured ~300x faster at 112 planes.  Wrap the consuming CTE in
    ``AS MATERIALIZED`` so multi-referenced CTEs don't recompute it."""
    dim = len(planes[0])
    mat = (
        "["
        + ", ".join(sql_vector_literal(p) for p in planes)
        + "]"
    )
    return (
        f"list_transform({mat}, p -> CASE WHEN "
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> CAST({vec_col}[i] AS DOUBLE) * p[i])) > 0 "
        f"THEN 1 ELSE 0 END)"
    )


def sql_dynamic_band_signature(
    signs_col: str, band_expr: str, bits_expr: str
) -> str:
    """Band signature from a sign-bit list at a runtime bit width: band
    ``band_expr`` (0-based) at width ``bits_expr`` packs bits MSB-first
    exactly like :func:`band_signature_udf`'s weight vector
    (bit i weight 2^(b-1-i)), using planes [band*b, band*b+b)."""
    return (
        f"list_sum(list_transform(range(0, {bits_expr}), i -> "
        f"{signs_col}[{band_expr} * {bits_expr} + i + 1] * "
        f"CAST(round(pow(2, {bits_expr} - 1 - i)) AS BIGINT)))"
    )


def sql_centroid_dots(vec_col: str, centroids: list[list[float]]) -> str:
    """Oracle twin of :func:`centroid_assign_udf`'s scaled dots, as a
    DuckDB list: each element is the same left-assoc fold times the same
    inv-norm literal, so ``list_position(ds, list_max(ds)) - 1`` (first
    max, ties to lowest index) agrees with the Arrow kernel's argmax
    bit-for-bit.  Alias the list in a CTE to avoid recomputing it."""
    dim = len(centroids[0])
    invs = _inv_norms(centroids)
    ds = [
        f"({sql_dot(vec_col, sql_vector_literal(c), dim)} * {inv!r})"
        for c, inv in zip(centroids, invs)
    ]
    return "list_value(" + ", ".join(ds) + ")"


def sql_signature(vec_col: str, planes: list[list[int]]) -> str:
    bits = len(planes)
    terms = []
    for j, plane in enumerate(planes):
        p = sql_vector_literal(plane)
        d = sql_dot(vec_col, p, len(plane))
        terms.append(f"(CASE WHEN {d} > 0 THEN {1 << (bits - 1 - j)} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def train_ivf_centroids(
    df: DataFrame,
    dim: int,
    n_centroids: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    seed: str = "ivf",
    spherical: bool = True,
    tol: float = 1e-9,
) -> list[list[float]]:
    """Distributed Lloyd's k-means for the IVF coarse quantizer — the
    data-learned codebook the deterministic :func:`ivf_centroids` init
    stands in for when the oracle must reproduce assignments.

    Each iteration is one Arrow assignment pass plus one map-side-
    combining aggregation over (cluster, dimension) — k*dim groups, so
    the shuffle and the driver-side collect are O(k*dim) regardless of
    corpus size; the corpus itself is scanned once per iteration, the
    standard Lloyd's cost.  Empty clusters keep their previous centroid
    (k stays fixed).  Deterministic: md5-seeded init + argmax-of-cosine
    assignment with first-index tie-break.

    ``spherical=True`` (default) L2-normalizes each updated centroid so
    the update step optimizes the same cosine objective the assignment
    uses (spherical k-means); the normalization reuses the module's
    left-assoc accumulation so an unrolled SQL oracle can reproduce it.
    Convergence: stop early when no centroid coordinate moved by more
    than ``tol``; pass ``tol=0.0`` to run exactly ``iters`` iterations
    (bit-reproducible against a fixed-depth oracle)."""
    centroids = ivf_centroids(dim=dim, n_centroids=n_centroids, seed=seed)
    for _ in range(int(iters)):
        assign = centroid_assign_udf(centroids)
        stats = (
            df.select(
                assign(F.col(vec_col)).alias("__c"),
                F.posexplode(_as_double(F.col(vec_col))).alias("__i", "__x"),
            )
            .groupBy("__c", "__i")
            .agg(F.sum("__x").alias("__s"), F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        new = [list(c) for c in centroids]
        touched = set()
        for r in stats:
            new[r["__c"]][r["__i"]] = r["__s"] / r["__n"]
            touched.add(r["__c"])
        if spherical:
            inv = _inv_norms(new)
            new = [
                [x * inv[j] for x in c] if j in touched and inv[j] > 0 else c
                for j, c in enumerate(new)
            ]
        shift = max(
            (
                abs(a - b)
                for c_new, c_old in zip(new, centroids)
                for a, b in zip(c_new, c_old)
            ),
            default=0.0,
        )
        centroids = new
        if shift <= tol:
            break
    return centroids


# ---------------------------------------------------------------------------
# Product quantization (PQ): m-subspace codes + ADC top-k
# ---------------------------------------------------------------------------


def pq_codebooks(
    dim: int, m: int = 8, k: int = 16, seed: str = "pq"
) -> list[list[list[float]]]:
    """``m`` codebooks of ``k`` centroids over ``dim/m``-wide subspaces,
    md5-deterministic like :func:`ivf_centroids` (so the DuckDB oracle
    reproduces every code; a data-learned codebook via
    :func:`train_ivf_centroids` on vector slices drops in with the same
    plan shape)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    return [
        ivf_centroids(dim=sub, n_centroids=k, seed=f"{seed}|{s}")
        for s in range(m)
    ]


def _pq_codes(mat: "np.ndarray", mats: list["np.ndarray"]) -> "np.ndarray":
    """(n, dim) -> (n, m) int64 codes: per subspace the argmin of the
    sequential sum of squared differences (ties to the lowest code,
    np.argmin's first-occurrence == the oracle's first list_min
    position)."""
    sub = mats[0].shape[1]
    codes = np.empty((mat.shape[0], len(mats)), dtype=np.int64)
    for s, C in enumerate(mats):  # (k, sub)
        acc = np.zeros((mat.shape[0], C.shape[0]), dtype=np.float64)
        off = s * sub
        for i in range(sub):  # sequential == the oracle's list_sum
            d = mat[:, off + i : off + i + 1] - C[np.newaxis, :, i]
            acc += d * d
        codes[:, s] = np.argmin(acc, axis=1)
    return codes


def pq_encode_udf(codebooks: list[list[list[float]]]):
    """Arrow-batched PQ encoder: ``udf(vec) -> array<long>`` of ``m``
    codes."""
    mats = [np.asarray(cb, dtype=np.float64) for cb in codebooks]

    @pandas_udf(ArrayType(LongType()))
    def _encode(v: pd.Series) -> pd.Series:
        n = len(v)
        if n == 0:
            return pd.Series([], dtype="object")
        mat = np.asarray(
            [np.asarray(x, dtype=np.float64) for x in v], dtype=np.float64
        )
        return pd.Series(list(_pq_codes(mat, mats)))

    return _encode


def pq_residual_encode_udf(
    centroids: list[list[float]], codebooks: list[list[list[float]]]
):
    """Residual PQ encoder (Jégou et al. 2011, the FAISS IVFPQ default):
    ``udf(vec, centroid) -> array<long>`` codes of ``v - c[centroid]``.
    Residuals concentrate around the origin, so the SAME shared
    codebooks quantize them with far lower error than raw vectors —
    the accuracy step between q91's raw-code store and exact search."""
    cents = np.asarray(centroids, dtype=np.float64)
    mats = [np.asarray(cb, dtype=np.float64) for cb in codebooks]

    @pandas_udf(ArrayType(LongType()))
    def _encode(v: pd.Series, cent: pd.Series) -> pd.Series:
        n = len(v)
        if n == 0:
            return pd.Series([], dtype="object")
        mat = np.asarray(
            [np.asarray(x, dtype=np.float64) for x in v], dtype=np.float64
        )
        mat = mat - cents[cent.to_numpy(dtype=np.int64)]
        return pd.Series(list(_pq_codes(mat, mats)))

    return _encode


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Attach the ``m``-byte PQ code column — the 100 TB memory story:
    a 64-dim float32 vector (256 B) becomes m=8 codes (8 B), so the
    searchable corpus shrinks ~32x and the ADC scan below never touches
    the raw vectors."""
    enc = pq_encode_udf(codebooks)
    return df.withColumn(code_col, enc(F.col(vec_col)))


def pq_distance_tables(
    query_vec: Sequence[float], codebooks: list[list[list[float]]]
) -> list[list[float]]:
    """Driver-side ADC tables: per subspace, the squared L2 distance of
    the query's subvector to each centroid (sequential accumulation —
    pure constants shared verbatim with the oracle)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    tables = []
    for s in range(m):
        row = []
        for c in codebooks[s]:
            acc = 0.0
            for i in range(sub):
                d = float(query_vec[s * sub + i]) - c[i]
                acc = acc + d * d
            row.append(acc)
        tables.append(row)
    return tables


def pq_adc_distance(
    code_col: Column, tables: list[list[float]]
) -> Column:
    """Asymmetric-distance column: ``sum_s table_s[code_s]`` — a chain of
    JVM array literal lookups, whole-stage-codegen friendly, no Python
    in the query path."""
    dist = None
    for s, table in enumerate(tables):
        lut = F.array(*[F.lit(float(x)) for x in table])
        term = F.element_at(lut, (F.element_at(code_col, s + 1) + 1).cast("int"))
        dist = term if dist is None else dist + term
    return dist


def pq_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """ADC top-k over PQ codes: per-row distance is m table lookups (the
    tables are broadcast literals), then one global top-k sort of
    scalars — the same single-shuffle shape as brute-force cosine but
    over a ~32x smaller scan, ties broken by id for determinism."""
    tables = pq_distance_tables(query_vec, codebooks)
    return (
        df.select(id_col, pq_adc_distance(F.col(code_col), tables).alias("dist"))
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def sql_pq_distance_lists(
    vec_col: str, codebooks: list[list[list[float]]]
) -> list[str]:
    """Oracle twins of the encoder: per subspace, a DuckDB
    ``list_value(d_0, ..., d_{k-1})`` of squared-difference sums with the
    kernel's sequential accumulation order; the code is then
    ``list_position(ds, list_min(ds)) - 1`` (first min, ties to the
    lowest code — np.argmin's convention).  Alias each list in a CTE to
    avoid recomputing it."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    lists = []
    for s in range(m):
        ds = []
        for c in codebooks[s]:
            lit = sql_vector_literal(c)
            x = f"CAST({vec_col}[{s * sub} + i] AS DOUBLE)"
            ds.append(
                f"list_sum(list_transform(range(1, {sub + 1}), i ->"
                f" ({x} - CAST({lit}[i] AS DOUBLE))"
                f" * ({x} - CAST({lit}[i] AS DOUBLE))))"
            )
        lists.append("list_value(" + ", ".join(ds) + ")")
    return lists


# ---------------------------------------------------------------------------
# IVF-PQ: inverted lists of codes — no raw vectors at query time
# ---------------------------------------------------------------------------


def build_ivfpq_store(
    df: DataFrame,
    dest_dir: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
) -> str:
    """The FAISS-style IVF-PQ layout as a parquet store: one Arrow pass
    assigns the coarse centroid AND the PQ codes, then the store is
    hive-partitioned by ``centroid=`` holding ONLY (id, pq_code) — the
    raw vectors are not stored.  At 1e9+ vectors this is both the IO
    story (a probe prunes whole list directories at the driver) and the
    memory story (each row is m bytes of codes, ~32x smaller than
    float32 vectors)."""
    assign = centroid_assign_udf(centroids)
    assigned = df.select(
        id_col, F.col(vec_col), assign(F.col(vec_col)).alias("centroid")
    )
    if residual:
        enc = pq_residual_encode_udf(centroids, codebooks)
        coded = assigned.select(
            id_col,
            enc(F.col(vec_col), F.col("centroid")).alias("pq_code"),
            "centroid",
        )
    else:
        enc = pq_encode_udf(codebooks)
        coded = assigned.select(
            id_col, enc(F.col(vec_col)).alias("pq_code"), "centroid"
        )
    (
        coded.repartition(len(centroids), "centroid")
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(dest_dir)
    )
    return dest_dir


def ivfpq_topk(
    spark,
    store_dir: str,
    query_vec: Sequence[float],
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    residual: bool = False,
) -> DataFrame:
    """ANN top-k over a :func:`build_ivfpq_store`: the probe set lands as
    a PartitionFilter (non-probed lists never touched), then the ADC
    table-lookup sum scores the probed codes inside codegen — zero
    Python, zero raw-vector IO, one top-k sort of scalars."""
    probes = query_probes(query_vec, centroids, nprobe)
    cand = spark.read.parquet(store_dir).filter(
        F.col("centroid").isin([int(p) for p in probes])
    )
    if residual:
        # per-probe ADC tables on the RESIDUAL query (q - c_p); each
        # probed list scores against its own table set — still pure
        # literal lookups inside codegen, just nprobe CASE branches
        dist = None
        for p in probes:
            qr = [
                float(x) - float(c)
                for x, c in zip(query_vec, centroids[p])
            ]
            d_p = pq_adc_distance(
                F.col("pq_code"), pq_distance_tables(qr, codebooks)
            )
            cond = F.col("centroid") == int(p)
            dist = (
                F.when(cond, d_p) if dist is None else dist.when(cond, d_p)
            )
    else:
        dist = pq_adc_distance(
            F.col("pq_code"), pq_distance_tables(query_vec, codebooks)
        )
    return (
        cand.select(id_col, dist.alias("dist"))
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization (per-dimension affine int8 codes)
# ---------------------------------------------------------------------------


def sq8_train(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> tuple[list[float], list[float]]:
    """Per-dimension [min, max] ranges for SQ8 in ONE aggregation pass
    (2*dim map-side-combined min/max columns — no explode, no shuffle of
    vector data; the collected result is O(dim) on the driver)."""
    dim = dim or _dim_hint(df, vec_col)
    v = _as_double(F.col(vec_col))
    aggs = []
    for i in range(dim):
        aggs.append(F.min(F.element_at(v, i + 1)).alias(f"mn{i}"))
        aggs.append(F.max(F.element_at(v, i + 1)).alias(f"mx{i}"))
    row = df.agg(*aggs).head()
    mins = [float(row[f"mn{i}"]) for i in range(dim)]
    maxs = [float(row[f"mx{i}"]) for i in range(dim)]
    return mins, maxs


def _sq8_scales(mins: Sequence[float], maxs: Sequence[float]) -> list[float]:
    # 256 buckets over [mn, mx]; degenerate dims (mn == mx) get scale 1.0
    # so every value codes to 0
    return [
        (mx - mn) / 256.0 if mx > mn else 1.0
        for mn, mx in zip(mins, maxs)
    ]


def sq8_encode(
    vec: Column, mins: Sequence[float], maxs: Sequence[float]
) -> Column:
    """``array<int>`` of codes in [0, 255]: floor((x - mn) / scale),
    clamped — 4x smaller than float32 at rest, 8x smaller than the
    double the JVM would otherwise shuffle.  Pure codegen (transform
    over literal arrays), no Python."""
    scales = _sq8_scales(mins, maxs)
    mins_l = F.array(*[F.lit(float(m)) for m in mins])
    scales_l = F.array(*[F.lit(float(s)) for s in scales])
    return F.transform(
        _as_double(vec),
        lambda x, i: F.least(
            F.lit(255),
            F.greatest(
                F.lit(0),
                F.floor(
                    (x - F.element_at(mins_l, i + 1))
                    / F.element_at(scales_l, i + 1)
                ).cast("int"),
            ),
        ),
    )


def sq8_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    mins: Sequence[float],
    maxs: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric SQ8 search: vectors are stored/scored as int8 codes,
    the query stays full-precision.  Each dimension reconstructs as the
    bucket midpoint ``mn + (code + 0.5) * scale`` and dots against the
    query — one codegen fold over three literal arrays, no Python and no
    float vectors at query time.  Scores round to 4dp before ranking
    (deterministic ties on id).  `pq_topk`'s table-lookup trick applied
    to the simplest quantizer — the FAISS ``SQ8`` baseline that usually
    wins below ~1B vectors."""
    scales = _sq8_scales(mins, maxs)
    mins_l = F.array(*[F.lit(float(m)) for m in mins])
    scales_l = F.array(*[F.lit(float(s)) for s in scales])
    q_l = F.array(*[F.lit(float(x)) for x in query_vec])
    codes = sq8_encode(F.col(vec_col), mins, maxs)
    terms = F.transform(
        codes,
        lambda c, i: (
            F.element_at(mins_l, i + 1)
            + (c.cast("double") + F.lit(0.5)) * F.element_at(scales_l, i + 1)
        )
        * F.element_at(q_l, i + 1),
    )
    score = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    return (
        df.select(F.col(id_col), F.round(score, 4).alias("dot_approx"))
        .orderBy(F.col("dot_approx").desc(), F.col(id_col))
        .limit(k)
    )


def sql_sq8_topk(
    query_vec: Sequence[float],
    mins: Sequence[float],
    maxs: Sequence[float],
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> str:
    """DuckDB oracle twin of :func:`sq8_topk` over literal ranges."""
    scales = _sq8_scales(mins, maxs)
    terms = []
    for i, (mn, sc, qx) in enumerate(zip(mins, scales, query_vec)):
        code = (
            f"least(255, greatest(0, CAST(floor("
            f"(CAST({vec_col}[{i + 1}] AS DOUBLE) - {mn!r}) / {sc!r}"
            f") AS INT)))"
        )
        terms.append(f"(({mn!r} + (CAST({code} AS DOUBLE) + 0.5) * {sc!r}) * {float(qx)!r})")
    acc = terms[0]
    for t in terms[1:]:
        acc = f"({acc} + {t})"
    return (
        f"SELECT {id_col}, round({acc}, 4) AS dot_approx FROM {table} "
        f"ORDER BY dot_approx DESC, {id_col} LIMIT {k}"
    )


def sq8_topk_trained(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Train + search in ONE distributed plan: the per-dim [min, max]
    ranges come from a 1-row aggregate broadcast-joined onto the scan —
    no driver collect, so the whole train->encode->score chain is lazy,
    restartable, and identical on a 1000-executor cluster.  Codes
    reconstruct as bucket midpoints and dot against the full-precision
    query inside one codegen fold."""
    dim = dim or _dim_hint(df, vec_col)
    v = _as_double(F.col(vec_col))
    mm = df.agg(
        F.array(
            *[F.min(F.element_at(v, i + 1)) for i in range(dim)]
        ).alias("__mins"),
        F.array(
            *[F.max(F.element_at(v, i + 1)) for i in range(dim)]
        ).alias("__maxs"),
    )
    q_l = F.array(*[F.lit(float(x)) for x in query_vec])
    joined = df.crossJoin(F.broadcast(mm))
    mn_i = lambda i: F.element_at(F.col("__mins"), i + 1)  # noqa: E731
    sc_i = lambda i: F.when(  # noqa: E731
        F.element_at(F.col("__maxs"), i + 1) > mn_i(i),
        (F.element_at(F.col("__maxs"), i + 1) - mn_i(i)) / F.lit(256.0),
    ).otherwise(F.lit(1.0))
    terms = F.transform(
        _as_double(F.col(vec_col)),
        lambda x, i: (
            mn_i(i)
            + (
                F.least(
                    F.lit(255),
                    F.greatest(
                        F.lit(0),
                        F.floor((x - mn_i(i)) / sc_i(i)).cast("int"),
                    ),
                ).cast("double")
                + F.lit(0.5)
            )
            * sc_i(i)
        )
        * F.element_at(q_l, i + 1),
    )
    score = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    return (
        joined.select(F.col(id_col), F.round(score, 4).alias("dot_approx"))
        .orderBy(F.col("dot_approx").desc(), F.col(id_col))
        .limit(k)
    )


def sql_sq8_topk_trained(
    query_vec: Sequence[float],
    dim: int,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> str:
    """DuckDB oracle twin of :func:`sq8_topk_trained`: ranges recomputed
    from the data with the same min/max folds, same midpoint decode."""
    terms = []
    for i in range(dim):
        mn = f"mm.mins[{i + 1}]"
        mx = f"mm.maxs[{i + 1}]"
        sc = f"(CASE WHEN {mx} > {mn} THEN ({mx} - {mn}) / 256.0 ELSE 1.0 END)"
        x = f"CAST(e.{vec_col}[{i + 1}] AS DOUBLE)"
        code = (
            f"least(255, greatest(0, CAST(floor(({x} - {mn}) / {sc}) AS INT)))"
        )
        terms.append(
            f"(({mn} + (CAST({code} AS DOUBLE) + 0.5) * {sc}) "
            f"* {float(query_vec[i])!r})"
        )
    acc = terms[0]
    for t in terms[1:]:
        acc = f"({acc} + {t})"
    mins_list = ", ".join(
        f"min(CAST({vec_col}[{i + 1}] AS DOUBLE))" for i in range(dim)
    )
    maxs_list = ", ".join(
        f"max(CAST({vec_col}[{i + 1}] AS DOUBLE))" for i in range(dim)
    )
    return f"""WITH mm AS (
  SELECT [{mins_list}] AS mins, [{maxs_list}] AS maxs FROM {table}
)
SELECT e.{id_col}, round({acc}, 4) AS dot_approx
FROM {table} e, mm
ORDER BY dot_approx DESC, e.{id_col} LIMIT {k}"""
