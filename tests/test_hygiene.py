"""Corpus-hygiene operators: decontamination, repetition filters, PII
redaction, deterministic training order."""

import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.functions import decontaminate as DC
from tsdb_parquet_spark.functions import ordering as ORD
from tsdb_parquet_spark.functions import pii as PII
from tsdb_parquet_spark.functions import quality as QA


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_contamination_report_counts(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the dog")])
    corpus = _docs(
        spark,
        [
            (1, "a sentence with the quick brown fox inside it"),  # 1 4-gram
            (2, "quick brown fox jumps over something"),  # 2 distinct
            (3, "completely unrelated words here friend"),  # clean
        ],
    )
    rep = {
        r["doc_id"]: (r["n_gram_hits"], r["n_bench_docs"])
        for r in DC.contamination_report(corpus, bench, ngram=4).collect()
    }
    assert rep == {1: (1, 1), 2: (2, 1)}


def test_decontaminate_drops_flagged(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the dog")])
    corpus = _docs(
        spark,
        [
            (1, "a sentence with the quick brown fox inside it"),
            (3, "completely unrelated words here friend"),
        ],
    )
    kept = DC.decontaminate(corpus, bench, ngram=4).collect()
    assert [r["doc_id"] for r in kept] == [3]


def test_decontaminate_min_overlap_threshold(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the dog")])
    corpus = _docs(
        spark, [(1, "a sentence with the quick brown fox inside it")]
    )
    # doc 1 shares exactly one 4-gram; min_overlap=2 keeps it
    kept = DC.decontaminate(corpus, bench, ngram=4, min_overlap=2).collect()
    assert [r["doc_id"] for r in kept] == [1]


# ---------------------------------------------------------------------------
# repetition
# ---------------------------------------------------------------------------


def test_repetition_stats_exact(spark):
    # "ab ab ab ab" -> 3 bigrams, all "ab ab": dup_frac 2/3, top_share 1.0
    df = _docs(spark, [(1, "ab ab ab ab"), (2, "w x y z")])
    out = {r["doc_id"]: r for r in QA.repetition_stats(df).collect()}
    assert out[1]["n_grams"] == 3 and out[1]["n_distinct_grams"] == 1
    assert out[1]["dup_ngram_frac"] == pytest.approx(0.6667)
    assert out[1]["top_ngram_share"] == 1.0
    assert out[2]["dup_ngram_frac"] == 0.0


def test_repetitive_docs_cutoff_and_short_docs(spark):
    df = _docs(spark, [(1, "ab ab ab ab"), (2, "w x y z"), (3, "one")])
    flagged = QA.repetitive_docs(df, max_dup_frac=0.3).collect()
    assert [r["doc_id"] for r in flagged] == [1]
    # doc 3 has no bigrams at all -> absent from stats, never flagged
    assert 3 not in {
        r["doc_id"] for r in QA.repetition_stats(df).collect()
    }


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_redact_pii_all_kinds(spark):
    text = (
        "mail a.b+c@ex-amp.le.org or bob@x.io, ssn 123-45-6789, "
        "call 415.555.0042 or 415-555-0042, host 10.0.0.1 done"
    )
    df = spark.createDataFrame([(text,)], "text STRING")
    row = df.select(
        PII.redact_pii(F.col("text")).alias("red"),
        *[c.alias(k) for k, c in PII.pii_counts(F.col("text")).items()],
    ).collect()[0]
    assert row["email"] == 2 and row["ssn"] == 1
    assert row["phone"] == 2 and row["ipv4"] == 1
    assert row["red"] == (
        "mail <EMAIL> or <EMAIL>, ssn <SSN>, "
        "call <PHONE> or <PHONE>, host <IP> done"
    )


def test_redact_pii_duckdb_parity(spark):
    import duckdb

    texts = [
        "x user@example.com y",
        "ssn 123-45-6789 tel 650-555-1234 ip 192.168.0.255",
        "no pii at all",
        "a@b.co c@d.info 1.2.3.4 999.999.999.999",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = [
        r["red"]
        for r in df.select(
            PII.redact_pii(F.col("text")).alias("red")
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        con.sql(
            f"SELECT {PII.sql_redact_pii('?::VARCHAR')} AS r", params=[t]
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want


# ---------------------------------------------------------------------------
# ordering
# ---------------------------------------------------------------------------


def test_global_shuffle_deterministic_and_seed_sensitive(spark):
    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    a1 = [r["doc_id"] for r in ORD.global_shuffle(df, "doc_id", "s1").collect()]
    a2 = [r["doc_id"] for r in ORD.global_shuffle(df, "doc_id", "s1").collect()]
    b = [r["doc_id"] for r in ORD.global_shuffle(df, "doc_id", "s2").collect()]
    assert a1 == a2
    assert a1 != b
    assert sorted(a1) == list(range(200))


def test_with_global_positions_matches_sort_order(spark):
    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    out = ORD.with_global_positions(df, "doc_id", "seed9")
    rows = out.orderBy("pos").collect()
    assert [r["pos"] for r in rows] == list(range(500))
    # positions must agree with the plain orderBy permutation
    want = [
        r["doc_id"]
        for r in ORD.global_shuffle(df, "doc_id", "seed9").collect()
    ]
    assert [r["doc_id"] for r in rows] == want
    # the fat tagged cache is dropped; only the output's own eager
    # localCheckpoint may remain pinned (released when `out` is GC'd).
    # Compare against a pre-call snapshot: the session fixture is shared,
    # so earlier tests' pinned checkpoint RDDs must not count against us.
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert len(after - before) <= 1


def test_remove_repeated_lines(spark):
    """Boilerplate lines (>= min_docs distinct docs) are dropped, unique
    content survives, original line order is preserved, and fully-
    boilerplate docs disappear."""
    from tsdb_parquet_spark.functions.quality import remove_repeated_lines

    boiler = "subscribe to our newsletter"
    rows = [(i, f"intro {i}\n{boiler}\nbody {i}") for i in range(10)]
    rows.append((100, boiler))                      # all-boilerplate doc
    rows.append((101, "one line\nrare shared"))     # rare line: 2 docs
    rows.append((102, "rare shared\nanother"))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_lines(df, min_docs=10).collect()
    }
    for i in range(10):
        assert out[i] == f"intro {i}\nbody {i}"  # middle line removed
    assert 100 not in out                        # nothing survived
    assert out[101] == "one line\nrare shared"   # below threshold: kept
    assert out[102] == "rare shared\nanother"


def test_repetition_stats_zero_shuffle_parity(spark, sf_oracle):
    """The zero-shuffle sorted-array variant must return exactly the
    explode-based values on real documents, and its plan must contain no
    Exchange (it is a pure scan + project)."""
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").select(
        "doc_id", "text"
    )
    a = QA.repetition_stats(docs, ngram=2)
    b = QA.repetition_stats(docs, ngram=2, zero_shuffle=True)
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b


# ---------------------------------------------------------------------------
# property test: repetition stats vs a pure-python reference (both shapes)
# ---------------------------------------------------------------------------

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    docs_words=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=2, max_size=16
        ),
        min_size=1,
        max_size=5,
    ),
    zero_shuffle=st.booleans(),
)
def test_repetition_stats_match_reference(spark, docs_words, zero_shuffle):
    """Both physical shapes (explode+groupBy and the no-exchange sorted-
    array variant) must produce the documented per-doc gram metrics."""
    texts = {i: " ".join(ws) for i, ws in enumerate(docs_words)}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id LONG, text STRING"
    )
    got = {
        r["doc_id"]: (
            r["n_grams"],
            r["n_distinct_grams"],
            r["top_gram_count"],
            r["dup_ngram_frac"],
        )
        for r in QA.repetition_stats(
            df, ngram=2, zero_shuffle=zero_shuffle
        ).collect()
    }
    for i, ws in enumerate(docs_words):
        grams = [" ".join(ws[j : j + 2]) for j in range(len(ws) - 1)]
        if not grams:
            assert i not in got
            continue
        c = Counter(grams)
        n, nd, top = len(grams), len(c), max(c.values())
        assert got[i] == (
            n, nd, top, pytest.approx(round(1.0 - nd / n, 4)),
        )


@settings(max_examples=8, deadline=None)
@given(
    corpus_words=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0,
                 max_size=12),
        min_size=1,
        max_size=5,
    ),
    bench_words=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0,
                 max_size=10),
        min_size=1,
        max_size=3,
    ),
    min_overlap=st.sampled_from([1, 2]),
)
def test_contamination_report_matches_reference(
    spark, corpus_words, bench_words, min_overlap
):
    """Distinct-gram hit counts and touched-benchmark-doc counts verified
    against a set-based reference over a 4-word vocabulary (dense
    collisions)."""
    from tsdb_parquet_spark.functions.decontaminate import (
        contamination_report,
        decontaminate,
    )

    ngram = 3

    def grams(ws):
        return {
            tuple(ws[i : i + ngram]) for i in range(len(ws) - ngram + 1)
        }

    corpus = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus_words)],
        "doc_id LONG, text STRING",
    )
    bench = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(bench_words)],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: (r["n_gram_hits"], r["n_bench_docs"])
        for r in contamination_report(
            corpus, bench, ngram=ngram, min_overlap=min_overlap
        ).collect()
    }
    bench_g = {i: grams(ws) for i, ws in enumerate(bench_words)}
    want = {}
    for i, ws in enumerate(corpus_words):
        hits = {
            g for g in grams(ws) if any(g in bg for bg in bench_g.values())
        }
        docs = {j for j, bg in bench_g.items() if bg & grams(ws)}
        if len(hits) >= min_overlap:
            want[i] = (len(hits), len(docs))
    assert got == want
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(
            corpus, bench, ngram=ngram, min_overlap=min_overlap
        ).collect()
    )
    assert kept == sorted(set(range(len(corpus_words))) - set(want))
