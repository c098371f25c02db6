"""Tests for the composed training-data pipeline."""

import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.functions.pipeline import clean_corpus, training_chunks


@pytest.fixture(scope="module")
def corpus(spark):
    long_en = " ".join(
        ["the quick brown fox jumps over the lazy dog and runs for it"] * 5
    )
    rows = [
        (0, long_en),
        (1, long_en),  # exact duplicate of 0
        (2, long_en + " extra tail tokens here"),  # near-dup of 0
        (3, "el perro y el gato en la casa no se ven y no hay mas"),  # es
        (4, "x"),  # too short -> low quality
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_clean_corpus_gates_and_dedups(corpus):
    kept = clean_corpus(corpus, min_quality=0.5, languages=("en",))
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [0, 2]  # 1 exact-dup dropped, 3 wrong lang, 4 low quality


def test_clean_corpus_near_dup_removal(corpus):
    kept = clean_corpus(
        corpus, min_quality=0.5, languages=("en",), drop_near_dups=True
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [0]  # 2 removed as near-dup of 0


def test_training_chunks_shapes(spark):
    text = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame([(0, text), (1, "a b"), (2, "")],
                                 "doc_id LONG, text STRING")
    out = training_chunks(docs, chunk_tokens=40, stride=32).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: starts at 0,32,64,96 -> 4 chunks; lengths 40,40,36,4
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_id"])
    assert [c["n_tokens"] for c in c0] == [40, 40, 36, 4]
    assert c0[0]["chunk_text"].startswith("w0 w1 ")
    assert c0[1]["chunk_text"].startswith("w32 ")
    # doc 1: single short chunk; doc 2: no chunks
    assert [c["n_tokens"] for c in by_doc[1]] == [2]
    assert 2 not in by_doc


def test_chunks_cover_all_tokens(spark):
    text = " ".join(f"w{i}" for i in range(75))
    docs = spark.createDataFrame([(0, text)], "doc_id LONG, text STRING")
    out = training_chunks(docs, chunk_tokens=40, stride=32).collect()
    covered = set()
    for r in out:
        covered.update(r["chunk_text"].split(" "))
    assert covered == {f"w{i}" for i in range(75)}


def test_pack_sequences_placement(spark):
    from tsdb_parquet_spark.functions.pipeline import pack_sequences

    # one shard (ids all % 1 == 0): lengths 6, 3, 4, 0, 5 with budget 8
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f"),       # start 0  -> seq 0, fits
            (1, "g h i"),             # start 6  -> spans seq 0 -> 1
            (2, "j k l m"),           # start 9  -> seq 1, offset 1
            (3, ""),                  # start 13 -> empty doc
            (4, "n o p q r"),         # start 13 -> spans seq 1 -> 2
        ],
        "doc_id LONG, text STRING",
    )
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(docs, budget_tokens=8, shards=1).collect()
    }
    assert [rows[0][c] for c in ("start_offset", "first_seq", "last_seq")] == [0, 0, 0]
    assert [rows[1][c] for c in ("start_offset", "first_seq", "last_seq")] == [6, 0, 1]
    assert [rows[2][c] for c in ("start_offset", "first_seq", "last_seq", "offset_in_seq")] == [9, 1, 1, 1]
    assert [rows[3][c] for c in ("n_tokens", "first_seq", "last_seq")] == [0, 1, 1]
    assert [rows[4][c] for c in ("start_offset", "first_seq", "last_seq")] == [13, 1, 2]


def test_pack_sequences_shard_independence(spark):
    from tsdb_parquet_spark.functions.pipeline import pack_sequences

    docs = spark.createDataFrame(
        [(i, "x " * 10) for i in range(40)], "doc_id LONG, text STRING"
    )
    out = pack_sequences(docs, budget_tokens=16, shards=4)
    # every shard's stream starts at offset 0 and is contiguous
    rows = sorted(out.collect(), key=lambda r: (r["shard"], r["doc_id"]))
    by_shard = {}
    for r in rows:
        exp = by_shard.get(r["shard"], 0)
        assert r["start_offset"] == exp
        by_shard[r["shard"]] = exp + r["n_tokens"]


# ---------------------------------------------------------------------------
# property test: pack_sequences vs a pure-python reference packer
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from tsdb_parquet_spark.functions.pipeline import pack_sequences


def _ref_pack(doc_lens, budget):
    """Reference: stream docs in id order, cumulative offsets, sequence
    boundaries every `budget` tokens (single shard)."""
    out, offset = {}, 0
    for doc_id, n in sorted(doc_lens.items()):
        first = offset // budget
        last = (offset + n - 1) // budget if n > 0 else first
        out[doc_id] = (n, offset, first, last, offset % budget)
        offset += n
    return out


@settings(max_examples=10, deadline=None)
@given(
    lens=st.lists(
        st.integers(min_value=1, max_value=30), min_size=1, max_size=15
    ),
    budget=st.sampled_from([16, 64]),
)
def test_pack_sequences_matches_reference(spark, lens, budget):
    # one shard so the reference's single stream applies; texts are n
    # repeated words so the token count is exact
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["start_offset"],
            r["first_seq"],
            r["last_seq"],
            r["offset_in_seq"],
        )
        for r in pack_sequences(
            df, budget_tokens=budget, shards=1
        ).collect()
    }
    assert got == _ref_pack({i: n for i, n in enumerate(lens)}, budget)
