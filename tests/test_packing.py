"""Sequence packing (`functions/packing.py`): invariants the oracle
hash can't see, plan shape, and bucket-count insensitivity."""

import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.functions.packing import pack_token_chunks


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b c"),  # 3 tokens
        (1, " "),  # 0 tokens — must vanish from the stream
        (2, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
        (3, "x"),  # 1 token
        (4, " ".join(f"u{i}" for i in range(9))),  # 9 tokens: crosses 2 bounds
        (5, "y z"),  # 2 tokens
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _spans(df):
    return sorted(
        (r["chunk_id"], r["doc_id"], r["doc_offset"], r["chunk_offset"], r["span_len"])
        for r in df.collect()
    )


def test_small_golden(docs):
    # stream (L=4): [abc|x0] [x1..x4] [x5..x8] [x9 x a b] ... doc order
    got = _spans(pack_token_chunks(docs, 4, num_buckets=2))
    # offsets: d0 off 0 n3, d2 off 3 n10, d3 off 13 n1, d4 off 14 n9, d5 off 23 n2
    want = sorted(
        [
            (0, 0, 0, 0, 3),
            (0, 2, 0, 3, 1),
            (1, 2, 1, 0, 4),
            (2, 2, 5, 0, 4),
            (3, 2, 9, 0, 1),
            (3, 3, 0, 1, 1),
            (3, 4, 0, 2, 2),
            (4, 4, 2, 0, 4),
            (5, 4, 6, 0, 3),
            (5, 5, 0, 3, 1),
            (6, 5, 1, 0, 1),
        ]
    )
    assert got == want


def test_invariants(docs):
    for seq_len in (1, 3, 7, 100):
        spans = _spans(pack_token_chunks(docs, seq_len, num_buckets=3))
        # every chunk except the last is exactly full
        fill = {}
        for c, _, _, _, ln in spans:
            fill[c] = fill.get(c, 0) + ln
        last = max(fill)
        assert all(v == seq_len for c, v in fill.items() if c != last)
        assert 0 < fill[last] <= seq_len
        # chunk ids are dense from 0
        assert sorted(fill) == list(range(last + 1))
        # per doc: spans tile [0, n) contiguously, in chunk order
        by_doc = {}
        for c, d, doff, coff, ln in spans:
            by_doc.setdefault(d, []).append((doff, coff, ln, c))
        assert 1 not in by_doc  # zero-token doc emits nothing
        total = sum(ln for s in by_doc.values() for _, _, ln, _ in s)
        assert total == 25  # 3 + 10 + 1 + 9 + 2
        for d, entries in by_doc.items():
            entries.sort()
            pos = 0
            for doff, coff, ln, c in entries:
                assert doff == pos
                pos += ln
                # span lies inside its chunk
                assert 0 <= coff and coff + ln <= seq_len


def test_bucket_count_invariance(docs):
    base = _spans(pack_token_chunks(docs, 4, num_buckets=1))
    for nb in (2, 5, 100):
        assert _spans(pack_token_chunks(docs, 4, num_buckets=nb)) == base


def test_custom_token_column(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 2)], "doc_id LONG, n LONG"
    )
    spans = _spans(
        pack_token_chunks(df, 6, n_tokens=F.col("n"), num_buckets=2)
    )
    assert spans == sorted(
        [(0, 1, 0, 0, 5), (0, 2, 0, 5, 1), (1, 2, 1, 0, 4), (1, 3, 0, 4, 2)]
    )


def test_rejects_bad_seq_len(docs):
    with pytest.raises(ValueError):
        pack_token_chunks(docs, 0)


def test_plan_is_jvm_only(docs):
    """No Python evaluation in the plan (the whole operator is Catalyst
    expressions) and exactly one content shuffle beyond the caller's."""
    plan = (
        pack_token_chunks(docs, 4, num_buckets=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan


def test_assemble_chunks(spark, docs):
    """Assembly materializes exactly the concatenated token stream cut
    every seq_len — verified against a pure-python reference."""
    from tsdb_parquet_spark.functions.packing import (
        assemble_chunks,
        pack_token_chunks,
    )

    seq_len = 4
    spans = pack_token_chunks(docs, seq_len, num_buckets=3)
    out = assemble_chunks(spans, docs)
    got = {r["chunk_id"]: r["tokens"] for r in out.collect()}

    # pure-python reference: same token contract (lower, \s+ split)
    stream = []
    for doc_id, text in sorted(
        (r["doc_id"], r["text"]) for r in docs.collect()
    ):
        stream += [t for t in text.lower().strip().split() if t]
    want = {
        i: stream[i * seq_len : (i + 1) * seq_len]
        for i in range((len(stream) + seq_len - 1) // seq_len)
    }
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
