"""Connected-components dedup clustering: hand-built graphs, convergence,
representative selection, and no leaked cache blocks."""

from pyspark.sql import functions as F

from tsdb_parquet_spark.functions.clusters import (
    connected_components,
    dedup_representatives,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a LONG, doc_b LONG")


def test_components_basic(spark):
    # {1,2,3} via chain, {10,11}, and 2-3 redundant edge
    cc = connected_components(
        _pairs(spark, [(1, 2), (2, 3), (3, 2), (10, 11)])
    )
    got = {(r["node"], r["cluster_id"]) for r in cc.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_components_long_chain(spark):
    """A 12-node path needs multiple propagation rounds (diameter 11) —
    exercises the convergence loop and the lineage checkpointing."""
    chain = [(i, i + 1) for i in range(12)]
    cc = connected_components(_pairs(spark, chain), checkpoint_every=3)
    rows = cc.collect()
    assert {r["cluster_id"] for r in rows} == {0}
    assert len(rows) == 13


def test_no_leaked_cache_blocks(spark):
    sc = spark.sparkContext
    before = len([r for r in sc._jsc.sc().getRDDStorageInfo()])
    connected_components(_pairs(spark, [(1, 2), (3, 4)])).collect()
    # the returned labels frame itself may stay cached; everything
    # intermediate (edges, prior rounds) must be released
    after = len([r for r in sc._jsc.sc().getRDDStorageInfo()])
    assert after <= before + 1


def test_dedup_representatives(spark):
    docs = spark.range(0, 6).select(F.col("id").alias("doc_id"),
                                    F.concat(F.lit("d"), "id").alias("text"))
    pairs = _pairs(spark, [(0, 1), (1, 2), (4, 5)])
    kept = sorted(
        r["doc_id"]
        for r in dedup_representatives(docs, pairs).collect()
    )
    # clusters {0,1,2}->keep 0, {4,5}->keep 4; 3 untouched
    assert kept == [0, 3, 4]


def test_components_rounds_telemetry(spark):
    """The fused min-neighbor seed puts star/clique components at
    fixpoint immediately: the loop closes in ONE confirming round, and
    the stats dict reports it.  A path still needs ~diameter rounds."""
    stats = {}
    cc = connected_components(
        _pairs(spark, [(1, 2), (1, 3), (2, 3), (10, 11)]), stats=stats
    )
    assert {(r["node"], r["cluster_id"]) for r in cc.collect()} == {
        (1, 1), (2, 1), (3, 1), (10, 10), (11, 10)
    }
    assert stats["rounds"] == 1

    stats = {}
    chain = [(i, i + 1) for i in range(8)]
    cc = connected_components(_pairs(spark, chain), stats=stats)
    assert {r["cluster_id"] for r in cc.collect()} == {0}
    # 9-node path, diameter 8: seed covers hop 1, the loop the rest
    assert 2 <= stats["rounds"] <= 9


# ---------------------------------------------------------------------------
# property test: random graphs vs a pure-python union-find
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _ref_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_components_match_union_find(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a LONG, doc_b LONG"
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    assert got == _ref_components(edges)
