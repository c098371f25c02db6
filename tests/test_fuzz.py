"""Seeded random-query fuzzing against the DuckDB oracle.

Goes beyond the reference's hand-written golden tests (SURVEY §5): generate
ANSI-SQL queries (valid in both dialects) over lineitem/orders with random
predicate conjunctions and aggregations, run them on Spark AND DuckDB, and
compare canonical results.  Deterministic seed -> reproducible corpus.
"""

import random

import pytest

from tsdb_parquet_spark.catalog import Catalog
from tsdb_parquet_spark.oracle import canonical_rows, duckdb_connection

NUMERIC_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice"],
    "orders": ["o_orderkey", "o_custkey", "o_totalprice"],
}
STRING_COLS = {
    "lineitem": {
        "l_returnflag": ["A", "N", "R"],
        "l_linestatus": ["F", "O"],
    },
    "orders": {
        "o_orderstatus": ["F", "O", "P"],
        "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM"],
    },
}
KEYS = {"lineitem": "l_orderkey, l_linenumber", "orders": "o_orderkey"}
BOUNDS = {
    "l_orderkey": (0, 15000), "l_partkey": (0, 2000), "l_suppkey": (0, 100),
    "l_quantity": (1, 50), "l_extendedprice": (900, 100000),
    "o_orderkey": (0, 15000), "o_custkey": (0, 1500),
    "o_totalprice": (800, 500000),
}


def _random_query(rng: random.Random) -> str:
    table = rng.choice(["lineitem", "orders"])
    preds = []
    for _ in range(rng.randint(1, 3)):
        if rng.random() < 0.5:
            col = rng.choice(NUMERIC_COLS[table])
            lo, hi = BOUNDS[col]
            op = rng.choice([">=", "<=", "=", "<>"])
            val = rng.randint(lo, hi)
            preds.append(f"{col} {op} {val}")
        else:
            col, values = rng.choice(list(STRING_COLS[table].items()))
            op = rng.choice(["=", "<>"])
            preds.append(f"{col} {op} '{rng.choice(values)}'")
    where = " AND ".join(preds)

    if rng.random() < 0.5:
        group_col = rng.choice(list(STRING_COLS[table]))
        agg_col = rng.choice(NUMERIC_COLS[table])
        return (
            f"SELECT {group_col}, count(*) AS cnt, "
            f"round(sum({agg_col}), 2) AS s, "
            f"min({agg_col}) AS mn, max({agg_col}) AS mx "
            f"FROM {table} WHERE {where} "
            f"GROUP BY {group_col} ORDER BY {group_col}"
        )
    key = KEYS[table]
    cols = rng.sample(NUMERIC_COLS[table], k=2)
    # ORDER BY the full unique key: a LIMIT over a tie at the cut point
    # would otherwise select different rows per engine
    return (
        f"SELECT {key}, {', '.join(cols)} FROM {table} "
        f"WHERE {where} ORDER BY {key} LIMIT 500"
    )


SEEDS = list(range(24))


@pytest.fixture(scope="module")
def duck(sf_oracle):
    con = duckdb_connection(sf_oracle)
    yield con
    con.close()


@pytest.mark.parametrize("seed", SEEDS)
def test_random_query_matches_oracle(spark, sf_oracle, duck, seed):
    rng = random.Random(20260813 + seed)
    sql = _random_query(rng)
    cat = Catalog(spark, sf_oracle)
    spark_df = cat.sql(sql)
    spark_rows = spark_df.collect()
    cur = duck.execute(sql)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()
    assert len(spark_rows) == len(duck_rows), sql
    s = canonical_rows(spark_rows, spark_df.columns)
    d = canonical_rows(duck_rows, duck_cols)
    assert s == d, f"value mismatch for: {sql}"
