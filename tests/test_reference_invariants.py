"""The reference's two hard benchmark invariants, replayed through this
engine on the reference's exact workload generators.

The reference publishes no absolute numbers, but its benchmark harnesses
assert two correctness invariants that double as workload definitions
(BASELINE.md):

- scanner: two equality predicates over the 1M-row sorted fixture select
  exactly 83,330 rows (`compute/scan_bench_test.go:19-50`, assert at :49;
  generator: per-page row index cycles ColumnA=row%4, ColumnB=row%3,
  5 pages x 200k rows, so A='2' AND B='1' hits row%12==10 -> 16,666 per
  page x 5);
- distinct: first-per-key over ColumnA on the same shape (20 pages x 50k
  rows) yields exactly 4 rows (`compute/distinct_bench_test.go:17-66`,
  `UniqueByColumn(0, ...)` over projected [ColumnA, ColumnB]).

Replaying them here pins our P2/P5 predicate path and A1 dedup to the
reference's own numbers, through the same sorted-parquet write path the
stores use.
"""

import os
import shutil

from pyspark.sql import functions as F

from tsdb_parquet_spark.operators.distinct import unique_by_column
from tsdb_parquet_spark.operators.selection import Matcher
from tsdb_parquet_spark.sources.writer import WriterOptions, write_sorted

WORK = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".work",
    "reference_invariants",
)

_SORT = ["ColumnA", "ColumnB", "ColumnC", "ColumnD"]


def _fixture(spark, num_pages: int):
    """The reference's generator: page-local row index drives the value
    cycles (`compute/scan_bench_test.go:22-35`)."""
    rows_per_page = 1_000_000 // num_pages
    return spark.range(1_000_000).select(
        (F.col("id") % rows_per_page).alias("__row")
    ).select(
        (F.col("__row") % 4).cast("string").alias("ColumnA"),
        (F.col("__row") % 3).cast("string").alias("ColumnB"),
        (F.col("__row") % 2).cast("string").alias("ColumnC"),
        F.col("__row").cast("string").alias("ColumnD"),
    )


def test_scan_selectivity_invariant_83330(spark):
    """`Equals(ColumnA,'2') AND Equals(ColumnB,'1')` over the sorted 1M-row
    file selects exactly 83,330 rows, with both predicates pushed to the
    parquet scan."""
    store = os.path.join(WORK, "scan_1m")
    if not os.path.exists(os.path.join(store, "_SUCCESS")):
        shutil.rmtree(store, ignore_errors=True)
        write_sorted(
            _fixture(spark, num_pages=5),
            store,
            WriterOptions(sort_columns=_SORT, max_files=4),
        )
    df = spark.read.parquet(store)
    pred = Matcher("ColumnA", "=", "2").to_column() & Matcher(
        "ColumnB", "=", "1"
    ).to_column()
    selected = df.filter(pred)
    plan = selected._jdf.queryExecution().executedPlan().toString()
    assert "ColumnA" in plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert selected.count() == 83_330


def test_distinct_invariant_4_rows(spark):
    """First-per-key over ColumnA (projected [ColumnA, ColumnB]) on the
    1M-row fixture yields exactly the 4 key values."""
    fixture = _fixture(spark, num_pages=20)
    out = unique_by_column(fixture, "ColumnA", ["ColumnA", "ColumnB"])
    rows = out.collect()
    assert len(rows) == 4
    assert sorted(r["ColumnA"] for r in rows) == ["0", "1", "2", "3"]
