#!/usr/bin/env python3
"""Measure wall-time scaling of data-bound corpus queries across the three
testdata scale factors (sf0.001 / sf0.01 / sf0.1 — 100x data spread).

Separates the two cost regimes visible at local scale:

- fixed driver overhead (planning, stage launch, codegen) — flat in SF,
  dominates the sub-second PromQL/selection rows;
- the data-linear term — what actually extrapolates to 100 TB; a query
  whose wall grows ~10x per 10x SF step at test scale is data-bound, and
  its 100 TB cost is governed by the plan shape (shuffle count, pushdown,
  partial aggregation), not the constant.

Usage: python tools/scale_probe.py [query ...]   (default: the heavy set)
Prints one table: per-SF min-of-2 wall seconds + step ratios.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "q07_groupby_agg",
    "q10_write_compact_roundtrip",
    "q22_exact_dedup",
    "q23_minhash_lsh_pairs",
    "q39_cleaning_pipeline",
    "q47_dedup_clusters",
    "q69_decontaminate",
    "q70_repetition_stats",
    "q72_global_shuffle",
    "q85_salted_distinct_count",
    "q92_semantic_dedup",
    "q93_exact_substring_spans",
    "q98_exact_substring_removal",
    "q99_lm_perplexity_score",
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from tsdb_parquet_spark.session import get_spark

    names = sys.argv[1:] or HEAVY
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    # warm codegen for every probed shape on the smallest SF (untimed)
    for name in names:
        try:
            qs[name](spark, SFS[0]).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"warm {name}: {exc}", file=sys.stderr)

    results: dict[str, list[float]] = {}
    for name in names:
        walls = []
        for sf in SFS:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf).write.format("noop").mode("overwrite").save()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            walls.append(best)
        results[name] = walls

    print(f"{'query':<32} {'sf.001':>8} {'sf.01':>8} {'sf.1':>8} "
          f"{'x@10':>6} {'x@100':>6}")
    for name, (a, b, c) in results.items():
        print(f"{name:<32} {a:8.3f} {b:8.3f} {c:8.3f} "
              f"{b / a:6.2f} {c / b:6.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
