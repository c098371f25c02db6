#!/usr/bin/env python3
"""Isolated-warm profiling of corpus queries — the regression litmus.

A novel plan shape pays ~4-11 s of whole-stage-codegen/JIT on its FIRST
execution, and in a full bench run memory pressure can keep even the
second pass inflated; a bench row that "regressed" is usually measuring
that, not the engine.  This tool times each named query N times in one
fresh session (first rep = cold, min of the rest = warm) so cold-compile
cost and steady-state cost are separated explicitly.

Usage:
    python tools/warm_profile.py q72_global_shuffle q73_promql_time_functions
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/warm_profile.py q23...

Prints one line per query: cold, warm (min of reps 2..N), and the ratio
— a high ratio with a small warm time means "add it to bench.py's warm
list", not "optimize the plan".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 4


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not names:
        print("usage: warm_profile.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tsdb_parquet_spark.session import get_spark

    spark = get_spark(app_name="warm-profile")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in names:
        if name not in qs:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
        cold, warm = times[0], min(times[1:])
        out[name] = {
            "cold": cold,
            "warm": warm,
            "cold_over_warm": round(cold / warm, 1) if warm > 0 else None,
            "reps": times,
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
