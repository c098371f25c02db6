#!/usr/bin/env python3
"""Split each corpus query's wall time into fn-call (driver-side Python:
fixture checks, store builds, API round-trips, plan construction) vs noop
execution (Spark jobs) — the first routing decision of guide §1: optimize
the distributed plan only when the plan is where the time goes.

Usage:
    python tools/split_profile.py [--reps 3] [q83_store_maintenance ...]
    (no names = every registry query; prints one JSON line per query)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tsdb_parquet_spark.session import get_spark

    spark = get_spark(app_name="split-profile")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    if not names:
        names = list(qs)
    out = {}
    for name in names:
        if name not in qs:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        builds, execs = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(round(t1 - t0, 3))
            execs.append(round(t2 - t1, 3))
        rec = {
            "fn_min": min(builds),
            "exec_min": min(execs),
            "fn_reps": builds,
            "exec_reps": execs,
        }
        out[name] = rec
        print(name, json.dumps(rec), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "split": out}))


if __name__ == "__main__":
    main()
