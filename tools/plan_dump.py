#!/usr/bin/env python3
"""Dump `.explain("formatted")` for corpus queries to plans/<round>/.

Usage:
    python tools/plan_dump.py --out plans/r16 --suffix before [q01... ]
    (no names = every registry query)

The plan is captured AFTER fn(spark, sf_dir) returns, i.e. for exactly
the DataFrame the bench times with the noop sink.  Queries whose fn
performs eager work (API round-trips, store lifecycle) still produce a
plan for their *returned* frame; the eager part is code, not plan, and
is profiled separately with tools/warm_profile.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    out_dir = None
    suffix = "before"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--out":
            out_dir = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    if out_dir is None:
        # no silent round default: a forgotten --out must not overwrite a
        # prior round's committed plan artifacts (r16 advice item)
        out_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR")
        if not out_dir:
            sys.exit("plan_dump: pass --out plans/rNN (or set "
                     "SPARK_GRAFT_PLAN_DIR)")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, out_dir)
    os.makedirs(out_dir, exist_ok=True)

    from tsdb_parquet_spark.session import get_spark

    spark = get_spark(app_name="plan-dump", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    if not names:
        names = list(qs)
    for name in names:
        if name not in qs:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {exc}\n"
        with open(path, "w") as fh:
            fh.write(plan if plan.endswith("\n") else plan + "\n")
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
