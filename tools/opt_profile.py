#!/usr/bin/env python3
"""Optimization profiler (rounds 13/14): time individual registry queries with
the noop sink (bench.py methodology, min-of-N) and optionally dump
`.explain("formatted")` to plans/r14/ (override with OPT_PLAN_DIR).

Usage:
  python tools/opt_profile.py [--reps N] [--explain SUFFIX] [query ...]

With no query names, profiles the bench.py HEADLINE set. --explain before
writes plans/r14/<query>_before.txt (after: _after.txt).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.environ.get("OPT_PLAN_DIR", "/root/repo/plans/r14")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", choices=["before", "after", "none"], default="none")
    ap.add_argument("--no-time", action="store_true", help="only dump plans")
    args = ap.parse_args()

    from bench import HEADLINE
    from duck_server_spark.engine.session import get_session
    from duck_server_spark.operators import all_queries

    names = args.queries or list(HEADLINE)
    spark = get_session("opt_profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warmup: same pair bench.py uses
    run(queries["tpch_q1_pricing_summary"](spark, SF_DIR))
    run(queries["dedup_minhash_vectorized"](spark, SF_DIR))

    results: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        if args.explain != "none":
            os.makedirs(PLAN_DIR, exist_ok=True)
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{PLAN_DIR}/{name}_{args.explain}.txt", "w") as f:
                f.write(buf.getvalue())
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"opt_profile:{name}")
        best = float("inf")
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run(fn(spark, SF_DIR))
            dt = time.perf_counter() - t0
            times.append(round(dt, 3))
            best = min(best, dt)
        spark.sparkContext.setJobDescription(None)
        results[name] = round(best, 3)
        print(f"{name}: min={best:.3f} all={times}", flush=True)

    if results:
        print(json.dumps({"total_min": round(sum(results.values()), 3), "queries": results}))


if __name__ == "__main__":
    main()
