"""Isolated per-query timing for the optimization loop (guide §1).

Usage: python tools/bench_queries.py [-n N] [--sf DIR] query [query ...]

Times each named query with the noop sink (full computation, no driver
collect), best-of-N (default 4), after one warm-up run of the first query.
Prints one JSON line per query plus a summary, and records the 1-min load
average so a contended reading is visible in the record (PLANS.md r10-r12
lesson). This is a measurement tool only — the driver contract lives in
bench.py, which is unchanged.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=4, help="attempts per query")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    import __spark_entry__ as entry
    from hiss_cube_spark import get_spark

    spark = get_spark("bench-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qreg = entry.queries()
    unknown = [n for n in args.names if n not in qreg]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    # JVM/codegen warm-up on the first query so timings measure the plan.
    qreg[args.names[0]](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    out = {}
    for name in args.names:
        spark.sparkContext.setJobDescription(f"bench:{name}")
        best, runs = float("inf"), []
        for _ in range(args.n):
            t0 = time.perf_counter()
            qreg[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            best = min(best, dt)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
        print(json.dumps({"q": name, "best": out[name], "runs": runs}))
        sys.stdout.flush()
    load = round(os.getloadavg()[0], 2)
    print(json.dumps({"total_best": round(sum(out.values()), 3), "load_1m": load}))
    spark.stop()


if __name__ == "__main__":
    main()
