"""Same-session interleaved A/B of runtime-settable Spark confs (guide §1;
PLANS.md jitter protocol: only interleaved same-JVM comparisons are credible
on these hosts).

Usage:
  python tools/ab_conf.py --conf k=v[,k=v...] [-n N] [--sf DIR] q [q ...]

Variant A = session defaults, variant B = session defaults + the given
confs. Each query alternates A,B,A,B,... for 2N runs in ONE JVM (noop
sink), reporting best and median per variant plus the B/A ratio. Confs are
restored between runs so A truly runs the defaults.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--conf", required=True,
                    help="comma-separated k=v pairs for variant B")
    ap.add_argument("-n", type=int, default=5, help="rounds per variant")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                       "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    import __spark_entry__ as entry
    from hiss_cube_spark import get_spark

    spark = get_spark("ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    qreg = entry.queries()
    unknown = [n for n in args.names if n not in qreg]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    b_confs = dict(kv.split("=", 1) for kv in args.conf.split(","))
    a_confs = {k: spark.conf.get(k, None) for k in b_confs}

    def _apply(variant: str) -> None:
        src = b_confs if variant == "B" else a_confs
        for k, v in src.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # warm-up under defaults
    qreg[args.names[0]](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    for name in args.names:
        times: dict[str, list[float]] = {"A": [], "B": []}
        for i in range(2 * args.n):
            variant = "AB"[i % 2]
            _apply(variant)
            spark.sparkContext.setJobDescription(f"ab:{name}:{variant}")
            t0 = time.perf_counter()
            qreg[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            times[variant].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        _apply("A")
        rec = {
            "query": name,
            "A_best": round(min(times["A"]), 3),
            "B_best": round(min(times["B"]), 3),
            "A_median": round(statistics.median(times["A"]), 3),
            "B_median": round(statistics.median(times["B"]), 3),
            "B_over_A_best": round(min(times["B"]) / min(times["A"]), 3),
            "B_over_A_median": round(
                statistics.median(times["B"]) / statistics.median(times["A"]),
                3,
            ),
            "load_1m": round(os.getloadavg()[0], 2),
            "runs_A": [round(t, 3) for t in times["A"]],
            "runs_B": [round(t, 3) for t in times["B"]],
        }
        print(json.dumps(rec))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
