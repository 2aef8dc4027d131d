"""Profile one query run: wall time split into build (py4j plan
construction), analysis/optimization+execution, plus per-job wall times from
the status tracker (guide §1/§7 without the UI).

Usage: python tools/profile_query.py <query> [--sf DIR] [-n N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("-n", type=int, default=2)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from hiss_cube_spark import get_spark

    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qreg = entry.queries()

    # warm-up
    qreg[args.name](spark, args.sf).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    for run in range(args.n):
        tracker = sc.statusTracker()
        before_ids = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df = qreg[args.name](spark, args.sf)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        ids = sorted(set(tracker.getJobIdsForGroup(None) or []) - before_ids)
        jobs = []
        for jid in ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            ntasks = 0
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    ntasks += si.numTasks
            jobs.append((jid, len(ji.stageIds), ntasks))
        print(
            f"run {run}: build={t1 - t0:.3f}s exec={t2 - t1:.3f}s "
            f"total={t2 - t0:.3f}s jobs={len(ids)} "
            f"stages={sum(j[1] for j in jobs)} tasks={sum(j[2] for j in jobs)}"
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
