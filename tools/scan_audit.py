"""Physical-plan scan audit: count parquet scans per registered query.

A query whose formatted plan scans the same fact table many times is a
100 TB red flag (each scan is a full pass at scale) — usually a lazily
re-derived aggregate that should be a window over a bounded intermediate
(see PLANS.md "Drift family single-scan rewrite"). Some multi-scan
shapes are legitimate: self-joins (dedup pairs, crossmatch), recall
companions that run an exact baseline beside the approximate leg, and
multi-table queries. The audit prints every query with >= `threshold`
scans so the legitimate ones can be triaged once and documented.

Usage: python tools/scan_audit.py [sf_dir] [threshold]
"""

from __future__ import annotations

import contextlib
import importlib.util
import io
import sys

def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    flagged = []
    for name, fn in mod.queries().items():
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            per_table: dict[str, int] = {}
            for line in plan.splitlines():
                if "Location:" in line and ".parquet" in line:
                    tbl = line.rsplit("/", 1)[-1].rstrip("]").removesuffix(
                        ".parquet"
                    )
                    per_table[tbl] = per_table.get(tbl, 0) + 1
            if per_table and max(per_table.values()) >= threshold:
                worst = max(per_table, key=per_table.get)
                flagged.append((per_table[worst], f"{name} ({worst})"))
        except Exception as e:  # streaming-only entries etc.
            print(f"SKIP {name}: {type(e).__name__}", file=sys.stderr)
    for nscan, name in sorted(flagged, reverse=True):
        print(nscan, name)
    print(f"-- {len(flagged)} queries with >= {threshold} scans")


if __name__ == "__main__":
    main()
