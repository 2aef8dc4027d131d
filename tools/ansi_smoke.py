"""ANSI-mode smoke: run every registered query with spark.sql.ansi.enabled.

Spark 4 harnesses may enable ANSI semantics (strict overflow, cast, and
array-index errors). Every query must survive it — silent-truncation bugs
that ANSI would surface as errors are exactly the cross-engine hazards the
oracle discipline exists to prevent.

Usage: python tools/ansi_smoke.py [sf_dir] [start [end]]
Exits non-zero listing any query that raises under ANSI.
"""

from __future__ import annotations

import sys

REPO = "/root/repo"
sys.path.insert(0, REPO)


def main() -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", f"{REPO}/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    end = int(sys.argv[3]) if len(sys.argv) > 3 else None

    spark = SparkSession.builder.master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.ansi.enabled", "true")

    qs = mod.queries()
    names = list(qs)[start:end]
    bad: list[tuple[str, str]] = []
    for n in names:
        try:
            qs[n](spark, sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            bad.append((n, str(ex).splitlines()[0][:160]))
    print(f"checked {len(names)} failures {len(bad)}")
    for n, e in bad:
        print("FAIL", n, e)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
