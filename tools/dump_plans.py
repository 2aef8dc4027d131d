"""Dump formatted physical plans for the audited queries (see PLANS.md).

Usage:  python tools/dump_plans.py [query ...]
With no arguments, dumps every bench-headline query. Plans print to
stdout at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import bench
    import __spark_entry__ as entry

    from hiss_cube_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or bench.HEADLINE
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    for name in names:
        if name not in queries:
            print(f"== {name}: UNKNOWN QUERY ==", file=sys.stderr)
            continue
        print(f"\n{'=' * 70}\n== {name}\n{'=' * 70}")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            queries[name](spark, sf_dir).explain("formatted")
        print(buf.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
