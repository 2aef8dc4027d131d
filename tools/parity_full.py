"""Full-registry oracle parity sweep — stricter than tests/oracle_harness.

Emulates the external driver: fresh SparkSession with no extra conf, loads
``__spark_entry__`` by file path, and for EVERY registered query compares the
Spark result against the DuckDB oracle at the given sf dir. On top of the
value compare it enforces two driver-canonicalizer hazards the soft harness
tolerates:

* **dtype-kind mismatch** — e.g. DuckDB ``sum(int)`` comes back DECIMAL →
  pandas float64 while Spark returns int64; the driver renders ``56.0`` vs
  ``56`` and the hash diverges even though values are "equal".
* **non-scalar cells** — list/ndarray/dict cells kill the driver's
  ``sort_values`` canonicalizer (``TypeError: unhashable type: 'list'``).

Usage: ``python tools/parity_full.py [sf_dir] [name_filter ...]``
Writes a JSON report to stdout (one line per query) and exits non-zero if
anything failed.
"""

from __future__ import annotations

import json
import math
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

REPO = "/root/repo"
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v):
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        # STRICT: full-precision repr, signed zeros visible. Any driver
        # renderer is a function of the double's bits, so bit-identical
        # doubles pass every renderer; this canon proves bit-identity.
        return repr(f)
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, pd.Timestamp):
        ts = v
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _kind(dtype, series) -> str:
    """Coarse dtype kind the driver's renderer would distinguish."""
    k = dtype.kind  # i u f b O M m
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "ts"
    if k == "O":
        for v in series.head(50):
            if isinstance(v, (list, tuple, dict, np.ndarray)):
                return "NONSCALAR"
            if isinstance(v, float):
                return "float"
            if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
                return "int"
            if v is not None:
                return "str" if isinstance(v, str) else type(v).__name__
        return "empty"
    return k


def run(sf_dir: str, only: list[str]) -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    import __spark_entry__ as em

    import os

    con = duckdb.connect()
    for t in TABLES:
        # multi-file replica tables (make_scale10) are directories —
        # DuckDB needs the glob there, Spark reads either layout
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = em.queries()
    oracles = em.oracle_sql()
    names = [n for n in queries if not only or any(s in n for s in only)]
    n_fail = 0
    for name in names:
        t0 = time.time()
        rec = {"q": name}
        try:
            sp = queries[name](spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sp)
            issues = []
            for c in sp.columns:
                if _kind(sp[c].dtype, sp[c]) == "NONSCALAR":
                    issues.append(f"spark col {c} NONSCALAR")
            if name not in oracles:
                rec["status"] = "rows-only"
                if issues:
                    rec["status"] = "FAIL"
                    rec["issues"] = issues
                    n_fail += 1
            else:
                dk = con.execute(oracles[name]).df()
                rec["oracle_rows"] = len(dk)
                if sorted(sp.columns) != sorted(dk.columns):
                    issues.append(
                        f"cols spark={sorted(sp.columns)} duck={sorted(dk.columns)}"
                    )
                elif len(sp) != len(dk):
                    issues.append(f"rowcount {len(sp)} vs {len(dk)}")
                else:
                    cols = sorted(sp.columns)
                    for c in cols:
                        ks, kd = _kind(sp[c].dtype, sp[c]), _kind(dk[c].dtype, dk[c])
                        if ks != kd:
                            issues.append(f"dtype[{c}] spark={ks} duck={kd}")
                    a = sorted(
                        tuple(_canon_cell(v) for v in row)
                        for row in sp[cols].itertuples(index=False, name=None)
                    )
                    b = sorted(
                        tuple(_canon_cell(v) for v in row)
                        for row in dk[cols].itertuples(index=False, name=None)
                    )
                    ndiff = sum(1 for x, y in zip(a, b) if x != y)
                    if ndiff:
                        first = next((x, y) for x, y in zip(a, b) if x != y)
                        issues.append(f"{ndiff} value diffs; first spark={first[0]} duck={first[1]}")
                if issues:
                    rec["status"] = "FAIL"
                    rec["issues"] = issues
                    n_fail += 1
                else:
                    rec["status"] = "ok"
        except Exception:
            rec["status"] = "ERROR"
            rec["err"] = traceback.format_exc().splitlines()[-1]
            n_fail += 1
        rec["sec"] = round(time.time() - t0, 2)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"total": len(names), "failed": n_fail}), flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]
    sys.exit(run(sf, only))
