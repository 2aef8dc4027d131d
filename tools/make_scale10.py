"""Materialize the 10× scaling corpus: replicate an sf dir K times with
consistently shifted keys (the SCALING.md method, now a committed tool).

Dimension identity keys shift per replica so joins stay consistent
(replica i of lineitem joins replica i of supplier); the 25-nation /
5-region domain tables stay fixed, so nation-grain aggregates densify
instead of growing — the realistic big-data shape.

Usage: python tools/make_scale10.py [src_sf_dir] [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import duckdb

SHIFT = 10_000_000

# table -> columns to shift per replica
SHIFTED: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # the K-way UNION ALL is one expression tree; past ~1000 copies it
    # trips DuckDB's default max_expression_depth
    con.execute("SET max_expression_depth TO 100000")
    for table, keys in SHIFTED.items():
        path = f"{src}/{table}.parquet"
        if not keys or copies == 1:
            if table in ("region", "nation"):
                con.execute(
                    f"COPY (SELECT * FROM '{path}') TO '{out}/{table}.parquet'"
                )
                continue
        parts = []
        for i in range(copies):
            cols = ", ".join(
                f"{k} + {i * SHIFT} AS {k}" if k in keys else k
                for k in con.execute(f"DESCRIBE SELECT * FROM '{path}'")
                .df()["column_name"]
                .tolist()
            )
            parts.append(f"SELECT {cols} FROM '{path}'")
        # MULTI-FILE output (a `{table}.parquet/` DIRECTORY of part files)
        # for replicated tables: a single DuckDB-written file has only
        # ~1 row group per 122k rows, capping Spark's scan parallelism —
        # the round-11 re-measure showed dq_kmv/theta at 100× were 3×
        # slower purely from that layout. Union branches parallelize, so
        # PER_THREAD_OUTPUT yields ~one file per thread. Spark reads the
        # directory transparently; DuckDB needs the '/*.parquet' glob.
        dst = f"{out}/{table}.parquet"
        # rebuilds into the same out dir are the documented workflow: the
        # tool owns dst's layout, so clear any previous build (file OR
        # directory — PER_THREAD_OUTPUT refuses non-empty dirs, and a
        # stale single-file table would shadow a directory write)
        if os.path.isfile(dst):
            os.remove(dst)
        elif os.path.isdir(dst):
            import shutil

            shutil.rmtree(dst)
        if copies > 1:
            con.execute(
                f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}' "
                "(FORMAT PARQUET, PER_THREAD_OUTPUT TRUE)"
            )
            probe = f"{dst}/*.parquet"
        else:
            con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}'")
            probe = dst
        n = con.execute(f"SELECT count(*) FROM '{probe}'").fetchone()[0]
        print(table, n, flush=True)


if __name__ == "__main__":
    main()
