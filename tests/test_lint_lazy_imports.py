"""The lazy-import lint must catch every historical shape of the
executor-lazy-import bug class (five instances by round 8) and stay quiet
on legitimate module-level / driver-side imports.

No SparkSession needed — pure AST checks."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from lint_lazy_imports import check_source  # noqa: E402

# shape 1 (fits.py, r5): lazy import directly inside a mapInPandas body
BAD_MAPINPANDAS = '''
def parse_batches(it):
    for pdf in it:
        from hiss_cube_spark.sources.fits import parse_header
        yield pdf

def scan(df):
    return df.mapInPandas(parse_batches, schema="x long")
'''

# shape 2 (decode_image_np, r6): lazy import in a helper CALLED from a
# pandas_udf kernel
BAD_HELPER = '''
def _decode(payload):
    from hiss_cube_spark.operators.jpeg import decode_jpeg_np
    return decode_jpeg_np(payload)

from pyspark.sql.functions import pandas_udf

@pandas_udf("array<float>")
def kernel(s):
    return s.map(_decode)
'''

# shape 3 (spectrum_rows_from_fits, r7): helper whose per-file try/except
# would SWALLOW the ModuleNotFoundError — lint must still flag the import
BAD_SWALLOWED = '''
def rows_from_file(path):
    try:
        from hiss_cube_spark.sources.photometry_ingest import parse_one
        return parse_one(path)
    except Exception:
        return []

def bulk(df):
    return df.mapInPandas(lambda it: (rows_from_file(p) for p in it), "x long")
'''

# shape 4 (write_rice_fits, r7): applyInPandas-passed function
BAD_APPLYINPANDAS = '''
def write_group(pdf):
    from hiss_cube_spark.sources.rice import rice_encode
    return pdf

def sink(df):
    return df.groupBy("k").applyInPandas(write_group, schema="x long")
'''

# clean: module-level package import + driver-side lazy import
GOOD = '''
from hiss_cube_spark.operators.jpeg import decode_jpeg_np

def driver_side_entry(spark):
    # driver-only lazy import (CLI pattern) — never shipped to executors
    from hiss_cube_spark.plans.pipeline import CubePipeline
    return CubePipeline(spark, "/tmp/x")

def kernel_batches(it):
    for pdf in it:
        yield pdf

def scan(df):
    return df.mapInPandas(kernel_batches, schema="x long")
'''


def test_flags_mapinpandas_body():
    assert check_source(BAD_MAPINPANDAS, "x.py")


def test_flags_called_helper_of_pandas_udf():
    assert check_source(BAD_HELPER, "x.py")


def test_flags_try_except_swallowed_helper():
    assert check_source(BAD_SWALLOWED, "x.py")


def test_flags_applyinpandas_fn():
    assert check_source(BAD_APPLYINPANDAS, "x.py")


def test_quiet_on_module_level_and_driver_side():
    assert check_source(GOOD, "x.py") == []


def test_repo_is_clean():
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "lint_lazy_imports.py"), repo],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
