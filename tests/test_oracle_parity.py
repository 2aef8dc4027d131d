"""Every declared query must match its DuckDB oracle (the driver's t2 gate).

Runs at sf0.001 by default (fast); set HCS_TEST_SF_DIR=/root/testdata/sf0.01
to replicate the driver's exact scale.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_connection

_QUERIES = entrymod.queries()
_ORACLE = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    df = _QUERIES[name](spark, sf_dir)
    if name not in _ORACLE:
        # rows-only contract for non-SQL-expressible operators
        assert df.count() >= 0
        return
    compare(df, duck, _ORACLE[name], name)
