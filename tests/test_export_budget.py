"""Export byte-budget guard (VERDICT r11 #5): a wide-array/text table must
abort the driver-side export loudly instead of OOMing the collect, and
generous budgets keep the existing writer behavior bit-for-bit."""

import os

import pytest
from pyspark.sql import functions as F


def _fat_df(spark):
    # 200 rows x ~8 KB of text each ≈ 1.6 MB estimated payload
    return spark.range(200).select(
        F.col("id"), F.concat_ws("", F.array_repeat(F.lit("x" * 80), 100)).alias("blob")
    )


def test_budget_triggers_all_writers(spark, tmp_path):
    from hiss_cube_spark.sources.exports import (
        ExportBudgetExceeded,
        write_fits_table,
        write_votable,
        write_votable_binary,
    )

    df = _fat_df(spark)
    for writer, fname in [
        (write_votable, "t.vot"),
        (write_votable_binary, "b.vot"),
        (write_fits_table, "t.fits"),
    ]:
        path = os.path.join(tmp_path, fname)
        with pytest.raises(ExportBudgetExceeded, match="max_bytes"):
            writer(df, path, max_bytes=100_000)
        # the guard fires before the output file opens — no partial file
        assert not os.path.exists(path)


def test_budget_allows_and_row_cap_still_truncates(spark, tmp_path):
    from hiss_cube_spark.sources.exports import read_votable, write_votable

    df = _fat_df(spark)
    path = os.path.join(tmp_path, "ok.vot")
    write_votable(df, path, max_bytes=100_000_000)
    names, rows = read_votable(path)
    assert names == ["id", "blob"] and len(rows) == 200

    capped = os.path.join(tmp_path, "capped.vot")
    write_votable(df, capped, max_rows=7, max_bytes=100_000_000)
    _, rows = read_votable(capped)
    assert len(rows) == 7


def test_fits_nullable_int_degrades_to_double(spark, tmp_path):
    """Integer columns with NULLs keep the old pandas-path behavior:
    degrade to float64/'D' with NaN (FITS ints have no null sentinel)."""
    from hiss_cube_spark.sources.exports import write_fits_table
    from hiss_cube_spark.sources.fits import read_fits_bytes_header

    df = spark.createDataFrame(
        [(1, 10, 2.5), (2, None, None)], "id long, v long, x double"
    )
    path = os.path.join(tmp_path, "n.fits")
    write_fits_table(df, path)
    blob = open(path, "rb").read()
    _, pos = read_fits_bytes_header(blob, 0)
    hdr, _ = read_fits_bytes_header(blob, pos)
    assert hdr["NAXIS2"] == 2 and hdr["TFIELDS"] == 3
    forms = {hdr[f"TTYPE{i}"]: hdr[f"TFORM{i}"] for i in (1, 2, 3)}
    assert forms["id"] == "K"  # no nulls → stays integer
    assert forms["v"] == "D"  # nullable long → double with NaN
    assert forms["x"] == "D"
