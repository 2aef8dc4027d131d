"""Deterministic synthetic astronomy fixtures per FIXTURES.md.

Mirrors the reference's galaxy_small shape at toy dimensions: 185 images
(37 fields × 5 bands) of 64×48 px, 11 spectra of 128 samples, 5 zoom levels.
Spectra 0/1 and 2/3 share positions (same "object") so they form ML-cube
targets; every spectrum sits at the center of field (spec_id % 37).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from hiss_cube_spark.functions.pyramid import downsample_image, downsample_spectrum
from hiss_cube_spark.functions.spatial import _ang2pix_nest_np

BANDS = [("u", 3551), ("g", 4686), ("r", 6166), ("i", 7480), ("z", 8932)]
N_FIELDS = 37
N_SPECTRA = 11
ZOOMS = 5
IMG_W, IMG_H = 64, 48
SPEC_N = 128
PIX_SCALE = 0.0004  # deg/px

_WCS_T = StructType(
    [
        StructField("crpix1", FloatType()),
        StructField("crpix2", FloatType()),
        StructField("cd1_1", FloatType()),
        StructField("cd1_2", FloatType()),
        StructField("cd2_1", FloatType()),
        StructField("cd2_2", FloatType()),
        StructField("crval1", FloatType()),
        StructField("crval2", FloatType()),
        StructField("ctype1", StringType()),
        StructField("ctype2", StringType()),
    ]
)

IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", LongType()),
        StructField("run", IntegerType()),
        StructField("camcol", IntegerType()),
        StructField("field", IntegerType()),
        StructField("band", StringType()),
        StructField("wl", IntegerType()),
        StructField("tai_time", DoubleType()),
        StructField("ra", DoubleType()),
        StructField("dec", DoubleType()),
        StructField("healpix", LongType()),
        StructField("zoom", IntegerType()),
        StructField("naxis1", IntegerType()),
        StructField("naxis2", IntegerType()),
        StructField("wcs", _WCS_T),
        StructField("data", ArrayType(ArrayType(FloatType()))),
        StructField("errors", ArrayType(ArrayType(FloatType()))),
    ]
)

SPECTRA_SCHEMA = StructType(
    [
        StructField("spec_id", LongType()),
        StructField("plateid", IntegerType()),
        StructField("mjd", IntegerType()),
        StructField("fiberid", IntegerType()),
        StructField("plug_ra", DoubleType()),
        StructField("plug_dec", DoubleType()),
        StructField("healpix", LongType()),
        StructField("time", DoubleType()),
        StructField("zoom", IntegerType()),
        StructField("wl", ArrayType(FloatType())),
        StructField("flux_mean", ArrayType(FloatType())),
        StructField("flux_sigma", ArrayType(FloatType())),
    ]
)


def field_center(f: int) -> tuple[float, float]:
    return 30.0 + (f % 8) * 0.08, 10.0 + (f // 8) * 0.08


def make_images(spark: SparkSession) -> "DataFrame":
    rng = np.random.default_rng(42)
    rows = []
    img_id = 0
    for f in range(N_FIELDS):
        ra, dec = field_center(f)
        for bi, (band, wl) in enumerate(BANDS):
            base = rng.uniform(0.5, 2.0, (IMG_H, IMG_W)).astype(np.float32)
            err = rng.uniform(0.05, 0.2, (IMG_H, IMG_W)).astype(np.float32)
            d, e = base, err
            w, h = IMG_W, IMG_H
            for z in range(ZOOMS):
                wcs = (
                    float((IMG_W / 2) / (1 << z)),
                    float((IMG_H / 2) / (1 << z)),
                    float(PIX_SCALE * (1 << z)),
                    0.0,
                    0.0,
                    float(PIX_SCALE * (1 << z)),
                    float(ra),
                    float(dec),
                    "RA---TAN",
                    "DEC--TAN",
                )
                rows.append(
                    (
                        img_id,
                        1000 + f,
                        (f % 6) + 1,
                        f,
                        band,
                        wl,
                        55000.0 + f + 0.1 * bi,
                        ra,
                        dec,
                        int(_ang2pix_nest_np(np.array([ra]), np.array([dec]), 1 << 10)[0]),
                        z,
                        w,
                        h,
                        wcs,
                        d.tolist(),
                        e.tolist(),
                    )
                )
                if z < ZOOMS - 1:
                    d, e = downsample_image(d, e)
                    h, w = d.shape
            img_id += 1
    return spark.createDataFrame(rows, IMAGES_SCHEMA)


def make_spectra(spark: SparkSession) -> "DataFrame":
    rng = np.random.default_rng(7)
    rows = []
    # spectra 0/1 share field 0; 2/3 share field 1; rest unique fields
    field_of = [0, 0, 1, 1, 2, 3, 4, 5, 6, 7, 8]
    for s in range(N_SPECTRA):
        ra, dec = field_center(field_of[s])
        wl = np.linspace(3839.7244, 8914.597, SPEC_N)
        flux = rng.uniform(0.5, 5.0, SPEC_N).astype(np.float32)
        flux[rng.integers(0, SPEC_N, 5)] = np.nan  # rebin NaN fill
        sig = rng.uniform(0.05, 0.5, SPEC_N).astype(np.float32)
        w, fl, sg = wl, flux, sig
        for z in range(ZOOMS):
            rows.append(
                (
                    s,
                    3000 + s if s < 7 else 9000 + s,  # 4 spectra won't match SFR
                    56000 + s,
                    s + 1,
                    ra,
                    dec,
                    int(_ang2pix_nest_np(np.array([ra]), np.array([dec]), 1 << 15)[0]),
                    56000.0 + s,
                    z,
                    np.asarray(w, dtype=np.float32).tolist(),
                    np.asarray(fl, dtype=np.float32).tolist(),
                    np.asarray(sg, dtype=np.float32).tolist(),
                )
            )
            if z < ZOOMS - 1:
                w, fl, sg = downsample_spectrum(np.asarray(w, dtype=np.float64), fl, sg)
    return spark.createDataFrame(rows, SPECTRA_SCHEMA)


def make_sfr_tables(spark: SparkSession):
    """gal_info/gal_sfr: 7 of the 11 spectra match (ref tests/test_sfr.py:57)."""
    info_rows = [(i, 3000 + i, 56000 + i, i + 1, 30.0 + i, 10.0 + i) for i in range(7)]
    info_rows += [(7 + j, 8000 + j, 50000 + j, 99 + j, 1.0, 1.0) for j in range(5)]
    gal_info = spark.createDataFrame(
        info_rows, "row_id long, PLATEID int, MJD int, FIBERID int, RA double, DEC double"
    )
    sfr_rows = [(i, 1.5 * i, 1.6 * i) for i in range(12)]
    gal_sfr = spark.createDataFrame(sfr_rows, "row_id long, MEDIAN double, AVG double")
    return gal_info, gal_sfr
