"""Full-scale synthetic galaxy_small: the reference's SHAPES, not its
(unavailable) pixel blobs.

The real galaxy_small FITS set is absent from the reference snapshot
(/root/reference/.MISSING_LARGE_BLOBS), so a value-golden e2e against it
is impossible — but its pinned counts are pure cardinality laws of the
shapes, and those ARE reproducible exactly:

    185 images  = 37 fields x 5 bands, 2048x1489 px   (F11 ladder
                  [(2048,1489),(1024,744),(512,372),(256,186),(128,93)])
    11 spectra  = 4620 samples                         (F10 ladder
                  [4620, 2310, 1155, 577, 288])
    64-px cutouts at zoom 0 (16x16 at zoom 2 — ref test_export.py:98)

    viz cube @ zoom 0: 11*4620 + 11*5*64**2      = 276,100
    viz cube @ zoom 3: 11*577  + 11*5*(64>>3)**2 =   9,867

matching /root/reference/hisscube/tests/test_export.py:63,92 exactly.

Geometry mirrors tests/astro_fixtures.py (fields 0.08 deg apart, every
spectrum at the center of field spec_id % 37, spectra 0/1 and 2/3 share
positions so they form multi-epoch targets); pixel content is seeded
PER IMAGE (rng(_IMG_SEED + img_id)) so any single image is regenerable
driver-side for value oracles without holding the 6 GB corpus.

Images are synthesized EXECUTOR-side (seed table -> mapInPandas): the
185 x 2048x1489 x (data+errors) corpus is ~6 GB of float32 — exactly the
shape a real 100 TB ingest has, where pixels are born in tasks, never on
the driver.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from hiss_cube_spark.functions.pyramid import downsample_image, downsample_spectrum
from hiss_cube_spark.functions.spatial import _ang2pix_nest_np

from astro_fixtures import (
    BANDS,
    IMAGES_SCHEMA,
    N_FIELDS,
    N_SPECTRA,
    SPECTRA_SCHEMA,
    ZOOMS,
    field_center,
)

IMG_W, IMG_H = 2048, 1489
SPEC_N = 4620
CUTOUT = 64
PIX_SCALE = 0.00011  # ~0.396 arcsec/px, the SDSS frame scale
_IMG_SEED = 42_000
_SPEC_SEED = 7_000

#: spectra 0/1 share field 0; 2/3 share field 1; rest unique fields
FIELD_OF_SPEC = [0, 0, 1, 1, 2, 3, 4, 5, 6, 7, 8]


def synth_image(img_id: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic full-frame (data, errors) for one image id —
    regenerable anywhere (test oracles re-call this driver-side)."""
    rng = np.random.default_rng(_IMG_SEED + img_id)
    data = rng.uniform(0.5, 2.0, (IMG_H, IMG_W)).astype(np.float32)
    errors = rng.uniform(0.05, 0.2, (IMG_H, IMG_W)).astype(np.float32)
    return data, errors


def synth_spectrum(spec_id: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    rng = np.random.default_rng(_SPEC_SEED + spec_id)
    wl = np.linspace(3839.7244, 8914.597, SPEC_N)
    flux = rng.uniform(0.5, 5.0, SPEC_N).astype(np.float32)
    flux[rng.integers(0, SPEC_N, 5)] = np.nan
    sig = rng.uniform(0.05, 0.5, SPEC_N).astype(np.float32)
    return wl, flux, sig


def _image_rows(img_id: int) -> list[tuple]:
    f, bi = divmod(img_id, len(BANDS))
    band, wl = BANDS[bi]
    ra, dec = field_center(f)
    hp = int(_ang2pix_nest_np(np.array([ra]), np.array([dec]), 1 << 10)[0])
    d, e = synth_image(img_id)
    h, w = d.shape
    rows = []
    for z in range(ZOOMS):
        wcs = (
            float((IMG_W / 2) / (1 << z)),
            float((IMG_H / 2) / (1 << z)),
            float(PIX_SCALE * (1 << z)), 0.0, 0.0,
            float(PIX_SCALE * (1 << z)),
            float(ra), float(dec), "RA---TAN", "DEC--TAN",
        )
        rows.append(
            (img_id, 1000 + f, (f % 6) + 1, f, band, wl,
             55000.0 + f + 0.1 * bi, ra, dec, hp, z, w, h, wcs,
             d.tolist(), e.tolist())
        )
        if z < ZOOMS - 1:
            d, e = downsample_image(d, e)
            h, w = d.shape
    return rows


def make_images_fullscale(spark: SparkSession) -> DataFrame:
    """185 x (2048x1489) images, all 5 zooms, synthesized in executors."""
    import pandas as pd

    n_images = N_FIELDS * len(BANDS)
    seeds = spark.range(n_images).repartition(n_images)

    def _gen(batches):
        for pdf in batches:
            for img_id in pdf["id"]:
                yield pd.DataFrame(
                    _image_rows(int(img_id)),
                    columns=[f.name for f in IMAGES_SCHEMA.fields],
                )

    return seeds.mapInPandas(_gen, schema=IMAGES_SCHEMA)


def make_spectra_fullscale(spark: SparkSession) -> DataFrame:
    """11 x 4620-sample spectra, all 5 zooms (small: built driver-side)."""
    rows = []
    for s in range(N_SPECTRA):
        ra, dec = field_center(FIELD_OF_SPEC[s])
        w, fl, sg = synth_spectrum(s)
        hp = int(_ang2pix_nest_np(np.array([ra]), np.array([dec]), 1 << 15)[0])
        for z in range(ZOOMS):
            rows.append(
                (s, 3000 + s if s < 7 else 9000 + s, 56000 + s, s + 1,
                 ra, dec, hp, 56000.0 + s, z,
                 np.asarray(w, dtype=np.float32).tolist(),
                 np.asarray(fl, dtype=np.float32).tolist(),
                 np.asarray(sg, dtype=np.float32).tolist())
            )
            if z < ZOOMS - 1:
                w, fl, sg = downsample_spectrum(
                    np.asarray(w, dtype=np.float64), fl, sg
                )
    return spark.createDataFrame(rows, SPECTRA_SCHEMA)


# mapInPandas closures reference this module (and astro_fixtures) from
# executor workers, where tests/ is not importable — ship both by value,
# the same cloudpickle registration every UDF-bearing package module uses.
from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self("astro_fixtures")
_register_self(__name__)
