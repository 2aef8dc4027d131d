"""Image/spectrum ingest math (SURVEY.md S5/S6): uncertainty derivation and
the pyramid, as numpy kernels applied in mapInPandas at ingest.

Reference formulas (Photometry._get_image_with_errors, photometry.py:193-228):
    simg    = bilinear upsample of the sky HDU
    cimg    = calibration vector tiled over rows
    dn      = img / cimg + simg
    dn_err  = sqrt(dn / gain + dark_variance)
    img_err = dn_err * cimg

Spectrum transform (photometry.py:105-108, 242-246):
    wl = 10^loglam ; flux *= 1e-17 ; sigma = sqrt(1/ivar) * 1e-17
"""

from __future__ import annotations

import numpy as np

__all__ = ["derive_image_uncertainty", "bilinear_upsample", "spectrum_physical_units", "rebin_spectrum"]


def bilinear_upsample(small: np.ndarray, out_shape: tuple[int, int]) -> np.ndarray:
    """Bilinear interpolation of a small sky grid to the full frame
    (ndimage.map_coordinates order-1 equivalent, pure numpy)."""
    h, w = small.shape
    H, W = out_shape
    ys = np.linspace(0, h - 1, H)
    xs = np.linspace(0, w - 1, W)
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 2)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 2)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    a = small[y0][:, x0]
    b = small[y0][:, x0 + 1]
    c = small[y0 + 1][:, x0]
    d = small[y0 + 1][:, x0 + 1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx) + d * fy * fx)


def derive_image_uncertainty(
    img: np.ndarray,
    calib_vec: np.ndarray,
    sky_small: np.ndarray,
    gain: float,
    dark_variance: float,
) -> tuple[np.ndarray, np.ndarray]:
    """(flux, flux_sigma) from a raw frame + calibration + sky
    (ref photometry.py:193-228)."""
    H, W = img.shape
    cimg = np.tile(calib_vec.astype(np.float64), (H, 1))
    simg = bilinear_upsample(sky_small.astype(np.float64), (H, W))
    dn = img / cimg + simg
    dn_err = np.sqrt(np.clip(dn / gain, 0, None) + dark_variance)
    img_err = dn_err * cimg
    return img.astype(np.float32), img_err.astype(np.float32)


def spectrum_physical_units(
    loglam: np.ndarray, flux: np.ndarray, ivar: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(wl, flux_mean, flux_sigma) in physical units (ref photometry.py:105-108)."""
    wl = np.power(10.0, loglam)
    with np.errstate(divide="ignore"):
        sigma = np.sqrt(1.0 / ivar) * 1e-17
    return wl, flux * 1e-17, sigma


def rebin_spectrum(
    wl: np.ndarray, flux: np.ndarray, sigma: np.ndarray, grid: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Rebin onto the fixed survey grid with NaN fill outside coverage
    (ref _get_rebinned_spectrum, photometry.py:343-350 — flux-conserving via
    ``spectres`` there; linear interpolation with NaN edges here, the
    operator contract is the fixed 4620-sample grid)."""
    f = np.interp(grid, wl, flux, left=np.nan, right=np.nan)
    s = np.interp(grid, wl, sigma, left=np.nan, right=np.nan)
    return f.astype(np.float32), s.astype(np.float32)


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)


def transmission_ratio(wl: np.ndarray, curve_wl: np.ndarray, curve_ratio: np.ndarray) -> np.ndarray:
    """Interpolate a filter transmission curve at given wavelengths
    (SURVEY.md F8; ref _get_transmission_ratio, photometry.py:248-254 —
    np.interp over the merged curve, zero outside coverage)."""
    return np.interp(wl, curve_wl, curve_ratio, left=0.0, right=0.0)
