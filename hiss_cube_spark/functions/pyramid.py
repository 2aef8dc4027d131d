"""Multi-resolution pyramid kernels (SURVEY.md F10/F11) — pure numpy,
applied at ingest via mapInPandas (never at query time).

Reference semantics (utils/photometry.py:256-306): spectra halve per zoom via
Gaussian smoothing (σ=2) + interpolation onto a n//2 grid with flux sigma/2
per level; images halve per zoom via 2-D resize with sigma/4 per level.
Pinned ladders (tests/test_cube_utils.py:14,32):
spectra [4620, 2310, 1155, 577, 288]; images [(2048,1489) … (128,93)].

cv2/scipy are not available here; the 2-D resize is an area-average (the
pyramid contract is the ladder of shapes + sigma scaling, not bit-parity
with cv2 INTER_CUBIC).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "gaussian_kernel",
    "downsample_spectrum",
    "downsample_image",
    "spectrum_zoom_lengths",
    "image_zoom_shapes",
]


def gaussian_kernel(sigma: float = 2.0, half_width: int | None = None) -> np.ndarray:
    """Normalized 1-D Gaussian kernel over ±4σ."""
    if half_width is None:
        half_width = int(4 * sigma)
    x = np.arange(-half_width, half_width + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2 * sigma * sigma))
    return k / k.sum()


def downsample_spectrum(
    wl: np.ndarray, flux: np.ndarray, sigma: np.ndarray, kernel_sigma: float = 2.0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One pyramid step: smooth, interpolate onto an n//2 grid, σ/2.

    NaNs are carried through interpolation (reference keeps NaN fill values,
    photometry.py:347-349).
    """
    n2 = len(wl) // 2
    new_wl = np.linspace(wl[0], wl[-1], n2)
    # convolve(mode="same") returns the kernel length when it exceeds the
    # signal — cap the kernel so short (deep-zoom) spectra stay intact
    k = gaussian_kernel(kernel_sigma, half_width=min(int(4 * kernel_sigma), max((len(wl) - 1) // 2, 1)))
    # NaN-aware smoothing: convolve values and the valid mask separately.
    valid = np.isfinite(flux)
    fz = np.where(valid, flux, 0.0)
    wsum = np.convolve(valid.astype(np.float64), k, mode="same")
    smooth = np.convolve(fz, k, mode="same")
    with np.errstate(invalid="ignore"):
        smooth = np.where(wsum > 1e-12, smooth / wsum, np.nan)
    new_flux = np.interp(new_wl, wl, smooth)
    new_sigma = np.interp(new_wl, wl, sigma) / 2.0
    return new_wl, new_flux.astype(np.float32), new_sigma.astype(np.float32)


def downsample_image(data: np.ndarray, errors: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One pyramid step: 2×2 area-average to (h//2, w//2), σ/4.

    NaN-aware only when NaNs are present — np.nanmean is ~10× slower than
    mean and full frames are usually finite."""
    h, w = data.shape
    h2, w2 = h // 2, w // 2
    d = data[: 2 * h2, : 2 * w2].reshape(h2, 2, w2, 2)
    e = errors[: 2 * h2, : 2 * w2].reshape(h2, 2, w2, 2)
    mean = np.nanmean if (np.isnan(data).any() or np.isnan(errors).any()) else np.mean
    with np.errstate(invalid="ignore"):
        dd = mean(mean(d, axis=3), axis=1)
        ee = mean(mean(e, axis=3), axis=1) / 4.0
    return dd.astype(np.float32), ee.astype(np.float32)


def spectrum_zoom_lengths(n0: int, zooms: int) -> list[int]:
    """Sample-count ladder: n, n//2, n//4, ... (reference pins
    [4620, 2310, 1155, 577, 288])."""
    out = [n0]
    for _ in range(zooms - 1):
        out.append(out[-1] // 2)
    return out


def image_zoom_shapes(w0: int, h0: int, zooms: int) -> list[tuple[int, int]]:
    """(width, height) ladder (reference pins [(2048,1489) … (128,93)])."""
    out = [(w0, h0)]
    for _ in range(zooms - 1):
        w, h = out[-1]
        out.append((w // 2, h // 2))
    return out


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
