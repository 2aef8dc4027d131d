"""Progressive JPEG (SOF2) — T.81 Annex G spectral selection +
successive approximation.

The progressive encoder's scan script (DC first at Al=1, per-component AC
first, DC refine, per-component AC refine) exercises every decoder branch:
EOBRUN block skips, ZRL in refinement, newly-significant coefficients, and
correction bits. Because both encoders quantize identically, progressive
decode must be BIT-IDENTICAL to baseline decode of the same image at the
same quality/subsampling — that is the strongest available oracle and the
test pins it across shapes, subsampling, grayscale, and quality levels.

Reference parity note: the reference stack reads whatever fitsio/Pillow
accept; a web corpus mixes baseline and progressive JPEG, so the in-repo
codec needs both (VERDICT r4 item 6).
"""

import numpy as np
import pytest

from hiss_cube_spark.operators.jpeg import (
    decode_jpeg_np,
    encode_jpeg_np,
    encode_jpeg_progressive_np,
)
from hiss_cube_spark.operators.multimodal import decode_image_np


def _noise_img(rng, shape):
    base = 128 + 60 * np.sin(
        np.linspace(0, 8, shape[0] * shape[1] * 3)
    ).reshape(shape + (3,))
    return np.clip(base + rng.normal(0, 12, shape + (3,)), 0, 255).astype(np.uint8)


@pytest.mark.parametrize(
    "shape,sub",
    [
        ((32, 48), "444"),
        ((32, 48), "420"),
        ((17, 23), "444"),  # odd dims: padded block grid + crop
        ((16, 16), "420"),
        ((24, 40), "420"),
        ((8, 8), "444"),    # single block
        ((64, 96), "420"),
    ],
)
def test_progressive_matches_baseline_bitexact(shape, sub):
    rng = np.random.default_rng(hash(shape) % (2**32))
    img = _noise_img(rng, shape)
    base = decode_jpeg_np(encode_jpeg_np(img, 85, sub))
    prog = decode_jpeg_np(encode_jpeg_progressive_np(img, 85, sub))
    np.testing.assert_array_equal(base, prog)


@pytest.mark.parametrize("quality", [50, 75, 95])
def test_progressive_quality_sweep(quality):
    rng = np.random.default_rng(quality)
    img = np.clip(rng.normal(128, 40, (24, 32, 3)), 0, 255).astype(np.uint8)
    base = decode_jpeg_np(encode_jpeg_np(img, quality, "444"))
    prog = decode_jpeg_np(encode_jpeg_progressive_np(img, quality, "444"))
    np.testing.assert_array_equal(base, prog)


def test_progressive_grayscale():
    rng = np.random.default_rng(7)
    g = np.clip(rng.normal(120, 30, (20, 28)), 0, 255).astype(np.uint8)
    base = decode_jpeg_np(encode_jpeg_np(g, 85))
    prog = decode_jpeg_np(encode_jpeg_progressive_np(g, 85))
    np.testing.assert_array_equal(base, prog)
    assert prog.shape == (20, 28, 3)  # gray broadcasts to 3 channels


def test_progressive_stream_structure():
    """The blob is genuinely progressive: SOF2 marker, no SOF0, and the
    6-scan color script (DC + 3xAC-first + DC-refine + 3xAC-refine = 8)."""
    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    blob = encode_jpeg_progressive_np(img, 85, "444")
    assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob
    n_sos = blob.count(b"\xff\xda")
    assert n_sos == 8
    # and it flows the generic image dispatch (JPEG magic)
    dec = decode_image_np(blob)
    assert dec.shape == (16, 16, 3)
    assert np.abs(dec.astype(int) - 77).max() <= 1


def test_progressive_reconstruction_error_bound():
    """Same lossy-error contract as baseline: smooth content at q95
    reconstructs within the mm_jpeg_pipeline tolerance (<8 mean err)."""
    h, w = 24, 24
    yy = np.arange(h)[:, None] / h
    xx = np.arange(w)[None, :] / w
    chans = [
        128.0 + 80.0 * np.sin(2 * np.pi * (xx + yy + c * 0.17)) for c in range(3)
    ]
    img = np.clip(np.round(np.stack(chans, -1)), 0, 255).astype(np.uint8)
    for sub in ("444", "420"):
        dec = decode_jpeg_np(encode_jpeg_progressive_np(img, 95, sub))
        err = np.abs(dec.astype(float) - img.astype(float)).mean()
        assert err < 8.0, (sub, err)


def test_progressive_422_matches_baseline():
    """Progressive 4:2:2 decodes bit-identically to baseline 4:2:2 at the
    same quality (coefficients identical; only scan order differs)."""
    import numpy as np

    from hiss_cube_spark.operators.jpeg import (
        decode_jpeg_np,
        encode_jpeg_np,
        encode_jpeg_progressive_np,
    )

    rng = np.random.default_rng(11)
    y, x = np.mgrid[0:16, 0:24]
    px = np.clip(
        np.stack(
            [128 + 70 * np.sin(2 * np.pi * (x / 24 + y / 16 + c * 0.15))
             for c in range(3)],
            axis=-1,
        ).round(),
        0, 255,
    ).astype(np.uint8)
    base = decode_jpeg_np(encode_jpeg_np(px, quality=92, subsampling="422"))
    prog = decode_jpeg_np(
        encode_jpeg_progressive_np(px, quality=92, subsampling="422")
    )
    np.testing.assert_array_equal(base, prog)
