"""Real (dependency-free) image pipeline: PPM decode → bilinear resize →
features, plus kernel-level pins. The library-backed formats stay stubbed;
this proves the Spark-side plumbing end-to-end with true pixel data."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hiss_cube_spark.operators.multimodal import (
    bilinear_resize_np,
    decode_images,
    decode_ppm_np,
    encode_ppm_np,
    image_features,
    resize_images,
)


def _payload_df(spark, images):
    rows = [(i, bytearray(encode_ppm_np(img))) for i, img in enumerate(images)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_ppm_roundtrip_and_comments():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    assert (decode_ppm_np(encode_ppm_np(img)) == img).all()
    commented = b"P6\n# hi\n7 5\n255\n" + img.tobytes()
    assert (decode_ppm_np(commented) == img).all()
    with pytest.raises(ValueError):
        decode_ppm_np(b"P5\n1 1\n255\n\x00")


def test_bilinear_identity_and_interpolation():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    # identity: same size reproduces the image exactly
    assert np.allclose(bilinear_resize_np(img, 6, 6), img.astype(np.float64))
    # 2x upscale of a 2-pixel gradient: midpoints average the neighbors
    grad = np.zeros((1, 2, 3), np.uint8)
    grad[0, 1] = 100
    up = bilinear_resize_np(grad, 1, 4)
    assert np.allclose(up[0, :, 0], [0.0, 25.0, 75.0, 100.0])


def test_distributed_decode_resize_features(spark):
    rng = np.random.default_rng(5)
    images = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
              for h, w in [(4, 6), (8, 3), (2, 2)]]
    df = _payload_df(spark, images)

    dec = decode_images(df)
    got = {r["doc_id"]: r for r in dec.collect()}
    for i, img in enumerate(images):
        r = got[i]
        assert (r["height"], r["width"], r["channels"]) == img.shape
        back = (np.array(r["pixels"], np.float32) * 255.0).round().astype(np.uint8)
        assert (back.reshape(img.shape) == img).all()

    res = {r["doc_id"]: r for r in resize_images(dec, 4, 4).collect()}
    for i, img in enumerate(images):
        expect = bilinear_resize_np(img.astype(np.float64) / 255.0, 4, 4)
        gotpx = np.array(res[i]["pixels"], np.float64).reshape(4, 4, 3)
        assert np.allclose(gotpx, expect, atol=1e-6)

    feats = {r["doc_id"]: np.array(r["feature"]) for r in image_features(dec).collect()}
    for i, img in enumerate(images):
        f = feats[i]
        assert len(f) == 3 + 3 + 8
        assert np.allclose(f[:3], (img / 255.0).mean((0, 1)), atol=1e-6)
        assert abs(f[6:].sum() - 1.0) < 1e-6  # histogram L1-normalized


def test_image_features_feed_similarity_search(spark):
    """Interop: image features are a first-class embedding for the ANN
    operators — near-identical images must be each other's top neighbor."""
    from hiss_cube_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(6)
    base = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    twin = base.copy()
    twin[0, 0] = (int(base[0, 0, 0]) + 1) % 256  # one-pixel difference
    other = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    feats = image_features(decode_images(_payload_df(spark, [base, twin, other])))
    e = feats.select(F.col("doc_id").alias("vec_id"), F.col("feature").alias("embedding"))
    top = {
        r["query_id"]: r["neighbor_id"]
        for r in cosine_topk(e.where(F.col("vec_id") < 2), e, k=1).collect()
    }
    assert top == {0: 1, 1: 0}


def test_image_phash_pinned_and_invariances(spark):
    """dHash bit semantics pinned analytically: a left-to-right luma ramp
    has every horizontal gradient positive -> all 64 bits set -> int64 -1;
    its mirror image -> 0. aHash of a half-dark/half-light split sets
    exactly the bright half. Global brightness shift leaves dHash
    unchanged; small noise stays within a few bits; a different image is
    far away."""
    import numpy as np

    from hiss_cube_spark.operators.multimodal import (
        decode_images,
        encode_ppm_np,
        image_phash,
        phash_neardup_pairs,
    )

    ramp = np.tile(np.linspace(0, 255, 32, dtype=np.uint8)[None, :, None], (16, 1, 3))
    mirror = ramp[:, ::-1, :]
    bright = np.clip(ramp.astype(np.int64) + 40, 0, 255).astype(np.uint8)
    rng = np.random.default_rng(5)
    noisy = np.clip(ramp.astype(np.int64) + rng.integers(-6, 7, ramp.shape), 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, ramp.shape).astype(np.uint8)
    half = np.zeros((16, 32, 3), np.uint8)
    half[:, 16:, :] = 255

    df = spark.createDataFrame(
        [(i, bytearray(encode_ppm_np(img)))
         for i, img in enumerate([ramp, mirror, bright, noisy, other, half])],
        "doc_id long, payload binary",
    )
    dec = decode_images(df)
    d = {r.doc_id: r.phash for r in image_phash(dec, kind="dhash").collect()}
    assert d[0] == -1          # all gradients positive -> 64 ones -> int64 -1
    assert d[1] == 0           # mirrored ramp: all negative
    assert d[2] == d[0]        # brightness shift invariant
    assert bin((d[0] ^ d[3]) & (2**64 - 1)).count("1") <= 6   # noise: few bits
    assert bin((d[0] ^ d[4]) & (2**64 - 1)).count("1") >= 16  # unrelated: far

    a = {r.doc_id: r.phash for r in image_phash(dec, kind="ahash").collect()}
    # half image: bright right half -> bits 1 on right 4 cols of each row
    row = int("00001111", 2)
    want = 0
    for _ in range(8):
        want = (want << 8) | row
    assert a[5] == np.int64(np.uint64(want))

    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in phash_neardup_pairs(
            image_phash(dec, kind="dhash"), max_hamming=7
        ).collect()
    }
    assert (0, 2) in pairs and pairs[(0, 2)] == 0   # identical hashes pair up
    assert (0, 3) in pairs                           # noisy ramp found
    assert (0, 4) not in pairs and (0, 1) not in pairs


def test_wav_roundtrip_exact():
    import numpy as np

    from hiss_cube_spark.operators.multimodal import decode_wav_np, encode_wav_np

    x = np.linspace(-1, 1, 1000)
    payload = encode_wav_np(x, rate=8000)
    back, rate = decode_wav_np(payload)
    assert rate == 8000 and len(back) == 1000
    # 16-bit quantization: within 1/32767 of the original
    assert np.max(np.abs(back - x)) < 1.1 / 32767


def test_wav_decode_rejects_non_pcm():
    import numpy as np
    import pytest as pt

    from hiss_cube_spark.operators.multimodal import decode_wav_np, encode_wav_np

    payload = bytearray(encode_wav_np(np.zeros(10), rate=8000))
    payload[20] = 85  # fmt tag 1 (PCM) -> 85 (mu-law-ish)
    with pt.raises(NotImplementedError):
        decode_wav_np(bytes(payload))
    with pt.raises(ValueError):
        decode_wav_np(b"nope" + bytes(payload[4:]))


def test_audio_features_pinned_sine(spark):
    import numpy as np

    from hiss_cube_spark.operators.multimodal import (
        audio_features,
        decode_audio,
        encode_wav_np,
    )

    rate, freq = 8000, 1000
    t = np.arange(8000) / rate  # exactly 1 s
    x = 0.5 * np.sin(2 * np.pi * freq * t)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav_np(x, rate)))], "doc_id long, payload binary"
    )
    r = audio_features(decode_audio(df)).collect()[0]
    assert r["duration_s"] == 1.0
    assert abs(r["rms"] - 0.5 / np.sqrt(2)) < 1e-3  # sine RMS = A/√2
    # a 1 kHz sine crosses zero 2f times per second
    assert abs(r["zero_cross_rate"] - 2 * freq / rate) < 1e-3
    assert abs(r["spectral_centroid_hz"] - freq) < 5.0
    bands = r["band_energy"]
    assert abs(sum(bands) - 1.0) < 1e-6
    # 1 kHz in a 0-4 kHz range, 8 bands of 500 Hz → band index 2
    assert bands[2] > 0.95


def test_audio_fingerprint_robust_to_gain_and_noise(spark):
    import numpy as np

    from hiss_cube_spark.operators.multimodal import (
        audio_fingerprint,
        audio_neardup_pairs,
    )

    rng = np.random.default_rng(7)
    n, rate = 4096, 16_000
    t = np.arange(n) / rate
    # broadband base (tones + texture): real audio never has digitally
    # silent bands, whose delta signs would be noise-determined coin flips
    base = (
        np.sin(2 * np.pi * 440 * t)
        + 0.5 * np.sin(2 * np.pi * 1200 * t)
        + 0.1 * rng.standard_normal(n)
    )
    rows = [
        (1, base.tolist(), rate),                                    # original
        (2, (base * 0.3).tolist(), rate),                            # gain change
        (3, (base + rng.standard_normal(n) * 0.02).tolist(), rate),  # light noise
        (4, rng.standard_normal(n).tolist(), rate),                  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, samples array<double>, rate int")
    fps = audio_fingerprint(df)
    got = {r["doc_id"]: r["afp"] for r in fps.collect()}
    assert got[1] == got[2]  # log-energy deltas are gain-invariant

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(got[1], got[3]) <= 7       # light noise stays within the gate
    assert ham(got[1], got[4]) > 7        # unrelated audio does not

    pairs = {(r["doc_a"], r["doc_b"]) for r in audio_neardup_pairs(fps).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert all(4 not in p for p in pairs)


def test_png_roundtrip_all_channel_counts():
    from hiss_cube_spark.operators.multimodal import decode_png_np, encode_png_np

    rng = np.random.default_rng(7)
    for shape in ((5, 4), (5, 4, 1), (6, 3, 3), (4, 7, 4)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_png_np(encode_png_np(img))
        want = img[:, :, None] if img.ndim == 2 else img
        np.testing.assert_array_equal(out, want)


def test_png_all_five_filters_reconstruct():
    """Hand-build IDAT scanlines with every filter type (applying each
    filter FORWARD per the spec), then check the decoder inverts them to
    the original pixels exactly."""
    import struct
    import zlib

    from hiss_cube_spark.operators.multimodal import _paeth, decode_png_np

    rng = np.random.default_rng(11)
    h, w, c = 5, 6, 3
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    stride, bpp = w * c, c

    def filt(y, ftype):
        cur = img[y].reshape(-1).astype(np.int64)
        prev = img[y - 1].reshape(-1).astype(np.int64) if y > 0 else np.zeros(stride, np.int64)
        out = np.empty(stride, np.int64)
        for i in range(stride):
            left = cur[i - bpp] if i >= bpp else 0
            ul = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                out[i] = cur[i]
            elif ftype == 1:
                out[i] = cur[i] - left
            elif ftype == 2:
                out[i] = cur[i] - prev[i]
            elif ftype == 3:
                out[i] = cur[i] - (left + prev[i]) // 2
            else:
                out[i] = cur[i] - _paeth(int(left), int(prev[i]), int(ul))
        return bytes([ftype]) + (out & 0xFF).astype(np.uint8).tobytes()

    raw = b"".join(filt(y, y % 5) for y in range(h))

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png_np(payload), img)


def test_png_rejects_bad_crc_and_unsupported():
    import pytest

    from hiss_cube_spark.operators.multimodal import decode_png_np, encode_png_np

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = bytearray(encode_png_np(img))
    good[-5] ^= 0xFF  # flip a bit inside the final chunk → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png_np(bytes(good))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png_np(b"JFIF....")


def test_decode_image_np_dispatch_and_stub():
    import pytest

    from hiss_cube_spark.operators.multimodal import (
        decode_image_np,
        encode_png_np,
        encode_ppm_np,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image_np(encode_png_np(img)), img)
    np.testing.assert_array_equal(decode_image_np(encode_ppm_np(img)), img)
    # grayscale broadcasts, alpha drops — callers always see (h, w, 3)
    g = rng.integers(0, 256, (4, 5), dtype=np.uint8)
    got = decode_image_np(encode_png_np(g))
    assert got.shape == (4, 5, 3)
    np.testing.assert_array_equal(got[:, :, 0], g)
    rgba = rng.integers(0, 256, (4, 5, 4), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image_np(encode_png_np(rgba)), rgba[:, :, :3])
    # JPEG magic dispatches into the real decoder: garbage after the SOI
    # marker is a parse error, and a genuine encode->decode roundtrip
    # reconstructs a flat image exactly (DC-only => lossless at q95)
    with pytest.raises(ValueError):
        decode_image_np(b"\xff\xd8\xff\xe0 jpeg bytes")
    from hiss_cube_spark.operators.jpeg import encode_jpeg_np

    flat = np.full((8, 8, 3), 99, dtype=np.uint8)
    dec = decode_image_np(encode_jpeg_np(flat, quality=95, subsampling="444"))
    assert dec.shape == (8, 8, 3)
    assert np.abs(dec.astype(int) - 99).max() <= 1


def test_distributed_pipeline_on_png(spark):
    """PNG payloads flow the whole decode→resize→features pipeline with
    pixels identical to the PPM path (lossless codec ⇒ same features)."""
    from hiss_cube_spark.operators.multimodal import (
        decode_images,
        encode_png_np,
        encode_ppm_np,
    )

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (6, 8, 3), dtype=np.uint8) for _ in range(4)]
    rows_png = [(i, bytearray(encode_png_np(im))) for i, im in enumerate(imgs)]
    rows_ppm = [(i, bytearray(encode_ppm_np(im))) for i, im in enumerate(imgs)]
    png = decode_images(spark.createDataFrame(rows_png, "doc_id long, payload binary"))
    ppm = decode_images(spark.createDataFrame(rows_ppm, "doc_id long, payload binary"))
    a = {r["doc_id"]: r["pixels"] for r in png.collect()}
    b = {r["doc_id"]: r["pixels"] for r in ppm.collect()}
    assert a == b


def test_y4m_roundtrip_and_c420_parse():
    import pytest

    from hiss_cube_spark.operators.multimodal import decode_y4m_np, encode_y4m_np

    rng = np.random.default_rng(2)
    fr = rng.integers(0, 256, (4, 6, 8), dtype=np.uint8)
    out, fps = decode_y4m_np(encode_y4m_np(fr, fps=30))
    np.testing.assert_array_equal(out, fr)
    assert fps == 30
    # C420 chroma-subsampled path with a parameterized FRAME marker
    y = np.arange(8, dtype=np.uint8)
    chroma = bytes(2 * (2 * 1))
    payload = (b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n"
               + b"FRAME\n" + y.tobytes() + chroma
               + b"FRAME Xvlc\n" + y[::-1].copy().tobytes() + chroma)
    fr2, _ = decode_y4m_np(payload)
    assert fr2.shape == (2, 2, 4)
    np.testing.assert_array_equal(fr2[1].reshape(-1), y[::-1])
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m_np(b"RIFFxxxx")
    with pytest.raises(NotImplementedError, match="colorspace"):
        decode_y4m_np(b"YUV4MPEG2 W2 H2 C422\nFRAME\n" + bytes(8))


def test_video_frame_features_scene_cut(spark):
    """Shot-boundary detection over a real Y4M clip: constant 50-luma
    frames, one jump to 200 at frame 2 — exactly one cut flagged there."""
    from hiss_cube_spark.operators.multimodal import (
        encode_y4m_np,
        video_frame_features,
    )

    frames = np.stack([np.full((8, 8), 50 if f < 2 else 200, np.uint8) for f in range(5)])
    df = spark.createDataFrame(
        [(1, bytearray(encode_y4m_np(frames)))], "doc_id long, payload binary"
    )
    rows = {r["frame_id"]: r for r in video_frame_features(df).collect()}
    assert [rows[f]["scene_cut"] for f in range(5)] == [0, 0, 1, 0, 0]
    assert rows[0]["mean_luma"] == 50.0 and rows[4]["mean_luma"] == 200.0
    assert rows[2]["frame_diff"] == 150.0 and rows[3]["frame_diff"] == 0.0


def test_y4m_color_roundtrip():
    """Color Y4M: C444 YUV roundtrips exactly; C420 box-downsampled chroma
    comes back within one 2x2 block mean of smooth source chroma, and
    constant chroma roundtrips exactly; mono luma API is unchanged."""
    import numpy as np

    from hiss_cube_spark.operators.multimodal import decode_y4m_np, encode_y4m_np

    rng = np.random.default_rng(7)
    yuv = rng.integers(0, 256, size=(3, 8, 10, 3)).astype(np.uint8)
    out, fps = decode_y4m_np(encode_y4m_np(yuv, fps=24), return_color=True)
    assert fps == 24
    np.testing.assert_array_equal(out, yuv)

    # C420: luma untouched, constant chroma exact
    yuv_const = yuv.copy()
    yuv_const[..., 1] = 77
    yuv_const[..., 2] = 200
    out420, _ = decode_y4m_np(
        encode_y4m_np(yuv_const, colorspace="C420jpeg"), return_color=True
    )
    np.testing.assert_array_equal(out420[..., 0], yuv_const[..., 0])
    np.testing.assert_array_equal(out420[..., 1], yuv_const[..., 1])
    np.testing.assert_array_equal(out420[..., 2], yuv_const[..., 2])

    # C420 smooth chroma: replicated upsample within one block-gradient step
    y, x = np.mgrid[0:8, 0:10]
    smooth = np.stack(
        [rng.integers(0, 256, size=(8, 10)).astype(np.uint8),
         (20 + 4 * x).astype(np.uint8), (30 + 4 * y).astype(np.uint8)],
        axis=-1,
    )[None]
    outs, _ = decode_y4m_np(
        encode_y4m_np(smooth, colorspace="C420"), return_color=True
    )
    err = np.abs(outs[..., 1:].astype(int) - smooth[..., 1:].astype(int)).max()
    assert err <= 4, err

    # luma-only decode of a color stream matches the Y plane
    mono, _ = decode_y4m_np(encode_y4m_np(yuv))
    np.testing.assert_array_equal(mono, yuv[..., 0])

    # odd dims refuse C420
    import pytest as _pytest

    with _pytest.raises(ValueError):
        encode_y4m_np(yuv[:, :7], colorspace="C420")


def test_wav_bit_depths_and_channels():
    """8/16/24/32-bit PCM x mono/stereo roundtrip within one LSB; the
    default 16-bit mono stream is byte-stable vs earlier rounds."""
    import hashlib

    import numpy as np

    from hiss_cube_spark.operators.multimodal import decode_wav_np, encode_wav_np

    rng = np.random.default_rng(20260815)
    mono = np.sin(np.arange(700) / 9.0) * 0.8
    stereo = np.stack([mono, rng.uniform(-0.9, 0.9, size=700)], axis=1)
    tol = {8: 1.1 / 127, 16: 1.1 / 32767, 24: 1.1 / 8_388_607, 32: 1e-6}
    for bits in (8, 16, 24, 32):
        for sig in (mono, stereo):
            back, rate = decode_wav_np(encode_wav_np(sig, rate=22_050, bits=bits))
            assert rate == 22_050 and back.shape == sig.shape, (bits, sig.shape)
            assert np.max(np.abs(back - sig)) < tol[bits], bits
    # byte-stability pin of the historical default path
    legacy = encode_wav_np(np.linspace(-1, 1, 64), rate=8000)
    assert hashlib.md5(legacy).hexdigest() == "28b563112080e1d03f97df62dd366f53"


def test_wav_float_and_extensible_decode():
    """IEEE-float (fmt 3) and WAVE_FORMAT_EXTENSIBLE (0xFFFE wrapping
    PCM) payloads decode; the mono downmix contract holds via
    decode_audio_np."""
    import struct

    import numpy as np

    from hiss_cube_spark.operators.multimodal import decode_audio_np, decode_wav_np

    sig = np.sin(np.arange(500) / 11.0).astype("<f4")

    def wav(fmt_tag, ch, bits, data, extensible=False):
        if extensible:
            ext = struct.pack("<HHI", 22, bits, 0x3) + struct.pack("<H", fmt_tag) + b"\x00" * 14
            fmt_body = struct.pack("<HHIIHH", 0xFFFE, ch, 16000, 16000 * ch * bits // 8, ch * bits // 8, bits) + ext
        else:
            fmt_body = struct.pack("<HHIIHH", fmt_tag, ch, 16000, 16000 * ch * bits // 8, ch * bits // 8, bits)
        return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
                + b"data" + struct.pack("<I", len(data)) + data)

    back, rate = decode_wav_np(wav(3, 1, 32, sig.tobytes()))
    assert rate == 16000
    np.testing.assert_allclose(back, sig, atol=1e-7)
    # float64
    back64, _ = decode_wav_np(wav(3, 1, 64, sig.astype("<f8").tobytes()))
    np.testing.assert_allclose(back64, sig, atol=1e-7)
    # extensible wrapping PCM-16 stereo; downmix = channel mean
    pcm = (np.stack([sig, -sig], axis=1) * 32767.0).astype("<i2")
    st, _ = decode_wav_np(wav(1, 2, 16, pcm.tobytes(), extensible=True))
    assert st.shape == (500, 2)
    mono, _ = decode_audio_np(wav(1, 2, 16, pcm.tobytes(), extensible=True))
    assert mono.shape == (500,)
    np.testing.assert_allclose(mono, st.mean(axis=1), atol=1e-7)


# -- EXIF orientation --------------------------------------------------------


def _exif_img():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)


def test_exif_roundtrip_both_byte_orders_all_orientations():
    from hiss_cube_spark.operators.jpeg import encode_jpeg_np, jpeg_orientation

    img = _exif_img()
    for bo in ("II", "MM"):
        for o in range(1, 9):
            blob = encode_jpeg_np(
                img, quality=95, exif_orientation=o, exif_byte_order=bo
            )
            assert jpeg_orientation(blob) == o, (bo, o)


def test_exif_transforms_match_independent_numpy_reference():
    from hiss_cube_spark.operators.jpeg import apply_exif_orientation

    a = np.arange(24, dtype=np.uint8).reshape(4, 6)  # asymmetric
    want = {
        1: a,
        2: np.fliplr(a),
        3: np.rot90(a, 2),
        4: np.flipud(a),
        5: a.T,
        6: np.rot90(a, -1),             # rotate 90 CW to display
        7: np.rot90(np.fliplr(a), -1),  # transverse
        8: np.rot90(a, 1),              # rotate 90 CCW
    }
    for o, w in want.items():
        got = apply_exif_orientation(a, o)
        assert np.array_equal(got, w), o
        # every transform is a permutation of the pixel multiset
        assert np.array_equal(np.sort(got.ravel()), np.sort(a.ravel()))


def test_exif_default_and_malformed_return_one():
    from hiss_cube_spark.operators.jpeg import encode_jpeg_np, jpeg_orientation

    img = _exif_img()
    assert jpeg_orientation(encode_jpeg_np(img)) == 1  # no APP1 at all
    blob = bytearray(encode_jpeg_np(img, exif_orientation=6))
    i = blob.find(b"Exif\x00\x00")
    blob[i + 6 : i + 8] = b"XX"  # clobber the TIFF byte-order mark
    assert jpeg_orientation(bytes(blob)) == 1
    assert jpeg_orientation(b"\x00\x01") == 1  # not a JPEG


def test_exif_orientation_tag_found_among_other_entries():
    import struct

    from hiss_cube_spark.operators.jpeg import jpeg_orientation

    # hand-built IFD0 with a leading unrelated tag (0x010F Make) before
    # 0x0112 — the walker must skip entries it does not know
    tiff = b"II" + struct.pack("<HI", 42, 8)
    tiff += struct.pack("<H", 2)
    tiff += struct.pack("<HHI", 0x010F, 2, 4) + b"cam\x00"
    tiff += struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<H", 7) + b"\x00\x00"
    tiff += struct.pack("<I", 0)
    app1 = b"Exif\x00\x00" + tiff
    jpg = (
        b"\xff\xd8"
        + b"\xff\xe1"
        + struct.pack(">H", len(app1) + 2)
        + app1
        + b"\xff\xd9"
    )
    assert jpeg_orientation(jpg) == 7


def test_decode_image_np_applies_exif_upright():
    from hiss_cube_spark.operators.jpeg import (
        apply_exif_orientation,
        decode_jpeg_np,
        encode_jpeg_np,
    )
    from hiss_cube_spark.operators.multimodal import decode_image_np

    img = _exif_img()
    for o in (1, 3, 6, 8):
        blob = encode_jpeg_np(img, quality=95, exif_orientation=o)
        up = decode_image_np(blob, apply_exif=True)
        assert np.array_equal(up, apply_exif_orientation(decode_jpeg_np(blob), o))
        assert up.shape[:2] == ((16, 24) if o >= 5 else (24, 16))
        # default stays raw storage order (codec tests depend on it)
        assert decode_image_np(blob).shape[:2] == (24, 16)
