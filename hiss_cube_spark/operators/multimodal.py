"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with struct metadata; decode /
feature-extract / resize / frame-sample are ``mapInPandas`` kernels so the
heavy bytes stay in Arrow batches and never explode into JVM rows.

Real dependency-free codecs: PNG (full spec — palette/tRNS, gray+alpha,
16-bit, sub-byte depths, Adam7, all five filters, CRC-checked), JPEG
(:mod:`hiss_cube_spark.operators.jpeg` — baseline + progressive SOF2 +
12-bit SOF1, 4:4:4/4:2:2/4:2:0, restart intervals, optimized Huffman),
PPM P6, PCM WAV, FLAC (:mod:`hiss_cube_spark.operators.flac` — fixed
predictors + Rice residuals, CRC-verified), and color Y4M (C444/C420).
Codecs that genuinely need external libraries (WebP / video beyond Y4M —
Pillow/libav/opencv are NOT in this container) stay stubbed:
``decode_fn`` defaults to a clearly-marked deterministic fake and raises
``NotImplementedError`` when ``require_real_codec=True``. Everything
Spark-side — schema, batch shape, partitioning, UDF signature — is real
and tested either way.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# Module-level, NOT lazy inside decode_image_np: a function-local import
# re-imports on the executor, where the package directory may not exist
# (closures ship by value via _serde) — the exact bug class the round-5
# fits.py hoist fixed.
from hiss_cube_spark.operators.flac import (  # noqa: E402
    decode_flac_np,
    flac_streaminfo,
)
from hiss_cube_spark.operators.jpeg import (  # noqa: E402
    apply_exif_orientation,
    decode_jpeg_np,
    jpeg_orientation,
)

__all__ = [
    "attach_binary_payload", "decode_metadata", "frame_sample", "extract_features",
    "encode_ppm_np", "decode_ppm_np", "bilinear_resize_np",
    "encode_png_np", "decode_png_np", "decode_image_np",
    "decode_images", "resize_images", "image_features",
    "image_phash", "phash_neardup_pairs",
    "encode_wav_np", "decode_wav_np", "decode_audio_np", "decode_audio",
    "audio_features",
    "audio_fingerprint", "audio_neardup_pairs",
    "encode_y4m_np", "decode_y4m_np", "video_frame_features",
]


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Demo helper: materialize an opaque binary column (UTF-8 payload) with
    typed metadata, the storage shape real image/audio columns use."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decoder (no codecs in env)."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": (n % 64) + 1,
        "height": (n % 48) + 1,
        "checksum": int(np.frombuffer(payload, dtype=np.uint8).astype(np.int64).sum()),
    }


def decode_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode_fn: Callable[[bytes], dict] | None = None,
    require_real_codec: bool = False,
) -> DataFrame:
    """Decode binary payloads to typed metadata via mapInPandas.

    Arrow moves each partition's payload column once; the decode loop is
    per-batch numpy. Plug a real codec through ``decode_fn``.
    """
    if require_real_codec:
        raise NotImplementedError(
            "No image/audio codec available in this environment; pass decode_fn "
            "wrapping your codec (PIL.Image.open, av.open, ...) on a real cluster."
        )
    decode = decode_fn or _fake_decode

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(p) for p in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, payload_col).mapInPandas(_decode, schema=_DECODE_SCHEMA)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_stride: int = 64,
) -> DataFrame:
    """Sample "frames" every ``frame_stride`` bytes: (doc_id, frame_id, byte_offset).

    The video analog: one row per sampled frame, native explode(sequence) —
    the payload itself is not shuffled, only offsets."""
    n = F.octet_length(F.col(payload_col))
    n_frames = F.greatest((n / F.lit(frame_stride)).cast("long"), F.lit(1))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_id"),
    ).withColumn("byte_offset", F.col("frame_id") * F.lit(frame_stride))


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 16,
) -> DataFrame:
    """Deterministic fake feature extractor (byte-histogram projection) with
    the real pipeline shape: mapInPandas → array<float> feature column ready
    for the similarity operators."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                b = np.frombuffer(p, dtype=np.uint8)
                hist = np.bincount(b % dim, minlength=dim).astype(np.float32)
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm > 0 else hist).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col].to_numpy(), "feature": feats})

    return df.select(id_col, payload_col).mapInPandas(_extract, schema=_FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# Real codec path: PPM (P6) needs no image library — pure numpy. The stubbed
# decode above stays the template for library-backed formats; this one is a
# genuinely working end-to-end image pipeline (decode → resize → features).
# --------------------------------------------------------------------------


def encode_ppm_np(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) array → binary PPM (P6) bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("PPM P6 is RGB: expected 3 channels")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm_np(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → uint8 (h, w, 3) array. Handles comments and
    arbitrary header whitespace per the spec."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos).reshape(h, w, 3)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (0 gray, 2 RGB, 3 palette idx, 4 gray+alpha,
# 6 RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}
# Adam7 pass grid: (x_start, y_start, x_step, y_step) per the PNG spec
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_np(
    img: np.ndarray,
    level: int = 6,
    interlace: bool = False,
    palette: np.ndarray | None = None,
    trns: np.ndarray | None = None,
) -> bytes:
    """(h, w[, c]) array → PNG bytes — a complete spec-conformant writer
    (zlib is stdlib — PNG needs no external codec): IHDR/IDAT/IEND chunks
    with CRCs, filter type 0 per scanline.

    - uint8 input: gray (h,w)/(h,w,1), gray+alpha (h,w,2), RGB (h,w,3),
      RGBA (h,w,4);
    - uint16 input: same layouts, written as big-endian 16-bit samples;
    - ``palette=(n,3) uint8``: ``img`` is an (h, w) index array, written
      as color-type-3 with a PLTE chunk (+ optional ``trns`` alpha vector);
    - ``interlace=True``: Adam7 — the IDAT stream is the concatenation of
      the 7 filtered pass sub-images.

    Readable by any PNG viewer.
    """
    import struct
    import zlib

    if palette is not None:
        img = np.ascontiguousarray(img, dtype=np.uint8)
        if img.ndim != 2:
            raise ValueError("palette PNG expects an (h, w) index array")
        img = img[:, :, None]
        color, depth = 3, 8
    else:
        img = np.ascontiguousarray(img)
        if img.dtype == np.uint16:
            depth = 16
        elif img.dtype == np.uint8:
            depth = 8
        else:
            raise ValueError(f"encode_png_np: dtype {img.dtype} (u1/u2 only)")
        if img.ndim == 2:
            img = img[:, :, None]
        color = {1: 0, 2: 4, 3: 2, 4: 6}[img.shape[2]]
    h, w, c = img.shape

    def _rows(sub: np.ndarray) -> bytes:
        if depth == 16:
            sub = sub.astype(">u2")
        return b"".join(b"\x00" + sub[y].tobytes() for y in range(sub.shape[0]))

    if interlace:
        raw = b"".join(
            _rows(img[y0::ys, x0::xs])
            for x0, y0, xs, ys in _ADAM7
            if img[y0::ys, x0::xs].shape[0] and img[y0::ys, x0::xs].shape[1]
        )
    else:
        raw = _rows(img)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, int(interlace))
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", np.ascontiguousarray(palette, dtype=np.uint8).tobytes())
        if trns is not None:
            out += _png_chunk(b"tRNS", np.ascontiguousarray(trns, dtype=np.uint8).tobytes())
    return out + _png_chunk(b"IDAT", zlib.compress(raw, level)) + _png_chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_defilter(raw: bytes, h: int, stride: int, bpp: int, p: int) -> tuple[np.ndarray, int]:
    """Reconstruct ``h`` filtered scanlines of ``stride`` bytes starting at
    offset ``p`` in the inflated stream; all five filters
    (None/Sub/Up/Average/Paeth) per the spec's modulo-256 arithmetic.
    Returns the (h, stride) byte grid and the stream offset after it."""
    if len(raw) < p + h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[p]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=p + 1).copy()
        p += 1 + stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub — per-lane prefix sum mod 256 (vectorized)
            for j in range(bpp):
                row[j::bpp] = np.cumsum(row[j::bpp], dtype=np.uint64) & 0xFF
        elif ftype == 2:  # Up
            row += prev  # uint8 wraparound == mod 256 per spec
        elif ftype == 3:  # Average
            r = row.astype(np.int64)
            pv = prev.astype(np.int64)
            acc = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = acc[i - bpp] if i >= bpp else 0
                acc[i] = (r[i] + (left + pv[i]) // 2) & 0xFF
            row = acc.astype(np.uint8)
        elif ftype == 4:  # Paeth
            r = row.astype(np.int64)
            pv = prev.astype(np.int64)
            acc = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = acc[i - bpp] if i >= bpp else 0
                ul = pv[i - bpp] if i >= bpp else 0
                acc[i] = (r[i] + _paeth(int(left), int(pv[i]), int(ul))) & 0xFF
            row = acc.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = row
        prev = row
    return out, p


def _png_unpack(rows: np.ndarray, w: int, channels: int, depth: int) -> np.ndarray:
    """(h, stride) defiltered bytes → (h, w, channels) sample array
    (uint16 for depth 16, uint8 otherwise; sub-byte samples NOT scaled)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        u = rows[:, : w * channels * 2].reshape(h, w * channels, 2).astype(np.uint16)
        return ((u[:, :, 0] << 8) | u[:, :, 1]).reshape(h, w, channels)
    # depth 1/2/4 — single-sample pixels only (gray or palette index)
    bits = np.unpackbits(rows, axis=1)[:, : w * depth].reshape(h, w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (bits * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8)[:, :, None]


def decode_png_np(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) array — a real decoder, not a stub:
    chunk walk with CRC verification, multi-IDAT zlib inflate, all five
    scanline filters, every legal depth/color-type combination (1/2/4/8/16
    bit; gray, gray+alpha, RGB, palette+PLTE/tRNS, RGBA), and Adam7
    interlace.

    Output dtype is uint16 when the file is 16-bit, else uint8. Palette
    images come back expanded to RGB (RGBA when a tRNS chunk supplies
    alpha); sub-byte grayscale is rescaled to 0-255 (palette indices are
    looked up, never rescaled), per the spec's sample-depth semantics.
    """
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, []
    w = h = depth = color = interlace = None
    plte = trns = None
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if color not in _PNG_CHANNELS:
                raise ValueError(f"PNG color type {color} invalid")
            if depth not in _PNG_DEPTHS[color]:
                raise ValueError(f"PNG depth {depth} invalid for color type {color}")
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    channels = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    bpp = max(1, channels * depth // 8)

    def _stride(width: int) -> int:
        return (width * channels * depth + 7) // 8

    if interlace:  # Adam7: 7 independently-filtered pass sub-images
        samples = np.zeros(
            (h, w, channels), dtype=np.uint16 if depth == 16 else np.uint8
        )
        p = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue
            rows, p = _png_defilter(raw, ph, _stride(pw), bpp, p)
            samples[y0::ys, x0::xs] = _png_unpack(rows, pw, channels, depth)
    else:
        rows, _ = _png_defilter(raw, h, _stride(w), bpp, 0)
        samples = _png_unpack(rows, w, channels, depth)

    if color == 3:  # palette lookup (+ tRNS alpha)
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = samples[:, :, 0].astype(np.intp)
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise ValueError("PNG palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(plte.shape[0], 255, dtype=np.uint8)
            alpha[: trns.size] = trns
            return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
        return rgb
    if color == 0 and depth < 8:  # rescale sub-byte gray to full 8-bit
        return (samples.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(
            np.uint8
        )
    return samples


def decode_image_np(payload: bytes, apply_exif: bool = False) -> np.ndarray:
    """Magic-byte image dispatch: PNG, baseline JPEG, or PPM P6 — all real
    dependency-free decoders. Grayscale broadcasts to 3 channels, alpha is
    dropped (gray+alpha and RGBA), and 16-bit samples collapse to their
    high byte, so every caller sees uint8 (h, w, 3); formats without a
    decoder (WebP) raise the labeled stub error. ``apply_exif`` rotates
    JPEG pixels upright per the Exif orientation tag (what any training
    pipeline must do before a visual model sees them); default False
    keeps raw storage order for byte-exact codec tests."""
    if payload[:8] == _PNG_SIG:
        img = decode_png_np(payload)
        if img.dtype == np.uint16:
            img = (img >> 8).astype(np.uint8)
        if img.shape[2] == 2:  # gray+alpha: keep luma only
            img = img[:, :, :1]
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        elif img.shape[2] == 4:
            img = img[:, :, :3]
        return img
    if payload[:2] == b"\xff\xd8":
        img = decode_jpeg_np(payload)
        if img.dtype == np.uint16:  # 12-bit: collapse to the high 8 bits
            img = (img >> 4).astype(np.uint8)
        if apply_exif:
            img = apply_exif_orientation(img, jpeg_orientation(payload))
        return img
    if payload[:2] == b"P6":
        return decode_ppm_np(payload)
    raise NotImplementedError(
        "no dependency-free decoder for this image format (PNG, baseline "
        "JPEG and PPM P6 are supported; WebP/AVIF need Pillow on the cluster)"
    )


def bilinear_resize_np(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pure-numpy bilinear resample, pixel-center aligned."""
    h, w = img.shape[:2]
    y = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    x = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(y).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(x).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(y - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(x - x0, 0.0, 1.0)[None, :, None]
    f = img.astype(np.float64)
    out = (
        f[y0][:, x0] * (1 - wy) * (1 - wx)
        + f[y0][:, x1] * (1 - wy) * wx
        + f[y1][:, x0] * wy * (1 - wx)
        + f[y1][:, x1] * wy * wx
    )
    return out


_IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixels", ArrayType(FloatType())),
    ]
)


def decode_images(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """PNG/PPM payloads (magic-byte dispatch) → flattened float pixel rows
    (row-major, [0, 1]) with a shape triple — the tiled-raster storage
    shape the astronomy tables use (flat array + shape columns, SURVEY
    §7.4)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image_np(bytes(p))
                rows.append(
                    (
                        int(doc_id),
                        img.shape[0],
                        img.shape[1],
                        img.shape[2],
                        (img.reshape(-1).astype(np.float32) / np.float32(255.0)).tolist(),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "height", "width", "channels", "pixels"])

    return df.select(id_col, payload_col).mapInPandas(_decode, schema=_IMAGE_SCHEMA)


def resize_images(df: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Bilinear-resize decoded images to (out_h, out_w); same schema out.

    Arrow-batched numpy kernel — the per-row work is O(out pixels), and
    nothing but the (already columnar) pixel arrays moves."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = np.asarray(r.pixels, dtype=np.float64).reshape(
                    r.height, r.width, r.channels
                )
                out = bilinear_resize_np(img, out_h, out_w)
                rows.append(
                    (int(r.doc_id), out_h, out_w, int(r.channels),
                     out.reshape(-1).astype(np.float32).tolist())
                )
            yield pd.DataFrame(rows, columns=["doc_id", "height", "width", "channels", "pixels"])

    return df.mapInPandas(_resize, schema=_IMAGE_SCHEMA)


def image_features(df: DataFrame, n_bins: int = 8) -> DataFrame:
    """Per-image features from decoded pixels: per-channel mean/std plus an
    ``n_bins`` luma histogram (L1-normalized) — a real embedding for the
    similarity operators, replacing the byte-histogram fake."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for r in pdf.itertuples(index=False):
                img = np.asarray(r.pixels, dtype=np.float64).reshape(
                    r.height, r.width, r.channels
                )
                mean = img.mean(axis=(0, 1))
                std = img.std(axis=(0, 1))
                luma = img @ np.array([0.2126, 0.7152, 0.0722])
                hist = np.histogram(luma, bins=n_bins, range=(0.0, 1.0))[0].astype(np.float64)
                hist /= max(hist.sum(), 1.0)
                ids.append(int(r.doc_id))
                feats.append(np.concatenate([mean, std, hist]).astype(np.float32).tolist())
            yield pd.DataFrame({"doc_id": ids, "feature": feats})

    return df.mapInPandas(_feat, schema=_FEATURE_SCHEMA)


_PHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("phash", LongType())]
)


def image_phash(df: DataFrame, hash_size: int = 8, kind: str = "dhash") -> DataFrame:
    """64-bit perceptual hash over decoded pixel rows (input schema =
    ``decode_images`` output): luma → bilinear downsample → bit per cell.

    * ``dhash``: resize to (hash_size, hash_size+1), bit = luma[y, x] <
      luma[y, x+1] (horizontal gradient sign) — robust to global
      brightness/contrast shifts.
    * ``ahash``: resize to (hash_size, hash_size), bit = luma ≥ mean.

    Near-duplicate images differ in few bits, so the SAME pigeonhole
    chunk-banding join that serves text SimHash
    (``operators.dedup.simhash_pairs``) finds image near-dups — one
    fingerprint family, two modalities. Arrow-batched numpy; only 8-byte
    hashes ever shuffle.
    """
    if kind not in ("dhash", "ahash"):
        raise ValueError(f"kind must be dhash|ahash, got {kind!r}")
    _LUMA = np.array([0.2126, 0.7152, 0.0722])

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for r in pdf.itertuples(index=False):
                img = np.asarray(r.pixels, dtype=np.float64).reshape(
                    r.height, r.width, r.channels
                )
                luma = img @ _LUMA
                if kind == "dhash":
                    small = bilinear_resize_np(luma[..., None], hash_size, hash_size + 1)[..., 0]
                    bits = (small[:, :-1] < small[:, 1:]).reshape(-1)
                else:
                    small = bilinear_resize_np(luma[..., None], hash_size, hash_size)[..., 0]
                    bits = (small >= small.mean()).reshape(-1)
                acc = np.uint64(0)
                for b in bits:
                    acc = (acc << np.uint64(1)) | np.uint64(bool(b))
                ids.append(int(r.doc_id))
                hashes.append(int(acc.astype(np.int64)))
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    return df.mapInPandas(_hash, schema=_PHASH_SCHEMA)


def phash_neardup_pairs(
    fps: DataFrame, max_hamming: int = 7, n_chunks: int = 8
) -> DataFrame:
    """Image near-dup pairs from perceptual hashes — delegates to the text
    SimHash pigeonhole banding (exact candidate superset + bit_count(xor)
    verify), keyed on the ``phash`` column."""
    from hiss_cube_spark.operators.dedup import simhash_pairs

    return simhash_pairs(fps, max_hamming=max_hamming, fp_col="phash", n_chunks=n_chunks)


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402


# --------------------------------------------------------------------------
# REAL audio pipeline: hand-rolled PCM-WAV (RIFF) encode/decode + numpy
# features. Like the PPM image path, WAV PCM needs no codec library — the
# container is a fixed 44-byte header over raw little-endian samples — so
# every stage below computes true signal math in this dependency-free
# container. Compressed codecs (mp3/aac/opus) remain behind the honest
# `decode_metadata(require_real_codec=True)` stub.


def encode_wav_np(
    samples: np.ndarray, rate: int = 16_000, *, bits: int = 16
) -> bytes:
    """Float [-1, 1] samples → PCM WAV bytes (RIFF header).

    Accepts (n,) mono or (n, ch) multi-channel; ``bits`` ∈ {8, 16, 24,
    32}. Defaults (mono float in, 16-bit) are byte-stable vs earlier
    rounds."""
    import struct

    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    pcm = np.clip(s, -1.0, 1.0)
    if bits == 16:
        data = np.ascontiguousarray((pcm * 32767.0).astype("<i2")).tobytes()
    elif bits == 8:  # 8-bit WAV is UNSIGNED, midpoint 128
        data = np.ascontiguousarray(
            np.round(pcm * 127.0 + 128.0).astype(np.uint8)
        ).tobytes()
    elif bits == 24:
        i32 = np.ascontiguousarray(
            np.round(pcm * 8_388_607.0).astype("<i4")
        ).view(np.uint8).reshape(-1, 4)
        data = np.ascontiguousarray(i32[:, :3]).tobytes()
    elif bits == 32:
        data = np.ascontiguousarray(
            np.round(pcm * 2_147_483_647.0).astype("<i4")
        ).tobytes()
    else:
        raise ValueError("bits must be 8/16/24/32")
    block = ch * bits // 8
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, ch, rate, rate * block, block, bits, b"data", len(data),
    )
    return hdr + data


def decode_wav_np(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (float32 samples in [-1, 1], sample rate); shape
    (n,) mono, (n, ch) multi-channel.

    Walks RIFF chunks (not a fixed offset) so padded/extra chunks parse.
    Accepts uncompressed PCM at 8 (unsigned) / 16 / 24 / 32 bits, IEEE
    float32/float64 (format 3), and WAVE_FORMAT_EXTENSIBLE (0xFFFE)
    wrapping either — anything else raises, keeping the honest-stub
    contract for real lossy codecs."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data, fmt, ch, bits = 12, None, None, None, 1, 16
    while pos + 8 <= len(payload):
        cid, sz = struct.unpack("<4sI", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt == 0xFFFE and sz >= 26:  # EXTENSIBLE: GUID leads with
                (fmt,) = struct.unpack("<H", body[24:26])  # the real code
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if ch < 1:
        raise ValueError("WAV with zero channels")
    if fmt == 1:
        if bits == 16:
            flat = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0
        elif bits == 8:
            flat = (
                np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0
            ) / 127.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: raw.size // 3 * 3].reshape(-1, 3).astype(np.int32)
            i32 = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            i32 -= (i32 & 0x800000) << 1  # sign-extend 24 -> 32
            flat = i32.astype(np.float32) / 8_388_607.0
        elif bits == 32:
            flat = (
                np.frombuffer(data, dtype="<i4").astype(np.float32)
                / 2_147_483_647.0
            )
        else:
            raise NotImplementedError(f"PCM WAV bits-per-sample {bits}")
    elif fmt == 3:  # IEEE float
        if bits == 32:
            flat = np.frombuffer(data, dtype="<f4").astype(np.float32)
        elif bits == 64:
            flat = np.frombuffer(data, dtype="<f8").astype(np.float32)
        else:
            raise NotImplementedError(f"float WAV bits-per-sample {bits}")
    else:
        raise NotImplementedError(f"WAV format tag {fmt} (PCM/float only)")
    if ch > 1:
        flat = flat[: flat.size // ch * ch].reshape(-1, ch)
    return flat, int(rate)


_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("samples", ArrayType(FloatType())),
    ]
)


def decode_audio_np(payload: bytes) -> tuple[np.ndarray, int]:
    """Magic-byte audio dispatch: PCM WAV (RIFF) or FLAC (the in-repo
    subset codec, `operators/flac.py`) → (mono float32 samples in
    [-1, 1], rate). Stereo FLAC downmixes by channel mean — the analysis
    pipeline's mono contract. FLAC normalizes at the STREAM's bit depth
    (127 / 32767 / 8388607), same per-depth contract as the WAV branch."""
    if payload[:4] == b"fLaC":
        arr, rate = decode_flac_np(payload)
        if arr.ndim == 2:
            arr = arr.astype(np.float32).mean(axis=1)
        bps = flac_streaminfo(payload)["bits_per_sample"]
        scale = {8: 127.0, 16: 32767.0, 24: 8_388_607.0}[bps]
        return arr.astype(np.float32) / scale, rate
    arr, rate = decode_wav_np(payload)
    if arr.ndim == 2:
        arr = arr.mean(axis=1, dtype=np.float32)
    return arr.astype(np.float32, copy=False), rate


def decode_audio(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """WAV/FLAC payloads → flat float sample arrays + rate (the audio
    analog of `decode_images`' flat-pixels shape). Arrow-batched; bytes
    never leave the Python worker as JVM rows."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                samples, rate = decode_audio_np(bytes(p))
                rows.append((int(doc_id), rate, len(samples), samples.tolist()))
            yield pd.DataFrame(
                rows, columns=["doc_id", "rate", "n_samples", "samples"]
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, schema=_AUDIO_SCHEMA)


_AUDIO_FEAT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("duration_s", FloatType()),
        StructField("rms", FloatType()),
        StructField("peak", FloatType()),
        StructField("zero_cross_rate", FloatType()),
        StructField("spectral_centroid_hz", FloatType()),
        StructField("band_energy", ArrayType(FloatType())),
    ]
)


def audio_features(df: DataFrame, n_bands: int = 8) -> DataFrame:
    """Per-clip signal features over decoded samples: RMS, peak,
    zero-crossing rate, FFT spectral centroid, and ``n_bands`` octave-ish
    band energies (normalized to sum 1) — the dedup/quality feature vector
    for audio corpora, feeding the same similarity operators the image
    features do. Pure-numpy kernel per Arrow batch.
    """

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                x = np.asarray(r.samples, dtype=np.float64)
                n, rate = len(x), int(r.rate)
                rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                peak = float(np.max(np.abs(x))) if n else 0.0
                zcr = (
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if n > 1
                    else 0.0
                )
                spec = np.abs(np.fft.rfft(x)) if n else np.zeros(1)
                freqs = np.fft.rfftfreq(max(n, 1), d=1.0 / rate)
                power = spec * spec
                tot = float(power.sum())
                centroid = float((freqs * power).sum() / tot) if tot > 0 else 0.0
                edges = np.linspace(0, len(power), n_bands + 1).astype(int)
                bands = np.array(
                    [float(power[a:b].sum()) for a, b in zip(edges, edges[1:])]
                )
                bands = bands / tot if tot > 0 else bands
                rows.append(
                    (
                        int(r.doc_id),
                        float(n / rate) if rate else 0.0,
                        rms,
                        peak,
                        zcr,
                        centroid,
                        [float(v) for v in bands],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "duration_s", "rms", "peak",
                    "zero_cross_rate", "spectral_centroid_hz", "band_energy",
                ],
            )

    return df.select("doc_id", "rate", "samples").mapInPandas(
        _feat, schema=_AUDIO_FEAT_SCHEMA
    )


_register_self(__name__)


def audio_fingerprint(df: DataFrame, n_bands: int = 9, n_frames: int = 8) -> DataFrame:
    """64-bit Haitsma–Kalker-style audio fingerprint over decoded samples:
    the clip splits into ``n_frames`` windows × ``n_bands`` log-energy
    bands, and each bit is the sign of the TIME-DELTA of the BAND-DELTA —
    sign(E[f,b] − E[f,b+1] − (E[f−1,b] − E[f−1,b+1])) — the classic robust
    hash: invariant to overall gain, resistant to noise, flipped only by
    genuine spectral-shape changes. (n_bands−1)·n_frames bits packed into
    one long; expects (doc_id, samples, rate) from `decode_audio`.

    Completes the fingerprint family across modalities: text SimHash,
    image pHash, audio HK — all three feed the same pigeonhole banding
    (`audio_neardup_pairs` below) for near-dup mining. Arrow-batched numpy
    kernel, one linear pass, no shuffle.
    """

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                x = np.asarray(r.samples, dtype=np.float64)
                n = len(x)
                fp = 0
                if n >= n_frames * 2:
                    frames = np.array_split(x, n_frames)
                    eng = []
                    for fr in frames:
                        spec = np.abs(np.fft.rfft(fr)) ** 2
                        edges = np.linspace(0, len(spec), n_bands + 1).astype(int)
                        # true log energy (not log1p): gain scales E by g²,
                        # adding a constant to log E that cancels in deltas
                        eng.append(
                            np.log(
                                np.array([spec[a:b].sum() for a, b in zip(edges, edges[1:])])
                                + 1e-12
                            )
                        )
                    e = np.asarray(eng)  # (frames, bands)
                    bd = e[:, :-1] - e[:, 1:]          # band deltas
                    td = bd[1:] - bd[:-1]              # time delta of band delta
                    td = np.vstack([bd[:1], td])       # frame 0: plain band delta
                    bits = (td > 0).astype(np.uint64).reshape(-1)[:64]
                    for i, b in enumerate(bits):
                        fp |= int(b) << i
                # map to signed 64-bit for a Spark long
                if fp >= 1 << 63:
                    fp -= 1 << 64
                rows.append((r.doc_id, fp))
            yield pd.DataFrame(rows, columns=["doc_id", "afp"])

    return df.select("doc_id", "samples").mapInPandas(
        _fp, schema="doc_id long, afp long"
    )


def audio_neardup_pairs(
    fps: DataFrame, max_hamming: int = 7, n_chunks: int = 8
) -> DataFrame:
    """Audio near-dup pairs from HK fingerprints — the same pigeonhole
    banding as text SimHash and image pHash, keyed on ``afp``."""
    from hiss_cube_spark.operators.dedup import simhash_pairs

    return simhash_pairs(fps, max_hamming=max_hamming, fp_col="afp", n_chunks=n_chunks)


# --------------------------------------------------------------------------
# Video: YUV4MPEG2 (Y4M) — the one video container that needs NO codec
# (uncompressed planar YUV behind a text header), so the video leg of the
# multimodal family gets a REAL decode path like PPM/PNG (images) and WAV
# (audio). Compressed video (H.264/VP9) stays behind the honest stub.
# --------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m_np(frames: np.ndarray, fps: int = 25, colorspace: str = "C444") -> bytes:
    """uint8 frames → Y4M bytes. ``frames`` is either (n, h, w) mono luma
    (chroma written neutral-128) or (n, h, w, 3) full YUV; ``colorspace``
    is ``C444`` (full-res planes) or ``C420jpeg``/``C420`` (chroma
    box-averaged 2x2 per the JPEG/MPEG-2 siting — h and w must be even)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    mono = frames.ndim == 3
    if mono:
        frames = np.concatenate(
            [frames[..., None], np.full((*frames.shape, 2), 128, np.uint8)],
            axis=-1,
        )
    n, h, w, c = frames.shape
    if c != 3:
        raise ValueError("encode_y4m_np expects (n,h,w) luma or (n,h,w,3) YUV")
    is420 = colorspace.startswith("C420")
    if is420 and (h % 2 or w % 2):
        raise ValueError("C420 needs even frame dimensions")
    if not is420 and colorspace != "C444":
        raise ValueError(f"Y4M colorspace {colorspace} not supported (C444/C420*)")
    header = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 {colorspace}\n".encode("ascii")
    out = [header]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(frames[f, :, :, 0]).tobytes())
        for p in (1, 2):
            plane = frames[f, :, :, p]
            if is420:  # 2x2 box mean, round-half-up — the C420jpeg siting
                s = plane.reshape(h // 2, 2, w // 2, 2).astype(np.uint16)
                plane = ((s.sum(axis=(1, 3)) + 2) // 4).astype(np.uint8)
            out.append(np.ascontiguousarray(plane).tobytes())
    return b"".join(out)


def decode_y4m_np(payload: bytes, return_color: bool = False) -> tuple[np.ndarray, int]:
    """Y4M bytes → (frames, fps). Default: uint8 (n, h, w) luma only —
    chroma planes are parsed and skipped (luma carries the analysis
    signal). With ``return_color=True``: uint8 (n, h, w, 3) YUV — C420*
    chroma is replicated 2x2 back to full resolution, C444 passes
    through. A real parser: stream header tags, per-FRAME markers with
    optional parameters, exact plane sizes."""
    if not payload.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    eol = payload.index(b"\n")
    w = h = None
    fps = 25
    cs = "C420jpeg"
    for tag in payload[len(_Y4M_MAGIC):eol].split():
        t = tag.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            num, den = t[1:].split(":")
            fps = max(1, int(round(int(num) / int(den))))
        elif t.startswith("C"):
            cs = t
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    is420 = cs.startswith("C420")
    if is420:
        cw, ch_ = w // 2, h // 2
    elif cs.startswith("C444"):
        cw, ch_ = w, h
    else:
        raise NotImplementedError(f"Y4M colorspace {cs} not supported")
    luma, chroma = w * h, 2 * cw * ch_
    frames = []
    pos = eol + 1
    while pos < len(payload):
        if not payload.startswith(b"FRAME", pos):
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = payload.index(b"\n", pos) + 1  # FRAME params (if any) end at \n
        y = np.frombuffer(payload, dtype=np.uint8, count=luma, offset=pos).reshape(h, w)
        if return_color:
            planes = [y]
            for p in range(2):
                cp = np.frombuffer(
                    payload, dtype=np.uint8, count=cw * ch_,
                    offset=pos + luma + p * cw * ch_,
                ).reshape(ch_, cw)
                if is420:  # nearest-neighbor replication back to full res
                    cp = cp.repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
                planes.append(cp)
            frames.append(np.stack(planes, axis=-1))
        else:
            frames.append(y)
        pos += luma + chroma
    shape = (0, h, w, 3) if return_color else (0, h, w)
    return np.stack(frames) if frames else np.empty(shape, np.uint8), fps


_VIDEO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_id", IntegerType()),
        StructField("mean_luma", FloatType()),
        StructField("frame_diff", FloatType()),
        StructField("scene_cut", IntegerType()),
    ]
)


def video_frame_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_stride: int = 1,
    cut_threshold: float = 24.0,
) -> DataFrame:
    """Real video frame analysis over Y4M payloads: decode every
    ``frame_stride``-th frame's luma plane, emit per-frame mean luma, the
    mean-absolute-difference to the previous SAMPLED frame, and a scene-cut
    flag (diff > threshold — the classic shot-boundary detector). One
    mapInPandas kernel; the payload bytes never become JVM rows, and each
    clip's state is one previous frame."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                frames, _fps = decode_y4m_np(bytes(p))
                prev = None
                for f in range(0, frames.shape[0], frame_stride):
                    cur = frames[f].astype(np.float64)
                    mean = float(cur.mean())
                    diff = (
                        float(np.abs(cur - prev).mean()) if prev is not None else 0.0
                    )
                    rows.append(
                        (
                            int(doc_id),
                            f,
                            mean,
                            diff,
                            int(prev is not None and diff > cut_threshold),
                        )
                    )
                    prev = cur
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_id", "mean_luma", "frame_diff", "scene_cut"],
            )

    return df.select(id_col, payload_col).mapInPandas(_feat, schema=_VIDEO_SCHEMA)
