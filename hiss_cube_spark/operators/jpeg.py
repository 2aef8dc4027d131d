"""JPEG codec (ITU-T T.81, 8-bit): baseline sequential DCT + progressive
(SOF2, Annex G spectral selection / successive approximation) — pure numpy.

Replaces the honest JPEG stub in :mod:`multimodal`: a web-scale multimodal
corpus is mostly JPEG, so the decode leg of the image pipeline must not
depend on Pillow/libjpeg being present on the cluster. Clean-room from the
public spec:

* marker parse: SOI / APPn / COM / DQT / DHT / DRI / SOF0+SOF1+SOF2 /
  SOS / EOI;
* entropy decode: canonical Huffman (tables taken from the stream's DHT
  segments), DC difference coding with EXTEND sign recovery, AC
  run/length with EOB and ZRL escapes, 0xFF00 byte unstuffing, RSTn
  restart-interval resync;
* block reconstruction: dequantize → inverse zigzag → 8×8 IDCT as two
  matrix products with the orthonormal DCT basis (whole-image batched in
  numpy) → +128 level shift;
* chroma upsampling by pixel-center bilinear interpolation (triangle
  filter, the libjpeg "fancy upsampling" geometry) for 4:2:0/4:2:2, then
  the BT.601 YCbCr→RGB transform.

Progressive scans (T.81 Annex G) accumulate per-component zigzag
coefficient grids across SOS segments — DC/AC first passes and DC/AC
refinement passes with EOBRUN block skips — and reconstruct once at EOI;
decode output is bit-identical to baseline at the same coefficients.
12-bit precision (extended sequential SOF1: uint16 samples, 16-bit
quantization tables, per-image optimized Huffman tables per Annex
K.2/K.3 — also usable as libjpeg-style ``optimize`` for 8-bit) is
supported in both directions; arithmetic coding and hierarchical modes
raise labeled ``NotImplementedError`` — the same honest-gap policy as
the WebP/FLAC cases. The encoders (baseline `encode_jpeg_np` and
progressive `encode_jpeg_progressive_np`, IJG-style quality scaling,
Annex-K tables) exist so fixtures and the mm_* queries can synthesize
deterministic JPEG payloads without external tooling; encode→decode is
deterministic bit-for-bit given the same input.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_jpeg_np",
    "decode_jpeg_np",
    "build_exif_app1",
    "jpeg_orientation",
    "apply_exif_orientation",
]

# standard Annex-K quantization tables (quality 50 base)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex-K typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

for _bits, _vals in (_DC_LUMA, _DC_CHROMA, _AC_LUMA, _AC_CHROMA):
    assert sum(_bits) == len(_vals), "Huffman table BITS/HUFFVAL mismatch"

# orthonormal 8x8 DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(0.125) if _u == 0 else 0.5) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) canonical Huffman assignment (T.81 C.2)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value for the bit-serial decoder."""
    return {(ln, c): v for v, (c, ln) in _canonical_codes(bits, vals).items()}


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = []
    for base in (_QT_LUMA, _QT_CHROMA):
        t = (base * scale + 50) // 100
        qt.append(np.clip(t, 1, 255).astype(np.int64))
    return qt[0], qt[1]


def _rgb_to_ycbcr(img: np.ndarray, center: float = 128.0) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = center - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = center + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    center: float = 128.0,
    maxval: int = 255,
) -> np.ndarray:
    r = y + 1.402 * (cr - center)
    g = y - 0.344136286 * (cb - center) - 0.714136286 * (cr - center)
    b = y + 1.772 * (cb - center)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, maxval).astype(
        np.uint8 if maxval <= 255 else np.uint16
    )


def _optimal_table(freq: np.ndarray) -> tuple[list[int], list[int]]:
    """Per-image optimal Huffman table from symbol frequencies — the
    T.81 Annex-K.2/K.3 procedure: pairwise merge of the two least-frequent
    codes (ties to the HIGHER symbol value) to get code sizes, then the
    16-bit length-limit adjustment, then symbols sorted by (size, value).
    Symbol 256 is reserved with frequency 1 so no real symbol gets the
    all-ones code. Needed for 12-bit precision (DC categories to 15, AC
    sizes to 14 — beyond the Annex-K example tables) and available as the
    libjpeg-style 'optimize' mode for 8-bit."""
    freq = freq.astype(np.int64).copy()
    if freq.size < 257:
        freq = np.concatenate([freq, np.zeros(257 - freq.size, np.int64)])
    freq[256] = 1
    codesize = np.zeros(257, np.int64)
    others = np.full(257, -1, np.int64)
    while True:
        nz = np.flatnonzero(freq)
        if nz.size <= 1:
            break
        order = nz[np.lexsort((-nz, freq[nz]))]  # min freq, then max value
        v1, v2 = int(order[0]), int(order[1])
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = int(others[v1])
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = int(others[v2])
            codesize[v2] += 1
    bits = np.zeros(max(33, int(codesize.max()) + 1), np.int64)
    for v in range(257):
        if codesize[v]:
            bits[codesize[v]] += 1
    i = len(bits) - 1  # K.3: push codes longer than 16 bits down
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while i > 0 and bits[i] == 0:
        i -= 1
    if i > 0:
        bits[i] -= 1  # drop the reserved symbol's slot
    syms = [v for v in range(256) if codesize[v]]
    syms.sort(key=lambda v: (codesize[v], v))
    return [int(b) for b in bits[1:17]], syms


class _SymbolCounter(dict):
    """Stands in for a code dict during the statistics pass: counts every
    symbol lookup, returns a zero-length code."""

    def __init__(self) -> None:
        super().__init__()
        self.freq = np.zeros(257, np.int64)

    def __getitem__(self, k: int) -> tuple[int, int]:
        self.freq[k] += 1
        return (0, 0)


class _NullWriterJ:
    """Bit sink for the statistics pass."""

    __slots__ = ()

    def put(self, code: int, length: int) -> None:
        pass

    def flush(self) -> bytes:
        return b""


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(h, w) float plane (already multiple of 8) -> (n, 8, 8) blocks in
    raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


class _BitWriterJ:
    __slots__ = ("buf", "acc", "n")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill padding per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    w: _BitWriterJ,
    coef: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    zz = coef.ravel()[_ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, ln = dc_codes[size]
    w.put(code, ln)
    if size:
        w.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_codes[(run << 4) | size]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.put(code, ln)
    return dc


def _pad_plane(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    q = np.empty((ph, pw))
    h, w = p.shape
    q[:h, :w] = p
    q[h:, :w] = p[-1:, :]  # edge replicate
    q[:, w:] = q[:, w - 1 : w]
    return q


def _sequential_scan(comps, mcuy, mcux, restart_interval, writer_cls=_BitWriterJ):
    """One interleaved sequential scan over the MCU grid. Each comp dict
    carries 'coef'/'nbx'/'dc'/'ac'; with a _SymbolCounter+_NullWriterJ
    pair this same loop is the statistics pass for optimized tables."""
    bw = writer_cls()
    preds = [0] * len(comps)
    scan = bytearray()
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                scan += bw.flush()
                scan += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = writer_cls()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                for byy in range(c["v"]):
                    for bxx in range(c["h"]):
                        bidx = (my * c["v"] + byy) * c["nbx"] + (mx * c["h"] + bxx)
                        preds[ci] = _encode_block(
                            bw, c["coef"][bidx], preds[ci], c["dc"], c["ac"]
                        )
            mcu_count += 1
    scan += bw.flush()
    return scan


# -- EXIF orientation (TIFF 6.0 IFD inside an APP1 segment) -----------------
#
# Real-world photo corpora carry camera rotation as Exif tag 0x0112 rather
# than rotated pixels; a training pipeline that ignores it feeds models
# sideways images. Clean-room from the public TIFF 6.0 and Exif 2.3 specs.

_EXIF_ORIENT_TAG = 0x0112


def build_exif_app1(orientation: int, byte_order: str = "II") -> bytes:
    """Minimal Exif APP1 payload: ``Exif\\0\\0`` + TIFF header + an IFD0
    holding only the orientation SHORT. ``byte_order``: 'II' (little) or
    'MM' (big) — both appear in the wild and both must parse."""
    if not 1 <= orientation <= 8:
        raise ValueError("EXIF orientation must be 1..8")
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    e = "<" if byte_order == "II" else ">"
    tiff = byte_order.encode()
    tiff += struct.pack(e + "HI", 42, 8)  # magic + IFD0 offset
    tiff += struct.pack(e + "H", 1)  # one directory entry
    # tag, type=3 (SHORT), count=1, value left-justified in the 4-byte slot
    tiff += struct.pack(e + "HHI", _EXIF_ORIENT_TAG, 3, 1)
    tiff += struct.pack(e + "H", orientation) + b"\x00\x00"
    tiff += struct.pack(e + "I", 0)  # no next IFD
    return b"Exif\x00\x00" + tiff


def jpeg_orientation(payload: bytes) -> int:
    """Extract Exif orientation (1..8) from a JPEG stream; 1 when absent
    or malformed (the spec default — never fail a decode over metadata).
    Pure marker walk, no entropy decode: O(header) however large the
    image."""
    if payload[:2] != b"\xff\xd8":
        return 1
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return 1
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS: no more metadata
            return 1
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker != 0xE1 or seg[:6] != b"Exif\x00\x00":
            continue
        tiff = seg[6:]
        try:
            bo = tiff[:2]
            e = {b"II": "<", b"MM": ">"}[bo]
            magic, ifd0 = struct.unpack_from(e + "HI", tiff, 2)
            if magic != 42:
                return 1
            (n,) = struct.unpack_from(e + "H", tiff, ifd0)
            for i in range(n):
                tag, typ, cnt = struct.unpack_from(
                    e + "HHI", tiff, ifd0 + 2 + 12 * i
                )
                if tag == _EXIF_ORIENT_TAG and typ == 3 and cnt == 1:
                    (val,) = struct.unpack_from(
                        e + "H", tiff, ifd0 + 2 + 12 * i + 8
                    )
                    return val if 1 <= val <= 8 else 1
        except (KeyError, struct.error):
            return 1
        return 1
    return 1


def apply_exif_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
    """Normalize pixels to upright display order (Exif 2.3 §4.6.4). Every
    transform is a numpy view permutation — zero copies until a consumer
    materializes, and exactly value-preserving (the pixel multiset is
    unchanged, which the distributed oracle exploits)."""
    o = orientation
    if o == 1:
        return img
    if o == 2:
        return img[:, ::-1]
    if o == 3:
        return img[::-1, ::-1]
    if o == 4:
        return img[::-1]
    t = np.swapaxes(img, 0, 1)
    if o == 5:
        return t
    if o == 6:
        return t[:, ::-1]
    if o == 7:
        return t[::-1, ::-1]
    if o == 8:
        return t[::-1]
    raise ValueError(f"EXIF orientation {orientation} outside 1..8")


def encode_jpeg_np(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    precision: int = 8,
    optimize: bool | None = None,
    exif_orientation: int | None = None,
    exif_byte_order: str = "II",
) -> bytes:
    """(h, w, 3) RGB or (h, w) grayscale -> sequential JFIF bytes.

    ``precision`` 8 (baseline SOF0, uint8 samples, Annex-K Huffman
    tables, IJG quality scaling) or 12 (extended sequential SOF1, uint16
    samples 0-4095, 16-bit quantization tables scaled 16x, per-image
    optimized Huffman tables — the larger DC/AC symbol alphabet exceeds
    the Annex-K examples). ``optimize=True`` builds per-image tables for
    8-bit too (libjpeg's -optimize; entropy-lossless, so decoded pixels
    are bit-identical to the standard-table stream). ``subsampling``:
    '444' (default) or '420' (2x2-mean chroma downsample); optional DRI
    restart markers every ``restart_interval`` MCUs. ``exif_orientation``
    embeds an Exif APP1 orientation tag (pixels are stored as given —
    the tag tells viewers how to rotate, exactly like a camera)."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    if optimize is None:
        optimize = precision != 8
    if precision == 12 and not optimize:
        raise ValueError("12-bit encoding requires optimized Huffman tables")
    center = float(1 << (precision - 1))
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt_l, qt_c = _quality_tables(quality)
    if precision == 12:
        # the Annex-K tables are 8-bit-referred: scale into the 12-bit
        # sample range (cfitsio/libjpeg practice), 16-bit DQT entries
        qt_l = np.clip(qt_l * 16, 1, 65535)
        qt_c = np.clip(qt_c * 16, 1, 65535)
    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be '444', '422' or '420'")
    # chroma decimation factors: (horizontal, vertical)
    cx, cy = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
    if gray:
        cx = cy = 1
        comps = [{"plane": img.astype(np.float64), "h": 1, "v": 1, "qt": qt_l,
                  "role": 0}]
    else:
        ycc = _rgb_to_ycbcr(img, center)
        yf, cb, cr = (ycc[..., i] for i in range(3))
        if cx > 1 or cy > 1:
            ph2, pw2 = -(-h // cy) * cy, -(-w // cx) * cx
            cb = _pad_plane(cb, ph2, pw2).reshape(
                ph2 // cy, cy, pw2 // cx, cx
            ).mean((1, 3))
            cr = _pad_plane(cr, ph2, pw2).reshape(
                ph2 // cy, cy, pw2 // cx, cx
            ).mean((1, 3))
        comps = [
            {"plane": yf, "h": cx, "v": cy, "qt": qt_l, "role": 0},
            {"plane": cb, "h": 1, "v": 1, "qt": qt_c, "role": 1},
            {"plane": cr, "h": 1, "v": 1, "qt": qt_c, "role": 1},
        ]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component coefficient grids in block coordinates
    for c in comps:
        gh, gw = mcuy * c["v"] * 8, mcux * c["h"] * 8
        p = _pad_plane(c["plane"], gh, gw) - center
        blocks = _blocks_of(p)
        f = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
        c["coef"] = np.round(f / c["qt"].reshape(8, 8)).astype(np.int64)
        c["nbx"] = gw // 8

    std = {(0, 0): _DC_LUMA, (1, 0): _AC_LUMA,
           (0, 1): _DC_CHROMA, (1, 1): _AC_CHROMA}
    if optimize:
        counters = {key: _SymbolCounter() for key in std}
        for c in comps:
            c["dc"] = counters[(0, c["role"])]
            c["ac"] = counters[(1, c["role"])]
        _sequential_scan(comps, mcuy, mcux, restart_interval, _NullWriterJ)
        tables = {
            key: _optimal_table(cnt.freq)
            for key, cnt in counters.items()
            if cnt.freq.any()
        }
    else:
        tables = {key: std[key] for key in std if gray is False or key[1] == 0}
    for c in comps:
        c["dc"] = _canonical_codes(*tables[(0, c["role"])])
        c["ac"] = _canonical_codes(*tables[(1, c["role"])])

    scan = _sequential_scan(comps, mcuy, mcux, restart_interval)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if exif_orientation is not None:
        out += seg(0xFFE1, build_exif_app1(exif_orientation, exif_byte_order))
    if precision == 8:
        out += seg(0xFFDB, b"\x00" + bytes(qt_l[_ZIGZAG].astype(np.uint8)))
        if not gray:
            out += seg(0xFFDB, b"\x01" + bytes(qt_c[_ZIGZAG].astype(np.uint8)))
    else:
        out += seg(0xFFDB, b"\x10" + qt_l[_ZIGZAG].astype(">u2").tobytes())
        if not gray:
            out += seg(0xFFDB, b"\x11" + qt_c[_ZIGZAG].astype(">u2").tobytes())
    ncomp = 1 if gray else 3
    sof = bytearray(struct.pack(">BHHB", precision, h, w, ncomp))
    for ci, c in enumerate(comps):
        sof += bytes([ci + 1, (c["h"] << 4) | c["v"], 0 if ci == 0 else 1])
    out += seg(0xFFC0 if precision == 8 else 0xFFC1, bytes(sof))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    for (cls, tid), (bits, vals) in sorted(tables.items(), key=lambda kv: kv[0][::-1]):
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, bytes(sos))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReaderJ:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at markers."""

    __slots__ = ("data", "pos", "acc", "n", "marker")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt in (0xD9,):
                self.marker = nxt
                b = 0  # reading past a marker yields zero-fill (spec 2-pass pad)
                self.acc = (self.acc << 8)
                self.n += 8
                return
            else:
                self.marker = nxt
                self.acc = self.acc << 8
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def get(self, nbits: int) -> int:
        while self.n < nbits:
            self._fill()
        self.n -= nbits
        out = (self.acc >> self.n) & ((1 << nbits) - 1)
        self.acc &= (1 << self.n) - 1
        return out

    def align_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.n = 0
        self.marker = None
        while self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


def _bilinear_up(p: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pixel-center-aligned bilinear upsample of one plane."""
    h, w = p.shape
    y = np.clip((np.arange(out_h) + 0.5) * h / out_h - 0.5, 0, h - 1)
    x = np.clip((np.arange(out_w) + 0.5) * w / out_w - 0.5, 0, w - 1)
    y0 = np.floor(y).astype(np.int64)
    x0 = np.floor(x).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (y - y0)[:, None]
    fx = (x - x0)[None, :]
    return (
        p[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + p[np.ix_(y0, x1)] * (1 - fy) * fx
        + p[np.ix_(y1, x0)] * fy * (1 - fx)
        + p[np.ix_(y1, x1)] * fy * fx
    )


def _huff_decode(r: _BitReaderJ, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 17:
        code = (code << 1) | r.get(1)
        ln += 1
        v = table.get((ln, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_np(payload: bytes) -> np.ndarray:
    """Baseline (SOF0/1) or progressive (SOF2) JPEG bytes -> uint8
    (h, w, 3) RGB (grayscale broadcasts to 3 channels, matching
    `decode_image_np`'s contract). Baseline scans decode in one pass;
    progressive scans accumulate coefficients per SOS (T.81 Annex G)
    and reconstruct at EOI."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    restart = 0
    frame = None
    progressive = False
    coefs: dict[int, np.ndarray] | None = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                n = 64 * (2 if prec else 1)
                raw = seg[p + 1 : p + 1 + n]
                vals = (
                    np.frombuffer(raw, dtype=">u2" if prec else np.uint8)
                    .astype(np.int64)
                )
                qtabs[tid] = vals[_UNZIGZAG]
                p += 1 + n
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                htabs[(cls, tid)] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec not in (8, 12):
                raise NotImplementedError(f"JPEG precision {prec} (8/12-bit)")
            comps = []
            for ci in range(ncomp):
                cid, samp, qid = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid})
            frame = (h, w, comps, prec)
            if marker == 0xC2:
                progressive = True
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                # zigzag-order coefficient accumulator on the padded
                # MCU-aligned block grid, filled scan by scan
                coefs = {
                    c["id"]: np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64
                    )
                    for c in comps
                }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF marker 0x{marker:02x} not supported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cid, tids = seg[1 + 2 * i], seg[2 + 2 * i]
                scomps.append((cid, tids >> 4, tids & 0xF))
            data_pos = pos + seglen
            if not progressive:
                return _decode_scan(
                    payload, data_pos, frame, scomps, qtabs, htabs, restart
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            preds = {c["id"]: 0 for c in frame[2]}
            pos = _progressive_scan(
                payload,
                data_pos,
                frame,
                scomps,
                (ss, se, ahal >> 4, ahal & 0xF),
                htabs,
                restart,
                coefs,
                preds,
            )
            continue
        pos += seglen
    if progressive and frame is not None:
        return _reconstruct_progressive(frame, coefs, qtabs)
    raise ValueError("JPEG stream has no scan")


def _comp_block_dims(h, w, c, hmax, vmax):
    """Non-interleaved block grid of one component (T.81 A.1.1)."""
    ch = -(-(h * c["v"]) // vmax)  # component pixel height
    cw = -(-(w * c["h"]) // hmax)
    return -(-ch // 8), -(-cw // 8)


def _progressive_scan(payload, data_pos, frame, scomps, params, htabs,
                      restart, coefs, preds):
    """Decode one SOS of a progressive frame (T.81 Annex G), updating the
    per-component zigzag coefficient grids in ``coefs`` in place.
    Returns the payload offset of the next marker."""
    h, w, comps = frame[:3]
    ss, se, ah, al = params
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    r = _BitReaderJ(payload, data_pos)
    eobrun = 0
    unit = 0

    def maybe_restart(unit):
        nonlocal eobrun
        if restart and unit and unit % restart == 0:
            r.align_restart()
            eobrun = 0
            for cid in preds:
                preds[cid] = 0

    if ss == 0:
        # DC scan: interleaved over the scan components in MCU order; a
        # single-component DC scan degenerates to its own block order
        if len(scomps) > 1:
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            order = [by_id[cid] for cid, _, _ in scomps]
            tids = {cid: dc for cid, dc, _ in scomps}
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart(unit)
                    for c in order:
                        cid = c["id"]
                        for byy in range(c["v"]):
                            for bxx in range(c["h"]):
                                b = (my * c["v"] + byy, mx * c["h"] + bxx)
                                if ah == 0:
                                    size = _huff_decode(r, htabs[(0, tids[cid])])
                                    diff = _extend(r.get(size), size) if size else 0
                                    preds[cid] += diff
                                    coefs[cid][b[0], b[1], 0] = preds[cid] << al
                                else:  # DC refinement: one raw bit per block
                                    if r.get(1):
                                        coefs[cid][b[0], b[1], 0] |= 1 << al
                    unit += 1
        else:
            cid, dc_tid, _ = scomps[0]
            c = by_id[cid]
            nby, nbx = _comp_block_dims(h, w, c, hmax, vmax)
            for byy in range(nby):
                for bxx in range(nbx):
                    maybe_restart(unit)
                    if ah == 0:
                        size = _huff_decode(r, htabs[(0, dc_tid)])
                        diff = _extend(r.get(size), size) if size else 0
                        preds[cid] += diff
                        coefs[cid][byy, bxx, 0] = preds[cid] << al
                    else:
                        if r.get(1):
                            coefs[cid][byy, bxx, 0] |= 1 << al
                    unit += 1
    else:
        # AC scan: always non-interleaved (T.81 G.1.1.1)
        if len(scomps) != 1:
            raise ValueError("progressive AC scan must have one component")
        cid, _, ac_tid = scomps[0]
        c = by_id[cid]
        ac_t = htabs[(1, ac_tid)]
        nby, nbx = _comp_block_dims(h, w, c, hmax, vmax)
        p1 = 1 << al
        m1 = -1 << al
        for byy in range(nby):
            for bxx in range(nbx):
                maybe_restart(unit)
                unit += 1
                block = coefs[cid][byy, bxx]
                if ah == 0:
                    # first AC pass (G.1.2.2): EOBRUN skips whole blocks
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _huff_decode(r, ac_t)
                        run, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if run == 15:
                                k += 16  # ZRL
                                continue
                            eobrun = (1 << run) - 1
                            if run:
                                eobrun += r.get(run)
                            break
                        k += run
                        if k > se:
                            raise ValueError("JPEG AC index overflow")
                        block[k] = _extend(r.get(size), size) << al
                        k += 1
                else:
                    # AC refinement pass (G.1.2.3): correction bits for
                    # already-nonzero coefficients, newly-significant ±1<<al
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = _huff_decode(r, ac_t)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run < 15:
                                    # EOBn: the current block is included
                                    eobrun = 1 << run
                                    if run:
                                        eobrun += r.get(run)
                                    break
                                val = 0  # ZRL: skip 16 zero-history coeffs
                            else:
                                val = p1 if r.get(1) else m1
                            while k <= se:
                                if block[k] != 0:
                                    if r.get(1) and (block[k] & p1) == 0:
                                        block[k] += p1 if block[k] >= 0 else m1
                                else:
                                    if run == 0:
                                        if val:
                                            block[k] = val
                                        k += 1
                                        break
                                    run -= 1
                                k += 1
                    if eobrun > 0:
                        # tail correction bits of the block ending the run
                        while k <= se:
                            if block[k] != 0:
                                if r.get(1) and (block[k] & p1) == 0:
                                    block[k] += p1 if block[k] >= 0 else m1
                            k += 1
                        eobrun -= 1

    # advance to the next marker (skip stuffed 0x00 bytes and RSTn)
    p = r.pos
    n = len(payload)
    while p + 1 < n:
        if payload[p] == 0xFF and payload[p + 1] != 0x00:
            if 0xD0 <= payload[p + 1] <= 0xD7:
                p += 2
                continue
            break
        p += 1
    return p


def _reconstruct_progressive(frame, coefs, qtabs):
    """Accumulated zigzag coefficient grids -> uint8 RGB (dequantize,
    batched IDCT, chroma upsample, BT.601)."""
    h, w, comps, prec = frame
    center, maxval = float(1 << (prec - 1)), (1 << prec) - 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = {}
    for c in comps:
        zz = coefs[c["id"]]
        nby, nbx, _ = zz.shape
        deq = zz.reshape(-1, 64) * qtabs[c["q"]][_ZIGZAG]
        blocks = deq[:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("xu,nuv,yv->nxy", _C.T, blocks, _C.T) + center
        plane = (
            pix.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = _bilinear_up(plane, plane.shape[0] * ry, plane.shape[1] * rx)
        full[c["id"]] = plane[:h, :w]
    if len(comps) == 1:
        y = np.clip(np.round(full[comps[0]["id"]]), 0, maxval).astype(
            np.uint8 if maxval <= 255 else np.uint16
        )
        return np.repeat(y[:, :, None], 3, axis=2)
    ids = [c["id"] for c in comps]
    return _ycbcr_to_rgb(full[ids[0]], full[ids[1]], full[ids[2]], center, maxval)


def _decode_scan(payload, data_pos, frame, scomps, qtabs, htabs, restart):
    h, w, comps, prec = frame
    center, maxval = float(1 << (prec - 1)), (1 << prec) - 1
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes = {}
    coef_lists = {}
    for c in comps:
        planes[c["id"]] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
        coef_lists[c["id"]] = []

    r = _BitReaderJ(payload, data_pos)
    preds = {c["id"]: 0 for c in comps}
    order = [by_id[cid] for cid, _, _ in scomps]
    tids = {cid: (dc, ac) for cid, dc, ac in scomps}
    mcu_count = 0
    blocks_pos: dict[int, list[tuple[int, int]]] = {c["id"]: [] for c in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                r.align_restart()
                preds = {c["id"]: 0 for c in comps}
            for c in order:
                dc_t = htabs[(0, tids[c["id"]][0])]
                ac_t = htabs[(1, tids[c["id"]][1])]
                for byy in range(c["v"]):
                    for bxx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _huff_decode(r, dc_t)
                        diff = _extend(r.get(size), size) if size else 0
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_t)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(r.get(size), size)
                            k += 1
                        coef_lists[c["id"]].append(zz)
                        blocks_pos[c["id"]].append(
                            (my * c["v"] + byy, mx * c["h"] + bxx)
                        )
            mcu_count += 1

    # dequantize + batched IDCT per component
    for c in comps:
        zzs = np.stack(coef_lists[c["id"]])  # (n, 64) zigzag order
        deq = zzs * qtabs[c["q"]][_ZIGZAG]
        blocks = deq[:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("xu,nuv,yv->nxy", _C.T, blocks, _C.T) + center
        plane = planes[c["id"]]
        for (byy, bxx), blk in zip(blocks_pos[c["id"]], pix):
            plane[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] = blk

    # upsample to full resolution (bilinear, pixel-center aligned — the
    # libjpeg "fancy upsampling" class of filter, not blocky replication)
    # and crop
    full = {}
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = _bilinear_up(p, p.shape[0] * ry, p.shape[1] * rx)
        full[c["id"]] = p[:h, :w]

    if len(comps) == 1:
        y = np.clip(np.round(full[comps[0]["id"]]), 0, maxval).astype(
            np.uint8 if maxval <= 255 else np.uint16
        )
        return np.repeat(y[:, :, None], 3, axis=2)
    ids = [c["id"] for c in comps]
    return _ycbcr_to_rgb(full[ids[0]], full[ids[1]], full[ids[2]], center, maxval)


class _ProgWriter(_BitWriterJ):
    """Bit writer with deferred EOBRUN + correction-bit buffering (the
    refinement-scan encoder must emit pending correction bits after the
    next Huffman symbol, T.81 G.1.2.3)."""

    def __init__(self, ac_codes):
        super().__init__()
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.bits: list[int] = []

    def put_bits(self, bits):
        for b in bits:
            self.put(b, 1)

    def flush_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, ln = self.ac_codes[nbits << 4]
            self.put(code, ln)
            if nbits:
                self.put(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
            self.put_bits(self.bits)
            self.bits = []


def encode_jpeg_progressive_np(
    img: np.ndarray, quality: int = 85, subsampling: str = "444"
) -> bytes:
    """uint8 RGB/gray -> progressive JFIF (SOF2): spectral selection +
    one successive-approximation level, libjpeg-style scan script
    DC(Al=1) -> AC first (Al=1) per component -> DC refine -> AC refine
    per component — so every Annex-G decoder branch (EOBRUN, ZRL,
    newly-significant, correction bits) is exercised. The Annex-K
    baseline AC tables lack EOBn (n>1) symbols, so EOB runs are emitted
    one block at a time (symbol 0x00); decode output is bit-identical to
    the baseline encoder's at the same quality/subsampling."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt_l, qt_c = _quality_tables(quality)
    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be '444', '422' or '420'")
    cx, cy = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]

    if gray:
        comps = [{"plane": img.astype(np.float64), "h": 1, "v": 1, "qt": qt_l,
                  "dc": _canonical_codes(*_DC_LUMA), "ac": _canonical_codes(*_AC_LUMA)}]
    else:
        ycc = _rgb_to_ycbcr(img)
        yf, cb, cr = (ycc[..., i] for i in range(3))
        if cx > 1 or cy > 1:
            ph2, pw2 = -(-h // cy) * cy, -(-w // cx) * cx
            cb = _pad_plane(cb, ph2, pw2).reshape(ph2 // cy, cy, pw2 // cx, cx).mean((1, 3))
            cr = _pad_plane(cr, ph2, pw2).reshape(ph2 // cy, cy, pw2 // cx, cx).mean((1, 3))
        comps = [
            {"plane": yf, "h": cx, "v": cy, "qt": qt_l,
             "dc": _canonical_codes(*_DC_LUMA), "ac": _canonical_codes(*_AC_LUMA)},
            {"plane": cb, "h": 1, "v": 1, "qt": qt_c,
             "dc": _canonical_codes(*_DC_CHROMA), "ac": _canonical_codes(*_AC_CHROMA)},
            {"plane": cr, "h": 1, "v": 1, "qt": qt_c,
             "dc": _canonical_codes(*_DC_CHROMA), "ac": _canonical_codes(*_AC_CHROMA)},
        ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        gh, gw = mcuy * c["v"] * 8, mcux * c["h"] * 8
        p = _pad_plane(c["plane"], gh, gw) - 128.0
        blocks = _blocks_of(p)
        f = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
        coef = np.round(f / c["qt"].reshape(8, 8)).astype(np.int64)
        c["zz"] = coef.reshape(-1, 64)[:, _ZIGZAG].reshape(gh // 8, gw // 8, 64)
        c["nby"], c["nbx"] = _comp_block_dims(h, w, c, hmax, vmax)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qt_l[_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, b"\x01" + bytes(qt_c[_ZIGZAG].astype(np.uint8)))
    ncomp = len(comps)
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci, c in enumerate(comps):
        sof += bytes([ci + 1, (c["h"] << 4) | c["v"], 0 if ci == 0 else 1])
    out += seg(0xFFC2, bytes(sof))  # SOF2 progressive
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)
    )[: 2 if gray else 4]:
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    def sos_hdr(comp_ids, ss, se, ah, al):
        b = bytearray([len(comp_ids)])
        for cid in comp_ids:
            tid = 0 if cid == 1 else 1
            b += bytes([cid, (tid << 4) | tid])
        b += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, bytes(b))

    AL = 1  # one successive-approximation level

    # ---- scan 1: DC first, all components interleaved, Al=AL ----
    bw = _BitWriterJ()
    preds = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                for byy in range(c["v"]):
                    for bxx in range(c["h"]):
                        dc = int(c["zz"][my * c["v"] + byy, mx * c["h"] + bxx, 0]) >> AL
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        size = _category(diff)
                        code, ln = c["dc"][size]
                        bw.put(code, ln)
                        if size:
                            bw.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    out += sos_hdr(list(range(1, ncomp + 1)), 0, 0, 0, AL)
    out += bw.flush()

    # ---- per component: AC first scan (Ss=1..63, Ah=0, Al=AL) ----
    for ci, c in enumerate(comps):
        pw = _ProgWriter(c["ac"])
        for byy in range(c["nby"]):
            for bxx in range(c["nbx"]):
                zz = c["zz"][byy, bxx]
                r = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    t = abs(v) >> AL
                    if t == 0:
                        r += 1
                        continue
                    pw.flush_eobrun()
                    while r > 15:
                        code, ln = c["ac"][0xF0]
                        pw.put(code, ln)
                        r -= 16
                    size = _category(t)
                    code, ln = c["ac"][(r << 4) | size]
                    pw.put(code, ln)
                    sv = t if v >= 0 else -t
                    pw.put(sv if sv >= 0 else sv + (1 << size) - 1, size)
                    r = 0
                if r > 0:
                    pw.eobrun = 1
                    pw.flush_eobrun()
        out += sos_hdr([ci + 1], 1, 63, 0, AL)
        out += pw.flush()

    # ---- DC refinement scan (Ah=AL, Al=0): one raw bit per block ----
    bw = _BitWriterJ()
    for my in range(mcuy):
        for mx in range(mcux):
            for c in comps:
                for byy in range(c["v"]):
                    for bxx in range(c["h"]):
                        bw.put(int(c["zz"][my * c["v"] + byy, mx * c["h"] + bxx, 0]) & 1, 1)
    out += sos_hdr(list(range(1, ncomp + 1)), 0, 0, AL, 0)
    out += bw.flush()

    # ---- per component: AC refinement (Ah=AL, Al=0) ----
    for ci, c in enumerate(comps):
        pw = _ProgWriter(c["ac"])
        for byy in range(c["nby"]):
            for bxx in range(c["nbx"]):
                zz = c["zz"][byy, bxx]
                absv = np.abs(zz[1:64])
                eob = 0
                for k in range(1, 64):
                    if absv[k - 1] == 1:
                        eob = k
                r = 0
                br: list[int] = []
                for k in range(1, 64):
                    t = int(absv[k - 1])
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        pw.flush_eobrun()
                        code, ln = c["ac"][0xF0]
                        pw.put(code, ln)
                        r -= 16
                        pw.put_bits(br)
                        br = []
                    if t > 1:
                        # already significant: correction bit only
                        br.append(t & 1)
                        continue
                    pw.flush_eobrun()
                    code, ln = c["ac"][(r << 4) | 1]
                    pw.put(code, ln)
                    pw.put(1 if int(zz[k]) > 0 else 0, 1)
                    pw.put_bits(br)
                    br = []
                    r = 0
                if r > 0 or br:
                    pw.eobrun = 1
                    pw.bits.extend(br)
                    pw.flush_eobrun()
        out += sos_hdr([ci + 1], 1, 63, AL, 0)
        out += pw.flush()

    out += b"\xff\xd9"
    return bytes(out)


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
