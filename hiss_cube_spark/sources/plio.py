"""PLIO_1 (IRAF pixel-list) codec for FITS tiled-image compression.

Clean-room implementation of the line-list scheme registered in the FITS
"Tiled Image Compression" convention as ``ZCMPTYPE='PLIO_1'`` (Pence,
Seaman & White 2013). PLIO was designed for integer image *masks*: long
runs of equal non-negative values (0 = unmasked) encode as a stream of
16-bit instruction words — 3-bit opcode in bits 13-15, 13-bit data field
in bits 0-12 — against a running "high value" register:

========  =======================================================
opcode    semantics (data field = N unless noted)
========  =======================================================
0  ZN     emit N zeros
1  SH     set high value absolute: data = low 13 bits, next word
          carries the high bits (mask values up to 2**27-1)
2  IH     high += N
3  DH     high -= N
4  HN     emit N copies of the high value
5  PN     emit N-1 zeros then a single high value
6  IS     high += N, then emit one high value
7  DS     high -= N, then emit one high value
========  =======================================================

The stream starts with a 3-word header (magic ``0x3A50``, then the pixel
count as two 15-bit words, low first). The encoder emits ZN/SH/IH/DH/HN
(+IS/DS for isolated stepped pixels); the decoder executes the full
opcode table. Like the sibling RICE/HCOMPRESS codecs this module is
property-tested self-consistent and convention-shaped but NOT claimed
bit-compatible with cfitsio's pliocomp output (no reference binary in
this environment) — the honest-gap policy documented at the call site in
:mod:`hiss_cube_spark.sources.fits`. The reference reads PLIO masks
transparently via fitsio (/root/reference/hisscube/utils/photometry.py:18).

Negative values are rejected (masks are non-negative by definition —
same restriction as the published codec).
"""

from __future__ import annotations

import numpy as np

__all__ = ["plio_encode", "plio_decode"]

_MAGIC = 0x3A50
_DMAX = (1 << 13) - 1  # 13-bit data field
_VMAX = (1 << 27) - 1  # 27-bit mask values


def _runs(a: np.ndarray) -> list[tuple[int, int]]:
    """[(value, run_length), ...] for a 1-D array."""
    if a.size == 0:
        return []
    edges = np.flatnonzero(np.diff(a)) + 1
    starts = np.concatenate([[0], edges])
    ends = np.concatenate([edges, [a.size]])
    return [(int(a[s]), int(e - s)) for s, e in zip(starts, ends)]


def plio_encode(a: np.ndarray) -> bytes:
    """1-D non-negative int array -> PLIO_1 line-list bytes (int16 BE words)."""
    a = np.asarray(a).ravel().astype(np.int64)
    if a.size and int(a.min()) < 0:
        raise ValueError("PLIO_1 encodes non-negative masks only")
    if a.size and int(a.max()) > _VMAX:
        raise ValueError(f"PLIO_1 values must fit 27 bits (max {_VMAX})")
    words: list[int] = [_MAGIC, a.size & 0x7FFF, (a.size >> 15) & 0x7FFF]
    hi = 1
    for v, n in _runs(a):
        if v == 0:
            while n > 0:
                d = min(n, _DMAX)
                words.append((0 << 13) | d)  # ZN
                n -= d
            continue
        if v != hi:
            dv = v - hi
            if n == 1 and 0 < dv <= _DMAX:
                words.append((6 << 13) | dv)  # IS: step up + emit one
                hi = v
                continue
            if n == 1 and 0 < -dv <= _DMAX:
                words.append((7 << 13) | (-dv))  # DS: step down + emit one
                hi = v
                continue
            if 0 < dv <= _DMAX:
                words.append((2 << 13) | dv)  # IH
            elif 0 < -dv <= _DMAX:
                words.append((3 << 13) | (-dv))  # DH
            else:
                words.append((1 << 13) | (v & 0x1FFF))  # SH low 13
                words.append((v >> 13) & 0x7FFF)  # SH high bits
            hi = v
        while n > 0:
            d = min(n, _DMAX)
            words.append((4 << 13) | d)  # HN
            n -= d
    return np.asarray(words, dtype=">u2").tobytes()


def plio_decode(buf: bytes) -> np.ndarray:
    """PLIO_1 line-list bytes -> 1-D int64 array."""
    w = np.frombuffer(buf, dtype=">u2").astype(np.int64)
    if w.size < 3 or w[0] != _MAGIC:
        raise ValueError("not a PLIO_1 line list (bad magic)")
    npix = int(w[1]) | (int(w[2]) << 15)
    out = np.zeros(npix, dtype=np.int64)
    pos, hi, i = 0, 1, 3
    while i < w.size and pos < npix:
        op, data = int(w[i]) >> 13, int(w[i]) & _DMAX
        i += 1
        if op == 0:  # ZN
            pos += data
        elif op == 1:  # SH (2 words)
            if i >= w.size:
                raise ValueError("PLIO_1 truncated SH instruction")
            hi = data | (int(w[i]) << 13)
            i += 1
        elif op == 2:  # IH
            hi += data
        elif op == 3:  # DH
            hi -= data
        elif op == 4:  # HN
            out[pos : pos + data] = hi
            pos += data
        elif op == 5:  # PN
            pos += data - 1
            if pos < npix:
                out[pos] = hi
            pos += 1
        elif op == 6:  # IS
            hi += data
            if pos < npix:
                out[pos] = hi
            pos += 1
        else:  # DS
            hi -= data
            if pos < npix:
                out[pos] = hi
            pos += 1
        if pos > npix:
            raise ValueError("PLIO_1 stream overruns pixel count")
    if pos != npix:
        # the encoder emits explicit ZN words even for trailing zeros, so
        # a short stream is corruption, not an implicit tail
        raise ValueError("PLIO_1 stream ends before pixel count reached")
    return out


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
