"""Rice (RICE_1) codec for FITS tiled-image compression (fpack ``.fits.fz``).

Clean-room implementation of the block-adaptive Rice coder specified by the
registered FITS convention "Tiled Image Compression in FITS Binary Tables"
(Pence, Seaman & White 2013; the cfitsio/fpack default codec, ZCMPTYPE =
'RICE_1'). The reference stack reads these transparently through fitsio
(/root/reference/hisscube/utils/photometry.py:18,31 — fitsio.FITS handles
compressed HDUs natively); this module gives the pure-python parser in
:mod:`hiss_cube_spark.sources.fits` the same capability, so SDSS-style
``frame-*.fits.fz`` distributions ingest without astropy/fitsio on the
cluster.

Format recap (per the convention):

* the stream opens with the first pixel value, raw big-endian, ``bytepix``
  bytes;
* pixels are processed in blocks of ``blocksize`` (ZVAL1, default 32);
  successive differences are zigzag-mapped (d>=0 → 2d, d<0 → -2d-1);
* each block is preceded by ``fsbits`` bits holding ``fs+1`` where ``fs``
  is the Golomb-Rice split: 0 → all diffs zero (run of the previous
  value), ``fsmax+1`` → verbatim ``bbits``-bit diffs, else each diff is
  ``(quotient in unary)(fs low bits)``;
* ``(fsbits, fsmax)`` = (3, 6) / (4, 14) / (5, 25) for bytepix 1 / 2 / 4;
* arithmetic wraps modulo 2^(8·bytepix) — decoded values are reinterpreted
  as the signed width of ZBITPIX.

Pure Python, per-tile; tiles are small (one image row by default), and the
Spark ingest path runs tiles inside mapInPandas batches so the decode is
executor-parallel. For heavier throughput plug fitsio through ``decode_fn``
where available.
"""

from __future__ import annotations

import numpy as np

__all__ = ["rice_encode", "rice_decode"]

_PARAMS = {1: (3, 6), 2: (4, 14), 4: (5, 25)}  # bytepix -> (fsbits, fsmax)


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, nbits: int) -> int:
        while self.nbits < nbits:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= nbits
        out = self.acc >> self.nbits
        self.acc &= (1 << self.nbits) - 1
        return out

    def read_unary(self) -> int:
        """Count zero bits up to and including the terminating 1 bit;
        returns the zero count (the unary-coded quotient)."""
        n = 0
        while self.acc == 0:
            n += self.nbits
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        lead = self.nbits - self.acc.bit_length()
        n += lead
        self.nbits -= lead + 1
        self.acc &= (1 << self.nbits) - 1  # drop the terminating 1
        return n


def rice_encode(values: np.ndarray, blocksize: int = 32, bytepix: int = 2) -> bytes:
    """Compress a 1-D integer tile to a RICE_1 byte stream."""
    fsbits, fsmax = _PARAMS[bytepix]
    bbits = 1 << fsbits
    mask = (1 << (8 * bytepix)) - 1
    vals = [int(v) & mask for v in np.asarray(values).ravel()]
    if not vals:
        return b""
    w = _BitWriter()
    w.write(vals[0], 8 * bytepix)  # first pixel, raw big-endian
    lastpix = vals[0]
    for start in range(0, len(vals), blocksize):
        block = vals[start : start + blocksize]
        mapped = []
        for v in block:
            d = (v - lastpix) & mask
            # interpret the wrapped difference as signed, then zigzag-map
            if d > mask >> 1:
                d -= mask + 1
            mapped.append(2 * d if d >= 0 else -2 * d - 1)
            lastpix = v
        psum = sum(mapped)
        if psum == 0:
            w.write(0, fsbits)  # fs = -1: whole block repeats lastpix
            continue
        # cfitsio's split estimate: fs = floor(log2(mean diff / 2))-ish
        dpsum = (psum - (len(block) >> 1) - 1) // len(block)
        if dpsum < 0:
            dpsum = 0
        fs = 0
        p = dpsum >> 1
        while p > 0:
            fs += 1
            p >>= 1
        if fs >= fsmax:
            w.write(fsmax + 1, fsbits)
            for m in block_mapped(mapped, mask):
                w.write(m, bbits)
        else:
            w.write(fs + 1, fsbits)
            for m in mapped:
                top = m >> fs
                w.write(1, top + 1)  # 'top' zeros then the terminating 1
                if fs:
                    w.write(m, fs)
    return w.done()


def block_mapped(mapped: list[int], mask: int) -> list[int]:
    """Verbatim-block values: zigzag codes wrapped to the pixel width."""
    return [m & mask for m in mapped]


def rice_decode(
    data: bytes, npix: int, blocksize: int = 32, bytepix: int = 2
) -> np.ndarray:
    """Decompress a RICE_1 stream to ``npix`` values (returned as int64,
    wrapped modulo the pixel width — caller reinterprets signedness)."""
    fsbits, fsmax = _PARAMS[bytepix]
    bbits = 1 << fsbits
    mask = (1 << (8 * bytepix)) - 1
    out = np.empty(npix, dtype=np.int64)
    if npix == 0:
        return out
    lastpix = int.from_bytes(data[:bytepix], "big")
    r = _BitReader(data, bytepix)
    i = 0
    while i < npix:
        fs = r.read(fsbits) - 1
        imax = min(i + blocksize, npix)
        if fs < 0:
            out[i:imax] = lastpix
            i = imax
            continue
        if fs == fsmax:
            for j in range(i, imax):
                m = r.read(bbits)
                d = (m >> 1) ^ (-(m & 1))  # zigzag unmap (two's complement)
                lastpix = (lastpix + d) & mask
                out[j] = lastpix
        else:
            for j in range(i, imax):
                q = r.read_unary()
                m = (q << fs) | (r.read(fs) if fs else 0)
                d = (m >> 1) ^ (-(m & 1))
                lastpix = (lastpix + d) & mask
                out[j] = lastpix
        i = imax
    return out


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
