"""Foreign (IRAF/cfitsio ``pliocomp``) PLIO_1 line-list codec.

Clean-room reconstruction of the pixel-list stream real ``fpack`` files
carry in PLIO_1 tiles. cfitsio compresses each tile with ONE call
``pl_p2li(idata, 1, cbuf, tilelen)`` over the flattened tile and stores
the resulting 16-bit words big-endian in the heap (imcompress.c PLIO_1
branch); ``pl_p2li``/``pl_l2pi`` themselves are Doug Tody's NRAO line-list
code (pliocomp.c, carried verbatim in cfitsio and astropy).

Stream structure, re-derived from the published pliocomp.c pointer
arithmetic (1-based f2c indices in comments; this module uses 0-based):

* 7-word header: ``lldst[1]=0, lldst[2]=7, lldst[3]=-100`` (the
  LL_NEWFORMAT marker), ``lldst[4]=(len)%32768, lldst[5]=(len)/32768``
  where *len* counts ALL words including the header, ``lldst[6]=0,
  lldst[7]=0``. First instruction at word 8 (= header length 7 + 1).
  The old 3-word format (``ll_src[3] > 0`` = positive length in word 3,
  instructions from word 4) is also accepted on decode.
* Instruction words are non-negative shorts: ``opcode = w / 4096``
  (I_SHIFT = 4096), ``data = w % 4096`` (I_DATAMAX = 4095) — a 3-bit
  opcode over a 12-BIT data field (the repo's self-versioned
  :mod:`hiss_cube_spark.sources.plio` uses 13-bit fields; the two
  streams are dispatched by magic, never confused).
* Opcodes (IRAF plio.h): ZN=0 skip N zeros; SH=1 set the high register
  absolute — ``hi = (next_word << 12) + data`` (12+15 = the 27-bit mask
  ceiling), consuming two words; IH=2 ``hi += N``; DH=3 ``hi -= N``;
  HN=4 emit N copies of hi; PN=5 emit N-1 zeros then ONE hi; IS=6 /
  DS=7 step hi by ±N then emit one hi.
* Zeros at the tail are implicit: the decoder zero-fills up to npix
  (pl_l2pi zeroes the remainder of the output line) — unlike the
  self-versioned stream, trailing ZN words are optional.

HONESTY NOTE (same policy as :mod:`hiss_cube_spark.sources.hcomp_foreign`):
byte-identity of the ENCODER with cfitsio's pl_p2li is unverifiable in
this container (no real fpack sample, no cfitsio); the encoder emits only
spec-legal instructions (ZN/SH/IH/DH/HN/PN/IS/DS with 12-bit data) that
pl_l2pi semantics decode exactly, and the DECODER executes the full
published opcode table, so real fpack tiles decode correctly or fail
loudly — they cannot mis-decode. Decode semantics are pinned by
hand-built golden instruction vectors in tests/test_plio.py (streams
written word-by-word from the opcode table, independent of the encoder —
the r7 hcomp lesson: roundtrip self-tests cannot catch stream-layout
mistakes).

Reference behavior being mirrored: the reference reads PLIO masks
transparently via fitsio (hisscube/utils/photometry.py:18,31).
"""

from __future__ import annotations

import numpy as np

__all__ = ["iraf_plio_encode", "iraf_plio_decode", "looks_like_iraf_plio"]

_I_SHIFT = 4096  # 12-bit data field (I_DATAMAX = 4095)
_DMAX = _I_SHIFT - 1
_VMAX = (1 << 27) - 1  # 12 low + 15 high bits via SH
_NEWFMT = -100  # LL_NEWFORMAT marker, word 3 (1-based)
_HDRLEN = 7


def looks_like_iraf_plio(buf: bytes) -> bool:
    """True if the first words parse as an IRAF line-list header."""
    if len(buf) < 6:
        return False
    w = np.frombuffer(buf[:6], dtype=">i2")
    # new format: {0, 7, -100, ...}; old format: word 3 (1-based) > 0
    # with a plausible 3-word header
    return (int(w[1]) == _HDRLEN and int(w[2]) == _NEWFMT) or (
        int(w[2]) > 0 and int(w[0]) >= 0 and int(w[1]) >= 0
    )


def iraf_plio_encode(a: np.ndarray) -> bytes:
    """1-D non-negative int array → IRAF new-format line list (BE shorts)."""
    a = np.asarray(a).ravel().astype(np.int64)
    if a.size and int(a.min()) < 0:
        raise ValueError("PLIO encodes non-negative masks only")
    if a.size and int(a.max()) > _VMAX:
        raise ValueError(f"PLIO values must fit 27 bits (max {_VMAX})")

    instr: list[int] = []
    hi = 1  # pl_p2li initializes the high register to 1
    # run-length walk
    if a.size:
        edges = np.flatnonzero(np.diff(a)) + 1
        starts = np.concatenate([[0], edges])
        ends = np.concatenate([edges, [a.size]])
        runs = [(int(a[s]), int(e - s)) for s, e in zip(starts, ends)]
    else:
        runs = []
    zrun = 0  # pending zeros (lets single pixels fuse into PN)
    for v, n in runs:
        if v == 0:
            zrun += n
            continue
        if v != hi:
            dv = v - hi
            if n == 1 and zrun == 0 and 0 < abs(dv) <= _DMAX:
                # lone stepped pixel with no pending zeros: IS/DS
                instr.append(((6 if dv > 0 else 7) * _I_SHIFT) | abs(dv))
                hi = v
                continue
            if 0 < abs(dv) <= _DMAX:
                instr.append(((2 if dv > 0 else 3) * _I_SHIFT) | abs(dv))
            else:
                instr.append((1 * _I_SHIFT) | (v & _DMAX))  # SH low 12
                instr.append((v >> 12) & 0x7FFF)  # SH high 15
            hi = v
        # flush pending zeros; a single pixel can absorb them as PN
        if n == 1 and 0 < zrun + 1 <= _DMAX:
            instr.append((5 * _I_SHIFT) | (zrun + 1))  # PN
            zrun = 0
            continue
        while zrun > 0:
            d = min(zrun, _DMAX)
            instr.append((0 * _I_SHIFT) | d)  # ZN
            zrun -= d
        m = n
        while m > 0:
            d = min(m, _DMAX)
            instr.append((4 * _I_SHIFT) | d)  # HN
            m -= d
    # trailing zeros are implicit (decoder zero-fills to npix)

    total = _HDRLEN + len(instr)
    words = [0, _HDRLEN, _NEWFMT, total % 32768, total // 32768, 0, 0] + instr
    return np.asarray(words, dtype=">i2").tobytes()


def iraf_plio_decode(buf: bytes, npix: int) -> np.ndarray:
    """IRAF line-list bytes → 1-D int64 array of ``npix`` pixels.

    Mirrors pl_l2pi: header branch on word 3 (1-based) sign, then the
    8-opcode interpreter; output zero-filled beyond the last instruction.
    """
    w = np.frombuffer(buf, dtype=">i2").astype(np.int64)
    if w.size < 3:
        raise ValueError("IRAF PLIO stream shorter than any header")
    if int(w[2]) > 0:  # old format: 1-based ll_src[3] > 0 is the length
        lllen = int(w[2])
        first = 3  # 0-based (1-based word 4)
    elif int(w[2]) == _NEWFMT:
        if w.size < _HDRLEN:
            raise ValueError("IRAF PLIO new-format header truncated")
        lllen = int(w[3]) + (int(w[4]) << 15)
        first = int(w[1])  # header length (7) = 0-based first instruction
    else:
        raise ValueError(
            f"not an IRAF PLIO line list (header word 3 = {int(w[2])})"
        )
    # fail loudly on truncation: clamping to w.size would turn missing
    # tail instructions into implicit zeros up to npix — a silent
    # partial decode the tile-level size check can never catch, because
    # this decoder always zero-fills to npix by design
    if int(w.size) < lllen:
        raise ValueError(
            f"IRAF PLIO stream truncated: header says {lllen} words, "
            f"buffer holds {int(w.size)}"
        )

    out = np.zeros(npix, dtype=np.int64)
    pos, hi = 0, 1
    i = first
    while i < lllen and pos < npix:
        word = int(w[i])
        i += 1
        if word < 0:
            raise ValueError("negative PLIO instruction word (corrupt)")
        op, data = word // _I_SHIFT, word % _I_SHIFT
        # ZN/HN/PN carry a run length ≥ 1 by construction (pl_p2li never
        # emits zero-length runs); data==0 here means corruption — and a
        # PN with data==0 would step pos BACKWARD and overwrite the
        # previous pixel. Reject rather than mis-decode.
        if data == 0 and op in (0, 4, 5):
            raise ValueError(
                f"IRAF PLIO zero-length run (opcode {op}) — corrupt stream"
            )
        if op == 0:  # ZN
            pos += data
        elif op == 1:  # SH — absolute set, 2 words
            if i >= lllen:
                raise ValueError("IRAF PLIO truncated SH instruction")
            hi = data + (int(w[i]) << 12)
            i += 1
        elif op == 2:  # IH
            hi += data
        elif op == 3:  # DH
            hi -= data
        elif op == 4:  # HN
            n = min(data, npix - pos)
            out[pos : pos + n] = hi
            pos += data
        elif op == 5:  # PN: data-1 zeros then one hi
            pos += data - 1
            if 0 <= pos < npix:
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
        raise ValueError("IRAF PLIO stream overruns the pixel count")
    return out


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
