"""FLAC codec — pure numpy/stdlib, clean-room from the public FLAC
format specification (xiph.org / RFC 9639).

Closes the audio-codec gap in the multimodal family: PCM WAV decoded
since round 2, compressed audio since round 5, and as of round 6 the
decoder reads the subframe/stereo surface real-world FLAC files use:

- **container**: ``fLaC`` magic, STREAMINFO metadata block (blocksize /
  sample-rate / channels / bits-per-sample / total-samples / MD5 of the
  raw little-endian PCM at the stream's byte width), additional
  metadata blocks skipped;
- **frames**: 14-bit sync, blocking-strategy bit, blocksize / rate /
  channel-assignment / sample-size codes, UTF-8-coded frame number,
  CRC-8 header check and CRC-16 whole-frame check (both real, both
  verified on decode);
- **subframes (decode)**: CONSTANT, VERBATIM, FIXED (orders 0-4) and
  **LPC (orders 1-32, quantized coefficients + arithmetic shift)** with
  Rice-coded residuals — 4-bit (method 0) and 5-bit (method 1)
  parameter widths, partition orders, the raw-bits escape, and
  **wasted-bits** handling;
- **stereo decorrelation (decode)**: independent, left/side,
  right/side and mid/side reconstruction per RFC 9639 §4.2;
- **encoder**: 16-bit mono/stereo, fixed 4096 blocksize. Default
  (``lpc=False, stereo="independent"``) uses best-of fixed predictor
  order (estimated Rice bit cost), single-partition Rice; one default
  8-bit stream is byte-pinned in tests, but cross-version byte
  stability of every input is not a contract — only losslessness is.
  Opt-in
  ``lpc=True`` adds Levinson-Durbin LPC subframes (orders 2/4/8,
  precision 12) chosen by estimated Rice bit cost; ``stereo=`` adds
  left/side / right/side / mid/side (or ``"auto"`` per-frame best).

The Rice residual decode is fully vectorized (round-6): the payload is
unpacked to a bit array once, unary terminators are selected with a
searchsorted pointer-doubling orbit (O(log n) vector steps per
partition), and remainder bits are gathered in one matrix op — no
per-sample Python on the FIXED/CONSTANT/VERBATIM path. LPC synthesis
is an inherently sequential integer IIR and keeps a per-sample loop
(same as any scalar decoder); it is off the default encode path.

Bit depths 8/16/24 decode (int16 out for <=16, int32 for 24; MD5
verified at the stream's byte width — 1/2/3 bytes per sample).
Like RICE/HCOMPRESS/PLIO there is no reference binary in this
environment, so bit-compatibility with libFLAC is documented as
unverified; the stream layout follows the spec.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["encode_flac_np", "decode_flac_np", "flac_streaminfo"]

_MAGIC = b"fLaC"

_CRC8_TABLE = np.zeros(256, dtype=np.uint8)
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE[_i] = _c

_CRC16_TABLE = np.zeros(256, dtype=np.uint16)
for _i in range(256):
    _c = _i << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TABLE[_i] = _c


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TABLE[c ^ b])
    return c


def _crc16_py(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ int(_CRC16_TABLE[((c >> 8) ^ b) & 0xFF])
    return c


# shift-by-2^k-zero-bytes operators on the CRC-16 state, as paired
# uint16[256] tables (state = hi-byte table ^ lo-byte table); level k+1
# is level k composed with itself.  Lets _crc16 run as a vectorized
# GF(2) binary-tree combine instead of a per-byte Python loop — the
# per-frame CRC was ~1/3 of whole-file decode time.
_CRC16_SHIFT: list[tuple[np.ndarray, np.ndarray]] = []


def _crc16_shift_tables(level: int) -> tuple[np.ndarray, np.ndarray]:
    while len(_CRC16_SHIFT) <= level:
        if not _CRC16_SHIFT:
            b = np.arange(256, dtype=np.int64)
            # one zero byte: f(s) = ((s << 8) & 0xFFFF) ^ T[s >> 8]
            hi = _CRC16_TABLE[b].astype(np.uint16)
            lo = ((b << 8) & 0xFFFF).astype(np.uint16)
        else:
            phi, plo = _CRC16_SHIFT[-1]
            hi = phi[phi >> 8] ^ plo[phi & 0xFF]
            lo = phi[plo >> 8] ^ plo[plo & 0xFF]
        _CRC16_SHIFT.append((hi, lo))
    return _CRC16_SHIFT[level]


def _crc16(data: bytes) -> int:
    """CRC-16 (poly 0x8005, init 0) via tree combine: CRC(A||B) =
    shift_{|B|}(CRC(A)) ^ CRC(B), all levels table-gathered in numpy.
    Front zero-padding is the identity under init 0."""
    n = len(data)
    if n < 64:
        return _crc16_py(data)
    states = _CRC16_TABLE[np.frombuffer(data, dtype=np.uint8)]
    size = 1 << (n - 1).bit_length()
    if size != n:
        states = np.concatenate([np.zeros(size - n, np.uint16), states])
    level = 0
    while states.size > 1:
        hi, lo = _crc16_shift_tables(level)
        left, right = states[0::2], states[1::2]
        states = hi[left >> 8] ^ lo[left & 0xFF] ^ right
        level += 1
    return int(states[0])


class _BW:
    """MSB-first bit writer over unpacked bit chunks (numpy packbits at
    the end — lets the Rice coder emit whole residual arrays in one
    vectorized append instead of per-sample bit pushes)."""

    __slots__ = ("chunks", "nbits")

    def __init__(self) -> None:
        self.chunks: list[np.ndarray] = []
        self.nbits = 0

    def put(self, v: int, nbits: int) -> None:
        if nbits == 0:
            return
        bits = (
            (int(v) >> np.arange(nbits - 1, -1, -1)) & 1
        ).astype(np.uint8)
        self.chunks.append(bits)
        self.nbits += nbits

    def put_bits(self, bits: np.ndarray) -> None:
        if bits.size:
            self.chunks.append(bits.astype(np.uint8, copy=False).ravel())
            self.nbits += bits.size

    def put_unary(self, q: int) -> None:
        bits = np.zeros(q + 1, dtype=np.uint8)
        bits[q] = 1
        self.put_bits(bits)

    def align(self) -> None:
        if self.nbits % 8:
            self.put_bits(np.zeros(8 - self.nbits % 8, dtype=np.uint8))

    @property
    def buf(self) -> bytes:
        if not self.chunks:
            return b""
        return np.packbits(np.concatenate(self.chunks)).tobytes()


class _BR:
    """MSB-first bit reader (header-sized reads; bulk reads go through
    the vectorized bit-array helpers below)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.bit = 0

    def get(self, nbits: int) -> int:
        out = 0
        while nbits > 0:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(avail, nbits)
            byte = self.data[self.pos]
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            nbits -= take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _utf8_number(n: int) -> bytes:
    """FLAC's extended-UTF-8 coded number (frame/sample index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (1 + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | ((n >> shift) & ((1 << (7 - nbytes)) - 1)))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BR) -> int:
    b0 = br.get(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    n = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        n = (n << 6) | (br.get(8) & 0x3F)
    return n


# ---------------------------------------------------------------------------
# Vectorized bit-array readers (decode hot path)
# ---------------------------------------------------------------------------


def _read_uint_vec(
    bits: np.ndarray, t: int, cnt: int, width: int
) -> tuple[np.ndarray, int]:
    """Read ``cnt`` unsigned big-endian ``width``-bit fields starting at
    absolute bit offset ``t`` — one reshape + one matvec, no loop."""
    if cnt == 0 or width == 0:
        return np.zeros(cnt, dtype=np.int64), t
    end = t + cnt * width
    if end > bits.size:
        raise ValueError("FLAC bitstream truncated")
    chunk = bits[t:end].reshape(cnt, width).astype(np.int64)
    w = np.int64(1) << np.arange(width - 1, -1, -1, dtype=np.int64)
    return chunk @ w, end


def _sign_extend(v: np.ndarray, width: int) -> np.ndarray:
    return v - ((v >> (width - 1)) << width)


def _rice_read_vec(
    bits: np.ndarray, ones: np.ndarray, rank: np.ndarray,
    t: int, cnt: int, param: int
) -> tuple[np.ndarray, int]:
    """Decode ``cnt`` Rice(param) codes starting at absolute bit ``t``.

    Fully vectorized: each code is <unary quotient><1><param remainder
    bits>, so every code consumes exactly one set bit as terminator plus
    at most ``param`` set bits of remainder. The terminators are the
    orbit of ``first one >= t`` under ``next(k) = first one >
    ones[k]+param``, extracted with pointer doubling (O(log cnt) vector
    steps); remainders are gathered in one fancy-index + matvec.
    """
    if cnt == 0:
        return np.empty(0, dtype=np.int64), t
    # rank[x] = #ones at positions <= x = index of the first one > x:
    # both "first one >= t" and the jump targets are O(1) gathers.
    k0 = int(rank[t - 1]) if t else 0
    win = ones[k0 : k0 + cnt * (param + 1)]
    if param == 0:
        if win.size < cnt:
            raise ValueError("FLAC bitstream truncated")
        p = win[:cnt]
    else:
        nxt = np.minimum(
            rank[np.minimum(win + param, rank.size - 1)] - k0, win.size
        )
        jump = np.concatenate([nxt, [win.size]])  # sentinel self-loop
        idx = np.zeros(cnt, dtype=np.int64)
        step = 1
        while step < cnt:
            m = min(step, cnt - step)
            idx[step : step + m] = jump[idx[:m]]  # orbit fill
            jump = jump[jump]  # compose: next^(2*step); values <= win.size
            step *= 2
        if cnt > 1 and int(idx.max()) >= win.size:
            raise ValueError("FLAC bitstream truncated")
        if win.size == 0:
            raise ValueError("FLAC bitstream truncated")
        p = win[idx]
    starts = np.empty(cnt, dtype=np.int64)
    starts[0] = t
    starts[1:] = p[:-1] + 1 + param
    q = p - starts
    if param:
        if int(p[-1]) + 1 + param > bits.size:
            raise ValueError("FLAC bitstream truncated")
        rem_idx = p[:, None] + 1 + np.arange(param, dtype=np.int64)[None, :]
        w = np.int64(1) << np.arange(param - 1, -1, -1, dtype=np.int64)
        rem = bits[rem_idx].astype(np.int64) @ w
        u = (q << param) | rem
        t_end = int(p[-1]) + 1 + param
    else:
        u = q
        t_end = int(p[-1]) + 1
    return (u >> 1) ^ -(u & 1), t_end


def _read_residual(
    bits: np.ndarray, ones: np.ndarray, rank: np.ndarray,
    t: int, bs: int, order: int
) -> tuple[np.ndarray, int]:
    """Rice-coded residual section (RFC 9639 §9.2.7): method, partition
    order, per-partition parameter (with raw-bits escape)."""
    method, t = int(bits[t]) << 1 | int(bits[t + 1]), t + 2
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder, t = _read_uint_vec(bits, t, 1, 4)
    porder = int(porder[0])
    nparts = 1 << porder
    if (bs >> porder) << porder != bs:
        raise ValueError("invalid partition order for blocksize")
    parts = []
    for pi in range(nparts):
        cnt = (bs >> porder) - (order if pi == 0 else 0)
        if cnt < 0:
            raise ValueError("invalid partition order for blocksize")
        param, t = _read_uint_vec(bits, t, 1, pbits)
        param = int(param[0])
        if param == escape:
            raw, t = _read_uint_vec(bits, t, 1, 5)
            raw = int(raw[0])
            if raw:
                vals, t = _read_uint_vec(bits, t, cnt, raw)
                vals = _sign_extend(vals, raw)
            else:
                vals = np.zeros(cnt, dtype=np.int64)
        else:
            vals, t = _rice_read_vec(bits, ones, rank, t, cnt, param)
        parts.append(vals)
    return (parts[0] if nparts == 1 else np.concatenate(parts)), t


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, r << 1, (-r << 1) - 1).astype(np.int64)


def _rice_write(bw: _BW, res: np.ndarray, param: int) -> None:
    """Vectorized Rice emission: build the whole partition's bit array at
    once (unary quotients + terminators + remainder bits) — the
    per-sample Python loop was the encoder's hot spot."""
    u = _zigzag(res)
    q = u >> param
    L = q + 1 + param
    off = np.concatenate([[0], np.cumsum(L)])
    bits = np.zeros(int(off[-1]), dtype=np.uint8)
    bits[off[:-1] + q] = 1  # unary terminators
    if param:
        pos = (off[:-1] + q + 1)[:, None] + np.arange(param)[None, :]
        vals = (u[:, None] >> np.arange(param - 1, -1, -1)[None, :]) & 1
        bits[pos.ravel()] = vals.ravel().astype(np.uint8)
    bw.put_bits(bits)


def _rice_param(res: np.ndarray) -> int:
    if res.size == 0:
        return 0
    mean = float(np.abs(res).mean()) * 2.0 + 1.0
    p = max(0, int(np.ceil(np.log2(mean))) - 1)
    return min(p, 14)


def _rice_cost_bits(res: np.ndarray) -> tuple[int, int]:
    """(estimated bits, param) for a single-partition Rice encoding."""
    param = _rice_param(res)
    u = _zigzag(res)
    return int((u >> param).sum()) + res.size * (param + 1), param


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _lpc_candidates(chan: np.ndarray, sbits: int) -> list[tuple]:
    """Levinson-Durbin LPC candidates (orders 2/4/8, precision 12).

    Returns [(est_bits, order, precision, shift, qlp, res), ...] — the
    quantized-coefficient integer predictor the decoder will run, so the
    residual here is exact (lossless) by construction.
    """
    n = chan.size
    maxo = min(8, n - 1)
    if maxo < 1:
        return []
    x = chan.astype(np.float64)
    ac = np.array([float(np.dot(x[: n - k], x[k:])) for k in range(maxo + 1)])
    if ac[0] <= 0:
        return []
    a = np.zeros(maxo + 1)
    err = ac[0]
    by_order: dict[int, np.ndarray] = {}
    for m in range(1, maxo + 1):
        acc = ac[m] - (np.dot(a[1:m], ac[m - 1 : 0 : -1]) if m > 1 else 0.0)
        if err <= 0:
            break
        k = acc / err
        new_a = a.copy()
        new_a[m] = k
        if m > 1:
            new_a[1:m] = a[1:m] - k * a[m - 1 : 0 : -1]
        a = new_a
        err *= max(1e-12, 1.0 - k * k)
        by_order[m] = a[1 : m + 1].copy()
    out = []
    precision = 12
    for order in (2, 4, 8):
        if order not in by_order or n <= order:
            continue
        c = by_order[order]
        maxc = float(np.abs(c).max())
        if maxc == 0 or not np.isfinite(maxc):
            continue
        shift = int(np.floor(np.log2((1 << (precision - 1)) - 1) - np.log2(maxc)))
        shift = max(0, min(15, shift))
        qlp = np.clip(
            np.round(c * (1 << shift)),
            -(1 << (precision - 1)),
            (1 << (precision - 1)) - 1,
        ).astype(np.int64)
        if not np.any(qlp):
            continue
        acc_i = np.zeros(n - order, dtype=np.int64)
        for j in range(order):
            acc_i += qlp[j] * chan[order - 1 - j : n - 1 - j]
        res = chan[order:] - (acc_i >> shift)
        bits_est, _ = _rice_cost_bits(res)
        bits_est += order * sbits + 4 + 5 + order * precision + 8
        out.append((bits_est, order, precision, shift, qlp, res))
    return out


def _write_subframe(fb: _BW, chan: np.ndarray, sbits: int, lpc: bool) -> None:
    """Best subframe for one (possibly decorrelated) channel at depth
    ``sbits``: CONSTANT, best FIXED 0-2, and optionally best LPC."""
    bs = chan.size
    if bs and np.all(chan == chan[0]):
        fb.put(0, 1)
        fb.put(0b000000, 6)  # CONSTANT
        fb.put(0, 1)
        fb.put(int(chan[0]), sbits)
        return
    best_o, best_r, best_cost = 0, chan, float("inf")
    for o in range(min(3, bs)):
        r = _fixed_residual(chan, o)
        cost, _ = _rice_cost_bits(r)
        cost += o * sbits
        if cost < best_cost:
            best_o, best_r, best_cost = o, r, cost
    lpc_pick = None
    if lpc:
        for cand in _lpc_candidates(chan, sbits):
            if cand[0] < best_cost:
                best_cost = cand[0]
                lpc_pick = cand
    if lpc_pick is not None:
        _, order, precision, shift, qlp, res = lpc_pick
        fb.put(0, 1)
        fb.put(0b100000 | (order - 1), 6)  # LPC
        fb.put(0, 1)
        for w in chan[:order]:
            fb.put(int(w), sbits)
        fb.put(precision - 1, 4)
        fb.put(shift, 5)
        for c in qlp:
            fb.put(int(c), precision)
        fb.put(0, 2)  # residual method 0 (4-bit rice)
        fb.put(0, 4)  # partition order 0
        param = _rice_param(res)
        fb.put(param, 4)
        _rice_write(fb, res, param)
        return
    fb.put(0, 1)
    fb.put(0b001000 | best_o, 6)  # FIXED order
    fb.put(0, 1)
    for w in chan[:best_o]:
        fb.put(int(w), sbits)
    fb.put(0, 2)
    fb.put(0, 4)
    param = _rice_param(best_r)
    fb.put(param, 4)
    _rice_write(fb, best_r, param)


def _stereo_cost(chan: np.ndarray) -> int:
    """Cheap order-2 Rice-bit proxy for channel-mode selection."""
    bits, _ = _rice_cost_bits(_fixed_residual(chan, min(2, max(0, chan.size - 1))))
    return bits


def encode_flac_np(
    samples: np.ndarray,
    rate: int = 16_000,
    *,
    lpc: bool = False,
    stereo: str = "independent",
) -> bytes:
    """int16 (n,) mono or (n, ch) array -> FLAC bytes (lossless).

    Defaults keep the round-5 byte-stable stream (fixed predictors,
    independent channels). ``lpc=True`` enables LPC subframes;
    ``stereo`` in {"independent","left-side","right-side","mid-side",
    "auto"} selects stereo decorrelation (2-channel input only).
    """
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError("encode_flac_np expects int16 samples")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if not 1 <= ch <= 8:
        raise ValueError("1-8 channels")
    if stereo != "independent" and ch != 2:
        raise ValueError("stereo decorrelation requires exactly 2 channels")
    bps = 16
    md5 = hashlib.md5(
        np.ascontiguousarray(s.astype("<i2")).tobytes()
    ).digest()

    block = 4096
    sib = _BW()
    sib.put(block if n else 16, 16)  # min blocksize (spec min 16)
    sib.put(block if n else 16, 16)
    sib.put(0, 24)  # min/max framesize unknown
    sib.put(0, 24)
    sib.put(int(rate), 20)
    sib.put(ch - 1, 3)
    sib.put(bps - 1, 5)
    sib.put(n, 36)
    streaminfo = bytes(sib.buf) + md5
    out = bytearray(_MAGIC)
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo

    for fi, start in enumerate(range(0, max(n, 1), block)):
        blk = s[start : start + block].astype(np.int64)
        bs = blk.shape[0] if n else 0
        if bs == 0:
            break
        # stereo-mode selection (per frame for "auto")
        mode = stereo
        if ch == 2 and stereo == "auto":
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            mid = (left + right) >> 1
            costs = {
                "independent": _stereo_cost(left) + _stereo_cost(right),
                "left-side": _stereo_cost(left) + _stereo_cost(side),
                "right-side": _stereo_cost(side) + _stereo_cost(right),
                "mid-side": _stereo_cost(mid) + _stereo_cost(side),
            }
            mode = min(costs, key=lambda k: costs[k])
        if mode == "independent":
            ca = ch - 1
            subchans = [(blk[:, c], bps) for c in range(ch)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if mode == "left-side":
                ca, subchans = 8, [(left, bps), (side, bps + 1)]
            elif mode == "right-side":
                ca, subchans = 9, [(side, bps + 1), (right, bps)]
            elif mode == "mid-side":
                ca, subchans = 10, [((left + right) >> 1, bps), (side, bps + 1)]
            else:
                raise ValueError(f"unknown stereo mode {mode!r}")

        hb = _BW()
        hb.put(0b11111111111110, 14)
        hb.put(0, 1)  # reserved
        hb.put(0, 1)  # fixed-blocksize strategy
        custom_bs = None
        if bs == 4096:
            hb.put(0b1100, 4)
        elif bs == 192:
            hb.put(0b0001, 4)
        else:
            hb.put(0b0111, 4)  # 16-bit blocksize-1 follows
            custom_bs = bs - 1
        hb.put(0, 4)  # sample rate: from STREAMINFO
        hb.put(ca, 4)
        hb.put(0b100, 3)  # 16-bit samples
        hb.put(0, 1)  # reserved
        hdr = bytes(hb.buf) + _utf8_number(fi)
        if custom_bs is not None:
            hdr += struct.pack(">H", custom_bs)
        hdr += bytes([_crc8(hdr)])

        fb = _BW()
        for chan, sbits in subchans:
            _write_subframe(fb, chan, sbits, lpc)
        fb.align()
        frame = hdr + bytes(fb.buf)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


_BS_CODES = {1: 192, **{i: 576 << (i - 2) for i in range(2, 6)},
             **{i: 256 << (i - 8) for i in range(8, 16)}}


def _decode_subframe(
    bits: np.ndarray, ones: np.ndarray, rank: np.ndarray,
    t: int, bs: int, sbits: int
) -> tuple[np.ndarray, int]:
    """One subframe at absolute bit offset ``t`` -> (bs samples, t')."""
    if int(bits[t]):
        raise ValueError("subframe padding bit set")
    st, t = _read_uint_vec(bits, t + 1, 1, 6)
    stype = int(st[0])
    wasted = 0
    if int(bits[t]):  # wasted-bits flag: unary-coded (wasted-1) follows
        t += 1
        k = int(rank[t - 1]) if t else 0
        if k >= ones.size:
            raise ValueError("FLAC bitstream truncated")
        p = int(ones[k])
        wasted = (p - t) + 1
        t = p + 1
    else:
        t += 1
    ssb = sbits - wasted
    if ssb <= 0:
        raise ValueError("wasted bits exceed sample size")

    if stype == 0:  # CONSTANT
        v, t = _read_uint_vec(bits, t, 1, ssb)
        v = int(_sign_extend(v, ssb)[0])
        out = np.full(bs, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        vals, t = _read_uint_vec(bits, t, bs, ssb)
        out = _sign_extend(vals, ssb)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm, t = _read_uint_vec(bits, t, order, ssb)
        warm = _sign_extend(warm, ssb)
        res, t = _read_residual(bits, ones, rank, t, bs, order)
        sig = res
        for o in range(order, 0, -1):
            seed = _fixed_residual(warm, o - 1)[-1:]
            sig = np.concatenate([seed, sig]).cumsum()[1:]
        out = np.concatenate([warm, sig]) if order else sig
    elif 32 <= stype <= 63:  # LPC order 1-32
        order = (stype & 0x1F) + 1
        if bs < order:
            raise ValueError("LPC order exceeds blocksize")
        warm, t = _read_uint_vec(bits, t, order, ssb)
        warm = _sign_extend(warm, ssb)
        prec, t = _read_uint_vec(bits, t, 1, 4)
        precision = int(prec[0]) + 1
        if precision == 16:
            raise ValueError("invalid LPC coefficient precision code")
        sh, t = _read_uint_vec(bits, t, 1, 5)
        shift = int(_sign_extend(sh, 5)[0])
        if shift < 0:
            raise ValueError("negative LPC shift is invalid")
        qlp, t = _read_uint_vec(bits, t, order, precision)
        qlp = _sign_extend(qlp, precision)
        res, t = _read_residual(bits, ones, rank, t, bs, order)
        # Integer IIR synthesis (RFC 9639 §9.2.6.3): inherently
        # sequential — each sample feeds the next prediction — so this
        # is the one per-sample loop in the decoder. Python ints keep
        # the arithmetic exact at any width.
        s_list = [int(v) for v in warm]
        co = [int(c) for c in qlp]
        for r_ in res.tolist():
            acc = 0
            for j in range(order):
                acc += co[j] * s_list[-1 - j]
            s_list.append(int(r_) + (acc >> shift))
        out = np.array(s_list, dtype=np.int64)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        out = out << wasted
    return out, t


def flac_streaminfo(payload: bytes) -> dict:
    """STREAMINFO fields only — no frame decode. Callers that need the
    stream's bit depth (e.g. per-depth [-1, 1] normalization in
    `multimodal.decode_audio_np`) get it here without paying for a full
    decode twice."""
    if payload[:4] != _MAGIC:
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    pos = 4
    while pos + 4 <= len(payload):
        head = payload[pos]
        last, btype = head & 0x80, head & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            br = _BR(body)
            br.get(16), br.get(16), br.get(24), br.get(24)
            return {
                "rate": br.get(20),
                "channels": br.get(3) + 1,
                "bits_per_sample": br.get(5) + 1,
                "total_samples": br.get(36),
            }
        pos += 4 + ln
        if last:
            break
    raise ValueError("FLAC missing STREAMINFO")


def decode_flac_np(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (samples, rate). Mono returns shape (n,), multi
    (n, ch); dtype int16 for bps <= 16, int32 for bps 24."""
    if payload[:4] != _MAGIC:
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    pos = 4
    rate = ch = bps = total = None
    md5_expect = None
    while pos + 4 <= len(payload):  # metadata blocks
        head = payload[pos]
        last, btype = head & 0x80, head & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            br = _BR(body)
            br.get(16), br.get(16), br.get(24), br.get(24)
            rate = br.get(20)
            ch = br.get(3) + 1
            bps = br.get(5) + 1
            total = br.get(36)
            md5_expect = body[18:34]
        pos += 4 + ln
        if last:
            break
    if rate is None:
        raise ValueError("FLAC missing STREAMINFO")
    if bps not in (8, 16, 24):
        raise NotImplementedError(f"FLAC bits-per-sample {bps} (8/16/24)")

    # one unpack of the whole payload feeds every vectorized bulk read
    bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8))
    ones = np.flatnonzero(bits)
    rank = np.cumsum(bits, dtype=np.int64)

    chans: list[list[np.ndarray]] = [[] for _ in range(ch)]
    got = 0
    while got < total and pos < len(payload):
        frame_start = pos
        br = _BR(payload, pos)
        if br.get(14) != 0b11111111111110:
            raise ValueError(f"FLAC frame sync lost at byte {frame_start}")
        br.get(1)
        br.get(1)  # blocking strategy (both handled: number is opaque)
        bs_code = br.get(4)
        sr_code = br.get(4)
        ca = br.get(4)
        ss_code = br.get(3)
        br.get(1)
        _read_utf8_number(br)
        if ca > 10:
            raise ValueError(f"reserved channel assignment {ca}")
        stereo_mode = None
        if ca >= 8:
            stereo_mode = ca
            if ch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
        elif ca + 1 != ch:
            raise ValueError("frame channel count != STREAMINFO")
        if bs_code == 0b0110:
            bs = br.get(8) + 1
        elif bs_code == 0b0111:
            bs = br.get(16) + 1
        elif bs_code in _BS_CODES:
            bs = _BS_CODES[bs_code]
        else:
            raise ValueError(f"reserved blocksize code {bs_code}")
        if sr_code == 0b1100:
            br.get(8)
        elif sr_code in (0b1101, 0b1110):
            br.get(16)
        elif sr_code == 0b1111:
            raise ValueError("invalid sample-rate code")
        sbits = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24}.get(ss_code)
        if sbits is None:
            raise ValueError(f"reserved sample-size code {ss_code}")
        hdr_end = br.pos + (1 if br.bit else 0)
        crc8_got = br.get(8) if br.bit == 0 else None
        if crc8_got is None:
            raise ValueError("FLAC header not byte-aligned before CRC-8")
        if _crc8(payload[frame_start:hdr_end]) != crc8_got:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        t = br.pos * 8 + br.bit
        subs: list[np.ndarray] = []
        nsub = 2 if stereo_mode is not None else ch
        for c in range(nsub):
            depth = sbits
            if stereo_mode == 8 and c == 1:  # left/side: side is +1 bit
                depth += 1
            elif stereo_mode == 9 and c == 0:  # right/side
                depth += 1
            elif stereo_mode == 10 and c == 1:  # mid/side
                depth += 1
            sub, t = _decode_subframe(bits, ones, rank, t, bs, depth)
            subs.append(sub)
        t = (t + 7) // 8 * 8  # byte-align before frame CRC
        if t + 16 > bits.size:
            raise ValueError("FLAC bitstream truncated")
        crc16_got = (int(payload[t // 8]) << 8) | int(payload[t // 8 + 1])
        if _crc16(payload[frame_start : t // 8]) != crc16_got:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = t // 8 + 2

        if stereo_mode is None:
            for c in range(ch):
                chans[c].append(subs[c])
        elif stereo_mode == 8:  # left/side: R = L - S
            chans[0].append(subs[0])
            chans[1].append(subs[0] - subs[1])
        elif stereo_mode == 9:  # right/side: L = R + S
            chans[0].append(subs[1] + subs[0])
            chans[1].append(subs[1])
        else:  # mid/side
            mid2 = (subs[0] << 1) | (subs[1] & 1)
            chans[0].append((mid2 + subs[1]) >> 1)
            chans[1].append((mid2 - subs[1]) >> 1)
        got += bs

    arr = np.stack([np.concatenate(c) if c else np.empty(0, np.int64)
                    for c in chans], axis=-1)[:total]
    if md5_expect and md5_expect != b"\x00" * 16:
        # MD5 covers the raw PCM at the STREAMINFO byte width (1/2/3
        # bytes per sample, little-endian, interleaved) — hashing 8- or
        # 24-bit streams as '<i2' spuriously rejected valid files.
        if bps == 8:
            raw = np.ascontiguousarray(arr.astype("<i1")).tobytes()
        elif bps == 16:
            raw = np.ascontiguousarray(arr.astype("<i2")).tobytes()
        else:  # 24-bit: low 3 bytes of each little-endian int32
            b4 = np.ascontiguousarray(arr.astype("<i4")).view(np.uint8)
            raw = np.ascontiguousarray(b4.reshape(-1, 4)[:, :3]).tobytes()
        if hashlib.md5(raw).digest() != md5_expect:
            raise ValueError("FLAC decoded-audio MD5 mismatch")
    out = arr.astype(np.int16) if bps <= 16 else arr.astype(np.int32)
    return (out[:, 0] if ch == 1 else out), int(rate)


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
