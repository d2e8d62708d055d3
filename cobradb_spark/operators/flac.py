"""Pure-python FLAC subset — the lossless compressed-AUDIO family,
completing the codec matrix (JPEG = lossy image, PNG/GIF = lossless
image, WAV = uncompressed audio, FLAC = compressed-lossless audio).

FLAC frames are fixed-predictor (or LPC) residuals under Rice coding
inside a CRC-guarded bitstream — fully lossless, so like PNG the decode
is bit-exact by construction and directly SQL-oracle-able.  This module
implements a genuine subset of the published FLAC format (bit-compatible
with the spec for the features it covers):

- an ENCODER (`encode_flac`): fLaC marker, STREAMINFO metadata block
  (including the MD5 of the unencoded samples), fixed-blocksize frames
  with spec frame headers (14-bit sync, UTF-8-coded frame number,
  CRC-8) and CRC-16 trailers; per-block best-of FIXED predictor order
  0-4 chosen by exact Rice cost, CONSTANT and VERBATIM subframes where
  they win; mono / 16-bit.
- a DECODER (`decode_flac`): metadata-block walk, all blocksize and
  sample-rate header encodings, CONSTANT / VERBATIM / FIXED subframes,
  both Rice residual methods (4- and 5-bit parameters) at any partition
  order including the verbatim-escape, wasted-bits handling, CRC-8 and
  CRC-16 verification, and the STREAMINFO MD5 end-to-end integrity
  check.  STEREO streams decode through all four channel assignments
  (independent, left/side, right/side, mid/side with the libFLAC
  integer reconstruction; side channels carry bps+1 bits), and LPC
  subframes (order 1-32, quantized integer predictor) decode exactly
  (r11 — both former subset bounds).  >2 channels and non-16-bit
  depths raise ValueError, as does any malformed input (fuzz-tested)
  via the shared wrap_codec_errors contract.

Scale: encode/decode run inside Arrow-batched mapInPandas over binary
payload columns — per-row independent work, no shuffle, no driver
materialization (see queries/multimodal.py:multimodal_flac_decode).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from cobradb_spark.operators._codec import wrap_codec_errors

_SYNC = 0b11111111111110
_BLOCKSIZE = 256  # encoder's fixed blocksize (multi-frame streams for typical clips)

# diff^k reconstruction coefficients: x[i] = r[i] + sum(c_j * x[i-1-j])
_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}

_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TABLE[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


class _BitWriter:
    """MSB-first bit packer (FLAC bit order, opposite of GIF's LZW)."""

    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (val & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:  # bounded chunks keep the accumulator small
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_bitarray(self, bits: np.ndarray) -> None:
        """Bulk-append a uint8 0/1 array (MSB-first stream order): the
        whole-byte prefix goes through np.packbits (MSB-first, matching
        FLAC bit order), only the <=7 pending/trailing bits loop."""
        if len(bits) == 0:
            return
        if self.nbits:
            pend = np.array(
                [(self.acc >> (self.nbits - 1 - j)) & 1 for j in range(self.nbits)],
                dtype=np.uint8,
            )
            bits = np.concatenate([pend, bits])
            self.acc = 0
            self.nbits = 0
        n8 = len(bits) & ~7
        if n8:
            self.buf += np.packbits(bits[:n8]).tobytes()
        for b in bits[n8:]:
            self.acc = (self.acc << 1) | int(b)
            self.nbits += 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


class _BitReader:
    """MSB-first bit reader with chunked unary scan."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8

    def read(self, bits: int) -> int:
        if bits == 0:
            return 0
        self._fill(bits)
        self.nbits -= bits
        v = (self.acc >> self.nbits) & ((1 << bits) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.nbits == 0:
                self._fill(1)
            if self.acc == 0:
                q += self.nbits
                self.nbits = 0
                continue
            top = self.acc.bit_length()
            q += self.nbits - top
            self.nbits = top - 1
            self.acc &= (1 << self.nbits) - 1
            return q

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0

    @property
    def bit_pos(self) -> int:
        """Absolute bit offset of the next unread bit."""
        return self.pos * 8 - self.nbits

    def seek_bits(self, e: int) -> None:
        """Position the reader at absolute bit offset e (used to rejoin
        the sequential reader after a vectorized segment)."""
        self.pos = e >> 3
        self.acc = 0
        self.nbits = 0
        if e & 7:
            self.read(e & 7)


class _BitCache:
    """Per-stream vectorized view of the bitstream for batch Rice /
    fixed-width decoding: the unpacked bit array, prefix one-counts,
    sorted one-positions, and per-width sliding-window field values.
    All lazily built and cached for the lifetime of one decode call."""

    __slots__ = ("bits", "cnt1", "ones", "_win", "_jump")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.cnt1 = np.concatenate(
            [np.zeros(1, dtype=np.int64), np.cumsum(self.bits, dtype=np.int64)]
        )
        self.ones = np.flatnonzero(self.bits).astype(np.int64)
        self._win = {}
        self._jump = {}

    def win(self, width: int) -> np.ndarray:
        """win(w)[p] = integer value of bits[p:p+w] (MSB-first)."""
        w = self._win.get(width)
        if w is None:
            b = self.bits
            n = len(b) - width + 1
            if n <= 0:
                w = np.zeros(0, dtype=np.int64)
            else:
                w = np.zeros(n, dtype=np.int64)
                for j in range(width):
                    w = (w << 1) | b[j : j + n]
            self._win[width] = w
        return w

    def jump(self, m: int) -> np.ndarray:
        """jump(m)[j] = index of the NEXT Rice terminator after the one
        at ones[j], for remainder width m: skip the terminator itself
        plus every 1-bit inside its m remainder bits.  The sentinel slot
        len(ones) is a fixed point so truncated streams converge there
        instead of indexing out of range."""
        F = self._jump.get(m)
        if F is None:
            n1 = len(self.ones)
            hi = np.minimum(self.ones + 1 + m, len(self.bits))
            F = np.arange(1, n1 + 1) + (self.cnt1[hi] - self.cnt1[self.ones + 1])
            F = np.concatenate([np.minimum(F, n1), [n1]])
            self._jump[m] = F
        return F


def _rice_decode_block(
    cache: _BitCache, p: int, m: int, count: int
) -> tuple[np.ndarray, int]:
    """Decode `count` Rice(m) values starting at absolute bit p, fully
    vectorized: terminator indices come from iterating the jump map with
    pointer doubling (O(count log count) array work, no per-sample
    Python), remainders from the sliding-window field cache.  Returns
    (zigzag-decoded residuals, end bit position)."""
    if count == 0:
        return np.empty(0, dtype=np.int64), p
    ones = cache.ones
    n1 = len(ones)
    j0 = int(np.searchsorted(ones, p))
    if j0 >= n1:
        raise ValueError("truncated FLAC bitstream")
    F = cache.jump(m)
    idx = np.empty(count, dtype=np.int64)
    idx[0] = j0
    done = 1
    while done < count:
        take = min(done, count - done)
        idx[done : done + take] = F[idx[:take]]
        done += take
        if done < count:
            F = F[F]  # square the jump map: F becomes F^(2^level)
    if idx[-1] >= n1:
        raise ValueError("truncated FLAC bitstream")
    t = ones[idx]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = p
    if count > 1:
        starts[1:] = t[:-1] + 1 + m
    q = t - starts
    end = int(t[-1]) + 1 + m
    if m:
        if end > len(cache.bits):
            raise ValueError("truncated FLAC bitstream")
        u = (q << m) | cache.win(m)[t + 1]
    else:
        u = q
    return (u >> 1) ^ -(u & 1), end


def _fixed_decode_block(
    cache: _BitCache, p: int, width: int, count: int
) -> tuple[np.ndarray, int]:
    """Decode `count` signed fixed-width fields starting at bit p."""
    if width == 0 or count == 0:
        return np.zeros(count, dtype=np.int64), p
    end = p + width * count
    if end > len(cache.bits):
        raise ValueError("truncated FLAC bitstream")
    vals = cache.win(width)[p + width * np.arange(count, dtype=np.int64)]
    sign = np.int64(1) << (width - 1)
    return np.where(vals >= sign, vals - (np.int64(1) << width), vals), end


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame numbers up to 36 bits):
    `extra` continuation bytes give (6 - extra) + 6 * extra payload bits."""
    if n < 0x80:
        return bytes([n])
    for extra in range(1, 7):
        if n.bit_length() <= (6 - extra) + 6 * extra:
            lead = (0xFF << (7 - extra)) & 0xFF
            out = [lead | ((n >> (6 * extra)) & ((1 << (6 - extra)) - 1))]
            for i in range(extra - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large for UTF-8 coding")


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    extra = 0
    mask = 0x40
    while first & mask:
        extra += 1
        mask >>= 1
    if extra == 0 or extra > 6:
        raise ValueError("bad UTF-8-coded frame number")
    n = first & (mask - 1)
    for _ in range(extra):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation byte")
        n = (n << 6) | (b & 0x3F)
    return n


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, 2 * r, -2 * r - 1)


def _rice_cost(u: np.ndarray, m: int) -> int:
    return int((u >> m).sum()) + len(u) * (m + 1)


_RICE_MS = np.arange(15, dtype=np.int64)


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    # all 15 candidate costs in one broadcast pass; ties keep the
    # smallest m (argmin is first-match), matching the scalar loop
    costs = (u[None, :] >> _RICE_MS[:, None]).sum(axis=1) + len(u) * (_RICE_MS + 1)
    m = int(np.argmin(costs))
    return m, int(costs[m])


def encode_flac(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode mono int16 samples as a spec-subset FLAC stream."""
    x = np.asarray(samples, dtype=np.int64)
    if x.size == 0:
        raise ValueError("cannot encode an empty clip")
    if x.min() < -32768 or x.max() > 32767:
        raise ValueError("samples out of int16 range")
    n_total = len(x)
    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()

    out = bytearray(b"fLaC")
    info = _BitWriter()
    info.write(_BLOCKSIZE, 16)  # min blocksize
    info.write(_BLOCKSIZE, 16)  # max blocksize
    info.write(0, 24)  # min framesize unknown
    info.write(0, 24)  # max framesize unknown
    info.write(sample_rate, 20)
    info.write(0, 3)  # channels - 1 (mono)
    info.write(15, 5)  # bits per sample - 1
    info.write(n_total, 36)
    assert info.nbits == 0
    body = bytes(info.buf) + md5
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body  # last block, type 0

    for frame_no, start in enumerate(range(0, n_total, _BLOCKSIZE)):
        block = x[start : start + _BLOCKSIZE]
        out += _encode_frame(block, frame_no)
    return bytes(out)


def _frame_header(w: "_BitWriter", n: int, frame_no: int, chan: int) -> None:
    w.write(_SYNC, 14)
    w.write(0, 1)  # reserved
    w.write(0, 1)  # fixed-blocksize strategy
    w.write(0b0111, 4)  # blocksize: explicit 16-bit at header end
    w.write(0b0000, 4)  # sample rate: from STREAMINFO
    w.write(chan, 4)  # channel assignment
    w.write(0b100, 3)  # 16 bits per sample
    w.write(0, 1)  # reserved
    for b in _utf8_number(frame_no):
        w.write(b, 8)
    w.write(n - 1, 16)
    assert w.nbits == 0
    w.write(_crc8(bytes(w.buf)), 8)


def _encode_frame(block: np.ndarray, frame_no: int) -> bytes:
    w = _BitWriter()
    _frame_header(w, len(block), frame_no, 0b0000)
    _write_subframe(w, block)
    w.align()
    w.write(_crc16(bytes(w.buf)), 16)
    return bytes(w.buf)


def _encode_frame_stereo(
    left: np.ndarray, right: np.ndarray, frame_no: int, use_lpc: bool
) -> bytes:
    """One stereo frame; the channel assignment rotates per frame
    through independent / left-side / right-side / mid-side so every
    decorrelation mode appears in every stream."""
    n = len(left)
    chan = (0b0001, 0b1000, 0b1001, 0b1010)[frame_no % 4]
    side = left - right
    if chan == 0b0001:
        c0, b0, c1, b1 = left, 16, right, 16
    elif chan == 0b1000:  # left/side
        c0, b0, c1, b1 = left, 16, side, 17
    elif chan == 0b1001:  # right/side
        c0, b0, c1, b1 = side, 17, right, 16
    else:  # mid/side
        c0, b0, c1, b1 = (left + right) >> 1, 16, side, 17
    w = _BitWriter()
    _frame_header(w, n, frame_no, chan)
    _write_subframe(w, c0, bits=b0, use_lpc=use_lpc)
    _write_subframe(w, c1, bits=b1, use_lpc=use_lpc)
    w.align()
    w.write(_crc16(bytes(w.buf)), 16)
    return bytes(w.buf)


def encode_flac_stereo(
    left: np.ndarray,
    right: np.ndarray,
    sample_rate: int = 8000,
    use_lpc: bool = True,
) -> bytes:
    """Encode a STEREO int16 pair as a spec-subset FLAC stream: frames
    rotate through all four channel assignments, and (by default) LPC
    subframes compete with the fixed predictors by exact Rice cost —
    residuals are computed with the QUANTIZED integer coefficients, so
    the stream is lossless regardless of the float fitting stage."""
    l = np.asarray(left, dtype=np.int64)
    r = np.asarray(right, dtype=np.int64)
    if l.size == 0 or l.shape != r.shape:
        raise ValueError("need two equal-length non-empty channels")
    for x in (l, r):
        if x.min() < -32768 or x.max() > 32767:
            raise ValueError("samples out of int16 range")
    n_total = len(l)
    inter = np.empty(2 * n_total, dtype="<i2")
    inter[0::2] = l.astype("<i2")
    inter[1::2] = r.astype("<i2")
    md5 = hashlib.md5(inter.tobytes()).digest()

    out = bytearray(b"fLaC")
    info = _BitWriter()
    info.write(_BLOCKSIZE, 16)
    info.write(_BLOCKSIZE, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(1, 3)  # channels - 1 (stereo)
    info.write(15, 5)  # bits per sample - 1
    info.write(n_total, 36)
    assert info.nbits == 0
    body = bytes(info.buf) + md5
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    for frame_no, start in enumerate(range(0, n_total, _BLOCKSIZE)):
        out += _encode_frame_stereo(
            l[start : start + _BLOCKSIZE],
            r[start : start + _BLOCKSIZE],
            frame_no,
            use_lpc,
        )
    return bytes(out)


def _quantize_lpc(block: np.ndarray, order: int, precision: int = 12):
    """Levinson-Durbin LPC coefficients, quantized to `precision`-bit
    integers with a non-negative shift (the spec's Q format).  Returns
    (coefs int64[order], shift) or None when the block is degenerate.
    The float stage only CHOOSES the predictor; residuals are computed
    with the quantized integers exactly as the decoder reconstructs,
    so the roundtrip is lossless regardless of float rounding."""
    x = block.astype(np.float64)
    n = len(x)
    if n <= order:
        return None
    ac = np.array(
        [np.dot(x[: n - lag], x[lag:]) for lag in range(order + 1)]
    )
    if ac[0] == 0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(a[:i], ac[i:0:-1][:i])
        k_ref = acc / err
        a[: i + 1] = np.concatenate([a[:i] - k_ref * a[:i][::-1], [k_ref]])
        err *= 1 - k_ref * k_ref
        if err <= 0:
            return None
    cmax = np.abs(a).max()
    if cmax == 0 or not np.isfinite(cmax):
        return None
    # shift so the largest coefficient uses the full precision
    shift = precision - 1 - max(int(np.floor(np.log2(cmax))) + 1, 0)
    shift = max(0, min(15, shift))
    q = np.round(a * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    q = np.clip(q, -lim, lim - 1)
    if not q.any():
        return None
    return q, shift


def _lpc_residual(block: np.ndarray, coefs: np.ndarray, shift: int) -> np.ndarray:
    """Exact integer residuals for the quantized predictor (the same
    arithmetic the decoder inverts)."""
    k = len(coefs)
    n = len(block)
    resid = np.empty(n - k, dtype=np.int64)
    for i in range(k, n):
        pred = int(np.dot(coefs, block[i - k : i][::-1])) >> shift
        resid[i - k] = block[i] - pred
    return resid


def _write_subframe(
    w: _BitWriter, block: np.ndarray, bits: int = 16, use_lpc: bool = False
) -> None:
    n = len(block)
    if n > 1 and (block == block[0]).all():
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(block[0]), bits)
        return
    # pick the cheapest FIXED order by exact Rice cost (order capped by n-1)
    best = None
    for k in range(0, min(5, n)):
        resid = np.diff(block, n=k) if k else block
        m, cost = _best_rice_param(_zigzag(resid))
        total = bits * k + 2 + 4 + 4 + cost  # warmup + method + part order + param
        if best is None or total < best[0]:
            best = (total, k, m, resid)
    total, k, m, resid = best
    lpc = None
    if use_lpc:
        for order in (1, 2, 4, 8):
            if order >= n:
                break
            got = _quantize_lpc(block, order=order)
            if got is None:
                continue
            coefs, shift = got
            lresid = _lpc_residual(block, coefs, shift)
            lm, lcost = _best_rice_param(_zigzag(lresid))
            ltotal = (
                bits * len(coefs) + 4 + 5 + 12 * len(coefs) + 2 + 4 + 4 + lcost
            )
            if ltotal < total:
                lpc = (coefs, shift, lm, lresid)
                total = ltotal
    if total >= bits * n:
        w.write(0, 1)
        w.write(0b000001, 6)  # VERBATIM
        w.write(0, 1)
        vals = block.astype(np.int64) & ((1 << bits) - 1)
        vbits = np.zeros(bits * n, dtype=np.uint8)
        for j in range(bits):
            vbits[j::bits] = (vals >> (bits - 1 - j)) & 1
        w.write_bitarray(vbits)
        return
    if lpc is not None:
        coefs, shift, m, resid = lpc
        k = len(coefs)
        w.write(0, 1)
        w.write(0b100000 | (k - 1), 6)  # LPC, order k
        w.write(0, 1)  # no wasted bits
        for v in block[:k]:
            w.write(int(v), bits)
        w.write(11, 4)  # precision 12 -> code 11
        w.write(shift, 5)
        for c in coefs:
            w.write(int(c), 12)
    else:
        w.write(0, 1)
        w.write(0b001000 | k, 6)  # FIXED, order k
        w.write(0, 1)  # no wasted bits
        for v in block[:k]:
            w.write(int(v), bits)
    w.write(0b00, 2)  # partitioned-Rice, 4-bit parameters
    w.write(0, 4)  # partition order 0
    w.write(m, 4)
    # Vectorized Rice: each value u emits (u>>m) zeros, a 1 terminator,
    # then the m low bits — laid out directly into one bit array (the
    # per-sample write_unary loop was the encoder's hot spot).
    u = _zigzag(resid).astype(np.int64)
    q = u >> m
    blen = q + 1 + m
    starts = np.zeros(len(u), dtype=np.int64)
    np.cumsum(blen[:-1], out=starts[1:])
    rbits = np.zeros(int(starts[-1] + blen[-1]), dtype=np.uint8)
    term = starts + q
    rbits[term] = 1
    for j in range(m):
        rbits[term + 1 + j] = ((u >> (m - 1 - j)) & 1).astype(np.uint8)
    w.write_bitarray(rbits)


_BLOCKSIZE_CODES = {0b0001: 192, **{c: 576 << (c - 2) for c in range(2, 6)},
                    **{c: 256 << (c - 8) for c in range(8, 16)}}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
               7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}


@wrap_codec_errors("FLAC")
def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono FLAC-subset stream to (int64 samples, sample_rate)
    — the mono-only entry point (decode_flac_general accepts stereo).
    Verifies frame CRC-8/CRC-16 and the STREAMINFO MD5; malformed input
    raises ValueError (shared wrap_codec_errors contract)."""
    return _decode_flac(data, require_mono=True)


@wrap_codec_errors("FLAC")
def decode_flac_general(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono or STEREO FLAC-subset stream — all four channel
    assignments (independent, left/side, right/side, mid/side with the
    libFLAC integer reconstruction; the side channel carries bps+1
    bits) and LPC subframes (order 1-32, quantized integer predictor
    with shift).  Stereo returns (n, 2) int64; mono returns (n,)."""
    return _decode_flac(data, require_mono=False)


def _decode_flac(data: bytes, require_mono: bool) -> tuple[np.ndarray, int]:
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (bad marker)")
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos : pos + 4]
        if len(hdr) < 4:
            raise ValueError("truncated metadata block header")
        last = bool(hdr[0] & 0x80)
        btype = hdr[0] & 0x7F
        blen = int.from_bytes(hdr[1:4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("truncated metadata block")
        if btype == 0:
            streaminfo = body
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) != 34:
        raise ValueError("missing or malformed STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)  # min framesize
    si.read(24)  # max framesize
    rate = si.read(20)
    channels = si.read(3) + 1
    bps = si.read(5) + 1
    n_total = si.read(36)
    md5 = streaminfo[18:34]
    if channels not in (1, 2):
        raise ValueError(
            f"subset decoder is mono/stereo-only ({channels} channels)"
        )
    if require_mono and channels != 1:
        raise ValueError(f"subset decoder is mono-only ({channels} channels)")
    if bps != 16:
        raise ValueError(f"subset decoder is 16-bit-only ({bps} bps)")
    if rate == 0:
        raise ValueError("invalid sample rate 0")

    samples: list[np.ndarray] = []
    got = 0
    cache = _BitCache(data)
    while got < n_total:
        block, pos = _decode_frame(data, pos, rate, bps, channels, cache)
        samples.append(block)
        got += block.shape[0]
    if got != n_total:
        raise ValueError("decoded sample count exceeds STREAMINFO total")
    x = (
        np.concatenate(samples)
        if samples
        else np.empty((0, channels), dtype=np.int64)
    )
    # FLAC MD5 is over the channel-interleaved little-endian samples
    if md5 != bytes(16) and hashlib.md5(x.astype("<i2").tobytes()).digest() != md5:
        raise ValueError("STREAMINFO MD5 mismatch (corrupt audio data)")
    if channels == 1:
        return x[:, 0], rate
    return x, rate


def _decode_frame(
    data: bytes, pos: int, si_rate: int, bps: int, channels: int,
    cache: _BitCache,
) -> tuple[np.ndarray, int]:
    br = _BitReader(data, pos)
    if br.read(14) != _SYNC:
        raise ValueError("lost frame sync")
    if br.read(1):
        raise ValueError("reserved frame-header bit set")
    br.read(1)  # blocking strategy
    bs_code = br.read(4)
    rate_code = br.read(4)
    chan = br.read(4)
    size_code = br.read(3)
    if br.read(1):
        raise ValueError("reserved frame-header bit set")
    # channel assignment: 0-7 = (nch-1) independent; 8/9/10 =
    # left-side / right-side / mid-side stereo decorrelation
    if chan == 0b0000:
        frame_nch = 1
    elif chan == 0b0001 or chan in (0b1000, 0b1001, 0b1010):
        frame_nch = 2
    else:
        raise ValueError(f"unsupported channel assignment {chan:04b}")
    if frame_nch != channels:
        raise ValueError("frame channel count contradicts STREAMINFO")
    if size_code not in (0b000, 0b100):
        raise ValueError(f"unsupported sample-size code {size_code:03b}")
    _read_utf8_number(br)
    if bs_code == 0b0110:
        blocksize = br.read(8) + 1
    elif bs_code == 0b0111:
        blocksize = br.read(16) + 1
    elif bs_code in _BLOCKSIZE_CODES:
        blocksize = _BLOCKSIZE_CODES[bs_code]
    else:
        raise ValueError(f"invalid blocksize code {bs_code:04b}")
    if rate_code == 0b0000:
        pass  # from STREAMINFO
    elif rate_code in _RATE_CODES:
        if _RATE_CODES[rate_code] != si_rate:
            raise ValueError("frame sample rate contradicts STREAMINFO")
    elif rate_code == 0b1100:
        br.read(8)
    elif rate_code in (0b1101, 0b1110):
        br.read(16)
    else:
        raise ValueError("invalid sample-rate code 1111")
    header_len = br.pos - pos
    if _crc8(data[pos : pos + header_len]) != br.read(8):
        raise ValueError("frame header CRC-8 mismatch")

    if channels == 1:
        block = _decode_subframe(br, blocksize, bps, cache)[:, None]
    else:
        # the SIDE channel of a decorrelated pair carries one extra bit
        bits0 = bps + (1 if chan == 0b1001 else 0)  # right/side: ch0=side
        bits1 = bps + (1 if chan in (0b1000, 0b1010) else 0)
        c0 = _decode_subframe(br, blocksize, bits0, cache)
        c1 = _decode_subframe(br, blocksize, bits1, cache)
        if chan == 0b0001:  # independent
            left, right = c0, c1
        elif chan == 0b1000:  # left/side: side = l - r
            left, right = c0, c0 - c1
        elif chan == 0b1001:  # right/side: side = l - r
            left, right = c0 + c1, c1
        else:  # mid/side (libFLAC reconstruction)
            mid2 = (c0 << 1) | (c1 & 1)
            left, right = (mid2 + c1) >> 1, (mid2 - c1) >> 1
        block = np.stack([left, right], axis=1)

    br.align()
    frame_len = br.pos - pos
    crc = br.read(16)
    if _crc16(data[pos : pos + frame_len]) != crc:
        raise ValueError("frame CRC-16 mismatch")
    return block, br.pos


def _decode_subframe(
    br: _BitReader, n: int, bps: int, cache: _BitCache
) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("wasted bits exceed sample size")
    if stype == 0b000000:  # CONSTANT
        x = np.full(n, br.read_signed(eff), dtype=np.int64)
    elif stype == 0b000001:  # VERBATIM
        x, end = _fixed_decode_block(cache, br.bit_pos, eff, n)
        br.seek_bits(end)
    elif 0b001000 <= stype <= 0b001100:  # FIXED order 0-4
        k = stype & 0x07
        if k > n:
            raise ValueError("predictor order exceeds blocksize")
        warmup = np.array([br.read_signed(eff) for _ in range(k)], dtype=np.int64)
        resid = _decode_residual(br, n, k, cache)
        x = _integrate_fixed(warmup, resid, k)
    elif stype & 0b100000:  # LPC, order 1-32
        k = (stype & 0x1F) + 1
        if k > n:
            raise ValueError("predictor order exceeds blocksize")
        warmup = np.array([br.read_signed(eff) for _ in range(k)], dtype=np.int64)
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code 1111")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = np.array(
            [br.read_signed(prec) for _ in range(k)], dtype=np.int64
        )
        resid = _decode_residual(br, n, k, cache)
        x = np.empty(n, dtype=np.int64)
        x[:k] = warmup
        for i in range(k, n):
            # exact integer predictor: floor-shifted dot with the k
            # previous samples (most-recent-first coefficient order)
            pred = int(np.dot(coefs, x[i - k : i][::-1])) >> shift
            x[i] = resid[i - k] + pred
    else:
        raise ValueError(f"reserved subframe type {stype:06b}")
    return x << wasted


def _decode_residual(
    br: _BitReader, n: int, k: int, cache: _BitCache
) -> np.ndarray:
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual coding method {method:02b}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    n_part = 1 << porder
    if n % n_part:
        raise ValueError("blocksize not divisible by partition count")
    out = np.empty(n - k, dtype=np.int64)
    idx = 0
    for p in range(n_part):
        count = n // n_part - (k if p == 0 else 0)
        if count < 0:
            raise ValueError("predictor order exceeds first partition")
        m = br.read(pbits)
        if m == escape:
            raw_bits = br.read(5)
            vals, end = _fixed_decode_block(cache, br.bit_pos, raw_bits, count)
        else:
            vals, end = _rice_decode_block(cache, br.bit_pos, m, count)
        br.seek_bits(end)
        out[idx : idx + count] = vals
        idx += count
    return out


def _integrate_fixed(warmup: np.ndarray, resid: np.ndarray, k: int) -> np.ndarray:
    """Invert diff^k via k cumulative sums seeded from the warmup."""
    if k == 0:
        return resid.copy()
    diffs = [warmup]
    for _ in range(k):
        diffs.append(np.diff(diffs[-1]))
    cur = resid
    for j in range(k - 1, -1, -1):
        first = diffs[j][0]
        cur = np.concatenate([[first], first + np.cumsum(cur)])
    return cur
