"""Pure-numpy baseline JPEG (ITU T.81) — real compressed-codec support
without any imaging library.

The container has no PIL/ffmpeg, which previously left JPEG as a
documented stub.  Baseline sequential JPEG is decodable with nothing
but numpy: segment parse, DQT/DHT table build, Huffman-coded MCU scan,
dezigzag, dequantize, float IDCT, level shift, YCbCr->RGB.  This module
implements

- a general DECODER (`decode_jpeg`): any baseline, 8-bit, non-subsampled
  (1x1 sampling) JPEG with arbitrary DQT/DHT tables, FF-stuffed entropy
  stream, DRI/RSTn restart intervals (byte-aligned, DC prediction
  reset), single interleaved scan; and
- an ENCODER (`encode_jpeg`) used to synthesize test payloads: writes
  its OWN canonical Huffman tables in DHT (no reliance on the Annex K
  defaults), 4:4:4, quality controlled by the caller's quant tables.

Cross-engine determinism strategy (how a LOSSY codec gets a DuckDB
oracle): for 8x8-block-constant content the DCT has only a DC
coefficient; with even pixel values and a DC quant step of 16 the
quantize/dequantize path is exact integer math and the float IDCT of a
DC-only block reproduces the constant to ~1e-13, far inside the
round-to-int guard band.  Such payloads decode BIT-EXACTLY to their
generating formula, so channel sums are SQL-computable.  General
content is covered by the encode->decode tolerance test in
tests/test_sources.py (mean-abs-error bound), where bit-exactness is
not required.
"""

from __future__ import annotations

import struct

import numpy as np

from cobradb_spark.operators._codec import wrap_codec_errors

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1) u pi / 16); spatial = C.T @ F @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct8x8(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _fdct8x8(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# ---------------------------------------------------------------- encoder

# Canonical code-length plan (written into DHT, so the decoder needs no
# built-in defaults): all 12 DC categories at 5 bits; all 162 AC
# (run, size) symbols at 9 bits (2^9 = 512 >= 162; the all-ones code
# stays unused as T.81 requires).
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _canonical_codes(symbols, length):
    return {sym: (i, length) for i, sym in enumerate(symbols)}


_DC_CODES = _canonical_codes(_DC_SYMBOLS, 5)
_AC_CODES = _canonical_codes(_AC_SYMBOLS, 9)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per convention


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _magnitude_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _dht_segment(tc: int, th: int, symbols, length: int) -> bytes:
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    ycbcr: np.ndarray,
    dc_step: int = 16,
    ac_step: int = 16,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 YCbCr image (h, w multiples of 8) as a
    baseline 4:4:4 JFIF byte string with self-describing Huffman tables.
    restart_interval > 0 writes a DRI segment and emits RSTn markers
    every N MCUs (byte-aligned, DC predictors reset) — the layout real
    encoders default to, used to exercise the decoder's restart path."""
    h, w, _ = ycbcr.shape
    assert h % 8 == 0 and w % 8 == 0, "dimensions must be multiples of 8"
    qtab = np.full(64, ac_step, dtype=np.int64)
    qtab[0] = dc_step

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # one quant table used by all components
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(x) for x in qtab)
    # SOF0: 8-bit, 3 components, 1x1 sampling, all on table 0
    sof = b"\x08" + struct.pack(">HH", h, w) + b"\x03"
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # our canonical tables, one DC + one AC, shared by all components
    out += _dht_segment(0, 0, _DC_SYMBOLS, 5)
    out += _dht_segment(1, 0, _AC_SYMBOLS, 9)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = b"\x03" + bytes([1, 0x00, 2, 0x00, 3, 0x00]) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    planes = [ycbcr[:, :, c].astype(np.float64) - 128.0 for c in range(3)]
    mcu_i = 0
    rst_i = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst_i])
                rst_i = (rst_i + 1) % 8
                prev_dc = [0, 0, 0]
            mcu_i += 1
            for c in range(3):
                coef = _fdct8x8(planes[c][by : by + 8, bx : bx + 8])
                q = np.round(coef.reshape(-1)[ZIGZAG] / qtab).astype(np.int64)
                diff = int(q[0]) - prev_dc[c]
                prev_dc[c] = int(q[0])
                s = _category(diff)
                code, ln = _DC_CODES[s]
                bw.write(code, ln)
                if s:
                    bw.write(_magnitude_bits(diff, s), s)
                run = 0
                last_nz = int(np.max(np.nonzero(q)[0])) if np.any(q[1:]) else 0
                for k in range(1, last_nz + 1):
                    v = int(q[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = _AC_CODES[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = _AC_CODES[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(_magnitude_bits(v, s), s)
                    run = 0
                if last_nz < 63:
                    code, ln = _AC_CODES[0x00]
                    bw.write(code, ln)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy stream")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise ValueError("unexpected marker in entropy stream")
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker (T.81 restart)."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            nxt = self.data[self.pos + 1]
            if 0xD0 <= nxt <= 0xD7:
                self.pos += 2
                return
            if nxt == 0x00:
                break  # stuffed data byte, not a marker
            self.pos += 2  # tolerate stray fill bytes
        raise ValueError("expected RSTn restart marker")


def _build_huffman(bits, vals):
    """(length, code) -> symbol from a DHT bits/values spec."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            i += 1
            code += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


@wrap_codec_errors("JPEG")
def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline, 8-bit, 1x1-sampled JPEG to (h, w, 3) uint8 RGB
    (grayscale images replicate into 3 channels).

    Malformed input always raises ValueError (fuzz-tested): low-level
    parse failures from corrupt bytes are wrapped by the shared
    wrap_codec_errors contract (operators/_codec.py)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    comps = []  # (id, qtab_id)
    h = w = 0
    scan_comps = []
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                qtabs[tq] = np.frombuffer(body[off + 1 : off + 65], dtype=np.uint8).astype(np.int64)
                off += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                htabs[(tc, th)] = _build_huffman(bits, vals)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            for c in range(ncomp):
                cid, sampling, tq = body[6 + 3 * c : 9 + 3 * c]
                if sampling != 0x11:
                    raise ValueError("only 1x1 (no subsampling) supported")
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = body[0]
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cid, tabs >> 4, tabs & 0xF))
            pos += seglen
            break
        pos += seglen

    if not comps or not scan_comps:
        raise ValueError("missing SOF/SOS")
    # entropy-coded data runs until EOI
    end = data.rfind(b"\xff\xd9")
    br = _BitReader(data[pos:end])

    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((bh * 8, bw_ * 8)) for _ in comps]
    prev_dc = [0] * len(comps)
    qt_by_cid = dict(comps)
    tabs_by_cid = {cid: (dc, ac) for cid, dc, ac in scan_comps}
    mcu_i = 0
    for by in range(bh):
        for bx in range(bw_):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                br.restart()  # byte-align, consume RSTn, reset DC prediction
                prev_dc = [0] * len(comps)
            mcu_i += 1
            for ci, (cid, tq) in enumerate(comps):
                dc_t, ac_t = tabs_by_cid[cid]
                dc_table = htabs[(0, dc_t)]
                ac_table = htabs[(1, ac_t)]
                q = np.zeros(64, dtype=np.int64)
                s = _huff_decode(br, dc_table)
                diff = _extend(br.read(s), s) if s else 0
                prev_dc[ci] += diff
                q[0] = prev_dc[ci]
                k = 1
                while k <= 63:
                    sym = _huff_decode(br, ac_table)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63:
                        raise ValueError("AC run past block end")
                    q[k] = _extend(br.read(size), size)
                    k += 1
                coef = np.zeros(64)
                coef[ZIGZAG] = q * qtabs[qt_by_cid[cid]]
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct8x8(
                    coef.reshape(8, 8)
                )
    planes = [np.clip(np.round(p[:h, :w] + 128.0), 0, 255) for p in planes]
    if len(planes) == 1:
        y = planes[0].astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    y, cb, cr = planes
    r = np.clip(np.round(y + 1.402 * (cr - 128.0)), 0, 255)
    g = np.clip(np.round(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)), 0, 255)
    b = np.clip(np.round(y + 1.772 * (cb - 128.0)), 0, 255)
    return np.stack([r, g, b], axis=2).astype(np.uint8)
