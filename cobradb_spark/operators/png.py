"""Pure-numpy PNG (RFC 2083) — lossless compressed-image support from
the stdlib.

PNG needs only zlib (stdlib) plus scanline unfiltering, so unlike JPEG
there is no numeric pipeline to reason about: decode is bit-exact by
construction, which makes compressed-image operators directly
SQL-oracle-able.  This module implements

- a general DECODER (`decode_png`): 8-bit greyscale / RGB / RGBA,
  non-interlaced AND Adam7-interlaced (seven sub-images, each its own
  filtered scanline sequence, scattered back on the fixed pass grid),
  multiple IDAT chunks, all five scanline filter types
  (None/Sub/Up/Average/Paeth), CRC-verified chunks; and
- an ENCODER (`encode_png`) for fixtures that deliberately CYCLES the
  filter type per scanline (y % 5 within each pass) so the fixture
  exercises every decoder unfilter path, not just filter 0; pass
  interlace=True for Adam7 output.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from cobradb_spark.operators._codec import wrap_codec_errors

_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


_PAETH_V = np.vectorize(_paeth, otypes=[np.int64])


# Adam7 pass grid (x_start, y_start, x_step, y_step) — RFC 2083 §2.6.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _filter_rows(img: np.ndarray) -> bytes:
    """Filter an (h, w*bpp) int64 sub-image, type y % 5 per scanline."""
    h, stride = img.shape
    bpp = 3
    out_rows = []
    for y in range(h):
        row = img[y]
        prev = img[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
        ftype = y % 5
        if ftype == 0:
            filt = row
        elif ftype == 1:
            filt = row - left
        elif ftype == 2:
            filt = row - prev
        elif ftype == 3:
            filt = row - (left + prev) // 2
        else:
            filt = row - _PAETH_V(left, prev, upleft)
        out_rows.append(bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes())
    return b"".join(out_rows)


def encode_png(rgb: np.ndarray, interlace: bool = False) -> bytes:
    """Encode (h, w, 3) uint8 RGB, filter type y % 5 per scanline
    (within each pass when interlace=True emits Adam7)."""
    h, w, _ = rgb.shape
    img = rgb.astype(np.int64)
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_filter_rows(sub.reshape(sub.shape[0], -1)))
        raw = b"".join(parts)
    else:
        raw = _filter_rows(img.reshape(h, -1))

    def chunk(typ: bytes, body: bytes) -> bytes:
        c = typ + body
        return struct.pack(">I", len(body)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, int(interlace))
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@wrap_codec_errors("PNG", extra=(zlib.error,))
def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced greyscale/RGB/RGBA PNG to
    (h, w, 3) uint8 RGB (alpha dropped, grey replicated).

    Malformed input always raises ValueError (fuzz-tested) via the
    shared wrap_codec_errors contract (operators/_codec.py)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    color_type = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(typ + body) != crc:
            raise ValueError(f"CRC mismatch in {typ!r} chunk")
        pos += 12 + length
        if typ == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError("only 8-bit depth supported")
            if color_type not in (0, 2, 6):
                raise ValueError("only greyscale/RGB/RGBA supported")
            if interlace not in (0, 1):
                raise ValueError(f"unknown interlace method {interlace}")
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    bpp = {0: 1, 2: 3, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        out = _unfilter(raw, h, w * bpp, bpp)
        px = out.reshape(h, w, bpp).astype(np.uint8)
    else:
        # Adam7: seven independently-filtered sub-images, scattered back
        # on the fixed pass grid
        px64 = np.zeros((h, w, bpp), dtype=np.int64)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            ph = (h - y0 + dy - 1) // dy
            pw = (w - x0 + dx - 1) // dx
            if ph <= 0 or pw <= 0:
                continue
            n = ph * (pw * bpp + 1)
            sub = _unfilter(raw[off : off + n], ph, pw * bpp, bpp)
            px64[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
            off += n
        if off != len(raw):
            raise ValueError("decompressed size mismatch")
        px = px64.astype(np.uint8)
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3]


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Unfilter h scanlines of `stride` bytes each (RFC 2083 §6)."""
    if len(raw) != h * (stride + 1):
        raise ValueError("decompressed size mismatch")
    out = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        if ftype == 0:
            cur = row
        elif ftype == 2:
            cur = (row + prev) % 256
        elif ftype in (1, 3, 4):
            # left-dependent filters recur along x; vectorize across the
            # bpp channels (independent) and walk pixels
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(0, stride, bpp):
                left = cur[x - bpp : x] if x else np.zeros(bpp, dtype=np.int64)
                up = prev[x : x + bpp]
                upleft = prev[x - bpp : x] if x else np.zeros(bpp, dtype=np.int64)
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    pred = _PAETH_V(left, up, upleft)
                cur[x : x + bpp] = (row[x : x + bpp] + pred) % 256
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y] = cur
    return out
