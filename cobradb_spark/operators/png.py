"""Pure-numpy PNG (RFC 2083) — lossless compressed-image support from
the stdlib.

PNG needs only zlib (stdlib) plus scanline unfiltering, so unlike JPEG
there is no numeric pipeline to reason about: decode is bit-exact by
construction, which makes compressed-image operators directly
SQL-oracle-able.  This module implements

- a general DECODER (`decode_png`): 8-bit greyscale / RGB / RGBA,
  non-interlaced, multiple IDAT chunks, all five scanline filter types
  (None/Sub/Up/Average/Paeth), CRC-verified chunks; and
- an ENCODER (`encode_png`) for fixtures that deliberately CYCLES the
  filter type per scanline (y % 5) so the fixture exercises every
  decoder unfilter path, not just filter 0.
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


def encode_png(rgb: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB, filter type y % 5 per scanline."""
    h, w, _ = rgb.shape
    img = rgb.astype(np.int64)
    bpp = 3
    out_rows = []
    for y in range(h):
        row = img[y].reshape(-1)  # w*3
        prev = img[y - 1].reshape(-1) if y > 0 else np.zeros(w * bpp, dtype=np.int64)
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
    raw = b"".join(out_rows)

    def chunk(typ: bytes, body: bytes) -> bytes:
        c = typ + body
        return struct.pack(">I", len(body)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
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
            if interlace != 0:
                raise ValueError("interlaced PNGs not supported")
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    bpp = {0: 1, 2: 3, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * bpp
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
    px = out.reshape(h, w, bpp).astype(np.uint8)
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3]
