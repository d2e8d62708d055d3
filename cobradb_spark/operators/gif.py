"""Pure-python GIF (89a) — the third compressed-image family, from
nothing but the standard library.

GIF is palette-indexed pixels under GIF-variant LZW — fully lossless,
so like PNG the decode is bit-exact by construction and directly
SQL-oracle-able.  This module implements

- a general DECODER (`decode_gif`): header + logical screen descriptor,
  global and local color tables, extension-block skipping, sub-block
  reassembly, and a real variable-width LZW decoder (clear/EOI codes,
  dictionary growth to 12 bits, the deferred-clear corner); first frame
  only, non-interlaced; and
- an ENCODER (`encode_gif`) for fixtures: real greedy-longest-match LZW
  (not the "uncompressed GIF" clear-spam trick), so roundtrips exercise
  the decoder's dictionary growth and width bumps.

Malformed input always raises ValueError (fuzz-tested), matching the
JPEG/PNG decoders' error contract.
"""

from __future__ import annotations

import struct

import numpy as np

from cobradb_spark.operators._codec import wrap_codec_errors


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode (h, w) uint8 palette indices + (n, 3) uint8 palette as a
    single-frame GIF89a.  Palette size is padded to the next power of
    two (min 4)."""
    h, w = indices.shape
    n = len(palette)
    bits = max(2, int(n - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[:n] = palette

    out = bytearray()
    out += b"GIF89a"
    # logical screen: global color table present, 8-bit color resolution
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07) | 0x70, 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    mcs = max(bits, 2)  # LZW minimum code size
    out.append(mcs)

    clear, eoi = 1 << mcs, (1 << mcs) + 1
    codes: list[tuple[int, int]] = []

    def emit_stream():
        table = {(-1, i): i for i in range(1 << mcs)}
        next_code = eoi + 1
        width = mcs + 1
        codes.append((clear, width))
        prev = -1
        for v in indices.reshape(-1):
            v = int(v)
            key = (prev, v)
            if key in table:
                prev = table[key]
                continue
            codes.append((prev, width))
            if next_code < 4096:
                table[key] = next_code
                next_code += 1
                if next_code - 1 == (1 << width) and width < 12:
                    width += 1
            else:
                codes.append((clear, width))
                table = {(-1, i): i for i in range(1 << mcs)}
                next_code = eoi + 1
                width = mcs + 1
            prev = table[(-1, v)]
        if prev != -1:
            codes.append((prev, width))
        codes.append((eoi, width))

    emit_stream()
    # pack LSB-first
    acc = nbits = 0
    data = bytearray()
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


@wrap_codec_errors("GIF")
def decode_gif(data: bytes) -> np.ndarray:
    """Decode the first frame of a GIF87a/89a to (h, w, 3) uint8 RGB.
    Malformed input always raises ValueError (fuzz-tested) via the
    shared wrap_codec_errors contract (operators/_codec.py)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, flags, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * size], dtype=np.uint8).reshape(size, 3)
        pos += 3 * size

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _left, _top, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
            pos += 9
            if iflags & 0x40:
                raise ValueError("interlaced GIFs not supported")
            table = gct
            if iflags & 0x80:
                size = 2 << (iflags & 0x07)
                table = np.frombuffer(
                    data[pos : pos + 3 * size], dtype=np.uint8
                ).reshape(size, 3)
                pos += 3 * size
            if table is None:
                raise ValueError("no color table for image")
            mcs = data[pos]
            pos += 1
            if not 2 <= mcs <= 11:
                raise ValueError(f"bad LZW minimum code size {mcs}")
            stream = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                stream += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(stream), mcs, w * h)
            if len(idx) < w * h:
                raise ValueError("LZW stream ended before the raster was full")
            arr = np.array(idx[: w * h], dtype=np.int64).reshape(h, w)
            if arr.max() >= len(table):
                raise ValueError("palette index out of range")
            return table[arr]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown block type 0x{block:02x}")
    raise ValueError("no image data found")


def _lzw_decode(stream: bytes, mcs: int, max_pixels: int) -> list[int]:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    base = [[i] for i in range(1 << mcs)]

    table = base + [[], []]
    width = mcs + 1
    acc = nbits = 0
    out: list[int] = []
    prev: list[int] | None = None
    i = 0
    while True:
        while nbits < width:
            if i >= len(stream):
                return out  # stream exhausted (caller validates length)
            acc |= stream[i] << nbits
            nbits += 8
            i += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = base + [[], []]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table) or not table[code]:
                raise ValueError("invalid first LZW code")
            entry = table[code]
        elif code < len(table) and table[code]:
            entry = table[code]
            table.append(prev + [entry[0]])
        elif code == len(table):
            entry = prev + [prev[0]]
            table.append(entry)
        else:
            raise ValueError("LZW code out of sequence")
        out.extend(entry)
        if len(out) > max_pixels:
            raise ValueError("LZW output exceeds raster size")
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
