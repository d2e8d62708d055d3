"""Windows BMP (BITMAPINFOHEADER) codec — pure NumPy/stdlib.

The one mainstream uncompressed image container the repo's netpbm path
doesn't cover: little-endian 14-byte BITMAPFILEHEADER + 40-byte
BITMAPINFOHEADER, 24-bit BGR pixel rows padded to 4-byte boundaries,
stored BOTTOM-UP by default (positive biHeight) or top-down (negative
biHeight).  The decoder is general over conformant 24-bpp uncompressed
files: magic/size/offset validation, either row order (rows are
re-flipped to image orientation — verified by an orientation-sensitive
aggregate), derived-not-assumed row stride, typed ValueError on
malformed input.  Palette (<=8 bpp), 16/32-bpp masks, and RLE
compression raise as the documented unsupported boundary.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, data offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # biSize .. biClrImportant


def bmp_schedule(doc_id: int) -> dict:
    """Deterministic per-document synthesis schedule (shared by the
    encoder, the SQL oracle, and the tests): width 5 + id%12 (row
    padding 0-3 bytes, all four phases exercised), height 3 + id%9,
    top-down storage on every 5th doc, RGB pixel value
    v(x, y, c) = (id + 3x + 7y + 11c) % 256."""
    return {
        "width": 5 + doc_id % 12,
        "height": 3 + doc_id % 9,
        "top_down": doc_id % 5 == 0,
        "value": lambda x, y, c: (doc_id + 3 * x + 7 * y + 11 * c) % 256,
    }


def encode_bmp(doc_id: int) -> bytes:
    """Spec-valid 24-bpp BMP for one document: real headers, BGR byte
    order, 4-byte-padded rows, bottom-up unless the schedule says
    top-down (negative biHeight)."""
    sch = bmp_schedule(doc_id)
    w, h = sch["width"], sch["height"]
    y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3), indexing="ij")
    rgb = ((doc_id + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
    bgr = rgb[:, :, ::-1]  # file stores Blue, Green, Red
    row_bytes = 3 * w
    stride = (row_bytes + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    if not sch["top_down"]:
        rows = rows[::-1]  # bottom-up: last image row first in the file
    data = rows.tobytes()
    offset = _FILE_HDR.size + _INFO_HDR.size
    info = _INFO_HDR.pack(
        40, w, -h if sch["top_down"] else h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    file_hdr = _FILE_HDR.pack(b"BM", offset + len(data), 0, 0, offset)
    return file_hdr + info + data


def decode_bmp(data: bytes) -> dict:
    """Decode a 24-bpp uncompressed BMP to an RGB array in IMAGE
    orientation (row 0 = top), whichever way the file stored it.
    Returns the array plus the integer aggregates the SQL oracle
    replays — including top_row_sum, which is orientation-SENSITIVE
    (a decoder that forgets the bottom-up flip matches the channel
    sums but not this one)."""
    if len(data) < _FILE_HDR.size + _INFO_HDR.size:
        raise ValueError("corrupt bmp: truncated headers")
    magic, file_size, _r1, _r2, offset = _FILE_HDR.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("corrupt bmp: bad magic")
    (
        bi_size, width, height, planes, bpp, compression,
        _size_image, _xppm, _yppm, _clr_used, _clr_important,
    ) = _INFO_HDR.unpack_from(data, _FILE_HDR.size)
    if bi_size != 40:
        raise ValueError(f"unsupported bmp: header size {bi_size} (want BITMAPINFOHEADER)")
    if planes != 1:
        raise ValueError(f"corrupt bmp: planes={planes}")
    if bpp != 24:
        raise ValueError(f"unsupported bmp: {bpp} bpp (only 24-bpp implemented)")
    if compression != 0:
        raise ValueError(f"unsupported bmp: compression {compression}")
    if width <= 0 or height == 0:
        raise ValueError(f"corrupt bmp: dimensions {width}x{height}")
    top_down = height < 0
    h, w = abs(height), width
    stride = (3 * w + 3) & ~3
    if offset < _FILE_HDR.size + _INFO_HDR.size or offset + stride * h > len(data):
        raise ValueError("corrupt bmp: pixel data runs past EOF")
    # bfSize is NOT validated against len(data): many real-world 24-bpp
    # writers emit a bogus bfSize (commonly 0) on otherwise-decodable
    # files, and the pixel-data bound above is the check that actually
    # protects the reshape below (r9 ADVICE — general over
    # strict-conformant).
    _ = file_size
    rows = np.frombuffer(
        data[offset : offset + stride * h], dtype=np.uint8
    ).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    bgr = rows[:, : 3 * w].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1].astype(np.int64)
    return {
        "width": w,
        "height": h,
        "top_down": int(top_down),
        "r_sum": int(rgb[:, :, 0].sum()),
        "g_sum": int(rgb[:, :, 1].sum()),
        "b_sum": int(rgb[:, :, 2].sum()),
        "top_row_sum": int(rgb[0, :, :].sum()),
        "rgb": rgb,
    }
