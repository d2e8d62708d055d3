"""Pure-python GIF (89a) — the third compressed-image family, from
nothing but the standard library.

GIF is palette-indexed pixels under GIF-variant LZW — fully lossless,
so like PNG the decode is bit-exact by construction and directly
SQL-oracle-able.  This module implements

- a general DECODER (`decode_gif` first frame; `decode_gif_frames` the
  whole ANIMATION): header + logical screen descriptor, global and
  local color tables, Graphic Control Extensions — per-frame delay,
  TRANSPARENCY (transparent-index pixels leave the underlying canvas
  visible), and all three defined disposal methods (0/1 do-not-
  dispose, 2 restore-to-background, 3 restore-to-previous; 4-7 are
  reserved and reject) — sub-rectangle frames composited over the
  evolving canvas, 4-pass ROW INTERLACING, sub-block reassembly, and
  a real variable-width LZW decoder (clear/EOI codes, dictionary
  growth to 12 bits, the deferred-clear corner); and
- ENCODERS (`encode_gif`, `encode_gif_animated`,
  `encode_gif_composited`) for fixtures: real greedy-longest-match
  LZW (not the "uncompressed GIF" clear-spam trick), so roundtrips
  exercise the decoder's dictionary growth and width bumps;
  interlace=True permutes rows into the 4-pass order;
  encode_gif_composited emits per-frame sub-rectangles with chosen
  disposal methods and a transparent index.

Stated convention (both engines replay it): the canvas starts as the
logical-screen background color (global color table entry named by the
LSD background field; black when only local tables exist), and
disposal 2 restores the frame's rectangle to that same background
color.  (Renderer folklore sometimes restores to *transparent*; this
module has no alpha plane — RGB rasters — so background-color restore
is the well-defined choice, and the fixtures + SQL oracle pin it.)

Malformed input always raises ValueError (fuzz-tested), matching the
JPEG/PNG decoders' error contract.
"""

from __future__ import annotations

import struct

import numpy as np

from cobradb_spark.operators._codec import wrap_codec_errors


def _interlace_order(h: int) -> list[int]:
    """GIF 4-pass row interlace (GIF89a appendix E): the order in which
    raster rows are STORED — every 8th from 0, every 8th from 4, every
    4th from 2, every 2nd from 1."""
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return order


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """Greedy-longest-match GIF LZW over a flat index array."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    codes: list[tuple[int, int]] = []
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
    return bytes(data)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)
    return bytes(out)


def _image_block(indices: np.ndarray, mcs: int, left: int, top: int,
                 interlace: bool) -> bytes:
    h, w = indices.shape
    if interlace:
        indices = indices[_interlace_order(h)]
    out = bytearray()
    out += b"\x2c" + struct.pack(
        "<HHHHB", left, top, w, h, 0x40 if interlace else 0
    )
    out.append(mcs)
    out += _sub_blocks(_lzw_encode(indices, mcs))
    return bytes(out)


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """Encode (h, w) uint8 palette indices + (n, 3) uint8 palette as a
    single-frame GIF89a.  Palette size is padded to the next power of
    two (min 4).  interlace=True stores rows in the 4-pass order with
    the descriptor flag set."""
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
    mcs = max(bits, 2)  # LZW minimum code size
    out += _image_block(indices, mcs, 0, 0, interlace)
    out += b"\x3b"  # trailer
    return bytes(out)


def encode_gif_animated(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delays_cs: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode an ANIMATED GIF89a: NETSCAPE2.0 loop extension, one
    Graphic Control Extension (disposal 1 = do not dispose, no
    transparency) + image block per frame.  All frames full-screen
    size; palette shared via the global color table."""
    h, w = frames[0].shape
    n = len(palette)
    bits = max(2, int(n - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[:n] = palette
    delays = delays_cs or [10] * len(frames)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07) | 0x70, 0, 0)
    out += pal.tobytes()
    # NETSCAPE2.0 application extension: loop forever
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(bits, 2)
    for fr, delay in zip(frames, delays):
        assert fr.shape == (h, w)
        # GCE: disposal 1 (do not dispose), no transparency
        out += b"\x21\xf9\x04" + bytes((0b100,)) + struct.pack("<H", delay) + b"\x00\x00"
        out += _image_block(fr, mcs, 0, 0, interlace)
    out += b"\x3b"
    return bytes(out)


def encode_gif_composited(
    screen_wh: tuple[int, int],
    frame_specs: list[dict],
    palette: np.ndarray,
    bg_index: int = 0,
) -> bytes:
    """Encode a GIF89a whose frames exercise the full GCE surface: each
    spec is {"indices": (h, w) uint8, "left": int, "top": int,
    "disposal": 0-3, "transparent": int | None, "delay_cs": int}.
    The logical screen is screen_wh = (w, h) with the global color
    table's bg_index recorded in the screen descriptor (the color
    disposal-2 restores to, per this module's stated convention)."""
    sw, sh = screen_wh
    n = len(palette)
    bits = max(2, int(n - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[:n] = palette

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack(
        "<HHBBB", sw, sh, 0x80 | ((bits - 1) & 0x07) | 0x70, bg_index, 0
    )
    out += pal.tobytes()
    mcs = max(bits, 2)
    for spec in frame_specs:
        t = spec.get("transparent")
        packed = (spec.get("disposal", 0) & 0b111) << 2 | (1 if t is not None else 0)
        out += (
            b"\x21\xf9\x04"
            + bytes((packed,))
            + struct.pack("<H", spec.get("delay_cs", 0))
            + bytes((t if t is not None else 0, 0))
        )
        out += _image_block(
            spec["indices"], mcs, spec.get("left", 0), spec.get("top", 0), False
        )
    out += b"\x3b"
    return bytes(out)


@wrap_codec_errors("GIF")
def decode_gif(data: bytes) -> np.ndarray:
    """Decode the first frame of a GIF87a/89a to (h, w, 3) uint8 RGB
    (interlaced or progressive).  Malformed input always raises
    ValueError (fuzz-tested) via the shared wrap_codec_errors contract
    (operators/_codec.py)."""
    return _decode_gif_walk(data, first_only=True)["frames"][0]


@wrap_codec_errors("GIF")
def decode_gif_frames(data: bytes) -> dict:
    """Decode EVERY frame of an animated GIF: Graphic Control
    Extensions (delay, TRANSPARENCY, disposal 0-3 — do-not-dispose,
    restore-to-background, restore-to-previous; reserved 4-7 reject),
    sub-rectangle frames composited over the evolving canvas, 4-pass
    row interlacing.  The canvas starts as the background color and
    disposal 2 restores to it (module-header convention).  Returns
    {"frames": [(h, w, 3) uint8 ...], "delays_cs": [...],
    "interlaced": bool}."""
    return _decode_gif_walk(data, first_only=False)


def _decode_gif_walk(data: bytes, first_only: bool) -> dict:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, flags, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * size], dtype=np.uint8).reshape(size, 3)
        pos += 3 * size

    frames: list[np.ndarray] = []
    delays: list[int] = []
    pending_delay = 0
    pending_disposal = 0
    pending_transparent: int | None = None
    # canvas state BEFORE the next frame composites; lazily created so
    # a background color is only demanded when a frame needs one under it
    state: np.ndarray | None = None
    any_interlaced = False
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                ln = data[pos]
                if ln != 4:
                    raise ValueError("bad GCE block size")
                packed = data[pos + 1]
                pending_delay = data[pos + 2] | (data[pos + 3] << 8)
                pending_disposal = (packed >> 2) & 0b111
                if pending_disposal > 3:
                    raise ValueError(
                        f"bad GIF: reserved disposal method {pending_disposal}"
                    )
                pending_transparent = data[pos + 4] if packed & 1 else None
            # skip the (remaining) sub-blocks of any extension
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
            pos += 9
            interlaced = bool(iflags & 0x40)
            any_interlaced = any_interlaced or interlaced
            table = gct
            if iflags & 0x80:
                size = 2 << (iflags & 0x07)
                table = np.frombuffer(
                    data[pos : pos + 3 * size], dtype=np.uint8
                ).reshape(size, 3)
                pos += 3 * size
            if table is None:
                raise ValueError("no color table for image")
            if left + w > sw or top + h > sh:
                raise ValueError("frame rectangle outside the logical screen")
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
            if interlaced:
                out = np.empty_like(arr)
                out[_interlace_order(h)] = arr
                arr = out
            if arr.max() >= len(table):
                raise ValueError("palette index out of range")
            bg_rgb = (
                gct[bg] if gct is not None and bg < len(gct)
                else np.zeros(3, dtype=np.uint8)
            )
            if state is None:
                state = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
            displayed = state.copy()
            region = displayed[top : top + h, left : left + w]
            if pending_transparent is None:
                region[:] = table[arr]
            else:
                opaque = arr != pending_transparent
                region[opaque] = table[arr][opaque]
            if first_only:
                return {"frames": [displayed], "delays_cs": [pending_delay],
                        "interlaced": any_interlaced}
            frames.append(displayed)
            delays.append(pending_delay)
            if pending_disposal == 2:  # restore rect to background color
                state = displayed.copy()
                state[top : top + h, left : left + w] = bg_rgb
            elif pending_disposal == 3:  # restore to previous: state unchanged
                pass
            else:  # 0/1: the composited result persists
                state = displayed
            pending_delay = 0
            pending_disposal = 0
            pending_transparent = None
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown block type 0x{block:02x}")
    if not frames:
        raise ValueError("no image data found")
    return {"frames": frames, "delays_cs": delays, "interlaced": any_interlaced}


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
