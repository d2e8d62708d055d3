"""MPEG-1 Layer III Huffman-coded main data — REAL symbol decode
(ISO/IEC 11172-3 2.4.1.7 / 2.4.2.7, Table B.7), no codec library.

This converted the documented Layer III boundary from "all of the main
data" to "requantization + IMDCT + synthesis only" — and both of those
landed too (operators/mp3requant.py; operators/mp3imdct.py through
polyphase synthesis to PCM): the container walk
(mp3.py index_mp3), the 136-bit side-info record (mp3.py
parse_mp3_sideinfo), and now the full part2+part3 bitstream — slen-coded
scalefactors with scfsi sharing, region-partitioned big-value pair
decode against the published Huffman codebooks, count1 quadruple decode
with both count1 tables, sign bits, and stuffing-tolerant granule
framing — are implemented for real from the published spec layout.

Scope boundary, stated precisely:
- Bundled big-value codebooks: the spec's small-value tables 0-3 and 5
  (dims 2x2 .. 4x4, no linbits), plus both count1 quadruple tables A/B.
  Every bundled code set is verified Kraft-complete at import.  Tables
  6-13/15 and the linbits families 16-23/24-31 carry their published
  dimension/linbits METADATA (so region setup and the |x|=15 escape
  mechanism are real, see _decode_pair) but not codeword data; a stream
  selecting one raises ValueError("codebook not bundled"), the same
  honest-boundary pattern as the B.2c/B.2d Layer II tables.
- bit-reservoir reassembly (main_data_begin != 0) IS implemented
  (r11): decode keeps a rolling <=511-byte tail of prior frames'
  main-data areas and starts each frame's granule bits main_data_begin
  bytes back, rejecting underruns; encode_mp3_reservoir synthesizes
  streams that genuinely use it (pumped frames, byte-aligned virtual
  stream, 511-byte reach clamp).
- Tables 4 and 14 are "not used" in the spec and are rejected.

The synthesizer builds spec-valid mono streams whose main data is
genuinely Huffman-coded by the same published codebooks (encoder and
decoder share only the table constants, not state), covering: all three
sample rates, long granules with region0/region1 boundaries from the
published long-block scalefactor-band tables, short (window-switching)
granules with the fixed 36-sample region split, scfsi scalefactor
sharing on all-long frames, zero-table regions, both count1 tables,
sign bits, VBR per-frame bitrate fitting, and the rzero tail.
"""

from __future__ import annotations

from cobradb_spark.operators.mp3 import (
    SAMPLE_RATE,
    _BitReader,
    _BitWriter,
    _byte_bits,
    _frame_header,
    crc16_protect,
)
from cobradb_spark.operators.mp3 import frame_length  # noqa: F401  (re-export)

# --- published fixed tables -------------------------------------------------

# scalefac_compress -> (slen1, slen2) (ISO 11172-3 2.4.2.7)
SLEN1 = (0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
SLEN2 = (0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

# Long-block scalefactor-band edges per sample rate (23 edges, 22 bands;
# ISO 11172-3 Table B.8).  Region boundaries for long-block big-value
# decode index into these, so they are part of the bitstream contract.
SFB_LONG = {
    44100: (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576),
    48000: (0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576),
    32000: (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576),
}

# scfsi groups over the 21 transmitted long scalefactor bands
# (bit 3 = group 0 = bands 0-5, then 6-10, 11-15, 16-20)
_SCFSI_GROUP_SIZES_SLEN1 = (6, 5)   # groups 0,1 use slen1
_SCFSI_GROUP_SIZES_SLEN2 = (5, 5)   # groups 2,3 use slen2

# Big-value Huffman codebooks (ISO 11172-3 Table B.7), row-major
# (x*dim + y) -> (hlen, hcod).  Only the small-value tables are bundled;
# each is verified prefix-free AND Kraft-complete below, so a corrupt
# bitstream can never fail to match a codeword (only exhaust the frame).
_BV_HLEN = {
    1: (1, 3, 2, 3),
    2: (1, 3, 6, 3, 3, 5, 5, 5, 6),
    3: (2, 2, 6, 3, 2, 5, 5, 5, 6),
    5: (1, 3, 6, 7, 3, 3, 6, 7, 6, 6, 7, 8, 7, 6, 7, 8),
}
_BV_HCOD = {
    1: (1, 1, 1, 0),
    2: (1, 2, 1, 3, 1, 1, 3, 2, 0),
    3: (3, 2, 1, 1, 1, 1, 3, 2, 0),
    5: (1, 2, 6, 5, 3, 1, 4, 4, 7, 5, 7, 1, 6, 1, 1, 0),
}
_BV_DIM = {0: 1, 1: 2, 2: 3, 3: 3, 5: 4}

# Published dimension/linbits metadata for the unbundled tables: region
# setup and the escape path are real; selecting one of these tables
# raises at decode because the codeword data is not bundled.
_UNBUNDLED_DIM = {6: 4, 7: 6, 8: 6, 9: 6, 10: 8, 11: 8, 12: 8, 13: 16, 15: 16}
LINBITS = {16: 1, 17: 2, 18: 3, 19: 4, 20: 6, 21: 8, 22: 10, 23: 13,
           24: 4, 25: 5, 26: 6, 27: 7, 28: 8, 29: 9, 30: 11, 31: 13}

# count1 quadruple tables (Table B.7): index (v<<3|w<<2|x<<1|y) ->
# (hlen, hcod).  Table A is the variable-length book; table B is the
# fixed 4-bit book whose codeword is the one's complement of the value.
_C1A_HLEN = (1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6)
_C1A_HCOD = (1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1)


def _build_codebook(hlen, hcod):
    """(len, code) -> symbol-index decode map; symbol -> (len, code)
    encode map.  Validates prefix-freeness and Kraft completeness."""
    dec: dict[tuple[int, int], int] = {}
    enc: list[tuple[int, int]] = []
    kraft = 0.0
    for i, (ln, cd) in enumerate(zip(hlen, hcod)):
        if (ln, cd) in dec:
            raise AssertionError(f"duplicate codeword ({ln},{cd})")
        dec[(ln, cd)] = i
        enc.append((ln, cd))
        kraft += 2.0 ** -ln
    # prefix check: no codeword is a prefix of a longer one
    for ln, cd in list(dec):
        for ln2, cd2 in list(dec):
            if ln2 > ln and (cd2 >> (ln2 - ln)) == cd:
                raise AssertionError(f"prefix violation ({ln},{cd})")
    if abs(kraft - 1.0) > 1e-12:
        raise AssertionError(f"codebook not Kraft-complete: {kraft}")
    return dec, enc


_BV_BOOKS = {t: _build_codebook(_BV_HLEN[t], _BV_HCOD[t]) for t in _BV_HLEN}
_C1_BOOKS = {
    0: _build_codebook(_C1A_HLEN, _C1A_HCOD),                      # table A
    1: _build_codebook((4,) * 16, tuple(15 - i for i in range(16))),  # table B
}
_MAX_HLEN = 8  # longest bundled codeword (table 5)


def table_dim(t: int) -> int:
    """x/y dimension of big-value table t, from bundled data or the
    published metadata; raises for the spec's unused tables 4/14."""
    if t in _BV_DIM:
        return _BV_DIM[t]
    if t in _UNBUNDLED_DIM:
        return _UNBUNDLED_DIM[t]
    if t in LINBITS:
        return 16
    raise ValueError(f"unsupported mp3 stream: huffman table {t} is not used")


def _read_code(r: _BitReader, dec: dict, max_len: int) -> int:
    """Walk bits MSB-first until a codeword matches.  With
    Kraft-complete books the only failure mode is running out of frame
    bits, which _BitReader turns into ValueError."""
    code = 0
    for n in range(1, max_len + 1):
        code = (code << 1) | r.read(1)
        sym = dec.get((n, code))
        if sym is not None:
            return sym
    raise ValueError("corrupt mp3 stream: invalid huffman code")


def _decode_pair(r: _BitReader, t: int) -> tuple[int, int]:
    """Decode one big-value (x, y) pair with table t: Huffman symbol,
    |15|-escape linbits extension (tables 16-31), then a sign bit per
    nonzero value (1 = negative).  Table 0 emits (0, 0) in zero bits."""
    if t == 0:
        return 0, 0
    book = _BV_BOOKS.get(t)
    if book is None:
        table_dim(t)  # raises for unused 4/14
        raise ValueError(
            f"unsupported mp3 stream: codebook not bundled for table {t}"
        )
    dim = _BV_DIM[t]
    sym = _read_code(r, book[0], _MAX_HLEN)
    x, y = divmod(sym, dim)
    linbits = LINBITS.get(t, 0)
    if linbits and x == 15:
        x += r.read(linbits)
    if x and r.read(1):
        x = -x
    if linbits and y == 15:
        y += r.read(linbits)
    if y and r.read(1):
        y = -y
    return x, y


def _encode_pair(w: _BitWriter, t: int, x: int, y: int) -> None:
    if t == 0:
        if x or y:
            raise ValueError("table 0 region must be all zero")
        return
    dim = _BV_DIM[t]
    ax, ay = abs(x), abs(y)
    if ax >= dim or ay >= dim:
        raise ValueError(f"value out of range for table {t}")
    ln, cd = _BV_BOOKS[t][1][ax * dim + ay]
    w.write(cd, ln)
    if ax:
        w.write(1 if x < 0 else 0, 1)
    if ay:
        w.write(1 if y < 0 else 0, 1)


# --- deterministic synthesis schedule ----------------------------------------

_TB = (1, 2, 3, 5, 0)  # region table rotation (0 = zero table)
_TMAX = {0: 0, 1: 1, 2: 2, 3: 2, 5: 3}


def mp3_main_schedule(doc_id: int) -> dict:
    """Deterministic mono main-data schedule (shared by the encoder,
    the SQL oracle, and the tests).  Per (frame f, granule g): short
    (window-switching) granules on a %5 rotation, slen-driven
    scalefactor values, big_values < 100 so every granule keeps an
    rzero tail, region tables rotating through {1,2,3,5,0}, count1
    quads with both tables, and scfsi on frames whose two granules are
    both long."""
    return {
        "sr_idx": doc_id % 3,
        "n_frames": 2 + doc_id % 3,
        "short": lambda f, g: (doc_id + 2 * f + g) % 5 == 0,
        "scfsi": lambda f: (doc_id + f) % 16,
        "scalefac_compress": lambda f, g: (doc_id + 3 * f + 5 * g) % 16,
        "sf_value": lambda f, g, j, sl: (doc_id + f + 2 * g + j) % (1 << sl),
        "big_values": lambda f, g: (doc_id * 3 + 5 * f + 7 * g) % 100,
        "region0": lambda f, g: 2 + (doc_id + f + g) % 6,
        "region1": lambda f, g: 2 + (doc_id + f + 2 * g) % 5,
        "table": lambda f, g, r: _TB[(doc_id + 2 * f + 3 * g + r) % 5],
        "bv_value": lambda f, g, i, m: (doc_id + 3 * f + 5 * g + 7 * i) % (m + 1),
        "bv_sign": lambda f, g, i: (doc_id + f + g + i) % 2,
        "n_quads": lambda f, g: (doc_id + f + 2 * g) % 12,
        "c1_bit": lambda f, g, q, p: 1 if (doc_id + f + g + 4 * q + p) % 3 == 0 else 0,
        "c1_sign": lambda q, p: (doc_id + q + p) % 2,
        "count1table": lambda f, g: (doc_id + f + g) % 2,
        "preflag": lambda f, g: (doc_id + f + g) % 2,
        "scalefac_scale": lambda f, g: (doc_id + f) % 2,
        "subblock_gain": lambda g, k: (doc_id + g + k) % 8,
    }


def _sf_slots(short: bool, g: int, scfsi: int, s1: int, s2: int) -> list[int]:
    """Transmitted scalefactor slot widths, in transmission order."""
    if short:
        return [s1] * 18 + [s2] * 18
    if g == 1 and scfsi:
        n1 = sum(
            sz for b, sz in enumerate(_SCFSI_GROUP_SIZES_SLEN1)
            if not (scfsi >> (3 - b)) & 1
        )
        n2 = sum(
            sz for b, sz in enumerate(_SCFSI_GROUP_SIZES_SLEN2)
            if not (scfsi >> (1 - b)) & 1
        )
        return [s1] * n1 + [s2] * n2
    return [s1] * 11 + [s2] * 10


def _granule_bounds(short: bool, bv2: int, sfb, r0c: int, r1c: int):
    """Cumulative big-value region ends (pair-aligned: every sfb edge
    and the fixed 36-sample switching split are even)."""
    if short:
        return [min(36, bv2), bv2]
    return [min(sfb[r0c + 1], bv2), min(sfb[r0c + r1c + 2], bv2), bv2]


def _build_granules(sch: dict, doc_id: int, sfb, f: int):
    """Huffman-encode frame f's two granules from the schedule: returns
    (grs, scfsi) where each gr carries its side-info fields AND the
    encoded part2+part3 bit list.  Shared by the contiguous
    (main_data_begin = 0) and bit-reservoir framings — the granule
    CONTENT is framing-independent, which is exactly what the
    reservoir key's oracle pins."""
    both_long = not (sch["short"](f, 0) or sch["short"](f, 1))
    scfsi = sch["scfsi"](f) if both_long else 0
    grs = []
    for g in range(2):
        short = sch["short"](f, g)
        sc = sch["scalefac_compress"](f, g)
        s1, s2 = SLEN1[sc], SLEN2[sc]
        w = _BitWriter()
        for j, sl in enumerate(_sf_slots(short, g, scfsi, s1, s2)):
            if sl:
                w.write(sch["sf_value"](f, g, j, sl), sl)
        bv = sch["big_values"](f, g)
        r0c, r1c = sch["region0"](f, g), sch["region1"](f, g)
        bounds = _granule_bounds(short, 2 * bv, sfb, r0c, r1c)
        tabs = [sch["table"](f, g, r) for r in range(len(bounds))]
        lo = 0
        for bound, t in zip(bounds, tabs):
            m = _TMAX[t]
            for i in range(lo, bound, 2):
                x = sch["bv_value"](f, g, i, m)
                y = sch["bv_value"](f, g, i + 1, m)
                if x and sch["bv_sign"](f, g, i):
                    x = -x
                if y and sch["bv_sign"](f, g, i + 1):
                    y = -y
                _encode_pair(w, t, x, y)
            lo = bound
        ct = sch["count1table"](f, g)
        enc = _C1_BOOKS[ct][1]
        for q in range(sch["n_quads"](f, g)):
            bits = [sch["c1_bit"](f, g, q, p) for p in range(4)]
            ln, cd = enc[bits[0] << 3 | bits[1] << 2 | bits[2] << 1 | bits[3]]
            w.write(cd, ln)
            for p, b in enumerate(bits):
                if b:
                    w.write(sch["c1_sign"](q, p), 1)
        grs.append(
            {
                "short": short, "sc": sc, "bv": bv, "r0c": r0c,
                "r1c": r1c, "tabs": tabs, "ct": ct, "bits": w.bits,
                "preflag": sch["preflag"](f, g),
                "sfs": sch["scalefac_scale"](f, g),
                "gg": (doc_id + g) % 256,
                "sbg": [sch["subblock_gain"](g, k) for k in range(3)],
            }
        )
    return grs, scfsi


def _write_granule_record(si: "_BitWriter", gr: dict) -> None:
    """The 59-bit per-granule(-per-channel) side-info record."""
    si.write(len(gr["bits"]), 12)  # part2_3_length
    si.write(gr["bv"], 9)
    si.write(gr["gg"], 8)  # global_gain (unused by decode)
    si.write(gr["sc"], 4)
    si.write(int(gr["short"]), 1)
    if gr["short"]:
        si.write(2, 2)  # block_type = short
        si.write(0, 1)  # not mixed
        for k in range(2):
            si.write(gr["tabs"][k], 5)
        for k in range(3):
            si.write(gr["sbg"][k], 3)
    else:
        for k in range(3):
            si.write(gr["tabs"][k], 5)
        si.write(gr["r0c"], 4)
        si.write(gr["r1c"], 3)
    si.write(gr["preflag"], 1)
    si.write(gr["sfs"], 1)
    si.write(gr["ct"], 1)


def _write_side_info(grs, scfsi: int, md: int) -> "_BitWriter":
    """136-bit mono side-info record for one frame."""
    si = _BitWriter()
    si.write(md, 9)  # main_data_begin
    si.write(0, 5)   # private_bits
    si.write(scfsi, 4)
    for gr in grs:
        _write_granule_record(si, gr)
    assert len(si.bits) == 136
    return si


def _write_side_info_stereo(grs_by_ch, scfsi_by_ch, md: int) -> "_BitWriter":
    """256-bit two-channel side-info record: 3 private bits, scfsi per
    channel, four granule records ordered gr0ch0 gr0ch1 gr1ch0 gr1ch1."""
    si = _BitWriter()
    si.write(md, 9)
    si.write(0, 3)  # private_bits (stereo)
    for scfsi in scfsi_by_ch:
        si.write(scfsi, 4)
    for g in range(2):
        for ch in range(2):
            _write_granule_record(si, grs_by_ch[ch][g])
    assert len(si.bits) == 256
    return si


def encode_mp3_main(doc_id: int, protect: bool = False) -> bytes:
    """Spec-valid mono MPEG-1 Layer III stream with REAL Huffman-coded
    main data: 4-byte header + 17-byte side info + part2 scalefactors +
    part3 big-value/count1 codes per granule, main_data_begin = 0,
    per-frame fitted bitrate, zero ancillary fill.  With protect=True
    the protection_bit is 0 and a real ISO 2.4.3.1 crc_check word
    (over header bits 16-31 + the entire side info) follows the
    header."""
    sch = mp3_main_schedule(doc_id)
    sr_idx = sch["sr_idx"]
    sr = SAMPLE_RATE[sr_idx]
    sfb = SFB_LONG[sr]
    crc_bytes = 2 if protect else 0
    out = bytearray()
    for f in range(sch["n_frames"]):
        grs, scfsi = _build_granules(sch, doc_id, sfb, f)
        si = _write_side_info(grs, scfsi, 0)
        need_bits = sum(len(gr["bits"]) for gr in grs)
        br_idx = next(
            i for i in range(1, 15)
            if (frame_length(i, sr_idx, 0) - 21 - crc_bytes) * 8 >= need_bits
        )
        flen = frame_length(br_idx, sr_idx, 0)
        main = _BitWriter()
        for gr in grs:
            main.bits.extend(gr["bits"])
        hdr = bytearray(_frame_header(br_idx, sr_idx, 0))
        if protect:
            hdr[1] &= ~1  # protection_bit 0: crc_check present
            crc = crc16_protect(
                list(_byte_bits(bytes(hdr[2:4])))
                + list(_byte_bits(si.to_bytes(17)))
            )
            out += bytes(hdr) + bytes((crc >> 8, crc & 0xFF))
        else:
            out += bytes(hdr)
        out += si.to_bytes(17)
        out += main.to_bytes(flen - 21 - crc_bytes)
    return bytes(out)


def mp3_stereo_virtual_docs(doc_id: int) -> tuple[int, int]:
    """Per-channel virtual doc ids for the two-channel fixture:
    v = 6*doc_id + 3*ch + doc_id%3.  Injective over (doc_id, ch) and
    v % 3 == doc_id % 3, so both channels share the mono schedule's
    sample rate and frame count while every OTHER schedule parameter
    (scfsi, window switching, tables, codes, signs) differs per
    channel.  This lets the stereo oracle be the mono schedule replay
    evaluated at v and summed over channels — no new arithmetic to
    trust."""
    base = 6 * doc_id + doc_id % 3
    return base, base + 3


def encode_mp3_stereo(doc_id: int) -> bytes:
    """Spec-valid TWO-CHANNEL MPEG-1 Layer III stream with real
    Huffman-coded main data: 32-byte stereo side info, main data
    interleaved gr0ch0 gr0ch1 gr1ch0 gr1ch1, per-frame fitted bitrate,
    main_data_begin = 0.  Rotates stereo / joint_stereo with
    mode_extension 0 (the layout-identical case; intensity/MS are
    requantized-domain and out of scope) / dual_channel.  Channel ch's
    granule content is mp3_main_schedule(mp3_stereo_virtual_docs(doc)
    [ch]) verbatim."""
    mode = (doc_id // 3) % 3  # header bits: 0 stereo, 1 joint, 2 dual
    vs = mp3_stereo_virtual_docs(doc_id)
    schs = [mp3_main_schedule(v) for v in vs]
    sr_idx = schs[0]["sr_idx"]
    assert schs[1]["sr_idx"] == sr_idx
    sfb = SFB_LONG[SAMPLE_RATE[sr_idx]]
    n_frames = schs[0]["n_frames"]
    assert schs[1]["n_frames"] == n_frames
    b3 = (mode << 6) | 0x04
    out = bytearray()
    for f in range(n_frames):
        grs_by_ch, scfsi_by_ch = [], []
        for ch in range(2):
            grs, scfsi = _build_granules(schs[ch], vs[ch], sfb, f)
            grs_by_ch.append(grs)
            scfsi_by_ch.append(scfsi)
        si = _write_side_info_stereo(grs_by_ch, scfsi_by_ch, 0)
        need_bits = sum(
            len(gr["bits"]) for grs in grs_by_ch for gr in grs
        )
        br_idx = next(
            i for i in range(1, 15)
            if (frame_length(i, sr_idx, 0) - 36) * 8 >= need_bits
        )
        flen = frame_length(br_idx, sr_idx, 0)
        main = _BitWriter()
        for g in range(2):
            for ch in range(2):
                main.bits.extend(grs_by_ch[ch][g]["bits"])
        b0, b1 = 0xFF, 0xE0 | (0b11 << 3) | (0b01 << 1) | 0b1
        b2 = (br_idx << 4) | (sr_idx << 2)
        out += bytes((b0, b1, b2, b3))
        out += si.to_bytes(32)
        out += main.to_bytes(flen - 36)
    return bytes(out)


def mp3_jstereo_schedule(doc_id: int, ch: int) -> dict:
    """Deterministic JOINT-STEREO schedule for channel ch (shared by
    the encoder, the SQL oracle, and the tests), shaped for
    _build_granules.  Deliberately simpler than the mono schedule so
    the requantized-domain stereo math is the thing under test: all
    granules LONG, scfsi 0, scalefac_compress 13 (slen 3/3 — every
    band's scalefactor is 3 bits, so ch1's values double as legal
    is_pos 0..7), preflag 0, no count1 quads.  ch0 carries a wide
    coded region (bv 40-69); ch1 a narrow one (bv 5-14), so intensity
    bands (band lower edge >= ch1's rzero start) always exist.
    mode_extension rotates 1/2/3 per frame (encoder header)."""
    bv = (lambda f, g: 40 + (doc_id + f + g) % 30) if ch == 0 else (
        lambda f, g: 5 + (doc_id + f + g) % 10
    )
    return {
        "sr_idx": doc_id % 3,
        "n_frames": 2 + doc_id % 2,
        "short": lambda f, g: False,
        "scfsi": lambda f: 0,
        "scalefac_compress": lambda f, g: 13,
        "sf_value": lambda f, g, j, sl: (doc_id + ch * 5 + f + 2 * g + j) % 8,
        "big_values": bv,
        "region0": lambda f, g: 2 + (doc_id + f + g) % 6,
        "region1": lambda f, g: 2 + (doc_id + f) % 5,
        "table": lambda f, g, r: _TB[(doc_id + 2 * f + 3 * g + r + ch) % 5],
        "bv_value": lambda f, g, i, m: (doc_id * 11 + ch * 13 + 3 * f + 5 * g + 7 * i)
        % (m + 1),
        "bv_sign": lambda f, g, i: (doc_id + ch + f + g + i) % 2,
        "n_quads": lambda f, g: 0,
        "c1_bit": lambda f, g, q, p: 0,
        "c1_sign": lambda q, p: 0,
        "count1table": lambda f, g: 0,
        "preflag": lambda f, g: 0,
        "scalefac_scale": lambda f, g: (doc_id + f) % 2,
        "subblock_gain": lambda g, k: 0,
    }


def _encode_joint(doc_id: int, schs) -> bytes:
    """Assemble a two-channel joint-stereo stream from per-channel
    schedules: mode_extension ext = 1 + (doc_id + f) % 3 rotates
    intensity-only / MS-only / both per frame; global_gain =
    (2*doc_id + ch + g) % 256 (the gg virtual id)."""
    sr_idx = schs[0]["sr_idx"]
    sfb = SFB_LONG[SAMPLE_RATE[sr_idx]]
    n_frames = schs[0]["n_frames"]
    out = bytearray()
    for f in range(n_frames):
        ext = 1 + (doc_id + f) % 3
        grs_by_ch, scfsi_by_ch = [], []
        for ch in range(2):
            grs, scfsi = _build_granules(schs[ch], 2 * doc_id + ch, sfb, f)
            grs_by_ch.append(grs)
            scfsi_by_ch.append(scfsi)
        si = _write_side_info_stereo(grs_by_ch, scfsi_by_ch, 0)
        need_bits = sum(len(gr["bits"]) for grs in grs_by_ch for gr in grs)
        br_idx = next(
            i for i in range(1, 15)
            if (frame_length(i, sr_idx, 0) - 36) * 8 >= need_bits
        )
        flen = frame_length(br_idx, sr_idx, 0)
        main = _BitWriter()
        for g in range(2):
            for ch in range(2):
                main.bits.extend(grs_by_ch[ch][g]["bits"])
        b0, b1 = 0xFF, 0xE0 | (0b11 << 3) | (0b01 << 1) | 0b1
        b2 = (br_idx << 4) | (sr_idx << 2)
        b3 = (0b01 << 6) | (ext << 4) | 0x04
        out += bytes((b0, b1, b2, b3))
        out += si.to_bytes(32)
        out += main.to_bytes(flen - 36)
    return bytes(out)


def encode_mp3_jstereo(doc_id: int) -> bytes:
    """Spec-valid TWO-CHANNEL joint-stereo MPEG-1 Layer III stream
    whose frames USE mode_extension (long-only granules; channel
    content follows mp3_jstereo_schedule)."""
    return _encode_joint(doc_id, [mp3_jstereo_schedule(doc_id, ch) for ch in range(2)])


def mp3_jstereo_short_schedule(doc_id: int, ch: int) -> dict:
    """Joint-stereo schedule variant with every granule SHORT
    (window-switching, block_type 2) — exercises the per-window
    intensity semantics.  Same simplifications as the long schedule
    (scalefac_compress 13 so the 36 short scalefactors are 3 bits each
    and ch1's double as legal per-(band, window) is_pos; no count1);
    subblock gains rotate so the requantized window gains differ.
    ch0 carries a wide coded region (bv 30-54, past the 36-line
    region-0 split), ch1 a narrow one (bv 4-12), so whole-window
    intensity regions always exist."""
    bv = (lambda f, g: 30 + (doc_id + f + g) % 25) if ch == 0 else (
        lambda f, g: 4 + (doc_id + f + g) % 9
    )
    return {
        "sr_idx": doc_id % 3,
        "n_frames": 2 + doc_id % 2,
        "short": lambda f, g: True,
        "scfsi": lambda f: 0,
        "scalefac_compress": lambda f, g: 13,
        "sf_value": lambda f, g, j, sl: (doc_id + ch * 5 + f + 2 * g + j) % 8,
        "big_values": bv,
        "region0": lambda f, g: 0,
        "region1": lambda f, g: 0,
        "table": lambda f, g, r: _TB[(doc_id + 2 * f + 3 * g + r + ch) % 5],
        "bv_value": lambda f, g, i, m: (doc_id * 11 + ch * 13 + 3 * f + 5 * g + 7 * i)
        % (m + 1),
        "bv_sign": lambda f, g, i: (doc_id + ch + f + g + i) % 2,
        "n_quads": lambda f, g: 0,
        "c1_bit": lambda f, g, q, p: 0,
        "c1_sign": lambda q, p: 0,
        "count1table": lambda f, g: 0,
        "preflag": lambda f, g: 0,
        "scalefac_scale": lambda f, g: (doc_id + f) % 2,
        "subblock_gain": lambda g, k: (doc_id + ch + g + k) % 8,
    }


def encode_mp3_jstereo_short(doc_id: int) -> bytes:
    """Joint-stereo stream whose granules are all SHORT — the
    per-window intensity fixture (mp3_jstereo_short_schedule)."""
    return _encode_joint(
        doc_id, [mp3_jstereo_short_schedule(doc_id, ch) for ch in range(2)]
    )


def encode_mp3_reservoir(doc_id: int) -> bytes:
    """Spec-valid mono Layer III stream whose main data USES the bit
    reservoir (ISO 11172-3 2.4.1.7 main_data_begin): granule bits are
    laid out in one continuous virtual main-data stream, byte-aligned
    per frame, while the PHYSICAL frame sizes are deliberately pumped
    (frame 0 always, then every (doc_id+f)%2==0 frame takes one
    bitrate step above the minimal fit) so later frames' main data
    starts back inside earlier frames' areas — main_data_begin > 0.

    Granule CONTENT is mp3_main_schedule(doc_id) verbatim, shared with
    encode_mp3_main: decoding this stream must yield byte-for-byte the
    same spectral values as the contiguous framing, which is what the
    multimodal_mp3_reservoir_decode oracle (the same schedule replay)
    hash-pins.  Stuffing rules are the spec's: pad-to-byte after each
    frame's granule bits (main_data_begin counts BYTES), ancillary
    zeros fill unused reservoir space, and when slack would exceed the
    9-bit field's 511-byte reach the virtual stream is advanced with
    stuffing bytes (exactly what a real encoder does when it cannot
    address that far back)."""
    sch = mp3_main_schedule(doc_id)
    sr_idx = sch["sr_idx"]
    sr = SAMPLE_RATE[sr_idx]
    sfb = SFB_LONG[sr]
    vbits: list[int] = []   # virtual main-data stream
    area_end = 0            # physical main-data bytes emitted so far
    frames = []             # (br_idx, side-info writer)
    for f in range(sch["n_frames"]):
        grs, scfsi = _build_granules(sch, doc_id, sfb, f)
        # frame's main data starts at the current byte-aligned virtual
        # position; clamp the back-reach to the field's 511-byte max
        if area_end - len(vbits) // 8 > 511:
            vbits.extend([0] * ((area_end - 511) * 8 - len(vbits)))
        w_start = len(vbits) // 8
        md = area_end - w_start
        assert 0 <= md <= 511
        for gr in grs:
            vbits.extend(gr["bits"])
        if len(vbits) % 8:
            vbits.extend([0] * (8 - len(vbits) % 8))  # pad to byte
        need_end = len(vbits) // 8
        fits = [
            i for i in range(1, 15)
            if area_end + frame_length(i, sr_idx, 0) - 21 >= need_end
        ]
        br_idx = fits[0]
        if (f == 0 or (doc_id + f) % 2 == 0) and br_idx < 14:
            br_idx += 1  # pump the reservoir
        area_end += frame_length(br_idx, sr_idx, 0) - 21
        frames.append((br_idx, _write_side_info(grs, scfsi, md)))
    # physical layout: slice the zero-padded virtual stream into areas
    vw = _BitWriter()
    vw.bits = vbits
    vstream = vw.to_bytes(area_end)
    out = bytearray()
    off = 0
    for br_idx, si in frames:
        flen = frame_length(br_idx, sr_idx, 0)
        out += _frame_header(br_idx, sr_idx, 0)
        out += si.to_bytes(17)
        out += vstream[off : off + flen - 21]
        off += flen - 21
    return bytes(out)


def decode_mp3_main(data: bytes) -> dict:
    """Decode the main data of a mono MPEG-1 Layer III stream: side
    info, slen-coded scalefactors with scfsi sharing, region-
    partitioned big-value Huffman decode, count1 quadruples (both
    tables) with the standard rewind-on-partial-quad stuffing
    tolerance, and per-granule stuffing skip to the part2_3 boundary.
    Single_channel-only entry point; decode_mp3_main_general accepts
    two-channel streams.

    General over any conformant mono stream within the stated boundary
    (bundled codebooks), INCLUDING bit-reservoir streams: main data is
    reassembled from the last <=511 bytes of prior frames' main-data
    areas per main_data_begin, with underruns rejected loudly.  Returns integer
    aggregates (what the SQL oracle replays) plus per-granule records
    for the tests."""
    return _decode_mp3_main(data, require_mono=True)


def decode_mp3_main_general(data: bytes) -> dict:
    """Decode mono OR two-channel Layer III main data.  Stereo (00),
    dual_channel (10), and joint_stereo (01) with mode_extension 0
    (intensity and MS matrixing OFF — the layout-identical-to-stereo
    case) are accepted; intensity/MS joint stereo is requantized-
    domain waveform math and stays on the documented boundary with
    IMDCT.  The stereo side-info record is 32 bytes (3 private bits,
    scfsi per channel, four 59-bit granule records ordered
    gr0ch0 gr0ch1 gr1ch0 gr1ch1 — the same order the main data
    interleaves scalefactor+Huffman blocks).  Aggregates sum over
    channels; every entity in Layer III is transmitted per channel,
    so there is no shared-sample subtlety.  Granule records carry a
    'ch' field."""
    return _decode_mp3_main(data, require_mono=False)


def decode_mp3_main_joint(data: bytes) -> dict:
    """General Layer III symbol decode that also ACCEPTS joint-stereo
    mode_extension != 0 (intensity and/or MS): each granule record is
    stamped with the frame's mode_ext so the requantized-domain stereo
    processing (operators/mp3stereo.py) can apply it downstream."""
    return _decode_mp3_main(data, require_mono=False, allow_joint=True)


def _decode_mp3_main(data: bytes, require_mono: bool, allow_joint: bool = False) -> dict:
    pos = 0
    n_frames = 0
    sr = None
    tail = bytearray()  # last <=511 bytes of prior main-data areas
    agg = {
        "n_long": 0, "n_short": 0, "n_sf_transmitted": 0,
        "sum_scalefac": 0, "sum_part2_bits": 0, "n_bv_pairs": 0,
        "n_c1_quads": 0, "sum_abs_is": 0, "sum_is": 0, "n_nonzero": 0,
        "rzero_total": 0,
    }
    granules: list[dict] = []
    nch = None
    while pos < len(data):
        if pos + 21 > len(data):
            raise ValueError("corrupt mp3 stream: truncated frame")
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"corrupt mp3 stream: lost sync at byte {pos}")
        if (b1 >> 3) & 0b11 != 0b11:
            raise ValueError("unsupported mp3 stream: not MPEG-1")
        if (b1 >> 1) & 0b11 != 0b01:
            raise ValueError("unsupported mp3 stream: not Layer III")
        br_idx = b2 >> 4
        sr_idx = (b2 >> 2) & 0b11
        pad = (b2 >> 1) & 1
        if br_idx in (0, 15):
            raise ValueError(f"unsupported mp3 stream: bitrate index {br_idx}")
        if sr_idx == 3:
            raise ValueError("corrupt mp3 stream: reserved sample-rate index")
        mode = b3 >> 6  # 00 stereo, 01 joint, 10 dual, 11 single
        if require_mono and mode != 0b11:
            raise ValueError("unsupported mp3 stream: not single-channel")
        mode_ext = (b3 >> 4) & 0b11
        if mode != 0b01:
            mode_ext = 0
        if mode_ext != 0 and not allow_joint:
            raise ValueError(
                "unsupported mp3 stream: intensity/MS joint stereo "
                "(mode_extension != 0) is requantized-domain processing, "
                "out of symbol-decode scope here — decode via "
                "decode_mp3_main_joint + operators/mp3stereo.py"
            )
        if nch is None:
            nch = 1 if mode == 0b11 else 2
        elif nch != (1 if mode == 0b11 else 2):
            raise ValueError("unsupported mp3 stream: mid-stream mode switch")
        si_len = 17 if nch == 1 else 32
        protected = not (b1 & 1)  # protection_bit 0 => crc_check present
        crc_len = 2 if protected else 0
        if pos + 4 + crc_len + si_len > len(data):
            raise ValueError("corrupt mp3 stream: truncated frame")
        if sr is None:
            sr = SAMPLE_RATE[sr_idx]
        elif sr != SAMPLE_RATE[sr_idx]:
            raise ValueError("unsupported mp3 stream: mid-stream rate switch")
        sfb = SFB_LONG[sr]
        flen = frame_length(br_idx, sr_idx, pad)
        if pos + flen > len(data):
            raise ValueError(f"corrupt mp3 stream: frame at {pos} runs past EOF")
        si_off = pos + 4 + crc_len
        if protected:
            # ISO 2.4.3.1: Layer III protects header bits 16-31 + the
            # ENTIRE side-information record
            crc_word = data[pos + 4] << 8 | data[pos + 5]
            want = crc16_protect(
                list(_byte_bits(data[pos + 2 : pos + 4]))
                + list(_byte_bits(data[si_off : si_off + si_len]))
            )
            if crc_word != want:
                raise ValueError(
                    "corrupt mp3 stream: crc_check mismatch "
                    f"(got {crc_word:#06x}, computed {want:#06x})"
                )
        si = _BitReader(data[si_off : si_off + si_len])
        md = si.read(9)
        if md > len(tail):
            raise ValueError(
                "corrupt mp3 stream: bit-reservoir underrun "
                f"(main_data_begin {md} > {len(tail)} reservoir bytes)"
            )
        si.read(5 if nch == 1 else 3)  # private_bits
        scfsi_ch = [si.read(4) for _ in range(nch)]
        side = []
        for _g in range(2 * nch):  # gr0ch0 [gr0ch1] gr1ch0 [gr1ch1]
            rec = {
                "part23": si.read(12), "bv": si.read(9),
                "global_gain": si.read(8), "sc": si.read(4),
            }
            if rec["bv"] > 288:
                raise ValueError("corrupt mp3 stream: big_values > 288")
            if si.read(1):  # window switching
                bt = si.read(2)
                if bt == 0:
                    raise ValueError(
                        "corrupt mp3 stream: block_type 0 with window switching"
                    )
                mixed = si.read(1)
                if bt != 2 or mixed:
                    raise ValueError(
                        "unsupported mp3 stream: only pure short (block_type 2, "
                        "not mixed) switching granules are implemented"
                    )
                rec["short"] = True
                rec["tabs"] = [si.read(5) for _ in range(2)]
                rec["subblock_gain"] = [si.read(3) for _ in range(3)]
            else:
                rec["short"] = False
                rec["tabs"] = [si.read(5) for _ in range(3)]
                rec["r0c"] = si.read(4)
                rec["r1c"] = si.read(3)
                if rec["r0c"] + rec["r1c"] + 2 > len(sfb) - 1:
                    raise ValueError("corrupt mp3 stream: region counts exceed bands")
            rec["preflag"] = si.read(1)
            rec["scalefac_scale"] = si.read(1)
            rec["ct"] = si.read(1)
            side.append(rec)
        for ch in range(nch):
            if scfsi_ch[ch] and (
                side[ch]["short"] or side[nch + ch]["short"]
            ):
                raise ValueError(
                    "corrupt mp3 stream: scfsi with a short granule"
                )
        if sum(rec["part23"] for rec in side) > (
            md + flen - 4 - crc_len - si_len
        ) * 8:
            raise ValueError(
                "corrupt mp3 stream: part2_3 lengths exceed available main data"
            )
        area = data[si_off + si_len : pos + flen]
        # bit-reservoir reassembly: this frame's main data starts md
        # bytes back inside the previous frames' main-data areas
        r = _BitReader((bytes(tail[len(tail) - md :]) + area) if md else area)
        tail = (tail + bytearray(area))[-511:]
        for i, rec in enumerate(side):
            g, ch = i // nch, i % nch
            scfsi = scfsi_ch[ch]
            start = r.pos
            s1, s2 = SLEN1[rec["sc"]], SLEN2[rec["sc"]]
            slots = _sf_slots(rec["short"], g, scfsi, s1, s2)
            sfv = [r.read(sl) if sl else 0 for sl in slots]
            part2 = sum(slots)
            if part2 > rec["part23"]:
                raise ValueError("corrupt mp3 stream: part2 exceeds part2_3_length")
            agg["n_sf_transmitted"] += len(slots)
            agg["sum_scalefac"] += sum(sfv)
            agg["sum_part2_bits"] += part2
            bv2 = 2 * rec["bv"]
            if bv2 > 576:
                raise ValueError("corrupt mp3 stream: big values exceed 576 samples")
            bounds = _granule_bounds(
                rec["short"], bv2, sfb, rec.get("r0c", 0), rec.get("r1c", 0)
            )
            values: list[int] = []
            lo = 0
            for bound, t in zip(bounds, rec["tabs"][: len(bounds)]):
                for _i in range(lo, bound, 2):
                    x, y = _decode_pair(r, t)
                    values.extend((x, y))
                lo = bound
            if r.pos - start > rec["part23"]:
                raise ValueError("corrupt mp3 stream: big values overran part2_3")
            agg["n_bv_pairs"] += rec["bv"]
            # count1: quads until the granule bit budget is exhausted or
            # 576 samples are reached; a partial quad at the boundary is
            # stuffing (standard tolerance: rewind and stop)
            nq = 0
            idx = bv2
            ct_book = _C1_BOOKS[rec["ct"]][0]
            while r.pos - start < rec["part23"] and idx <= 572:
                mark = r.pos
                try:
                    sym = _read_code(r, ct_book, 6)
                    quad = [(sym >> 3) & 1, (sym >> 2) & 1, (sym >> 1) & 1, sym & 1]
                    for p in range(4):
                        if quad[p] and r.read(1):
                            quad[p] = -quad[p]
                except ValueError:
                    r.pos = mark
                    break
                if r.pos - start > rec["part23"]:
                    r.pos = mark
                    break
                values.extend(quad)
                nq += 1
                idx += 4
            agg["n_c1_quads"] += nq
            agg["sum_abs_is"] += sum(abs(v) for v in values)
            agg["sum_is"] += sum(values)
            agg["n_nonzero"] += sum(1 for v in values if v)
            agg["rzero_total"] += 576 - idx
            if rec["short"]:
                agg["n_short"] += 1
            else:
                agg["n_long"] += 1
            # skip stuffing to the declared granule boundary
            r.pos = start + rec["part23"]
            granules.append(
                {
                    "frame": n_frames, "granule": g, "ch": ch,
                    "short": rec["short"],
                    "scalefacs": sfv, "values": values, "n_quads": nq,
                    "big_values": rec["bv"], "tabs": rec["tabs"],
                    "ct": rec["ct"],
                    # requantization inputs (operators/mp3requant.py)
                    "global_gain": rec["global_gain"],
                    "preflag": rec["preflag"],
                    "scalefac_scale": rec["scalefac_scale"],
                    "subblock_gain": rec.get("subblock_gain"),
                    "scfsi": scfsi,
                    "mode_ext": mode_ext,
                }
            )
        n_frames += 1
        pos += flen
    if n_frames == 0:
        raise ValueError("corrupt mp3 stream: no frames")
    return {
        "n_frames": n_frames, "sample_rate": sr,
        "nch": nch, "granules": granules, **agg,
    }
