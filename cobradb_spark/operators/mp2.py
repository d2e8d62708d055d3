"""MPEG-1 Audio Layer II (ISO/IEC 11172-3) subband codec — pure
NumPy/stdlib, no codec library.

Layer II is Layer I's subband structure with three refinements, all
implementable exactly from the published spec (no Huffman, no MDCT):

  * per-subband allocation comes from the published bit-allocation
    tables B.2a (sblimit 27) / B.2b (sblimit 30), selected by
    (sample rate, per-channel bitrate), with REGION-dependent
    allocation-field widths (4/4/3/2 bits);
  * the small quantizers GROUP three consecutive samples into one
    code word (3 levels -> 5 bits, 5 -> 7, 9 -> 10; v0 + L*v1 + L^2*v2);
  * scalefactors are shared across the frame's three 12-sample parts
    under a 2-bit scfsi selector (0: three factors, 1: parts 0,1
    share, 2: one factor, 3: parts 1,2 share).

Requantization is the spec's s'' = C*(s''' + D) with the Table B.4
constants, which reduces to ONE exact rational for every quantizer
(grouped and ungrouped): for L levels and per-sample code v,

    sample = sf * (2*v + 1 - L) / L        (sf = 2 * 2^(-idx/3))

(for ungrouped L = 2^nb - 1 this is Layer I's (2c + 2 - 2^nb)/(2^nb-1);
for grouped L in {3,5,9} it is (2^nb/L)*(v/2^(nb-1) - 1 + 1/2) — both
verified symmetric and matching Table B.4's C/D columns).

All four published allocation tables are implemented: B.2a (sblimit
27) / B.2b (sblimit 30) for 56-192 kbps, and the low-rate B.2c
(sblimit 8) / B.2d (sblimit 12) for 32/48 kbps — the low-rate tables
share one quantizer row (3,5,9,15,...,32767 — no 7-level class) over
an nbal-4 region (sb 0-1) and an nbal-3 region (sb 2+), with B.2d
selected at 32 kHz and B.2c at 44.1/48 kHz.  All four channel modes
decode (decode_layer2_general): stereo, joint_stereo with the
intensity bound at 4 + 4*mode_extension (shared triplets, per-channel
scalefactors), dual_channel, and single_channel; table selection keys
on the per-channel bitrate.  The honest remaining boundary is the
polyphase synthesis window to PCM.  Everything through exact
requantization is real and general over conformant streams at
32-192 kbps/channel.
"""

from __future__ import annotations

import numpy as np

from cobradb_spark.operators.mp3 import (
    SAMPLE_RATE,
    SCALEFACTOR,
    SF_FP,
    _BitReader,
    _BitWriter,
    _byte_bits,
    crc16_protect,
)

# Layer II bitrate table (header index 1..14), kbps.
LAYER2_BITRATE_KBPS = [
    0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 0,
]

# Bit-allocation tables B.2a / B.2b: per REGION, (first_sb, nbal,
# allocation-index -> levels).  B.2b extends B.2a's last region from
# subband 26 to 29; the shared regions are identical in the spec.
_REGION_LEVELS_40 = [  # sb 0-2, nbal=4
    3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383, 32767, 65535,
]
_REGION_LEVELS_41 = [  # sb 3-10, nbal=4
    3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 65535,
]
_REGION_LEVELS_3 = [3, 5, 7, 9, 15, 31, 65535]  # sb 11-22, nbal=3
_REGION_LEVELS_2 = [3, 5, 65535]  # sb 23+, nbal=2

# Low-rate tables B.2c/B.2d share ONE quantizer row (ISO 11172-3: the
# 3,5,9,15,... sequence with no 7-level class) across both regions;
# the nbal-3 region simply truncates it to 7 entries.
_REGION_LEVELS_LOWRATE = [
    3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383, 32767,
]

# grouped quantizers: levels -> code-word bits (3 samples per code)
GROUP_BITS = {3: 5, 5: 7, 9: 10}


def layer2_sblimit(sr_idx: int, kbps: int) -> int:
    """Allocation-table selection from the published mapping (mono, so
    per-channel bitrate == stream bitrate): 32/48 kbps use the
    low-rate tables (B.2d at 32 kHz, B.2c at 44.1/48 kHz); otherwise
    48 kHz always uses B.2a, and 44.1/32 kHz use B.2a up to 80 kbps
    and B.2b from 96 kbps.  The returned sblimit doubles as the table
    id (8=B.2c, 12=B.2d, 27=B.2a, 30=B.2b)."""
    if kbps in (32, 48):
        # low-rate tables: B.2d (sblimit 12) at 32 kHz, else B.2c (8)
        return 12 if sr_idx == 2 else 8
    if sr_idx == 1 or kbps <= 80:  # 48 kHz, or low bitrate at 44.1/32
        return 27
    return 30


def layer2_nbal(sb: int, sblimit: int = 27) -> int:
    if sblimit <= 12:  # B.2c/B.2d: nbal 4 for sb 0-1, 3 above
        return 4 if sb < 2 else 3
    if sb < 3:
        return 4
    if sb < 11:
        return 4
    if sb < 23:
        return 3
    return 2


def layer2_levels(sb: int, alloc: int, sblimit: int = 27) -> int:
    """allocation index (>=1) -> quantizer levels for subband sb."""
    if sblimit <= 12:  # B.2c/B.2d: one shared row, both regions
        return _REGION_LEVELS_LOWRATE[alloc - 1]
    if sb < 3:
        table = _REGION_LEVELS_40
    elif sb < 11:
        table = _REGION_LEVELS_41
    elif sb < 23:
        table = _REGION_LEVELS_3
    else:
        table = _REGION_LEVELS_2
    return table[alloc - 1]


def layer2_frame_bytes(bitrate_idx: int, sr_idx: int, pad: int) -> int:
    """Layer II frame length in bytes (slots are 1 byte, unlike
    Layer I's 4): floor(144 * bitrate / samplerate) + pad."""
    return 144000 * LAYER2_BITRATE_KBPS[bitrate_idx] // SAMPLE_RATE[sr_idx] + pad


def _layer2_header(bitrate_idx: int, sr_idx: int, pad: int) -> bytes:
    """4-byte MPEG-1 Layer II header: sync=0x7FF, version=11, layer=10
    (Layer II), no CRC, mono, original."""
    b0 = 0xFF
    b1 = 0xE0 | (0b11 << 3) | (0b10 << 1) | 0b1
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (pad << 1)
    b3 = 0xC4
    return bytes((b0, b1, b2, b3))


def layer2_schedule(doc_id: int) -> dict:
    """Deterministic per-document synthesis schedule, shared by the
    encoder, the SQL oracle, and the tests.  Mono; sr rotates the three
    MPEG-1 rates; table B.2b on odd docs at 44.1/32 kHz (48 kHz cannot
    use B.2b); n_frames = 2 + id%3.  Allocated subbands span all three
    nbal regions: the first n_low = 2+id%3 subbands, n_mid = 1+id%3
    from sb 11, n_hi = id%3 from sb 23 — exercising the grouped 3/5/9
    quantizers, the ungrouped 7/15/31, and all four allocation-field
    widths.  scfsi = (id+sb)%4 covers all four sharing modes;
    scalefactor indices are multiples of 3 (dyadic sf) so float subband
    samples are exact rationals in the tests."""
    use_b = (doc_id % 2 == 1) and (doc_id % 3 != 1)
    n_low, n_mid, n_hi = 2 + doc_id % 3, 1 + doc_id % 3, doc_id % 3
    alloc_sbs = (
        list(range(n_low))
        + list(range(11, 11 + n_mid))
        + list(range(23, 23 + n_hi))
    )

    def alloc_idx(sb: int) -> int:
        return 1 + (doc_id + sb) % (2 if sb >= 23 else 4)

    return {
        "sr_idx": doc_id % 3,
        "use_b": use_b,
        "sblimit": 30 if use_b else 27,
        "n_frames": 2 + doc_id % 3,
        "alloc_sbs": alloc_sbs,
        "alloc_idx": alloc_idx,
        "levels": lambda sb: layer2_levels(sb, alloc_idx(sb)),
        "scfsi": lambda sb: (doc_id + sb) % 4,
        "sf_t": lambda sb, j: 3 * ((doc_id + sb + 7 * j) % 21),
        "code": lambda f, sb, gr, k, L: (
            doc_id * 11 + f * 7 + sb * 5 + gr * 3 + k
        )
        % L,
    }


def _transmitted_sf(scfsi: int, t0: int, t1: int, t2: int) -> list[int]:
    """Scalefactors actually written to the stream per scfsi mode."""
    if scfsi == 0:
        return [t0, t1, t2]
    if scfsi == 2:
        return [t0]
    return [t0, t1]  # modes 1 and 3 transmit two


def _applied_sf(scfsi: int, t0: int, t1: int, t2: int) -> list[int]:
    """Scalefactor index applied to each of the frame's 3 parts."""
    if scfsi == 0:
        return [t0, t1, t2]
    if scfsi == 1:
        return [t0, t0, t1]
    if scfsi == 2:
        return [t0, t0, t0]
    return [t0, t1, t1]


def _write_triplet(w: "_BitWriter", lv: int, v: list[int]) -> None:
    """Write one 3-sample code: grouped word for L in {3,5,9}, else
    three nb-bit codes (L = 2^nb - 1)."""
    if lv in GROUP_BITS:
        w.write(v[0] + lv * v[1] + lv * lv * v[2], GROUP_BITS[lv])
    else:
        nb = lv.bit_length()
        for k in range(3):
            w.write(v[k], nb)


def encode_layer2(doc_id: int, protect: bool = False) -> bytes:
    """Spec-valid mono MPEG-1 Layer II stream for one document.  The
    bitrate index is fitted per frame as the smallest table entry that
    (a) holds the payload and (b) keeps the decoder's table derivation
    on the schedule's B.2a/B.2b choice (B.2a at 44.1/32 kHz caps at
    80 kbps; B.2b starts at 96); fill bits are zero (spec ancillary
    data)."""
    sch = layer2_schedule(doc_id)
    sr_idx, sblimit = sch["sr_idx"], sch["sblimit"]
    alloc_sbs = sch["alloc_sbs"]
    # ISO 11172-3 2.4.2.3: single_channel Layer II forbids 224-384 kbps
    # (those rates are stereo-mode-only), so every admissible set caps
    # at 192 kbps for this mono encoder (r9 ADVICE).
    if sch["use_b"]:
        admissible = [
            i for i in range(1, 15) if 96 <= LAYER2_BITRATE_KBPS[i] <= 192
        ]
    elif sr_idx == 1:  # 48 kHz: B.2a at any mono-admissible rate
        admissible = [
            i for i in range(1, 15) if 56 <= LAYER2_BITRATE_KBPS[i] <= 192
        ]
    else:  # B.2a at 44.1/32 kHz: must stay <= 80 kbps
        admissible = [
            i for i in range(1, 15) if 56 <= LAYER2_BITRATE_KBPS[i] <= 80
        ]
    out = bytearray()
    for f in range(sch["n_frames"]):
        w = _BitWriter()
        for sb in range(sblimit):
            w.write(sch["alloc_idx"](sb) if sb in alloc_sbs else 0, layer2_nbal(sb))
        for sb in alloc_sbs:
            w.write(sch["scfsi"](sb), 2)
        prot_len = len(w.bits)
        for sb in alloc_sbs:
            t = [sch["sf_t"](sb, j) for j in range(3)]
            for idx in _transmitted_sf(sch["scfsi"](sb), *t):
                w.write(idx, 6)
        for gr in range(12):
            for sb in alloc_sbs:
                lv = sch["levels"](sb)
                _write_triplet(w, lv, [sch["code"](f, sb, gr, k, lv) for k in range(3)])
        crc_bytes = 2 if protect else 0
        need_bytes = 4 + crc_bytes + (len(w.bits) + 7) // 8
        br_idx = next(
            i
            for i in admissible
            if layer2_frame_bytes(i, sr_idx, 0) >= need_bytes
        )
        nbytes = layer2_frame_bytes(br_idx, sr_idx, 0)
        hdr = bytearray(_layer2_header(br_idx, sr_idx, 0))
        if protect:
            hdr[1] &= ~1  # protection_bit 0: crc_check present
            crc = crc16_protect(
                list(_byte_bits(bytes(hdr[2:4]))) + w.bits[:prot_len]
            )
            out += bytes(hdr) + bytes((crc >> 8, crc & 0xFF))
        else:
            out += bytes(hdr)
        out += w.to_bytes(nbytes - 4 - crc_bytes)
    return bytes(out)


def layer2_lowrate_schedule(doc_id: int) -> dict:
    """Deterministic low-rate (B.2c/B.2d) synthesis schedule, shared by
    the encoder, the SQL oracle, and the tests.  Mono; sr rotates the
    three MPEG-1 rates, which forces BOTH low-rate tables (B.2d at
    32 kHz, B.2c at 44.1/48 kHz).  Three allocated subbands span both
    allocation regions: one of sb {0,1} (nbal 4, quantizers up to
    16383 so the worst-case payload still fits a 48 kbps frame at
    48 kHz) and two from the nbal-3 region including the top subband
    (the table-truncation edge).  The shared low-rate quantizer row has
    no 7-level class — a decode against B.2a's row would mis-parse
    every frame, which is exactly what the hash pins."""
    sr_idx = doc_id % 3
    sblimit = 12 if sr_idx == 2 else 8
    alloc_sbs = [doc_id % 2, 2 + doc_id % (sblimit - 3), sblimit - 1]

    def alloc_idx(sb: int) -> int:
        return 1 + (doc_id + sb) % (14 if sb < 2 else 7)

    return {
        "sr_idx": sr_idx,
        "sblimit": sblimit,
        "n_frames": 2 + doc_id % 3,
        "alloc_sbs": alloc_sbs,
        "alloc_idx": alloc_idx,
        "levels": lambda sb: layer2_levels(sb, alloc_idx(sb), sblimit),
        "scfsi": lambda sb: (doc_id + sb) % 4,
        "sf_t": lambda sb, j: 3 * ((doc_id + sb + 7 * j) % 21),
        "code": lambda f, sb, gr, k, L: (
            doc_id * 11 + f * 7 + sb * 5 + gr * 3 + k
        )
        % L,
    }


def encode_layer2_lowrate(doc_id: int) -> bytes:
    """Spec-valid mono low-rate MPEG-1 Layer II stream (32/48 kbps, so
    the decoder's table derivation lands on B.2c/B.2d).  Same bitstream
    layout as encode_layer2 — only the allocation tables differ."""
    sch = layer2_lowrate_schedule(doc_id)
    sr_idx, sblimit = sch["sr_idx"], sch["sblimit"]
    alloc_sbs = sch["alloc_sbs"]
    admissible = [1, 2]  # 32, 48 kbps: the low-rate table domain
    out = bytearray()
    for f in range(sch["n_frames"]):
        w = _BitWriter()
        for sb in range(sblimit):
            w.write(
                sch["alloc_idx"](sb) if sb in alloc_sbs else 0,
                layer2_nbal(sb, sblimit),
            )
        for sb in alloc_sbs:
            w.write(sch["scfsi"](sb), 2)
        for sb in alloc_sbs:
            t = [sch["sf_t"](sb, j) for j in range(3)]
            for idx in _transmitted_sf(sch["scfsi"](sb), *t):
                w.write(idx, 6)
        for gr in range(12):
            for sb in alloc_sbs:
                lv = sch["levels"](sb)
                _write_triplet(w, lv, [sch["code"](f, sb, gr, k, lv) for k in range(3)])
        need_bytes = 4 + (len(w.bits) + 7) // 8
        br_idx = next(
            i
            for i in admissible
            if layer2_frame_bytes(i, sr_idx, 0) >= need_bytes
        )
        nbytes = layer2_frame_bytes(br_idx, sr_idx, 0)
        out += _layer2_header(br_idx, sr_idx, 0)
        out += w.to_bytes(nbytes - 4)
    return bytes(out)


def layer2_stereo_schedule(doc_id: int) -> dict:
    """Deterministic two-channel synthesis schedule (shared by the
    encoder, the SQL oracle, and the tests).  Rotates all three
    non-mono modes — stereo (00), joint_stereo (01) with intensity
    bound 4 + 4*((doc_id+1)%4), dual_channel (10) — and all three
    sample rates; B.2b on odd docs away from 48 kHz.  Below the bound
    the two channels carry DIFFERENT allocations, scalefactors, and
    codes (the +3*ch / +2*ch / +13*ch terms); at and above the bound
    the shared fields drop the ch term, matching the one-triplet
    intensity transmission."""
    sr_idx = doc_id % 3
    mode = (doc_id // 3) % 3  # header bits: 0 stereo, 1 joint, 2 dual
    use_b = (doc_id % 2 == 1) and sr_idx != 1
    sblimit = 30 if use_b else 27
    bound = min(4 + 4 * ((doc_id + 1) % 4), sblimit) if mode == 1 else sblimit
    n_low, n_mid, n_hi = 2 + doc_id % 3, 1 + doc_id % 3, doc_id % 3
    alloc_sbs = (
        list(range(n_low))
        + list(range(11, 11 + n_mid))
        + list(range(23, 23 + n_hi))
    )

    def alloc_idx(ch: int, sb: int) -> int:
        c = ch if sb < bound else 0
        return 1 + (doc_id + sb + 3 * c) % (2 if sb >= 23 else 4)

    return {
        "sr_idx": sr_idx,
        "mode": mode,
        "mode_ext": (doc_id + 1) % 4 if mode == 1 else 0,
        "use_b": use_b,
        "sblimit": sblimit,
        "bound": bound,
        "n_frames": 2 + doc_id % 3,
        "alloc_sbs": alloc_sbs,
        "alloc_idx": alloc_idx,
        "levels": lambda ch, sb: layer2_levels(sb, alloc_idx(ch, sb), sblimit),
        "scfsi": lambda ch, sb: (doc_id + sb + ch) % 4,
        "sf_t": lambda ch, sb, j: 3 * ((doc_id + sb + 7 * j + 2 * ch) % 21),
        "code": lambda f, ch, sb, gr, k, L: (
            doc_id * 11
            + f * 7
            + sb * 5
            + gr * 3
            + k
            + 13 * (ch if sb < bound else 0)
        )
        % L,
    }


def encode_layer2_stereo(doc_id: int) -> bytes:
    """Spec-valid TWO-CHANNEL MPEG-1 Layer II stream for one document
    (layer2_stereo_schedule): per-channel allocation below the bound,
    one shared allocation + sample triplet at/above it (joint stereo),
    per-channel scfsi/scalefactors everywhere, per-frame fitted TOTAL
    bitrate with table selection on the per-channel rate."""
    sch = layer2_stereo_schedule(doc_id)
    sr_idx, sblimit, bound = sch["sr_idx"], sch["sblimit"], sch["bound"]
    alloc_sbs = sch["alloc_sbs"]
    # admissible TOTAL bitrates: none of the single-channel-only rates
    # (32/48/56/80); per-channel = total/2 must keep the schedule's
    # B.2a/B.2b choice (B.2b needs >=96 per channel; B.2a <=80)
    if sch["use_b"]:
        admissible = [
            i for i in range(1, 15)
            if 192 <= LAYER2_BITRATE_KBPS[i] <= 384
        ]
    else:
        admissible = [
            i for i in range(1, 15)
            if 112 <= LAYER2_BITRATE_KBPS[i] <= 160
        ]
    b3 = (sch["mode"] << 6) | (sch["mode_ext"] << 4) | 0x04
    out = bytearray()
    for f in range(sch["n_frames"]):
        w = _BitWriter()
        for sb in range(bound):
            for ch in range(2):
                w.write(
                    sch["alloc_idx"](ch, sb) if sb in alloc_sbs else 0,
                    layer2_nbal(sb, sblimit),
                )
        for sb in range(bound, sblimit):
            w.write(
                sch["alloc_idx"](0, sb) if sb in alloc_sbs else 0,
                layer2_nbal(sb, sblimit),
            )
        for sb in range(sblimit):
            for ch in range(2):
                if sb in alloc_sbs:
                    w.write(sch["scfsi"](ch, sb), 2)
        for sb in range(sblimit):
            for ch in range(2):
                if sb in alloc_sbs:
                    t = [sch["sf_t"](ch, sb, j) for j in range(3)]
                    for idx in _transmitted_sf(sch["scfsi"](ch, sb), *t):
                        w.write(idx, 6)

        def write_triplet(ch, sb, gr):
            lv = sch["levels"](ch, sb)
            _write_triplet(w, lv, [sch["code"](f, ch, sb, gr, k, lv) for k in range(3)])

        for gr in range(12):
            for sb in alloc_sbs:
                if sb < bound:
                    for ch in range(2):
                        write_triplet(ch, sb, gr)
                else:
                    write_triplet(0, sb, gr)
        need_bytes = 4 + (len(w.bits) + 7) // 8
        br_idx = next(
            i for i in admissible
            if layer2_frame_bytes(i, sr_idx, 0) >= need_bytes
        )
        nbytes = layer2_frame_bytes(br_idx, sr_idx, 0)
        b0 = 0xFF
        b1 = 0xE0 | (0b11 << 3) | (0b10 << 1) | 0b1
        b2 = (br_idx << 4) | (sr_idx << 2)
        out += bytes((b0, b1, b2, b3))
        out += w.to_bytes(nbytes - 4)
    return bytes(out)


def decode_layer2(data: bytes) -> dict:
    """Decode a mono MPEG-1 Layer II stream to subband samples —
    the single_channel-only entry point (a stereo stream raises "not
    single-channel"); decode_layer2_general accepts all four modes.
    General over conformant mono 32-192 kbps streams: header validation,
    B.2a/B.2b/B.2c/B.2d table derivation from (rate, bitrate),
    region-width allocation parse, scfsi/scalefactor sharing, grouped
    and ungrouped sample codes, exact rational requantization

        num = 2*v + 1 - L,   sample = sf(idx) * num / L.

    Returns integer aggregates (what the SQL oracle replays) plus the
    float subband samples laid out (n_frames*36, 32) (what the tests
    check against directly computed rationals)."""
    out = _decode_layer2(data, require_mono=True)
    out["subband_samples"] = out["subband_samples"][:, :, 0]
    return out


def decode_layer2_general(data: bytes) -> dict:
    """Decode ANY conformant MPEG-1 Layer II stream — stereo (00),
    joint_stereo with intensity bound = 4 + 4*mode_extension (01),
    dual_channel (10), or single_channel (11).  Below the bound,
    allocation and sample codes are per channel; at and above it
    (joint stereo only) ONE allocation and ONE sample triplet are
    transmitted and applied to both channels under their own
    scalefactors (ISO 11172-3 2.4.1.6/2.4.2.3).  Aggregates count
    TRANSMITTED entities (a shared triplet once); scalefactors are
    per channel everywhere, so sf_idx_sum spans both channels.
    subband_samples has shape (n_frames*36, 32, nch)."""
    return _decode_layer2(data, require_mono=False)


def _decode_layer2(data: bytes, require_mono: bool) -> dict:
    pos = 0
    n_frames = 0
    sr = None
    sblimit_seen = None
    bound_seen = None
    n_alloc_total = 0
    scfsi_sum = 0
    sf_idx_sum = 0
    code_sum = 0
    num_sum = 0
    num_sq_sum = 0
    samples: list[np.ndarray] = []
    samples_fp: list[np.ndarray] = []
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("corrupt layer2 stream: truncated frame header")
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"corrupt layer2 stream: lost sync at byte {pos}")
        if (b1 >> 3) & 0b11 != 0b11:
            raise ValueError("unsupported layer2 stream: not MPEG-1")
        if (b1 >> 1) & 0b11 != 0b10:
            raise ValueError("unsupported layer2 stream: not Layer II")
        br_idx = b2 >> 4
        sr_idx = (b2 >> 2) & 0b11
        pad = (b2 >> 1) & 1
        if br_idx in (0, 15):
            raise ValueError(f"unsupported layer2 stream: bitrate index {br_idx}")
        if sr_idx == 3:
            raise ValueError("corrupt layer2 stream: reserved sample-rate index")
        mode = b3 >> 6  # 00 stereo, 01 joint_stereo, 10 dual, 11 single
        mode_ext = (b3 >> 4) & 0b11
        if require_mono and mode != 0b11:
            raise ValueError("unsupported layer2 stream: not single-channel")
        nch = 1 if mode == 0b11 else 2
        kbps = LAYER2_BITRATE_KBPS[br_idx]
        if mode == 0b11 and kbps > 192:
            # ISO 11172-3 2.4.2.3: 224-384 kbps are stereo-mode-only in
            # Layer II; a single_channel frame claiming one is
            # non-conformant (r9 ADVICE).  Checked AFTER the channel-mode
            # gate so a stereo 224-384 kbps stream reports the accurate
            # "not single-channel" rather than a misleading mono-bitrate
            # message (r10 ADVICE).
            raise ValueError(
                f"corrupt layer2 stream: {kbps} kbps not allowed for mono"
            )
        if mode != 0b11 and kbps in (32, 48, 56, 80):
            raise ValueError(
                f"corrupt layer2 stream: {kbps} kbps is single-channel-only"
            )
        if sr is None:
            sr = SAMPLE_RATE[sr_idx]
        elif sr != SAMPLE_RATE[sr_idx]:
            raise ValueError("unsupported layer2 stream: mid-stream rate switch")
        # table selection keys on the PER-CHANNEL bitrate (2.4.2.3)
        sblimit = layer2_sblimit(sr_idx, kbps // nch)
        if sblimit_seen is None:
            sblimit_seen, mode_seen = sblimit, mode
        elif sblimit_seen != sblimit:
            raise ValueError("unsupported layer2 stream: mid-stream table switch")
        elif mode_seen != mode:
            raise ValueError("unsupported layer2 stream: mid-stream mode switch")
        bound = min(4 + 4 * mode_ext, sblimit) if mode == 0b01 else sblimit
        # per-frame bound changes are spec-legal (encoders vary the
        # intensity bound dynamically) but this decoder reports ONE
        # stream-level bound column, so a switch is an honest
        # unsupported boundary rather than an ill-defined output
        if bound_seen is None:
            bound_seen = bound
        elif bound_seen != bound:
            raise ValueError(
                "unsupported layer2 stream: mid-stream intensity-bound switch"
            )
        nbytes = layer2_frame_bytes(br_idx, sr_idx, pad)
        if pos + nbytes > len(data):
            raise ValueError(f"corrupt layer2 stream: frame at {pos} runs past EOF")
        protected = not (b1 & 1)  # protection_bit 0 => crc_check present
        crc_len = 2 if protected else 0
        if protected:
            crc_word = data[pos + 4] << 8 | data[pos + 5]
        r = _BitReader(data[pos + 4 + crc_len : pos + nbytes])
        alloc = [[0] * sblimit for _ in range(nch)]
        for sb in range(bound):
            for ch in range(nch):
                alloc[ch][sb] = r.read(layer2_nbal(sb, sblimit))
                if alloc[ch][sb]:
                    n_alloc_total += 1
        for sb in range(bound, sblimit):
            a = r.read(layer2_nbal(sb, sblimit))
            if a:
                n_alloc_total += 1  # transmitted once, applies to both
            for ch in range(nch):
                alloc[ch][sb] = a
        scfsi = {}
        for sb in range(sblimit):
            for ch in range(nch):
                if alloc[ch][sb]:
                    scfsi[(ch, sb)] = r.read(2)
                    scfsi_sum += scfsi[(ch, sb)]
        if protected:
            # ISO 2.4.3.1: Layer II protects header bits 16-31 + the
            # allocation and scfsi sections (the bits parsed so far)
            want = crc16_protect(
                list(_byte_bits(data[pos + 2 : pos + 4])) + list(r.bits[: r.pos])
            )
            if crc_word != want:
                raise ValueError(
                    "corrupt layer2 stream: crc_check mismatch "
                    f"(got {crc_word:#06x}, computed {want:#06x})"
                )
        sf_parts: dict[tuple[int, int], list[int]] = {}
        for sb in range(sblimit):
            for ch in range(nch):
                if alloc[ch][sb]:
                    sc = scfsi[(ch, sb)]
                    n_tx = 3 if sc == 0 else (1 if sc == 2 else 2)
                    tx = [r.read(6) for _ in range(n_tx)]
                    if any(i > 62 for i in tx):
                        raise ValueError(
                            "corrupt layer2 stream: scalefactor index > 62"
                        )
                    t0 = tx[0]
                    t1 = tx[1] if n_tx > 1 else t0
                    t2 = tx[2] if n_tx > 2 else t1
                    sf_parts[(ch, sb)] = _applied_sf(sc, t0, t1, t2)
                    sf_idx_sum += sum(sf_parts[(ch, sb)])

        def read_triplet(lv: int) -> list[int]:
            if lv in GROUP_BITS:
                c = r.read(GROUP_BITS[lv])
                if c >= lv * lv * lv:
                    raise ValueError(
                        "corrupt layer2 stream: grouped code out of range"
                    )
                return [c % lv, (c // lv) % lv, c // (lv * lv)]
            nb = lv.bit_length()
            return [r.read(nb) for _ in range(3)]

        frame_samples = np.zeros((36, 32, nch))
        frame_fp = np.zeros((36, 32, nch), dtype=np.int64)
        for gr in range(12):
            part = gr // 4
            for sb in range(sblimit):
                if not alloc[0][sb] and not alloc[nch - 1][sb]:
                    continue
                if sb < bound:
                    for ch in range(nch):
                        if not alloc[ch][sb]:
                            continue
                        lv = layer2_levels(sb, alloc[ch][sb], sblimit)
                        v = read_triplet(lv)
                        sfi = sf_parts[(ch, sb)][part]
                        sf = SCALEFACTOR[sfi]
                        for k in range(3):
                            num = 2 * v[k] + 1 - lv
                            code_sum += v[k]
                            num_sum += num
                            num_sq_sum += num * num
                            frame_samples[gr * 3 + k, sb, ch] = sf * num / lv
                            # 2^28 fixed point (python // floors; the
                            # SQL replay uses the +K*L offset form)
                            frame_fp[gr * 3 + k, sb, ch] = (
                                num * SF_FP[sfi]
                            ) // lv
                else:
                    # intensity region: one triplet, both channels
                    lv = layer2_levels(sb, alloc[0][sb], sblimit)
                    v = read_triplet(lv)
                    for k in range(3):
                        num = 2 * v[k] + 1 - lv
                        code_sum += v[k]
                        num_sum += num
                        num_sq_sum += num * num
                    for ch in range(nch):
                        sfi = sf_parts[(ch, sb)][part]
                        sf = SCALEFACTOR[sfi]
                        for k in range(3):
                            frame_samples[gr * 3 + k, sb, ch] = (
                                sf * (2 * v[k] + 1 - lv) / lv
                            )
                            frame_fp[gr * 3 + k, sb, ch] = (
                                (2 * v[k] + 1 - lv) * SF_FP[sfi]
                            ) // lv
        samples.append(frame_samples)
        samples_fp.append(frame_fp)
        n_frames += 1
        pos += nbytes
    if n_frames == 0:
        raise ValueError("corrupt layer2 stream: no frames")
    return {
        "n_frames": n_frames,
        "sample_rate": sr,
        "sblimit": sblimit_seen,
        "mode": mode_seen,
        "bound": bound,
        "nch": nch,
        "n_alloc_total": n_alloc_total,
        "scfsi_sum": scfsi_sum,
        "sf_idx_sum": sf_idx_sum,
        "code_sum": code_sum,
        "num_sum": num_sum,
        "num_sq_sum": num_sq_sum,
        "subband_samples": np.concatenate(samples, axis=0),
        "subband_samples_fp": np.concatenate(samples_fp, axis=0),
    }
