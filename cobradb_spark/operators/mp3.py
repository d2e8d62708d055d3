"""MP3 (MPEG-1 Audio Layer III) frame INDEXER — header-level, no PCM.

What a 100-TB audio-ingest pipeline needs from MP3 files first is not
the waveform but the index: frame count, duration, bitrate profile,
CBR/VBR classification, container offsets — the metadata pass that
decides routing, sharding, and dedup BEFORE any expensive decode.  This
module implements that pass for real, from the published MPEG-1 header
layout (ISO/IEC 11172-3 frame header: 11-bit syncword, version/layer
bits, 4-bit bitrate index, 2-bit sampling-rate index, padding bit), plus
ID3v2 tag skipping (syncsafe 28-bit size, the id3.org spec).  The FULL
decode chain past the index is real too: Huffman symbol decode
(operators/mp3huff.py), requantization (operators/mp3requant.py), and
the time-domain stages to PCM — alias reduction, reorder, windowed
IMDCT, overlap-add, frequency inversion, polyphase synthesis
(operators/mp3imdct.py; queries multimodal_mp3_{huffman,requantize,
imdct,pcm}_decode).  Remaining documented boundaries: linbits escape
magnitudes (|is| > 3 needs the unbundled large-value codebooks) and
the normative ISO Table B.3 synthesis prototype window (a substitute
prototype is used — mp3imdct.py docstring).

Synthesis builds spec-valid frame sequences (real headers, deterministic
filler payload) so the walk is exercised end-to-end: per-frame bitrate
switching (VBR), padding-bit length changes, all three MPEG-1 sample
rates, and an ID3v2.3 prefix on every 4th document.
"""

from __future__ import annotations

import numpy as np

# Published MPEG-1 Layer III tables (index 0 = "free", 15 = invalid).
BITRATE_KBPS = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0]
SAMPLE_RATE = [44100, 48000, 32000, 0]
SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III


def _frame_header(bitrate_idx: int, sr_idx: int, pad: int) -> bytes:
    """4-byte MPEG-1 Layer III header: sync=0x7FF, version=11 (MPEG-1),
    layer=01 (III), no CRC, mono, original."""
    b0 = 0xFF
    b1 = 0xE0 | (0b11 << 3) | (0b01 << 1) | 0b1
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (pad << 1)
    b3 = 0xC4  # mono, original=1
    return bytes((b0, b1, b2, b3))


def frame_length(bitrate_idx: int, sr_idx: int, pad: int) -> int:
    """Layer III frame byte length: floor(144 * bitrate / samplerate) + pad
    (the 144 constant = 1152 samples / 8 bits per byte)."""
    return 144000 * BITRATE_KBPS[bitrate_idx] // SAMPLE_RATE[sr_idx] + pad


def _syncsafe(n: int) -> bytes:
    """ID3v2 28-bit syncsafe size (7 bits per byte, MSB clear)."""
    return bytes(((n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F))


def encode_mp3(doc_id: int) -> bytes:
    """Deterministic spec-valid MP3 stream for one document:
    n = 8 + id % 8 frames, sample rate rotates over the three MPEG-1
    rates by id % 3, per-frame bitrate index 1 + (id*7 + i*13) % 14
    (a VBR profile touching every table row across the corpus), padding
    bit (id + i) % 2.  Every 4th document carries an ID3v2.3 tag of
    32 + id % 64 payload bytes so the indexer's tag skip is exercised."""
    out = bytearray()
    if doc_id % 4 == 0:
        tag = 32 + doc_id % 64
        out += b"ID3" + bytes((3, 0, 0)) + _syncsafe(tag)
        # <0x80: never false-syncs
        out += (((doc_id + np.arange(tag)) % 0x70).astype(np.uint8)).tobytes()
    sr_idx = doc_id % 3
    n = 8 + doc_id % 8
    for i in range(n):
        br_idx = 1 + (doc_id * 7 + i * 13) % 14
        pad = (doc_id + i) % 2
        flen = frame_length(br_idx, sr_idx, pad)
        out += _frame_header(br_idx, sr_idx, pad)
        out += ((doc_id * 3 + i * 5 + np.arange(flen - 4)) % 256).astype(
            np.uint8
        ).tobytes()
    return bytes(out)


def index_mp3(data: bytes) -> dict:
    """Walk a (possibly ID3v2-prefixed, possibly ID3v1-trailed) MPEG-1
    Layer III stream and return its index: per-frame header fields are
    validated against the published tables, frame lengths computed
    from the bitrate/rate/pad arithmetic — or, for FREE-FORMAT streams
    (bitrate index 0), discovered once from the spacing to the next
    syncword and enforced constant (+padding slot) thereafter, the way
    real decoders handle free format — and the walk must land exactly
    on the end of the audio span (truncated or misaligned streams
    raise ValueError).  General over any conformant CBR/VBR/free
    mono/stereo MPEG-1 Layer III file — nothing here assumes the
    synthesizer's parameter schedule."""
    pos = 0
    id3_bytes = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise ValueError("corrupt mp3 stream: truncated ID3v2 header")
        if (data[6] | data[7] | data[8] | data[9]) & 0x80:
            raise ValueError("corrupt mp3 stream: non-syncsafe ID3v2 size")
        size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
        id3_bytes = 10 + size
        pos = id3_bytes
        if pos > len(data):
            raise ValueError("corrupt mp3 stream: ID3v2 size past EOF")
    # ID3v1: fixed 128-byte "TAG" trailer after the last frame
    end = len(data)
    id3v1_bytes = 0
    if end - pos >= 128 and data[end - 128 : end - 125] == b"TAG":
        id3v1_bytes = 128
        end -= 128
    n_frames = 0
    sr = None
    free_base = None  # discovered unpadded frame length for free format
    saw_table_rate = False
    bitrate_sum = 0
    bitrates: set[int] = set()
    while pos < end:
        if pos + 4 > end:
            raise ValueError("corrupt mp3 stream: truncated frame header")
        b0, b1, b2, _b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"corrupt mp3 stream: lost sync at byte {pos}")
        if (b1 >> 3) & 0b11 != 0b11:
            raise ValueError("unsupported mp3 stream: not MPEG-1")
        if (b1 >> 1) & 0b11 != 0b01:
            raise ValueError("unsupported mp3 stream: not Layer III")
        br_idx = b2 >> 4
        sr_idx = (b2 >> 2) & 0b11
        pad = (b2 >> 1) & 1
        if br_idx == 15:
            raise ValueError(f"unsupported mp3 stream: bitrate index {br_idx}")
        if sr_idx == 3:
            raise ValueError("corrupt mp3 stream: reserved sample-rate index")
        if sr is None:
            sr = SAMPLE_RATE[sr_idx]
        elif sr != SAMPLE_RATE[sr_idx]:
            raise ValueError("unsupported mp3 stream: mid-stream sample-rate switch")
        if br_idx == 0:
            # free format: all frames must be free (ISO 2.4.2.3), with
            # one constant frame length modulo the padding slot
            if saw_table_rate:
                raise ValueError(
                    "corrupt mp3 stream: free-format frame after table-rate frames"
                )
            if free_base is None:
                # discover: distance to the next syncword with the same
                # version/layer/protection byte and sample rate; the
                # found header must itself be free-format (ISO 2.4.2.3:
                # free streams are free throughout)
                j = pos + 21  # room for header + mono side info at least
                while j + 4 <= end:
                    if (
                        data[j] == 0xFF
                        and data[j + 1] == b1
                        and ((data[j + 2] >> 2) & 0b11) == sr_idx
                    ):
                        if (data[j + 2] >> 4) != 0:
                            raise ValueError(
                                "corrupt mp3 stream: table-rate frame "
                                "inside a free-format stream"
                            )
                        break
                    j += 1
                else:
                    j = end + pad  # single-frame stream
                free_base = j - pos - pad
                if free_base <= 21:
                    raise ValueError(
                        "corrupt mp3 stream: free-format frame too short"
                    )
            flen = free_base + pad
            kbps = free_base * sr // 144000
        else:
            if free_base is not None:
                raise ValueError(
                    "corrupt mp3 stream: table-rate frame inside a "
                    "free-format stream"
                )
            saw_table_rate = True
            flen = frame_length(br_idx, sr_idx, pad)
            kbps = BITRATE_KBPS[br_idx]
        if pos + flen > end:
            raise ValueError(f"corrupt mp3 stream: frame at {pos} runs past EOF")
        n_frames += 1
        bitrate_sum += kbps
        bitrates.add(kbps)
        pos += flen
    if n_frames == 0:
        raise ValueError("corrupt mp3 stream: no frames")
    return {
        "n_frames": n_frames,
        "sample_rate": sr,
        "duration_us": n_frames * SAMPLES_PER_FRAME * 1_000_000 // sr,
        "bitrate_sum_kbps": bitrate_sum,
        "n_bitrates": len(bitrates),
        "audio_bytes": end - id3_bytes,
        "id3_bytes": id3_bytes,
        "id3v1_bytes": id3v1_bytes,
        "free_format": free_base is not None,
    }


# ---------------------------------------------------------------------------
# MPEG-1 Audio Layer I (ISO/IEC 11172-3 §2.4.1.5 / §2.4.2.5): a REAL
# subband-sample decoder, pure NumPy.  Layer I has no Huffman coding and
# no MDCT — a frame is: 32-bit header, 4-bit bit allocation per subband,
# 6-bit scalefactor per allocated subband, then 12 uniformly-quantized
# samples per allocated subband (nb = alloc_code + 1 bits each).  The
# requantization is the published rational
#     s'' = (2^nb / (2^nb - 1)) * (s''' + 2^(1-nb)),  s''' = C/2^(nb-1) - 1
#         = (2*C + 2 - 2^nb) / (2^nb - 1)
# scaled by the 6-bit scalefactor table sf(idx) = 2 * 2^(-idx/3).  The
# polyphase synthesis filterbank (the 512-tap window) is the one step NOT
# implemented — subband samples, not PCM, are the honest decode boundary
# here (the r7 verdict's "MDCT-free Layer-I" scope).  Everything below the
# filterbank is exact: the integer numerator (2C + 2 - 2^nb) is the decode
# check the SQL oracle replays, and the float samples are exact dyadic
# rationals whenever the scalefactor index is a multiple of 3 (sf = 2^(1-k)),
# which the synthesizer restricts itself to so tests compare bit-exactly.
# ---------------------------------------------------------------------------

LAYER1_BITRATE_KBPS = [
    0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, 0,
]


def layer1_frame_slots(bitrate_idx: int, sr_idx: int, pad: int) -> int:
    """Layer I frame length in 4-byte SLOTS (header included):
    floor(12 * bitrate / samplerate) + pad."""
    return 12000 * LAYER1_BITRATE_KBPS[bitrate_idx] // SAMPLE_RATE[sr_idx] + pad


def _layer1_header(bitrate_idx: int, sr_idx: int, pad: int) -> bytes:
    """4-byte MPEG-1 Layer I header: sync=0x7FF, version=11, layer=11
    (Layer I), no CRC, mono, original."""
    b0 = 0xFF
    b1 = 0xE0 | (0b11 << 3) | (0b11 << 1) | 0b1
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (pad << 1)
    b3 = 0xC4
    return bytes((b0, b1, b2, b3))


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def to_bytes(self, total_bytes: int) -> bytes:
        if len(self.bits) > total_bytes * 8:
            raise ValueError("layer1 synthesis: payload exceeds frame slots")
        arr = np.zeros(total_bytes * 8, dtype=np.uint8)
        arr[: len(self.bits)] = self.bits
        return np.packbits(arr).tobytes()


def layer1_schedule(doc_id: int) -> dict:
    """The deterministic per-document synthesis schedule (shared by the
    encoder, the SQL oracle, and the tests): mono, sr rotates over the
    three MPEG-1 rates, n_frames = 3 + id%4, the first 4 + id%5 subbands
    allocated with nb = 2 + (id+sb)%10 bits, scalefactor index
    3*((id+sb)%21) (a multiple of 3 -> exactly dyadic sf), and sample
    codes C = (id*11 + f*7 + sb*5 + t*3) % 2^nb."""
    return {
        "sr_idx": doc_id % 3,
        "n_frames": 3 + doc_id % 4,
        "n_alloc": 4 + doc_id % 5,
        "nb": lambda sb: 2 + (doc_id + sb) % 10,
        "sf_idx": lambda sb: 3 * ((doc_id + sb) % 21),
        "code": lambda f, sb, t: (doc_id * 11 + f * 7 + sb * 5 + t * 3)
        % (1 << (2 + (doc_id + sb) % 10)),
    }


def encode_layer1(doc_id: int, protect: bool = False) -> bytes:
    """Spec-valid mono MPEG-1 Layer I stream for one document.  The
    bitrate index is chosen per frame as the smallest table entry whose
    slot count fits the payload (so the decoder's table lookup and slot
    arithmetic are exercised across documents); fill bits are zero.
    With protect=True the protection_bit is 0 and a real ISO 2.4.3.1
    crc_check word (over header bits 16-31 + the allocation section)
    follows the header."""
    sch = layer1_schedule(doc_id)
    sr_idx, n_alloc = sch["sr_idx"], sch["n_alloc"]
    out = bytearray()
    for f in range(sch["n_frames"]):
        w = _BitWriter()
        for sb in range(32):
            w.write(sch["nb"](sb) - 1 if sb < n_alloc else 0, 4)
        prot_len = len(w.bits)
        for sb in range(n_alloc):
            w.write(sch["sf_idx"](sb), 6)
        for t in range(12):
            for sb in range(n_alloc):
                w.write(sch["code"](f, sb, t), sch["nb"](sb))
        crc_bits = 16 if protect else 0
        need_slots = (32 + crc_bits + len(w.bits) + 31) // 32
        br_idx = next(
            i
            for i in range(1, 15)
            if layer1_frame_slots(i, sr_idx, 0) >= need_slots
        )
        slots = layer1_frame_slots(br_idx, sr_idx, 0)
        hdr = bytearray(_layer1_header(br_idx, sr_idx, 0))
        if protect:
            hdr[1] &= ~1  # protection_bit 0: crc_check present
            crc = crc16_protect(
                list(_byte_bits(bytes(hdr[2:4]))) + w.bits[:prot_len]
            )
            out += bytes(hdr) + bytes((crc >> 8, crc & 0xFF))
            out += w.to_bytes(slots * 4 - 6)
        else:
            out += bytes(hdr)
            out += w.to_bytes(slots * 4 - 4)
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if self.pos + n > len(self.bits):
            raise ValueError("corrupt layer1 stream: bit read past frame end")
        v = 0
        for b in self.bits[self.pos : self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v


def crc16_protect(bits) -> int:
    """ISO/IEC 11172-3 2.4.3.1 crc_check: CRC-16 with generator
    x^16 + x^15 + x^2 + 1 (0x8005), initial state 0xFFFF, applied
    MSB-first over the protected bit span (header bits 16-31 followed
    by the layer-dependent side-information bits)."""
    crc = 0xFFFF
    for b in bits:
        t = ((crc >> 15) ^ int(b)) & 1
        crc = (crc << 1) & 0xFFFF
        if t:
            crc ^= 0x8005
    return crc


def _byte_bits(data: bytes):
    for byte in data:
        for i in range(7, -1, -1):
            yield (byte >> i) & 1


SCALEFACTOR = [2.0 * 2.0 ** (-idx / 3.0) for idx in range(63)]

# Fixed-point scalefactors for the Layer I/II PCM pins
# (operators/mp3imdct.py): floor(sf * 2^28) int literals, embedded
# verbatim into the DuckDB oracle SQL so both engines share them by
# construction.  |num * SF_FP| <= 65534 * 2^29 < 2^46 — int64-safe.
SF_FP_BITS = 28
SF_FP = tuple(int(np.floor(s * (1 << SF_FP_BITS))) for s in SCALEFACTOR)


def layer1_stereo_schedule(doc_id: int) -> dict:
    """Deterministic two-channel Layer I synthesis schedule (shared by
    the encoder, the SQL oracle, and the tests).  Rotates stereo /
    joint_stereo (intensity bound 4 + 4*((doc_id+1)%4)) / dual_channel
    and all three sample rates.  Below the bound the channels carry
    DIFFERENT subband memberships — ch0 allocates [0, n0), ch1
    allocates [1, 1 + n1) — so ch0-only AND ch1-only subbands both
    occur (the interleave case a mono-assuming parser desyncs on); at
    and above the bound allocation and samples are shared (ch0's
    formulas) while scalefactors stay per channel."""
    sr_idx = doc_id % 3
    mode = (doc_id // 3) % 3  # header bits: 0 stereo, 1 joint, 2 dual
    mode_ext = (doc_id + 1) % 4 if mode == 1 else 0
    bound = 4 + 4 * mode_ext if mode == 1 else 32
    n0, n1 = 4 + doc_id % 5, 3 + doc_id % 6

    def member(ch: int, sb: int) -> bool:
        if sb >= bound:
            return sb < n0  # shared region: ch0's membership
        return sb < n0 if ch == 0 else 1 <= sb < 1 + n1

    def nb(ch: int, sb: int) -> int:
        c = ch if sb < bound else 0
        return 2 + (doc_id + sb + 3 * c) % 10

    return {
        "sr_idx": sr_idx,
        "mode": mode,
        "mode_ext": mode_ext,
        "bound": bound,
        "n_frames": 3 + doc_id % 4,
        "n0": n0,
        "n1": n1,
        "member": member,
        "nb": nb,
        "sf_idx": lambda ch, sb: 3 * ((doc_id + sb + 5 * ch) % 21),
        "code": lambda f, ch, sb, t: (
            doc_id * 11
            + f * 7
            + sb * 5
            + t * 3
            + 13 * (ch if sb < bound else 0)
        )
        % (1 << nb(ch, sb)),
    }


def encode_layer1_stereo(doc_id: int) -> bytes:
    """Spec-valid TWO-CHANNEL MPEG-1 Layer I stream for one document
    (layer1_stereo_schedule): per-channel 4-bit allocation below the
    bound, one shared allocation at/above it, 6-bit scalefactors per
    channel everywhere, one shared sample per intensity subband,
    per-frame fitted bitrate."""
    sch = layer1_stereo_schedule(doc_id)
    sr_idx, bound = sch["sr_idx"], sch["bound"]
    member, nb = sch["member"], sch["nb"]
    b3 = (sch["mode"] << 6) | (sch["mode_ext"] << 4) | 0x04
    out = bytearray()
    for f in range(sch["n_frames"]):
        w = _BitWriter()
        for sb in range(bound):
            for ch in range(2):
                w.write(nb(ch, sb) - 1 if member(ch, sb) else 0, 4)
        for sb in range(bound, 32):
            w.write(nb(0, sb) - 1 if member(0, sb) else 0, 4)
        for sb in range(32):
            for ch in range(2):
                if member(ch, sb):
                    w.write(sch["sf_idx"](ch, sb), 6)
        for t in range(12):
            for sb in range(32):
                if sb < bound:
                    for ch in range(2):
                        if member(ch, sb):
                            w.write(sch["code"](f, ch, sb, t), nb(ch, sb))
                elif member(0, sb):
                    w.write(sch["code"](f, 0, sb, t), nb(0, sb))
        need_slots = (32 + len(w.bits) + 31) // 32
        br_idx = next(
            i
            for i in range(1, 15)
            if layer1_frame_slots(i, sr_idx, 0) >= need_slots
        )
        slots = layer1_frame_slots(br_idx, sr_idx, 0)
        b0 = 0xFF
        b1 = 0xE0 | (0b11 << 3) | (0b11 << 1) | 0b1
        b2 = (br_idx << 4) | (sr_idx << 2)
        out += bytes((b0, b1, b2, b3))
        out += w.to_bytes(slots * 4 - 4)
    return bytes(out)


def decode_layer1(data: bytes) -> dict:
    """Decode a mono MPEG-1 Layer I stream to subband samples — the
    single_channel-only entry point (a stereo stream now raises "not
    single-channel" instead of silently misparsing the two-channel
    interleave as mono, the pre-r11 latent hazard);
    decode_layer1_general accepts all four modes.  General over any
    conformant mono stream: header validation against the published
    tables, slot-length walk landing exactly on EOF, 4-bit allocation /
    6-bit scalefactor / nb-bit sample parsing, exact rational
    requantization.  Returns integer aggregates (what the SQL oracle
    replays) plus the float subband samples (what the tests check
    against directly-computed rationals):
      num = 2*C + 2 - 2^nb        (exact integer dequant numerator)
      sample = sf(idx) * num / (2^nb - 1)
    """
    out = _decode_layer1(data, require_mono=True)
    out["subband_samples"] = out["subband_samples"][:, :, 0]
    return out


def decode_layer1_general(data: bytes) -> dict:
    """Decode ANY conformant MPEG-1 Layer I stream — stereo (00),
    joint_stereo (01) with intensity bound 4 + 4*mode_extension,
    dual_channel (10), single_channel (11).  Below the bound
    allocation and samples are per channel; at and above it ONE
    allocation and ONE sample are transmitted and applied to both
    channels under their own scalefactors (ISO 11172-3 2.4.1.5).
    Aggregates count TRANSMITTED entities (a shared sample once);
    scalefactors are per channel everywhere.  subband_samples has
    shape (n_frames*12, 32, nch)."""
    return _decode_layer1(data, require_mono=False)


def _decode_layer1(data: bytes, require_mono: bool) -> dict:
    pos = 0
    n_frames = 0
    sr = None
    mode_seen = None
    bound_seen = None
    n_alloc_total = 0
    sf_idx_sum = 0
    code_sum = 0
    num_sum = 0
    num_sq_sum = 0
    samples: list[np.ndarray] = []
    samples_fp: list[np.ndarray] = []
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("corrupt layer1 stream: truncated frame header")
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"corrupt layer1 stream: lost sync at byte {pos}")
        if (b1 >> 3) & 0b11 != 0b11:
            raise ValueError("unsupported layer1 stream: not MPEG-1")
        if (b1 >> 1) & 0b11 != 0b11:
            raise ValueError("unsupported layer1 stream: not Layer I")
        br_idx = b2 >> 4
        sr_idx = (b2 >> 2) & 0b11
        pad = (b2 >> 1) & 1
        if br_idx in (0, 15):
            raise ValueError(f"unsupported layer1 stream: bitrate index {br_idx}")
        if sr_idx == 3:
            raise ValueError("corrupt layer1 stream: reserved sample-rate index")
        mode = b3 >> 6
        if require_mono and mode != 0b11:
            raise ValueError("unsupported layer1 stream: not single-channel")
        nch = 1 if mode == 0b11 else 2
        bound = min(4 + 4 * ((b3 >> 4) & 0b11), 32) if mode == 0b01 else 32
        if sr is None:
            sr = SAMPLE_RATE[sr_idx]
        elif sr != SAMPLE_RATE[sr_idx]:
            raise ValueError("unsupported layer1 stream: mid-stream rate switch")
        if mode_seen is None:
            mode_seen = mode
        elif mode_seen != mode:
            raise ValueError("unsupported layer1 stream: mid-stream mode switch")
        # one stream-level bound is reported, so a per-frame intensity-
        # bound change (spec-legal) is an honest unsupported boundary
        if bound_seen is None:
            bound_seen = bound
        elif bound_seen != bound:
            raise ValueError(
                "unsupported layer1 stream: mid-stream intensity-bound switch"
            )
        slots = layer1_frame_slots(br_idx, sr_idx, pad)
        if pos + slots * 4 > len(data):
            raise ValueError(f"corrupt layer1 stream: frame at {pos} runs past EOF")
        protected = not (b1 & 1)  # protection_bit 0 => crc_check present
        crc_len = 2 if protected else 0
        if protected:
            crc_word = data[pos + 4] << 8 | data[pos + 5]
        r = _BitReader(data[pos + 4 + crc_len : pos + slots * 4])
        alloc = [[0] * 32 for _ in range(nch)]
        for sb in range(bound):
            for ch in range(nch):
                alloc[ch][sb] = r.read(4)
                if alloc[ch][sb]:
                    n_alloc_total += 1
        for sb in range(bound, 32):
            a = r.read(4)
            if a:
                n_alloc_total += 1  # transmitted once, applies to both
            for ch in range(nch):
                alloc[ch][sb] = a
        if any(a == 15 for row in alloc for a in row):
            raise ValueError("corrupt layer1 stream: forbidden allocation 15")
        if protected:
            # ISO 2.4.3.1: Layer I protects header bits 16-31 + the
            # allocation section (exactly the bits parsed so far)
            want = crc16_protect(
                list(_byte_bits(data[pos + 2 : pos + 4])) + list(r.bits[: r.pos])
            )
            if crc_word != want:
                raise ValueError(
                    "corrupt layer1 stream: crc_check mismatch "
                    f"(got {crc_word:#06x}, computed {want:#06x})"
                )
        sf_idx = {}
        for sb in range(32):
            for ch in range(nch):
                if alloc[ch][sb]:
                    idx = r.read(6)
                    if idx > 62:
                        raise ValueError(
                            "corrupt layer1 stream: scalefactor index > 62"
                        )
                    sf_idx[(ch, sb)] = idx
                    sf_idx_sum += idx
        frame_samples = np.zeros((12, 32, nch))
        frame_fp = np.zeros((12, 32, nch), dtype=np.int64)
        for t in range(12):
            for sb in range(32):
                if not any(alloc[ch][sb] for ch in range(nch)):
                    continue
                if sb < bound:
                    for ch in range(nch):
                        if not alloc[ch][sb]:
                            continue
                        nb = alloc[ch][sb] + 1
                        c = r.read(nb)
                        num = 2 * c + 2 - (1 << nb)
                        code_sum += c
                        num_sum += num
                        num_sq_sum += num * num
                        frame_samples[t, sb, ch] = (
                            SCALEFACTOR[sf_idx[(ch, sb)]] * num / ((1 << nb) - 1)
                        )
                        # 2^28 fixed point (python // floors; the SQL
                        # replay uses the +K*L offset form)
                        frame_fp[t, sb, ch] = (
                            num * SF_FP[sf_idx[(ch, sb)]]
                        ) // ((1 << nb) - 1)
                else:
                    # intensity region: one sample code, both channels
                    nb = alloc[0][sb] + 1
                    c = r.read(nb)
                    num = 2 * c + 2 - (1 << nb)
                    code_sum += c
                    num_sum += num
                    num_sq_sum += num * num
                    for ch in range(nch):
                        frame_samples[t, sb, ch] = (
                            SCALEFACTOR[sf_idx[(ch, sb)]] * num / ((1 << nb) - 1)
                        )
                        frame_fp[t, sb, ch] = (
                            num * SF_FP[sf_idx[(ch, sb)]]
                        ) // ((1 << nb) - 1)
        samples.append(frame_samples)
        samples_fp.append(frame_fp)
        n_frames += 1
        pos += slots * 4
    if n_frames == 0:
        raise ValueError("corrupt layer1 stream: no frames")
    return {
        "n_frames": n_frames,
        "sample_rate": sr,
        "mode": mode_seen,
        "bound": bound,
        "nch": 1 if mode_seen == 0b11 else 2,
        "n_alloc_total": n_alloc_total,
        "sf_idx_sum": sf_idx_sum,
        "code_sum": code_sum,
        "num_sum": num_sum,
        "num_sq_sum": num_sq_sum,
        "subband_samples": np.concatenate(samples, axis=0),
        "subband_samples_fp": np.concatenate(samples_fp, axis=0),
    }


# ---------------------------------------------------------------------------
# MPEG-1 Layer III side information (ISO/IEC 11172-3 2.4.1.7) — every
# field is a fixed-width bitfield, so parsing it needs no Huffman work.
# Huffman symbol decode over this record is real as well (mp3huff.py),
# and so are requantization (mp3requant.py) and the time-domain chain
# to PCM (mp3imdct.py): container walk (index_mp3), header arithmetic,
# and the full side-info record are real; THIS fixture's main data is
# zero bits, a synthetic simplification
# documented at the query (the side info itself is spec-valid and the
# declared part2_3 lengths FIT the frame's main-data area with
# main_data_begin = 0, so the framing is structurally consistent).
# ---------------------------------------------------------------------------


def mp3_sideinfo_schedule(doc_id: int) -> dict:
    """Deterministic mono side-info schedule (shared by encoder, SQL
    oracle, tests).  Per (frame f, granule g): small part2_3_length so
    two granules always fit the fitted frame's main-data area;
    window-switching on every 3rd granule with block_type in 1..3
    (0 is forbidden while switching — the decoder validates that)."""
    return {
        "sr_idx": doc_id % 3,
        "n_frames": 3 + doc_id % 4,
        "scfsi": doc_id % 16,
        "part23": lambda f, g: (doc_id * 13 + f * 7 + g * 3) % 512,
        "big_values": lambda f, g: (doc_id * 5 + f * 3 + g) % 289,
        "global_gain": lambda f, g: (doc_id + f * 11 + g * 7) % 256,
        "scalefac_compress": lambda f, g: (doc_id + f + g) % 16,
        "switching": lambda f, g: (doc_id + f + g) % 3 == 0,
        "block_type": lambda f, g: 1 + (doc_id + f + g) % 3,
        "mixed_block": lambda f, g: (doc_id + f) % 2,
        "table_select": lambda f, g, k: (doc_id + f * 2 + g + k) % 32,
        "subblock_gain": lambda f, g, k: (doc_id + g + k) % 8,
        "region0": lambda f, g: (doc_id + g) % 16,
        "region1": lambda f, g: (doc_id + f) % 8,
        "preflag": lambda f, g: (doc_id + f + g) % 2,
        "scalefac_scale": lambda f, g: (doc_id + f) % 2,
        "count1table": lambda f, g: (doc_id + g) % 2,
    }


def encode_mp3_sideinfo(doc_id: int) -> bytes:
    """Spec-valid mono MPEG-1 Layer III stream with REAL side-info
    records: 4-byte header + 17-byte side info per frame (no CRC),
    main_data_begin = 0, zero main-data bits.  The bitrate index is
    fitted per frame so the declared part2_3 bits fit the frame's
    main-data area."""
    sch = mp3_sideinfo_schedule(doc_id)
    sr_idx = sch["sr_idx"]
    out = bytearray()
    for f in range(sch["n_frames"]):
        w = _BitWriter()
        w.write(0, 9)  # main_data_begin: no reservoir borrow
        w.write(0, 5)  # private_bits (mono)
        w.write(sch["scfsi"], 4)
        for g in range(2):
            w.write(sch["part23"](f, g), 12)
            w.write(sch["big_values"](f, g), 9)
            w.write(sch["global_gain"](f, g), 8)
            w.write(sch["scalefac_compress"](f, g), 4)
            sw = sch["switching"](f, g)
            w.write(int(sw), 1)
            if sw:
                w.write(sch["block_type"](f, g), 2)
                w.write(sch["mixed_block"](f, g), 1)
                for k in range(2):
                    w.write(sch["table_select"](f, g, k), 5)
                for k in range(3):
                    w.write(sch["subblock_gain"](f, g, k), 3)
            else:
                for k in range(3):
                    w.write(sch["table_select"](f, g, k), 5)
                w.write(sch["region0"](f, g), 4)
                w.write(sch["region1"](f, g), 3)
            w.write(sch["preflag"](f, g), 1)
            w.write(sch["scalefac_scale"](f, g), 1)
            w.write(sch["count1table"](f, g), 1)
        assert len(w.bits) == 136  # 17 bytes, mono MPEG-1 layout
        need_bits = sch["part23"](f, 0) + sch["part23"](f, 1)
        br_idx = next(
            i
            for i in range(1, 15)
            if (frame_length(i, sr_idx, 0) - 21) * 8 >= need_bits
        )
        flen = frame_length(br_idx, sr_idx, 0)
        out += _frame_header(br_idx, sr_idx, 0)
        out += w.to_bytes(17)
        out += bytes(flen - 21)  # zero main data + ancillary fill
    return bytes(out)


def parse_mp3_sideinfo(data: bytes) -> dict:
    """Walk a mono MPEG-1 Layer III stream and parse every frame's full
    side-info record (the published 136-bit mono layout): main_data
    begin/reservoir pointer, scfsi, and per-granule part2_3_length,
    big_values, global_gain, scalefac_compress, window switching with
    block_type/mixed/subblock gains or region counts, preflag,
    scalefac_scale, count1 table.  Validates spec constraints
    (block_type 0 while switching is forbidden; big_values <= 288;
    declared part2_3 bits must fit the stream before EOF given
    main_data_begin).  Returns integer aggregates for the SQL replay
    plus the per-granule record list for the tests."""
    pos = 0
    n_frames = 0
    sr = None
    agg = {
        "sum_part23": 0, "sum_big_values": 0, "sum_global_gain": 0,
        "sum_table_select": 0, "n_switching": 0, "sum_region": 0,
        "sum_scalefac_compress": 0, "sum_flags": 0, "scfsi_first": None,
        "sum_main_data_begin": 0,
    }
    granules: list[dict] = []
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
        if (b3 >> 6) != 0b11:
            raise ValueError("unsupported mp3 stream: not single-channel")
        if sr is None:
            sr = SAMPLE_RATE[sr_idx]
        elif sr != SAMPLE_RATE[sr_idx]:
            raise ValueError("unsupported mp3 stream: mid-stream rate switch")
        flen = frame_length(br_idx, sr_idx, pad)
        if pos + flen > len(data):
            raise ValueError(f"corrupt mp3 stream: frame at {pos} runs past EOF")
        r = _BitReader(data[pos + 4 : pos + 21])
        mdb = r.read(9)
        agg["sum_main_data_begin"] += mdb
        r.read(5)  # private_bits
        scfsi = r.read(4)
        if agg["scfsi_first"] is None:
            agg["scfsi_first"] = scfsi
        part23_total = 0
        for g in range(2):
            rec = {"frame": n_frames, "granule": g}
            rec["part2_3_length"] = r.read(12)
            rec["big_values"] = r.read(9)
            if rec["big_values"] > 288:
                raise ValueError("corrupt mp3 stream: big_values > 288")
            rec["global_gain"] = r.read(8)
            rec["scalefac_compress"] = r.read(4)
            sw = r.read(1)
            rec["switching"] = sw
            if sw:
                rec["block_type"] = r.read(2)
                if rec["block_type"] == 0:
                    raise ValueError(
                        "corrupt mp3 stream: block_type 0 with window switching"
                    )
                rec["mixed_block"] = r.read(1)
                ts = [r.read(5) for _ in range(2)]
                sbg = [r.read(3) for _ in range(3)]
                rec["table_select"] = ts
                rec["subblock_gain"] = sbg
                agg["n_switching"] += 1
                agg["sum_table_select"] += sum(ts)
            else:
                ts = [r.read(5) for _ in range(3)]
                rec["table_select"] = ts
                rec["region0_count"] = r.read(4)
                rec["region1_count"] = r.read(3)
                agg["sum_table_select"] += sum(ts)
                agg["sum_region"] += rec["region0_count"] + rec["region1_count"]
            rec["preflag"] = r.read(1)
            rec["scalefac_scale"] = r.read(1)
            rec["count1table_select"] = r.read(1)
            agg["sum_part23"] += rec["part2_3_length"]
            agg["sum_big_values"] += rec["big_values"]
            agg["sum_global_gain"] += rec["global_gain"]
            agg["sum_scalefac_compress"] += rec["scalefac_compress"]
            agg["sum_flags"] += (
                rec["preflag"] + rec["scalefac_scale"] + rec["count1table_select"]
            )
            part23_total += rec["part2_3_length"]
            granules.append(rec)
        # structural consistency: declared main-data bits must fit the
        # bytes available before EOF (this frame's main-data area plus
        # the reservoir the pointer claims)
        avail_bits = (flen - 21 + mdb) * 8
        if part23_total > avail_bits:
            raise ValueError(
                "corrupt mp3 stream: part2_3 lengths exceed available main data"
            )
        n_frames += 1
        pos += flen
    if n_frames == 0:
        raise ValueError("corrupt mp3 stream: no frames")
    return {
        "n_frames": n_frames,
        "sample_rate": sr,
        "granules": granules,
        **agg,
    }
