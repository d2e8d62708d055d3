"""MP3 (MPEG-1 Audio Layer III) frame INDEXER — header-level, no PCM.

What a 100-TB audio-ingest pipeline needs from MP3 files first is not
the waveform but the index: frame count, duration, bitrate profile,
CBR/VBR classification, container offsets — the metadata pass that
decides routing, sharding, and dedup BEFORE any expensive decode.  This
module implements that pass for real, from the published MPEG-1 header
layout (ISO/IEC 11172-3 frame header: 11-bit syncword, version/layer
bits, 4-bit bitrate index, 2-bit sampling-rate index, padding bit), plus
ID3v2 tag skipping (syncsafe 28-bit size, the id3.org spec).  Full
Huffman/IMDCT PCM decode remains the documented NotImplementedError stub
in operators/multimodal.py — indexing is the honest subset that is both
genuinely useful and implementable without an audio library.

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
    """Walk a (possibly ID3v2-prefixed) MPEG-1 Layer III stream and
    return its index: per-frame header fields are validated against the
    published tables, frame lengths computed from the bitrate/rate/pad
    arithmetic, and the walk must land exactly on EOF (truncated or
    misaligned streams raise ValueError).  General over any conformant
    CBR/VBR mono/stereo MPEG-1 Layer III file — nothing here assumes the
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
    n_frames = 0
    sr = None
    bitrate_sum = 0
    bitrates: set[int] = set()
    while pos < len(data):
        if pos + 4 > len(data):
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
        if br_idx in (0, 15):
            raise ValueError(f"unsupported mp3 stream: bitrate index {br_idx}")
        if sr_idx == 3:
            raise ValueError("corrupt mp3 stream: reserved sample-rate index")
        if sr is None:
            sr = SAMPLE_RATE[sr_idx]
        elif sr != SAMPLE_RATE[sr_idx]:
            raise ValueError("unsupported mp3 stream: mid-stream sample-rate switch")
        flen = frame_length(br_idx, sr_idx, pad)
        if pos + flen > len(data):
            raise ValueError(f"corrupt mp3 stream: frame at {pos} runs past EOF")
        n_frames += 1
        bitrate_sum += BITRATE_KBPS[br_idx]
        bitrates.add(BITRATE_KBPS[br_idx])
        pos += flen
    if n_frames == 0:
        raise ValueError("corrupt mp3 stream: no frames")
    return {
        "n_frames": n_frames,
        "sample_rate": sr,
        "duration_us": n_frames * SAMPLES_PER_FRAME * 1_000_000 // sr,
        "bitrate_sum_kbps": bitrate_sum,
        "n_bitrates": len(bitrates),
        "audio_bytes": len(data) - id3_bytes,
        "id3_bytes": id3_bytes,
    }
