"""MPEG-1 Layer III JOINT-STEREO processing (ISO/IEC 11172-3
2.4.3.4.9): MS (middle/side) and intensity stereo on the requantized
spectra — the processing the symbol-decode stereo key documented as
out of scope, now real.

Semantics (both block families — long granules and SHORT
window-switching granules with per-(band, window) intensity):
- mode_extension bit 1 = MS stereo: L = (M + S)/sqrt(2),
  R = (M - S)/sqrt(2) on every band not intensity-processed.
- mode_extension bit 0 = intensity stereo: scalefactor bands whose
  LOWER EDGE lies at/above the right channel's zero-part start
  (nzend_r = its coded-region length) are intensity regions; the left
  channel carries the signal and the right granule's scalefactor in
  the band is the intensity position is_pos.  L = M * k/(1+k),
  R = M * 1/(1+k) with k = tan(is_pos * pi/12); is_pos 6 puts all
  energy left; is_pos 7 is the spec's illegal position — no intensity
  processing for that band (it falls back to MS when MS is on, else
  passthrough).  Band 21 (no scalefactor of its own) uses band 20's
  is_pos.

Cross-engine exactness (same contract as mp3imdct.py): the mixing is
one integer multiply by a floor(x * 2^18) table entry plus one
floor-division, applied to the 1e-9 fixed-point xr values BEFORE the
time-domain chain.  Bounds: |xr| <= 1.06e13, so the MS product
|(M+S) * MS_FP| <= 2.12e13 * 185363 < 3.94e18 < 2^62 (the offset-form
requirement) and mixed outputs <= 1.5e13.

Mixed outputs EXCEED the mono chain's |xr| bound by sqrt(2), which
would push the IMDCT z-stage raw sums to ~6.1e18 — past the -2^62
domain of the oracle's positive-offset floor-division (DuckDB `//`
truncates, so a sum in (-6.1e18, -2^62) would differ from numpy floor
by 1).  joint_stereo_lines therefore divides EVERY granule's spectrum
in a joint stream by 2^JOINT_HEADROOM_BITS before the time-domain
chain, and the SQL replay folds the same bit into its a0 stage
(floor(floor(x/2)/2^4) == floor(x/2^5), so one combined division is
exact).  Post-headroom |xr| <= 7.5e12 < the 1.06e13 mono bound, and
every documented mp3imdct stage bound applies a fortiori.
"""

from __future__ import annotations

import numpy as np

from cobradb_spark.operators.mp3huff import SFB_LONG
from cobradb_spark.operators.mp3requant import (
    SFB_SHORT,
    _effective_long_scalefacs,
    requantize_lines,
)

FP_BITS = 18
FP_ONE = 1 << FP_BITS

# floor(2^18 / sqrt(2)) — the MS normalization, shared with the oracle.
MS_FP = int(np.floor(FP_ONE / np.sqrt(2.0)))

# Extra right-shift applied to every granule of a joint stream before
# the time-domain chain (module docstring: keeps the IMDCT z-stage raw
# sums inside the oracle's +-2^62 offset-form floor-division domain).
JOINT_HEADROOM_BITS = 1

# Intensity ratios k/(1+k) and 1/(1+k), k = tan(is_pos*pi/12), for
# is_pos 0..6 (6 = all-left).  is_pos 7 never indexes these.
_TAN = [float(np.tan(p * np.pi / 12.0)) for p in range(6)]
ILR_FP = tuple(int(np.floor(t / (1.0 + t) * FP_ONE)) for t in _TAN) + (FP_ONE,)
IRR_FP = tuple(int(np.floor(1.0 / (1.0 + t) * FP_ONE)) for t in _TAN) + (0,)


def joint_mix_granule(
    m_fp: np.ndarray,
    s_fp: np.ndarray,
    ext: int,
    scalefacs_r,
    nzend_r: int,
    sr: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Mix one granule pair's requantized spectra (dense int64[576]) to
    (L, R) under mode_extension ext.  One floor-division per output
    line, after the single table multiply — replayed verbatim in SQL."""
    if ext & 2:
        left = ((m_fp + s_fp) * MS_FP) // FP_ONE
        right = ((m_fp - s_fp) * MS_FP) // FP_ONE
    else:
        left = m_fp.copy()
        right = s_fp.copy()
    if ext & 1:
        edges = SFB_LONG[sr]
        sf_r = np.asarray(scalefacs_r, dtype=np.int64)
        for b in range(22):
            lo, hi = edges[b], edges[b + 1]
            if lo < nzend_r:
                continue
            p = int(sf_r[min(b, 20)])
            if p == 7:
                continue  # illegal position: MS/passthrough stands
            left[lo:hi] = (m_fp[lo:hi] * ILR_FP[p]) // FP_ONE
            right[lo:hi] = (m_fp[lo:hi] * IRR_FP[p]) // FP_ONE
    return left, right


def joint_mix_granule_short(
    m_fp: np.ndarray,
    s_fp: np.ndarray,
    ext: int,
    sf36_r,
    nzend_r: int,
    sr: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Joint mixing for a SHORT (window-switching) granule pair, on the
    STORED (band-major, pre-reorder) layout: intensity applies per
    (band, window) — window w of band b is an intensity region iff its
    first stored line (3*edge[b] + w*width) lies at/above the right
    channel's zero-part start, with is_pos = the right granule's short
    scalefactor sf36[3b + w]; band 12 (no scalefactor) inherits band
    11's same-window is_pos, as long band 21 inherits band 20's.
    is_pos 7 falls back to MS/passthrough, as in the long path."""
    if ext & 2:
        left = ((m_fp + s_fp) * MS_FP) // FP_ONE
        right = ((m_fp - s_fp) * MS_FP) // FP_ONE
    else:
        left = m_fp.copy()
        right = s_fp.copy()
    if ext & 1:
        edges = SFB_SHORT[sr]
        sf_r = np.asarray(sf36_r, dtype=np.int64)
        if sf_r.size != 36:
            raise ValueError("corrupt joint stream: expected 36 short scalefactors")
        for b in range(13):
            width = edges[b + 1] - edges[b]
            base = 3 * edges[b]
            for w in range(3):
                lo = base + w * width
                if lo < nzend_r:
                    continue
                p = int(sf_r[3 * min(b, 11) + w])
                if p == 7:
                    continue
                hi = lo + width
                left[lo:hi] = (m_fp[lo:hi] * ILR_FP[p]) // FP_ONE
                right[lo:hi] = (m_fp[lo:hi] * IRR_FP[p]) // FP_ONE
    return left, right


def joint_stereo_lines(dec: dict) -> list[dict]:
    """Requantize + stereo-process a decode_mp3_main_joint result:
    returns per-granule line records in the requantize_lines shape
    (dense xr_fp int64[576] per channel) with MS/intensity applied, for
    operators/mp3imdct.time_samples."""
    if dec.get("nch") != 2:
        raise ValueError("joint stereo processing needs a two-channel stream")
    sr = dec["sample_rate"]
    lines = requantize_lines(dec)
    by_key: dict[tuple[int, int], dict[int, int]] = {}
    for idx, rec in enumerate(lines):
        by_key.setdefault((rec["frame"], rec["granule"]), {})[rec["ch"]] = idx
    recs_by_key = {}
    for gr in dec["granules"]:
        recs_by_key[(gr["frame"], gr["granule"], gr["ch"])] = gr
    out = [dict(rec) for rec in lines]
    g0_eff_r: dict[int, "np.ndarray"] = {}
    for (f, g), chs in by_key.items():
        if set(chs) != {0, 1}:
            raise ValueError("corrupt joint stream: missing channel granule")
        gr_l = recs_by_key[(f, g, 0)]
        gr_r = recs_by_key[(f, g, 1)]
        ext = gr_l["mode_ext"]
        if ext == 0:
            continue
        if gr_l["short"] != gr_r["short"]:
            raise ValueError(
                "unsupported joint stream: channel block types differ in a "
                "mode_extension frame (intensity band geometry is undefined)"
            )
        if gr_l["short"]:
            left, right = joint_mix_granule_short(
                lines[chs[0]]["xr_fp"],
                lines[chs[1]]["xr_fp"],
                ext,
                gr_r["scalefacs"],
                len(gr_r["values"]),
                sr,
            )
        else:
            # is_pos reads the right granule's EFFECTIVE scalefactors —
            # scfsi-shared groups copy granule 0's, exactly as
            # requantization applies them; the RAW transmitted list is
            # shorter and band-misaligned under scfsi (a corrupt stream
            # flipping a scfsi bit must reject, not misindex).
            eff_r = _effective_long_scalefacs(gr_r, g0_eff_r.get(f))
            if g == 0:
                g0_eff_r[f] = eff_r
            left, right = joint_mix_granule(
                lines[chs[0]]["xr_fp"],
                lines[chs[1]]["xr_fp"],
                ext,
                eff_r,
                len(gr_r["values"]),
                sr,
            )
        out[chs[0]]["xr_fp"] = left
        out[chs[1]]["xr_fp"] = right
    # Uniform headroom bit for the WHOLE stream (mixed and ext==0
    # granules alike, so the stream stays on one scale): numpy //
    # floors, and the oracle folds this into its a0 division —
    # floor(floor(x/2)/2^4) == floor(x/2^5).
    for rec in out:
        rec["xr_fp"] = rec["xr_fp"] // (1 << JOINT_HEADROOM_BITS)
    return out
