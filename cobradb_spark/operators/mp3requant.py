"""MPEG-1 Layer III REQUANTIZATION (ISO/IEC 11172-3 2.4.3.4) — from
decoded Huffman symbols + side info to spectral values, no codec
library.

This moves the documented Layer III boundary from "requantization +
IMDCT + synthesis" to "IMDCT + synthesis only" (pure waveform
transforms): the spectral-domain math — |is|^(4/3) scaling, the
global_gain 2^((gg-210)/4) ladder, scalefac_scale halves/units,
preflag's pretab highlights (Table B.6), short-window subblock gains,
scfsi-SHARED scalefactors applied (not just parsed), and the
long/short scalefactor-band geometry (Tables B.8 long + short) that
maps each spectral line to the band whose scalefactor scales it — is
implemented for real and hash-checked against a pure-SQL replay.

Cross-engine exactness design: every Layer III exponent is a multiple
of 1/4, so each requantized value factors as

    xr = sign * P43[|is|] * QP[q mod 4] * 2^(q//4)      (q = quarter exp)

where P43 (|is|^(4/3), |is| <= 3 for the bundled small-value
codebooks) and QP (2^(k/4)) are four-entry LITERAL double tables
shared verbatim by this module and the DuckDB oracle.  IEEE-754
multiplication of identical doubles in identical order is
bit-deterministic across engines, 2^n is exact, and FLOOR of an
identical double is unambiguous — so the fixed-point pin

    xr_fp = sign * floor(((P43[a] * QP[r]) * 2.0**A) * 1e9)

is reproducible bit-exactly by numpy here and by DuckDB in the oracle
with no rounding-mode or libm dependence (the association order is
part of the contract; both sides write the same parenthesization).

IMDCT + polyphase synthesis to PCM are real too, downstream in
operators/mp3imdct.py (which consumes requantize_lines below).
Remaining honest boundary: the linbits escape magnitudes (|is| > 3
needs the unbundled escape codebooks — the bundled tables max out at
3 — so requantization of escapes is unreachable here; a stream that
somehow presented one raises).
"""

from __future__ import annotations

import numpy as np

from cobradb_spark.operators.mp3huff import SFB_LONG, decode_mp3_main

# Short-block scalefactor-band edges per sample rate (ISO 11172-3
# Table B.8, short blocks): 13 bands of 3 windows x width; band 12
# (the 192-line tail per window) carries no scalefactor, like long
# band 21.
SFB_SHORT = {
    44100: (0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    48000: (0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    32000: (0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192),
}

# pretab (Table B.6): preflag's fixed scalefactor increments for long
# bands 0..21.
PRETAB = (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

# |is|^(4/3) for the bundled-codebook magnitude range, and 2^(k/4):
# LITERAL doubles mirrored character-for-character in the SQL oracle.
P43 = (0.0, 1.0, 2.5198420997897464, 4.3267487109222245)
QP = (1.0, 1.189207115002721, 1.4142135623730951, 1.681792830507429)

# scfsi groups over the 21 long bands: (start, end); bit 3 = group 0.
_SCFSI_GROUPS = ((0, 6), (6, 11), (11, 16), (16, 21))

_FP_SCALE = 1e9


def _long_band_of_line(sr: int) -> np.ndarray:
    """Line index (0..575) -> long scalefactor band (0..21)."""
    edges = SFB_LONG[sr]
    out = np.empty(576, dtype=np.int64)
    for b in range(22):
        out[edges[b] : edges[b + 1]] = b
    return out


def _short_maps(sr: int) -> tuple[np.ndarray, np.ndarray]:
    """Line index -> (short band 0..12, window 0..2) under the short-
    block spectral layout: lines ordered band-major, then window, then
    line-within-band (each band contributes 3 consecutive
    window-chunks of its width)."""
    edges = SFB_SHORT[sr]
    band = np.empty(576, dtype=np.int64)
    win = np.empty(576, dtype=np.int64)
    for b in range(13):
        width = edges[b + 1] - edges[b]
        base = 3 * edges[b]
        for w in range(3):
            s = base + w * width
            band[s : s + width] = b
            win[s : s + width] = w
    return band, win


def _effective_long_scalefacs(gr: dict, g0_eff: np.ndarray | None) -> np.ndarray:
    """The 21 long-band scalefactors this granule's requantization
    actually uses: granule 1 copies scfsi-shared groups from granule
    0's effective list (ISO 2.4.2.7 scfsi semantics)."""
    if gr["granule"] == 0 or not gr["scfsi"]:
        eff = np.asarray(gr["scalefacs"], dtype=np.int64)
        if eff.size != 21:
            raise ValueError("corrupt granule record: expected 21 long scalefactors")
        return eff
    if g0_eff is None:
        raise ValueError("corrupt mp3 stream: scfsi sharing without granule 0")
    eff = np.empty(21, dtype=np.int64)
    it = iter(gr["scalefacs"])
    for k, (lo, hi) in enumerate(_SCFSI_GROUPS):
        if (gr["scfsi"] >> (3 - k)) & 1:
            eff[lo:hi] = g0_eff[lo:hi]
        else:
            for b in range(lo, hi):
                eff[b] = next(it)
    return eff


def _requant_fp(a: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Fixed-point magnitude floor(((P43[a] * QP[r]) * 2^A) * 1e9) with
    qs = q + 400 >= 0 so // and % agree with SQL's on both engines."""
    if a.size and int(a.max()) > 3:
        raise NotImplementedError(
            "requantization of linbits escape magnitudes (|is| > 3) "
            "needs the unbundled large-value codebooks"
        )
    qs = q + 400
    if qs.size and int(qs.min()) < 0:
        raise ValueError("quarter exponent below the representable pin range")
    p = np.asarray(P43)[a] * np.asarray(QP)[qs % 4]
    return np.floor(p * np.power(2.0, qs // 4 - 100) * _FP_SCALE)


def requantize_granules(dec: dict) -> dict:
    """Requantize every granule of a decode_mp3_main(_general) result;
    returns the integer aggregates the SQL oracle replays:

    - sum_q: sum of quarter exponents over nonzero lines (pins
      global_gain, scalefac_scale, preflag/pretab, subblock gains,
      scfsi sharing, and the band geometry — integer-exact);
    - sum_xr_fp / sum_abs_xr_fp: signed / absolute requantized values
      in 1e-9 fixed point (pins the |is|^(4/3) * 2^(q/4) magnitudes
      and every sign bit);
    - sum_abs_short_fp: the short-granule share (pins window mapping
      and subblock gains independently of the long path);
    - n_requant_nz: nonzero spectral lines (cross-checks the symbol
      decode's n_nonzero).
    """
    sr = dec["sample_rate"]
    long_band = _long_band_of_line(sr)
    pretab = np.asarray(PRETAB, dtype=np.int64)
    short_band, short_win = _short_maps(sr)
    g0_eff: dict[tuple[int, int], np.ndarray] = {}
    sum_q = sum_xr = sum_abs = sum_abs_short = n_nz = 0
    for gr in dec["granules"]:
        vals = np.asarray(gr["values"], dtype=np.int64)
        if vals.size == 0:
            continue
        a = np.abs(vals)
        gg = gr["global_gain"]
        sfs_units = 2 * (gr["scalefac_scale"] + 1)  # quarter-exp per sf step
        n = vals.size
        if gr["short"]:
            band = short_band[:n]
            win = short_win[:n]
            sf36 = np.asarray(gr["scalefacs"], dtype=np.int64)
            if sf36.size != 36:
                raise ValueError("corrupt granule record: expected 36 short scalefactors")
            sf = np.where(band < 12, sf36[np.minimum(3 * band + win, 35)], 0)
            sbg = np.asarray(gr["subblock_gain"], dtype=np.int64)[win]
            q = gg - 210 - 8 * sbg - sfs_units * sf
        else:
            eff = _effective_long_scalefacs(
                gr, g0_eff.get((gr["frame"], gr["ch"]))
            )
            if gr["granule"] == 0:
                g0_eff[(gr["frame"], gr["ch"])] = eff
            band = long_band[:n]
            sfband = np.where(band < 21, eff[np.minimum(band, 20)], 0)
            q = gg - 210 - sfs_units * (sfband + gr["preflag"] * pretab[band])
        nz = a > 0
        # int64 per line BEFORE summing: float accumulation would lose
        # exactness past 2^53, and the SQL side sums BIGINTs too
        mag = _requant_fp(a[nz], q[nz]).astype(np.int64)
        sum_q += int(q[nz].sum())
        sum_xr += int((np.sign(vals[nz]) * mag).sum())
        sum_abs += int(mag.sum())
        if gr["short"]:
            sum_abs_short += int(mag.sum())
        n_nz += int(nz.sum())
    return {
        "sum_q": sum_q,
        "sum_xr_fp": sum_xr,
        "sum_abs_xr_fp": sum_abs,
        "sum_abs_short_fp": sum_abs_short,
        "n_requant_nz": n_nz,
    }


def requantize_lines(dec: dict) -> list[dict]:
    """Per-granule DENSE requantized spectra for the time-domain stages
    (operators/mp3imdct.py): one record per granule with the full
    576-line int64 vector in 1e-9 fixed point (uncoded lines are 0),
    plus the fields the IMDCT chain needs.  The per-line math is the
    SAME helpers requantize_granules hashes (q ladder, scfsi sharing,
    band geometry, floor pin) — sign applied AFTER the magnitude floor,
    exactly as the SQL oracle writes it."""
    sr = dec["sample_rate"]
    long_band = _long_band_of_line(sr)
    pretab = np.asarray(PRETAB, dtype=np.int64)
    short_band, short_win = _short_maps(sr)
    g0_eff: dict[tuple[int, int], np.ndarray] = {}
    out: list[dict] = []
    for gr in dec["granules"]:
        vals = np.asarray(gr["values"], dtype=np.int64)
        xr = np.zeros(576, dtype=np.int64)
        if vals.size:
            a = np.abs(vals)
            gg = gr["global_gain"]
            sfs_units = 2 * (gr["scalefac_scale"] + 1)
            n = vals.size
            if gr["short"]:
                band = short_band[:n]
                win = short_win[:n]
                sf36 = np.asarray(gr["scalefacs"], dtype=np.int64)
                if sf36.size != 36:
                    raise ValueError("corrupt granule record: expected 36 short scalefactors")
                sf = np.where(band < 12, sf36[np.minimum(3 * band + win, 35)], 0)
                sbg = np.asarray(gr["subblock_gain"], dtype=np.int64)[win]
                q = gg - 210 - 8 * sbg - sfs_units * sf
            else:
                eff = _effective_long_scalefacs(gr, g0_eff.get((gr["frame"], gr["ch"])))
                if gr["granule"] == 0:
                    g0_eff[(gr["frame"], gr["ch"])] = eff
                band = long_band[:n]
                sfband = np.where(band < 21, eff[np.minimum(band, 20)], 0)
                q = gg - 210 - sfs_units * (sfband + gr["preflag"] * pretab[band])
            nz = a > 0
            mag = _requant_fp(a[nz], q[nz]).astype(np.int64)
            xr[np.nonzero(nz)[0]] = np.where(vals[nz] < 0, -mag, mag)
        out.append(
            {
                "frame": gr["frame"], "ch": gr["ch"], "granule": gr["granule"],
                "short": gr["short"], "xr_fp": xr,
            }
        )
    return out


def decode_mp3_requantized(data: bytes) -> dict:
    """Full mono Layer III decode THROUGH requantization: container
    walk + side info + Huffman symbol decode (operators/mp3huff.py)
    then spectral requantization (this module).  Returns the symbol-
    decode aggregates merged with the requantization pins."""
    dec = decode_mp3_main(data)
    out = dict(dec)
    out.update(requantize_granules(dec))
    return out
