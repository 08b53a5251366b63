"""4x4 integer transform, Hadamard DC transforms, quant/dequant — scalar ref.

Normative decode-side math follows spec 8.5.10-8.5.12 exactly (bit-exact
with default flat scaling matrices); encode-side quantization follows the
JM convention (upstream `lencod/src/quant4x4.c`, `block.c` dct_luma /
dct_luma_16x16 / dct_chroma — SURVEY.md §2a #13): dead-zone quantizer with
f = (1<<qbits)/3 intra, /6 inter.

All arrays int64 numpy for headroom; results fit int32.
"""

from __future__ import annotations

import numpy as np

# forward core matrix Cf (spec-equivalent; encoder-side choice)
CF = np.array([[1, 1, 1, 1],
               [2, 1, -1, -2],
               [1, -1, -1, 1],
               [1, -2, 2, -1]], dtype=np.int64)

# 4x4 Hadamard (symmetric, H @ H = 4 I)
H4 = np.array([[1, 1, 1, 1],
               [1, 1, -1, -1],
               [1, -1, -1, 1],
               [1, -1, 1, -1]], dtype=np.int64)

H2 = np.array([[1, 1], [1, -1]], dtype=np.int64)

# MF quant multipliers per qp%6, position class (JM quant_coef)
_MF_CLASS = np.array([
    [13107, 11916, 10082, 9362, 8192, 7282],   # class 0: (i,j) both even
    [5243, 4660, 4194, 3647, 3355, 2893],      # class 1: both odd
    [8066, 7490, 6554, 5825, 5243, 4559],      # class 2: mixed
], dtype=np.int64).T  # [6, 3]

# V dequant scale (normAdjust4x4; spec LevelScale = 16*V with flat weights)
_V_CLASS = np.array([
    [10, 11, 13, 14, 16, 18],
    [16, 18, 20, 23, 25, 29],
    [13, 14, 16, 18, 20, 23],
], dtype=np.int64).T  # [6, 3]

# position → class map for a 4x4 block
_POS_CLASS = np.array([[0, 2, 0, 2],
                       [2, 1, 2, 1],
                       [0, 2, 0, 2],
                       [2, 1, 2, 1]], dtype=np.int64)

MF_TABLE = _MF_CLASS[:, _POS_CLASS]   # [6, 4, 4]
V_TABLE = _V_CLASS[:, _POS_CLASS]     # [6, 4, 4]

# chroma QP mapping (spec Table 8-15), index by clipped qPi 0..51
CHROMA_QP_TABLE = np.concatenate([
    np.arange(30),
    np.array([29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37,
              38, 38, 38, 39, 39, 39, 39]),
]).astype(np.int64)

# zig-zag scan for 4x4 blocks (raster index in scan order)
ZIGZAG_4x4 = np.array([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15],
                      dtype=np.int64)



def wrap16(x):
    """Wrap to int16 — libavcodec (and x264's own reconstruction) store
    dequantized coefficients in int16_t; streams that push levels past
    the conforming range (x264 at QP~0) are decoded with two's-complement
    wrapping by every production decoder, so bit-exactness against them
    requires reproducing it.  Identity for all in-range values."""
    return ((np.asarray(x, dtype=np.int64) + 32768) & 65535) - 32768


def chroma_qp(qp_y: int, offset: int = 0) -> int:
    qpi = int(np.clip(qp_y + offset, 0, 51))
    return int(CHROMA_QP_TABLE[qpi])


def fdct4x4(x: np.ndarray) -> np.ndarray:
    """Forward 4x4 integer transform W = Cf X Cf^T."""
    x = np.asarray(x, dtype=np.int64)
    return CF @ x @ CF.T


def level_limit_ac(qp: int) -> np.ndarray:
    """Per-position max |level| so the dequantized coefficient fits int16
    (spec 8.5.12 range constraint — an encoder conformance duty; reference
    decoders store scaled coefficients as 16-bit)."""
    return 32767 // (V_TABLE[qp % 6] << (qp // 6))


def level_limit_dc(qp: int) -> int:
    """Max |DC level| such that a single level keeps the scaled luma DC
    (spec 8.5.10) within int16.  A single level c produces |dcY| = |c| *
    16*V00 * 2^(q6-6); real residuals cannot align 16 large levels, so the
    single-level bound is the practical encoder-conformance clamp (it never
    binds on natural 8-bit content)."""
    q6 = qp // 6
    ls = 16 * int(_V_CLASS[qp % 6, 0])
    if q6 >= 6:
        return max(1, 32767 // (ls << (q6 - 6)))
    return max(1, (32767 << (6 - q6)) // ls)


def level_limit_cdc(qp: int) -> int:
    """Max |chroma DC level| (single-level bound, spec 8.5.11)."""
    q6 = qp // 6
    ls = 16 * int(_V_CLASS[qp % 6, 0])
    # |dcC| = |c| * ls * 2^q6 / 32 per single level
    return max(1, (32767 << 5) // (ls << q6))


def quant4x4(w: np.ndarray, qp: int, intra: bool) -> np.ndarray:
    """Dead-zone scalar quant of a 4x4 coefficient block (JM convention)."""
    qbits = 15 + qp // 6
    mf = MF_TABLE[qp % 6]
    f = (1 << qbits) // (3 if intra else 6)
    w = np.asarray(w, dtype=np.int64)
    lev = (np.abs(w) * mf + f) >> qbits
    lev = np.minimum(lev, level_limit_ac(qp))
    return np.sign(w) * lev


def dequant4x4(c: np.ndarray, qp: int, ws=None) -> np.ndarray:
    """Normative AC dequant (spec 8.5.12.1); int16-wrapped like
    libavcodec.  `ws`: [4,4] weightScale matrix (scaling lists) — the
    flat-16 case reduces to d = c * V(qp%6) << (qp/6)."""
    c = np.asarray(c, dtype=np.int64)
    if ws is None:
        return wrap16(c * V_TABLE[qp % 6] << (qp // 6))
    ls = np.asarray(ws, dtype=np.int64) * V_TABLE[qp % 6]
    q6 = qp // 6
    if qp >= 24:
        return wrap16((c * ls) << (q6 - 4))
    return wrap16((c * ls + (1 << (3 - q6))) >> (4 - q6))


def idct4x4(d: np.ndarray) -> np.ndarray:
    """Normative inverse 4x4 transform (spec 8.5.12.2) incl. (x+32)>>6.

    Input d: dequantized coefficients. Output: residual (to add to pred).
    """
    d = np.asarray(d, dtype=np.int64)
    # horizontal (rows)
    e = np.empty_like(d)
    f = np.empty_like(d)
    e0 = d[:, 0] + d[:, 2]
    e1 = d[:, 0] - d[:, 2]
    e2 = (d[:, 1] >> 1) - d[:, 3]
    e3 = d[:, 1] + (d[:, 3] >> 1)
    f[:, 0] = e0 + e3
    f[:, 1] = e1 + e2
    f[:, 2] = e1 - e2
    f[:, 3] = e0 - e3
    # vertical (columns)
    g0 = f[0, :] + f[2, :]
    g1 = f[0, :] - f[2, :]
    g2 = (f[1, :] >> 1) - f[3, :]
    g3 = f[1, :] + (f[3, :] >> 1)
    h = np.empty_like(d)
    h[0, :] = g0 + g3
    h[1, :] = g1 + g2
    h[2, :] = g1 - g2
    h[3, :] = g0 - g3
    return (h + 32) >> 6


def hadamard4x4_fwd_quant_dc(wdc: np.ndarray, qp: int, intra: bool = True):
    """Encoder luma-DC path for I16x16: Hadamard + quant (JM dct_luma_16x16).

    wdc: 4x4 array of the 16 per-block DCT DC coefficients.
    Returns quantized DC levels (4x4).
    """
    m = H4 @ np.asarray(wdc, dtype=np.int64) @ H4
    qbits = 15 + qp // 6
    mf00 = int(_MF_CLASS[qp % 6, 0])
    f = (1 << qbits) // (3 if intra else 6)
    lev = ((np.abs(m) >> 1) * mf00 + 2 * f) >> (qbits + 1)
    lev = np.minimum(lev, level_limit_dc(qp))
    return np.sign(m) * lev


def hadamard4x4_inv_dequant_dc(c: np.ndarray, qp: int,
                               w00: int = 16) -> np.ndarray:
    """Normative luma-DC inverse (spec 8.5.10): inverse Hadamard then
    scale; `w00` = weightScale(0,0) of the intra luma list (16 flat)."""
    f = H4 @ np.asarray(c, dtype=np.int64) @ H4
    q6 = qp // 6
    ls = w00 * int(_V_CLASS[qp % 6, 0])  # LevelScale4x4(qp%6, 0, 0)
    if qp >= 36:
        return wrap16((f * ls) << (q6 - 6))
    return wrap16((f * ls + (1 << (5 - q6))) >> (6 - q6))


def hadamard2x2_fwd_quant_dc(wdc: np.ndarray, qp: int, intra: bool):
    """Encoder chroma-DC path (JM dct_chroma): 2x2 Hadamard + quant."""
    m = H2 @ np.asarray(wdc, dtype=np.int64) @ H2
    qbits = 15 + qp // 6
    mf00 = int(_MF_CLASS[qp % 6, 0])
    f = (1 << qbits) // (3 if intra else 6)
    lev = (np.abs(m) * mf00 + 2 * f) >> (qbits + 1)
    lev = np.minimum(lev, level_limit_cdc(qp))
    return np.sign(m) * lev


def hadamard2x2_inv_dequant_dc(c: np.ndarray, qp: int,
                               w00: int = 16) -> np.ndarray:
    """Normative chroma-DC inverse (spec 8.5.11, 4:2:0); `w00` =
    weightScale(0,0) of the chroma list (16 flat)."""
    f = H2 @ np.asarray(c, dtype=np.int64) @ H2
    ls = w00 * int(_V_CLASS[qp % 6, 0])
    return wrap16(((f * ls) << (qp // 6)) >> 5)


def residual_block_recon(coeff: np.ndarray, qp: int,
                         dc: int | None = None, ws=None):
    """Dequant + IDCT for one 4x4 block; `dc` (if given) overrides position
    (0,0) with an externally scaled DC value (I16x16 / chroma paths);
    `ws` = weightScale matrix (scaling lists)."""
    d = dequant4x4(coeff, qp, ws=ws)
    if dc is not None:
        d[0, 0] = dc
    return idct4x4(d)


def clip1(x: np.ndarray) -> np.ndarray:
    return np.clip(x, 0, 255)


def satd4x4(diff: np.ndarray) -> int:
    """Sum of absolute Hadamard-transformed differences (JM me_distortion)."""
    m = H4 @ np.asarray(diff, dtype=np.int64) @ H4
    return int((np.abs(m).sum() + 1) // 2)
