"""Batched 4x4 transform / quant / SATD kernels (JAX).

Vectorized counterparts of `tpu264.ref.transform` (normative math, spec
8.5.10-8.5.12; JM `block.c`/`quant4x4.c` parity — SURVEY.md §2a #13).
All functions map over arbitrary leading batch dimensions of [..., 4, 4]
int32 arrays.  Matmuls use int32 accumulation on the XLA/VPU path; the
Pallas MXU variants live in `pallas_kernels.py` (bit-exact twins, used
for large batches via `fdct_quant4x4` when `use_pallas` is enabled).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpu264.ref import transform as ref

CF = jnp.asarray(ref.CF, dtype=jnp.int32)
H4 = jnp.asarray(ref.H4, dtype=jnp.int32)
H2 = jnp.asarray(ref.H2, dtype=jnp.int32)
MF_TABLE = jnp.asarray(ref.MF_TABLE, dtype=jnp.int32)    # [6,4,4]
V_TABLE = jnp.asarray(ref.V_TABLE, dtype=jnp.int32)      # [6,4,4]
MF00 = jnp.asarray(ref._MF_CLASS[:, 0], dtype=jnp.int32)  # [6]
V00 = jnp.asarray(ref._V_CLASS[:, 0], dtype=jnp.int32)    # [6]
ZIGZAG_4x4 = jnp.asarray(ref.ZIGZAG_4x4, dtype=jnp.int32)

# per-QP level-limit tables so qp can be a traced scalar (rate control
# varies QP per frame without recompiling)
LIMIT_AC = jnp.asarray(np.stack([ref.level_limit_ac(q) for q in range(52)]),
                       jnp.int32)                         # [52,4,4]
LIMIT_DC = jnp.asarray([ref.level_limit_dc(q) for q in range(52)], jnp.int32)
LIMIT_CDC = jnp.asarray([ref.level_limit_cdc(q) for q in range(52)],
                        jnp.int32)


def _mm(a, m_left, m_right):
    """a @ m_right with m_left @ first: computes m_left @ a @ m_right over
    leading batch dims, int32."""
    return jnp.einsum("ij,...jk,kl->...il", m_left, a, m_right)


def fdct4x4(x):
    """W = Cf X Cf^T, batched."""
    return _mm(x.astype(jnp.int32), CF, CF.T)


# batches at least this large route through the Pallas MXU kernel when
# enabled (smaller calls inside the wavefront scan stay fused XLA)
_PALLAS_MIN_BLOCKS = 2048


def fdct_quant4x4(x, qp, intra: bool):
    """Fused forward DCT + quant over [..., 4, 4] blocks.

    Dispatches to the Pallas MXU kernel (`pallas_kernels.fdct_quant4x4`,
    bit-exact twin) for large batches when `use_pallas` is on."""
    from . import pallas_kernels as pk
    nblocks = 1
    for d in x.shape[:-2]:
        nblocks *= d
    if pk.enabled() and nblocks >= _PALLAS_MIN_BLOCKS:
        return pk.fdct_quant4x4(x, qp, intra)
    return quant4x4(fdct4x4(x), qp, intra=intra)


def quant4x4(w, qp, intra: bool):
    """qp may be a python int or a traced int32 scalar."""
    qbits = 15 + qp // 6
    mf = MF_TABLE[qp % 6]
    f = ((1 << qbits) if isinstance(qp, int) else (1 << qbits).astype(
        jnp.int32)) // (3 if intra else 6)
    lev = (jnp.abs(w) * mf + f) >> qbits
    # spec 8.5.12 int16 range constraint on dequantized coefficients
    lev = jnp.minimum(lev, LIMIT_AC[qp])
    return jnp.sign(w) * lev


def dequant4x4(c, qp):
    return (c * V_TABLE[qp % 6]) << (qp // 6)


def idct4x4(d):
    """Normative inverse transform incl. (x+32)>>6, batched (spec 8.5.12.2)."""
    d = d.astype(jnp.int32)
    # horizontal
    e0 = d[..., :, 0] + d[..., :, 2]
    e1 = d[..., :, 0] - d[..., :, 2]
    e2 = (d[..., :, 1] >> 1) - d[..., :, 3]
    e3 = d[..., :, 1] + (d[..., :, 3] >> 1)
    f = jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    # vertical
    g0 = f[..., 0, :] + f[..., 2, :]
    g1 = f[..., 0, :] - f[..., 2, :]
    g2 = (f[..., 1, :] >> 1) - f[..., 3, :]
    g3 = f[..., 1, :] + (f[..., 3, :] >> 1)
    h = jnp.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=-2)
    return (h + 32) >> 6


def block_recon(coeff, qp, dc=None):
    """Dequant + IDCT; optional external DC override at position (0,0)."""
    d = dequant4x4(coeff, qp)
    if dc is not None:
        d = d.at[..., 0, 0].set(dc)
    return idct4x4(d)


def hadamard4x4_fwd_quant_dc(wdc, qp, intra: bool = True):
    m = _mm(wdc.astype(jnp.int32), H4, H4)
    qbits = 15 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)
    lev = ((jnp.abs(m) >> 1) * MF00[qp % 6] + 2 * f) >> (qbits + 1)
    lev = jnp.minimum(lev, LIMIT_DC[qp])
    return jnp.sign(m) * lev


def hadamard4x4_inv_dequant_dc(c, qp):
    f = _mm(c.astype(jnp.int32), H4, H4)
    q6 = qp // 6
    ls = 16 * V00[qp % 6]
    if isinstance(qp, int):
        if qp >= 36:
            return (f * ls) << (q6 - 6)
        return (f * ls + (1 << (5 - q6))) >> (6 - q6)
    hi = (f * ls) << jnp.maximum(q6 - 6, 0)
    lo = (f * ls + (1 << jnp.maximum(5 - q6, 0))) >> jnp.maximum(6 - q6, 0)
    return jnp.where(qp >= 36, hi, lo)


def hadamard2x2_fwd_quant_dc(wdc, qp, intra: bool):
    m = _mm(wdc.astype(jnp.int32), H2, H2)
    qbits = 15 + qp // 6
    f = ((1 << qbits) if isinstance(qp, int) else (1 << qbits).astype(
        jnp.int32)) // (3 if intra else 6)
    lev = (jnp.abs(m) * MF00[qp % 6] + 2 * f) >> (qbits + 1)
    lev = jnp.minimum(lev, LIMIT_CDC[qp])
    return jnp.sign(m) * lev


def hadamard2x2_inv_dequant_dc(c, qp):
    f = _mm(c.astype(jnp.int32), H2, H2)
    ls = 16 * V00[qp % 6]
    return ((f * ls) << (qp // 6)) >> 5


def satd4x4(diff):
    """(sum |H diff H| + 1) >> 1 per block, batched over [..., 4, 4]."""
    m = _mm(diff.astype(jnp.int32), H4, H4)
    return (jnp.abs(m).sum(axis=(-2, -1)) + 1) >> 1


def clip1(x):
    return jnp.clip(x, 0, 255)


def zigzag_scan(blocks):
    """[..., 4, 4] → [..., 16] in zig-zag scan order."""
    flat = blocks.reshape(blocks.shape[:-2] + (16,))
    return flat[..., ZIGZAG_4x4]


def zigzag_unscan(scanned):
    """[..., 16] scan order → [..., 4, 4] raster."""
    inv = jnp.zeros(16, dtype=jnp.int32).at[ZIGZAG_4x4].set(
        jnp.arange(16, dtype=jnp.int32))
    flat = scanned[..., inv]
    return flat.reshape(scanned.shape[:-1] + (4, 4))
