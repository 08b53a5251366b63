"""Pallas TPU kernels for the hot per-block math (BASELINE.json north
star: "restructured as vectorizable Pallas kernels").

Design notes (tpu264-specific):

* 4x4 transform as one MXU matmul: W = Cf X Cf^T is linear, so over the
  row-major flattening vec(W) = (Cf o Cf) vec(X) with `o` the Kronecker
  product — a [16,16] x [16,N] matmul with the block axis N on the lanes.
  Residuals are <= 2^9 and |W| <= 2^15, so float32 MXU accumulation is
  exact; quantization stays int32 on the VPU inside the same kernel
  (JM `block.c`/`quant4x4.c` semantics — SURVEY.md §2a #13).
* Deblock line filters are pure VPU elementwise over [8, L] windows
  (p3..q3 on sublanes, lines on lanes) — spec 8.7 normative math,
  identical to `kernels.deblock.filter_luma_lines`.

All kernels are bit-exact twins of the jnp reference path
(`kernels/transform.py`, `kernels/deblock.py`); tests compare them on
random inputs in interpret mode (CPU) and compiled (TPU).  They are
enabled via `EncoderConfig.use_pallas` / `set_enabled`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu264.ref import transform as ref

# vec(Cf X Cf^T) = (Cf kron Cf) vec(X) for row-major vec
_KRON_F = np.kron(ref.CF, ref.CF).astype(np.float32)            # [16, 16]
_MF_FLAT = ref.MF_TABLE.reshape(6, 16).astype(np.int32)         # [6, 16]
_LIMIT_FLAT = np.stack(
    [ref.level_limit_ac(q).reshape(16) for q in range(52)]).astype(np.int32)

LANES = 512          # block-axis tile per grid step


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def _pad_lanes(x2d):
    n = x2d.shape[1]
    npad = (-n) % LANES
    if npad:
        x2d = jnp.pad(x2d, ((0, 0), (0, npad)))
    return x2d, n


# ------------------------------------------------------ fused DCT + quant

def _dct_quant_kernel(k_ref, x_ref, mf_ref, lim_ref, s_ref, out_ref):
    w = jnp.dot(k_ref[:], x_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    wi = w.astype(jnp.int32)
    f = s_ref[0]
    qbits = s_ref[1]
    lev = (jnp.abs(wi) * mf_ref[:] + f) >> qbits
    lev = jnp.minimum(lev, lim_ref[:])
    out_ref[:] = jnp.sign(wi) * lev


def _dct_kernel(k_ref, x_ref, out_ref):
    w = jnp.dot(k_ref[:], x_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    out_ref[:] = w.astype(jnp.int32)


def _quant_params(qp, intra: bool):
    """(mf [16,1], limit [16,1], scal [2]) for python-int or traced qp."""
    mf = jnp.asarray(_MF_FLAT)[qp % 6][:, None]
    lim = jnp.asarray(_LIMIT_FLAT)[qp][:, None]
    qbits = 15 + qp // 6
    if isinstance(qp, int):
        f = (1 << qbits) // (3 if intra else 6)
        scal = jnp.asarray([f, qbits], jnp.int32)
    else:
        f = ((1 << qbits).astype(jnp.int32) // (3 if intra else 6))
        scal = jnp.stack([f, qbits]).astype(jnp.int32)
    return mf, lim, scal


def fdct_quant4x4(x, qp, intra: bool):
    """Fused forward 4x4 DCT + quant: [..., 4, 4] int32 -> levels.

    Bit-exact twin of `kt.quant4x4(kt.fdct4x4(x), qp, intra)`."""
    shape = x.shape
    xt = x.reshape(-1, 16).T.astype(jnp.int32)                  # [16, N]
    xt, n = _pad_lanes(xt)
    mf, lim, scal = _quant_params(qp, intra)
    grid = (xt.shape[1] // LANES,)
    out = pl.pallas_call(
        _dct_quant_kernel,
        out_shape=jax.ShapeDtypeStruct(xt.shape, jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((16, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(jnp.asarray(_KRON_F), xt, mf, lim, scal)
    return out[:, :n].T.reshape(shape)


def fdct4x4(x):
    """Forward 4x4 DCT via MXU: bit-exact twin of `kt.fdct4x4`."""
    shape = x.shape
    xt = x.reshape(-1, 16).T.astype(jnp.int32)
    xt, n = _pad_lanes(xt)
    grid = (xt.shape[1] // LANES,)
    out = pl.pallas_call(
        _dct_kernel,
        out_shape=jax.ShapeDtypeStruct(xt.shape, jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(jnp.asarray(_KRON_F), xt)
    return out[:, :n].T.reshape(shape)


# ------------------------------------------------------ deblock line filter

def _deblock_luma_kernel(win_ref, bs_ref, tc0_ref, s_ref, out_ref):
    alpha = s_ref[0]
    beta = s_ref[1]
    p3, p2, p1, p0 = (win_ref[i, :] for i in range(4))
    q0, q1, q2, q3 = (win_ref[i, :] for i in range(4, 8))
    bs = bs_ref[0, :]
    tc0 = tc0_ref[0, :]
    fflag = ((jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
             & (jnp.abs(q1 - q0) < beta) & (bs > 0))
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta
    tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = jnp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = jnp.clip(p0 + delta, 0, 255)
    nq0 = jnp.clip(q0 - delta, 0, 255)
    np1 = p1 + jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0)
    nq1 = q1 + jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0)
    use_n = fflag & (bs < 4)
    strong = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = fflag & (bs == 4) & strong & ap
    sq = fflag & (bs == 4) & strong & aq
    weak4 = fflag & (bs == 4)
    o_p0 = jnp.where(use_n, np0,
                     jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                               jnp.where(weak4, (2 * p1 + p0 + q1 + 2) >> 2, p0)))
    o_p1 = jnp.where(use_n & ap, np1,
                     jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1))
    o_p2 = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    o_q0 = jnp.where(use_n, nq0,
                     jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                               jnp.where(weak4, (2 * q1 + q0 + p1 + 2) >> 2, q0)))
    o_q1 = jnp.where(use_n & aq, nq1,
                     jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1))
    o_q2 = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    out_ref[0, :] = p3
    out_ref[1, :] = o_p2
    out_ref[2, :] = o_p1
    out_ref[3, :] = o_p0
    out_ref[4, :] = o_q0
    out_ref[5, :] = o_q1
    out_ref[6, :] = o_q2
    out_ref[7, :] = q3


def filter_luma_lines(win, bs, alpha, beta, tc0_row):
    """Pallas twin of `kernels.deblock.filter_luma_lines`.

    win [..., 8] int32 (p3..q3 per line), bs broadcastable to win[..., 0].
    """
    shape = win.shape
    lines = win.reshape(-1, 8).T.astype(jnp.int32)               # [8, L]
    bsf = jnp.broadcast_to(bs, shape[:-1]).reshape(1, -1).astype(jnp.int32)
    tc0 = jnp.asarray(tc0_row)[jnp.clip(bsf, 1, 3) - 1]
    lines, n = _pad_lanes(lines)
    bsf, _ = _pad_lanes(bsf)
    tc0, _ = _pad_lanes(tc0)
    scal = jnp.stack([jnp.asarray(alpha, jnp.int32),
                      jnp.asarray(beta, jnp.int32)])
    grid = (lines.shape[1] // LANES,)
    out = pl.pallas_call(
        _deblock_luma_kernel,
        out_shape=jax.ShapeDtypeStruct(lines.shape, jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(lines, bsf, tc0, scal)
    return out[:, :n].T.reshape(shape)


# ------------------------------------------------------------------ switch

_ENABLED = False


def set_enabled(on: bool) -> None:
    """Route large-batch transform calls through Pallas (EncoderConfig
    `use_pallas`)."""
    global _ENABLED
    _ENABLED = bool(on)


def enabled() -> bool:
    return _ENABLED
