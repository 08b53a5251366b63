"""Batched intra predictors (JAX): all modes of all blocks at once.

TPU-first reformulation of spec 8.3 (JM per-block `intra4x4.c` etc. —
SURVEY.md §2a #9): every directional 4x4 mode is expressed as an integer
matmul over a 13-sample support line (left-reversed | corner | top), so a
batch of B blocks evaluates all 9 modes as one [B,13]x[13,8*16] product —
MXU-shaped — followed by a (+2)>>2 shift.  The weight tensor is derived at
import time by probing the scalar reference with impulse supports (the
predictors are linear in the support for fixed availability), so the
vectorized path is correct-by-construction against `tpu264.ref.intra`.

Support layout (4x4): sup[0:4] = l3,l2,l1,l0; sup[4] = corner Z;
sup[5:13] = t0..t7 (top-right substitution applied by the caller).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpu264.ref import intra as ref_intra

# directional 4x4 modes expressible as (w·sup + 2) >> 2
_DIR4_MODES = (ref_intra.I4_V, ref_intra.I4_H, ref_intra.I4_DDL,
               ref_intra.I4_DDR, ref_intra.I4_VR, ref_intra.I4_HD,
               ref_intra.I4_VL, ref_intra.I4_HU)


def _probe_weights4() -> np.ndarray:
    """[8, 4, 4, 13] integer weights via impulse probing of the scalar ref."""
    w = np.zeros((len(_DIR4_MODES), 4, 4, 13), dtype=np.int64)
    for mi, mode in enumerate(_DIR4_MODES):
        for j in range(13):
            sup = np.zeros(13, dtype=np.int64)
            sup[j] = 4
            left = sup[0:4][::-1].copy()   # sup[3] = l0 ... sup[0] = l3
            tl = int(sup[4])
            top = sup[5:13].copy()
            p = ref_intra.predict_4x4(mode, top, left, tl, True, True, True)
            w[mi, :, :, j] = p
    return w


_W4 = _probe_weights4()                     # numpy [8,4,4,13]
W4 = jnp.asarray(_W4.reshape(8 * 16, 13).T, dtype=jnp.int32)  # [13, 128]

# availability requirement masks per mode 0..8: (top, left, topleft)
_NEEDS = np.zeros((9, 3), dtype=bool)
for m, need in ref_intra.I4_MODE_NEEDS.items():
    _NEEDS[m] = need
NEEDS4 = jnp.asarray(_NEEDS)


def predict4x4_all(top, left, tl):
    """All 9 modes for B blocks.

    Args:
      top: [B, 8] int32 (top-right substitution already applied).
      left: [B, 4], tl: [B].
    Returns: preds [B, 9, 4, 4] int32 (DC at index 2 uses all-available
      rule; use `predict4x4_dc` for boundary blocks' DC).
    """
    sup = jnp.concatenate(
        [left[:, ::-1], tl[:, None], top], axis=1).astype(jnp.int32)  # [B,13]
    dirs = (sup @ W4 + 2) >> 2                       # [B, 128]
    dirs = dirs.reshape(-1, 8, 4, 4)
    dc = predict4x4_dc(top, left,
                       jnp.ones(top.shape[0], bool),
                       jnp.ones(top.shape[0], bool))
    order = [0, 1, None, 2, 3, 4, 5, 6, 7]           # dir index per mode no.
    preds = jnp.stack(
        [dirs[:, order[m]] if order[m] is not None
         else jnp.broadcast_to(dc[:, None, None], dirs.shape[0:1] + (4, 4))
         for m in range(9)], axis=1)
    return preds


def predict4x4_dc(top, left, avail_top, avail_left):
    """DC value per block with the normative availability cascade."""
    st = top[:, :4].sum(axis=1)
    sl = left.sum(axis=1)
    both = (st + sl + 4) >> 3
    t_only = (st + 2) >> 2
    l_only = (sl + 2) >> 2
    return jnp.where(avail_top & avail_left, both,
                     jnp.where(avail_top, t_only,
                               jnp.where(avail_left, l_only, 128))).astype(jnp.int32)


def mode_valid4(avail_top, avail_left, avail_tl):
    """[B, 9] validity of each 4x4 mode given neighbor availability."""
    av = jnp.stack([avail_top, avail_left, avail_tl], axis=1)  # [B,3]
    return (av[:, None, :] | ~NEEDS4[None, :, :]).all(axis=2)


# ---------------------------------------------------------------- 16x16

def predict16x16_all(top, left, tl, avail_top, avail_left):
    """[B, 4, 16, 16] predictions for V/H/DC/Plane (spec 8.3.3)."""
    b = top.shape[0]
    top = top.astype(jnp.int32)
    left = left.astype(jnp.int32)
    v = jnp.broadcast_to(top[:, None, :], (b, 16, 16))
    h = jnp.broadcast_to(left[:, :, None], (b, 16, 16))
    st, sl = top.sum(axis=1), left.sum(axis=1)
    dcv = jnp.where(avail_top & avail_left, (st + sl + 16) >> 5,
                    jnp.where(avail_top, (st + 8) >> 4,
                              jnp.where(avail_left, (sl + 8) >> 4, 128)))
    dc = jnp.broadcast_to(dcv[:, None, None], (b, 16, 16)).astype(jnp.int32)
    # plane (spec 8.3.3.4)
    wx = jnp.arange(1, 9, dtype=jnp.int32)
    tz = jnp.concatenate([tl[:, None], top], axis=1)   # tz[i] = p[i-1,-1]
    lz = jnp.concatenate([tl[:, None], left], axis=1)
    hh = (wx[None, :] * (tz[:, 9:17] - tz[:, 0:8][:, ::-1])).sum(axis=1)
    vv = (wx[None, :] * (lz[:, 9:17] - lz[:, 0:8][:, ::-1])).sum(axis=1)
    a = 16 * (left[:, 15] + top[:, 15])
    bb = (5 * hh + 32) >> 6
    cc = (5 * vv + 32) >> 6
    xs = jnp.arange(16, dtype=jnp.int32) - 7
    plane = jnp.clip(
        (a[:, None, None] + bb[:, None, None] * xs[None, None, :]
         + cc[:, None, None] * xs[None, :, None] + 16) >> 5, 0, 255)
    return jnp.stack([v, h, dc, plane], axis=1).astype(jnp.int32)


def mode_valid16(avail_top, avail_left, avail_tl):
    """[B, 4] validity for V/H/DC/Plane."""
    return jnp.stack([avail_top, avail_left,
                      jnp.ones_like(avail_top),
                      avail_top & avail_left & avail_tl], axis=1)


# ---------------------------------------------------------------- chroma

def predict_chroma_all(top, left, tl, avail_top, avail_left):
    """[B, 4, 8, 8] for DC/H/V/Plane (spec 8.3.4; DC per 4x4 quadrant)."""
    b = top.shape[0]
    top = top.astype(jnp.int32)
    left = left.astype(jnp.int32)
    h = jnp.broadcast_to(left[:, :, None], (b, 8, 8))
    v = jnp.broadcast_to(top[:, None, :], (b, 8, 8))
    # quadrant DC
    st0 = top[:, 0:4].sum(axis=1)
    st1 = top[:, 4:8].sum(axis=1)
    sl0 = left[:, 0:4].sum(axis=1)
    sl1 = left[:, 4:8].sum(axis=1)

    def _quad(stq, slq, prefer):
        both = (stq + slq + 4) >> 3
        t_only = (stq + 2) >> 2
        l_only = (slq + 2) >> 2
        if prefer == "both":
            return jnp.where(avail_top & avail_left, both,
                             jnp.where(avail_top, t_only,
                                       jnp.where(avail_left, l_only, 128)))
        if prefer == "top":
            return jnp.where(avail_top, t_only,
                             jnp.where(avail_left, l_only, 128))
        return jnp.where(avail_left, l_only,
                         jnp.where(avail_top, t_only, 128))

    q00 = _quad(st0, sl0, "both")
    q01 = _quad(st1, sl0, "top")     # top-right quadrant prefers top
    q10 = _quad(st0, sl1, "left")    # bottom-left prefers left
    q11 = _quad(st1, sl1, "both")
    dc = jnp.concatenate([
        jnp.concatenate([jnp.broadcast_to(q00[:, None, None], (b, 4, 4)),
                         jnp.broadcast_to(q01[:, None, None], (b, 4, 4))], axis=2),
        jnp.concatenate([jnp.broadcast_to(q10[:, None, None], (b, 4, 4)),
                         jnp.broadcast_to(q11[:, None, None], (b, 4, 4))], axis=2),
    ], axis=1)
    # plane
    wx = jnp.arange(1, 5, dtype=jnp.int32)
    tz = jnp.concatenate([tl[:, None], top], axis=1)
    lz = jnp.concatenate([tl[:, None], left], axis=1)
    hh = (wx[None, :] * (tz[:, 5:9] - tz[:, 0:4][:, ::-1])).sum(axis=1)
    vv = (wx[None, :] * (lz[:, 5:9] - lz[:, 0:4][:, ::-1])).sum(axis=1)
    a = 16 * (left[:, 7] + top[:, 7])
    bb = (17 * hh + 16) >> 5
    cc = (17 * vv + 16) >> 5
    xs = jnp.arange(8, dtype=jnp.int32) - 3
    plane = jnp.clip(
        (a[:, None, None] + bb[:, None, None] * xs[None, None, :]
         + cc[:, None, None] * xs[None, :, None] + 16) >> 5, 0, 255)
    return jnp.stack([dc, h, v, plane], axis=1).astype(jnp.int32)


def mode_valid_chroma(avail_top, avail_left, avail_tl):
    """[B, 4] validity for chroma DC/H/V/Plane."""
    return jnp.stack([jnp.ones_like(avail_top), avail_left, avail_top,
                      avail_top & avail_left & avail_tl], axis=1)
