"""Batched sub-pel interpolation + motion compensation (JAX).

JM precomputes 4x-upsampled reference planes once per frame
(`img_luma.c`, SURVEY.md §2a #11); here that is three separable 6-tap
convolutions over the padded reference — bulk, regular TPU compute — and
per-block quarter-pel MC becomes two dynamic gathers + one average,
driven by a static 16-entry position table (`ref.interp.QPEL_TABLE`).
Bit-exact against the scalar reference (tests/test_interp.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpu264.ref import interp as ri

TAPS = jnp.asarray(ri.TAPS, dtype=jnp.int32)

# dense [16, 7] table: fy*4+fx → p1, dy1, dx1, p2, dy2, dx2, avg
_QT = np.zeros((16, 7), dtype=np.int32)
for (fx, fy), (p1, dx1, dy1, p2, dx2, dy2, avg) in ri.QPEL_TABLE.items():
    _QT[fy * 4 + fx] = (p1, dy1, dx1, p2, dy2, dx2, avg)
QPEL_TABLE = jnp.asarray(_QT)


def pad_plane(plane, pad: int):
    return jnp.pad(plane.astype(jnp.int32), pad, mode="edge")


def _conv6(g, axis: int):
    """6-tap filter along an axis via shifted adds (intermediate, no
    rounding)."""
    out = jnp.zeros_like(g)
    for k in range(6):
        sh = k - 2
        out = out + TAPS[k] * jnp.roll(g, -sh, axis=axis)
    return out


def luma_planes(g_pad):
    """Stack [4, Hp, Wp]: G, b, h, j (spec 8.4.2.2.1 half-pel planes)."""
    g = g_pad.astype(jnp.int32)
    b1 = _conv6(g, axis=1)
    h1 = _conv6(g, axis=0)
    j1 = _conv6(b1, axis=0)
    b = jnp.clip((b1 + 16) >> 5, 0, 255)
    h = jnp.clip((h1 + 16) >> 5, 0, 255)
    j = jnp.clip((j1 + 512) >> 10, 0, 255)
    return jnp.stack([g, b, h, j])


def mc_luma(planes, y0, x0, mv, bh: int = 16, bw: int = 16):
    """Batched quarter-pel MC: planes [4,Hp,Wp]; y0/x0 [B] padded-grid
    block origins; mv [B,2] (y, x) quarter-pel. → [B,bh,bw] int32."""
    iy, ix = mv[:, 0] >> 2, mv[:, 1] >> 2
    fy, fx = mv[:, 0] & 3, mv[:, 1] & 3
    sub = fy * 4 + fx
    t = QPEL_TABLE[sub]                       # [B,7]
    by, bx = y0 + iy, x0 + ix

    def gather(pidx, yy, xx):
        return jax.lax.dynamic_slice(
            planes, (pidx, yy, xx), (1, bh, bw))[0]

    a = jax.vmap(gather)(t[:, 0], by + t[:, 1], bx + t[:, 2])
    b = jax.vmap(gather)(t[:, 3], by + t[:, 4], bx + t[:, 5])
    return jnp.where(t[:, 6, None, None] == 1, (a + b + 1) >> 1, a)


def mc_chroma(c_pad, y0, x0, mv, bh: int = 8, bw: int = 8):
    """Batched chroma eighth-pel bilinear MC (spec 8.4.2.2.2)."""
    iy, ix = mv[:, 0] >> 3, mv[:, 1] >> 3
    fy, fx = (mv[:, 0] & 7).astype(jnp.int32), (mv[:, 1] & 7).astype(jnp.int32)
    by, bx = y0 + iy, x0 + ix

    def gather(yy, xx):
        return jax.lax.dynamic_slice(c_pad, (yy, xx), (bh + 1, bw + 1))

    w = jax.vmap(gather)(by, bx)             # [B, bh+1, bw+1]
    a = w[:, :bh, :bw]
    b = w[:, :bh, 1:]
    c = w[:, 1:, :bw]
    d = w[:, 1:, 1:]
    fx_ = fx[:, None, None]
    fy_ = fy[:, None, None]
    return ((8 - fx_) * (8 - fy_) * a + fx_ * (8 - fy_) * b
            + (8 - fx_) * fy_ * c + fx_ * fy_ * d + 32) >> 6
