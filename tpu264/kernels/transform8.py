"""Batched 8x8 transform / quant kernels (JAX) — High profile
(SURVEY.md §2a #13 "4x4/8x8 integer DCT + quantization").

jnp twins of `tpu264.ref.transform8` (bit-exact; tests compare on random
blocks); map over arbitrary leading batch dims of [..., 8, 8] int32.
The dequant table is verified against libavcodec's own rodata
(tests/test_transform8.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpu264.ref import transform8 as ref8

MF8_TABLE = jnp.asarray(ref8.MF8_TABLE, jnp.int32)     # [6, 8, 8]
V8_TABLE = jnp.asarray(ref8.V8_TABLE, jnp.int32)       # [6, 8, 8]
ZIGZAG_8x8 = jnp.asarray(ref8.ZIGZAG_8x8, jnp.int32)


def _fwd1d(b):
    b = b.astype(jnp.int32)
    a = [b[..., i] + b[..., 7 - i] for i in range(4)]
    d = [b[..., i] - b[..., 7 - i] for i in range(4)]
    b0 = a[0] + a[3]
    b1 = a[1] + a[2]
    b2 = a[0] - a[3]
    b3 = a[1] - a[2]
    b4 = d[1] + d[2] + ((d[0] >> 1) + d[0])
    b5 = d[0] - d[3] - ((d[2] >> 1) + d[2])
    b6 = d[0] + d[3] - ((d[1] >> 1) + d[1])
    b7 = d[1] - d[2] + ((d[3] >> 1) + d[3])
    return jnp.stack([
        b0 + b1, b4 + (b7 >> 2), b2 + (b3 >> 1), b5 + (b6 >> 2),
        b0 - b1, b6 - (b5 >> 2), (b2 >> 1) - b3, (b4 >> 2) - b7,
    ], axis=-1)


def fdct8x8(x):
    t = _fwd1d(x)
    return jnp.swapaxes(_fwd1d(jnp.swapaxes(t, -1, -2)), -1, -2)


def _inv1d(d):
    d = d.astype(jnp.int32)
    e0 = d[..., 0] + d[..., 4]
    e1 = -d[..., 3] + d[..., 5] - d[..., 7] - (d[..., 7] >> 1)
    e2 = d[..., 0] - d[..., 4]
    e3 = d[..., 1] + d[..., 7] - d[..., 3] - (d[..., 3] >> 1)
    e4 = (d[..., 2] >> 1) - d[..., 6]
    e5 = -d[..., 1] + d[..., 7] + d[..., 5] + (d[..., 5] >> 1)
    e6 = d[..., 2] + (d[..., 6] >> 1)
    e7 = d[..., 3] + d[..., 5] + d[..., 1] + (d[..., 1] >> 1)
    f0 = e0 + e6
    f1 = e1 + (e7 >> 2)
    f2 = e2 + e4
    f3 = e3 + (e5 >> 2)
    f4 = e2 - e4
    f5 = (e3 >> 2) - e5
    f6 = e0 - e6
    f7 = e7 - (e1 >> 2)
    return jnp.stack([
        f0 + f7, f2 + f5, f4 + f3, f6 + f1,
        f6 - f1, f4 - f3, f2 - f5, f0 - f7,
    ], axis=-1)


def idct8x8(d):
    t = _inv1d(d)
    r = jnp.swapaxes(_inv1d(jnp.swapaxes(t, -1, -2)), -1, -2)
    return (r + 32) >> 6


def quant8x8(w, qp, intra: bool):
    """qp may be a python int or traced int32 scalar."""
    qbits = 16 + qp // 6
    mf = MF8_TABLE[qp % 6]
    f = ((1 << qbits) if isinstance(qp, int)
         else (1 << qbits).astype(jnp.int32)) // (3 if intra else 6)
    lev = (jnp.abs(w) * mf + f) >> qbits
    return jnp.sign(w) * lev


def dequant8x8(c, qp):
    c = c.astype(jnp.int32)
    v = V8_TABLE[qp % 6]
    k = qp // 6
    if isinstance(qp, int):
        if k >= 2:
            return (c * v) << (k - 2)
        return (c * v + (1 << (1 - k))) >> (2 - k)
    hi = (c * v) << jnp.maximum(k - 2, 0)
    lo = (c * v + (1 << jnp.maximum(1 - k, 0))) >> jnp.maximum(2 - k, 0)
    return jnp.where(k >= 2, hi, lo)


def zigzag_scan8(blocks):
    flat = blocks.reshape(blocks.shape[:-2] + (64,))
    return flat[..., ZIGZAG_8x8]


def zigzag_unscan8(scanned):
    inv = jnp.zeros(64, jnp.int32).at[ZIGZAG_8x8].set(
        jnp.arange(64, dtype=jnp.int32))
    return scanned[..., inv].reshape(scanned.shape[:-1] + (8, 8))
