"""Full-search + sub-pel motion estimation kernels (JAX).

JM iterates SAD over (2R+1)^2 candidates per block inside the MB loop
(`me_fullsearch.c`, the hottest loop — SURVEY.md §3.1); here ALL
macroblocks search in parallel and the candidate sweep is expressed as
MXU work: SSD(dy,dx) = sum(W^2) - 2*corr(W, O) + sum(O^2), where the
cross-correlation and window energy are `lax.conv` ops over the whole
frame batch (exact in f32: all intermediate integer sums < 2^24).
Encoder-side distortion choice is free (SSD here, SATD for sub-pel like
JM), so this stays standard-conforming by construction.

Sub-pel refinement follows JM (`SubPelBlockMotionSearch`): evaluate the 8
half-pel neighbors of the best integer position, then the 8 quarter-pel
neighbors of the best half position, with SATD + lambda * mv-rate cost.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import interp as ki
from . import transform as kt


def mv_bits_table(max_abs: int):
    """ue(se(v)) code lengths for mvd components -max_abs..max_abs."""
    v = np.arange(-max_abs, max_abs + 1)
    k = np.where(v > 0, 2 * v - 1, -2 * v)
    return np.floor(np.log2(k + 1)).astype(np.int64) * 2 + 1


def full_search_16x16(orig_y, ref_pad, pad: int, search_range: int,
                      lam: int, width_mbs: int, height_mbs: int):
    """Integer full search for every MB of a frame at once.

    orig_y: [H, W]; ref_pad: [H+2p, W+2p] edge-padded reference.
    Returns mv_int [nMB, 2] (full-pel, y/x) and ssd cost [nMB].
    """
    r = search_range
    n = width_mbs * height_mbs
    mb_r = jnp.arange(n, dtype=jnp.int32) // width_mbs
    mb_c = jnp.arange(n, dtype=jnp.int32) % width_mbs
    # search windows [n, 16+2r, 16+2r]
    win = 16 + 2 * r

    def gwin(rr, cc):
        return jax.lax.dynamic_slice(
            ref_pad, (rr * 16 + pad - r, cc * 16 + pad - r), (win, win))

    windows = jax.vmap(gwin)(mb_r, mb_c).astype(jnp.float32)

    def gmb(rr, cc):
        return jax.lax.dynamic_slice(orig_y, (rr * 16, cc * 16), (16, 16))

    origs = jax.vmap(gmb)(mb_r, mb_c).astype(jnp.float32)

    # cross-correlation per MB: batch_group_count groups lhs batch with
    # rhs output features → each MB correlates with its own block
    corr = jax.lax.conv_general_dilated(
        windows[None],                       # [1, n, win, win] (NCHW)
        origs[:, None],                      # [n, 1, 16, 16]   (OIHW)
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        batch_group_count=1, feature_group_count=n,
    )[0]                                     # [n, 2r+1, 2r+1]
    ones = jnp.ones((1, 1, 16, 16), jnp.float32)
    w2 = jax.lax.conv_general_dilated(
        (windows * windows)[:, None], ones,
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]                                  # [n, 2r+1, 2r+1]
    o2 = (origs * origs).sum(axis=(1, 2))
    ssd = w2 - 2.0 * corr + o2[:, None, None]

    # mv-rate prior centered on (0,0) (JM centers on the predictor; the
    # wavefront pass re-rates against the true predictor)
    bits = jnp.asarray(mv_bits_table(r), dtype=jnp.float32)
    cost = ssd + lam * (bits[None, :, None] + bits[None, None, :])
    flat = cost.reshape(n, -1)
    best = jnp.argmin(flat, axis=1).astype(jnp.int32)
    dy = best // (2 * r + 1) - r
    dx = best % (2 * r + 1) - r
    return jnp.stack([dy, dx], axis=1), jnp.min(flat, axis=1)


def full_search_parts(orig_y, ref_pad, pad: int, search_range: int,
                      lam: int, width_mbs: int, height_mbs: int):
    """Integer full search for the 16x8 / 8x16 halves of every MB.

    The four half-block SSD maps come from four cross-correlation
    sweeps with half-size kernels over the SAME search windows the
    16x16 search uses (the halves stay anchored to the MB origin, so a
    candidate (dy, dx) reads the window at row/col offset +8 for the
    second half).  Returns {"top"|"bot"|"left"|"right": mv_int [n, 2]}.
    """
    r = search_range
    n = width_mbs * height_mbs
    mb_r = jnp.arange(n, dtype=jnp.int32) // width_mbs
    mb_c = jnp.arange(n, dtype=jnp.int32) % width_mbs
    win = 16 + 2 * r

    def gwin(rr, cc):
        return jax.lax.dynamic_slice(
            ref_pad, (rr * 16 + pad - r, cc * 16 + pad - r), (win, win))

    windows = jax.vmap(gwin)(mb_r, mb_c).astype(jnp.float32)

    def gmb(rr, cc):
        return jax.lax.dynamic_slice(orig_y, (rr * 16, cc * 16), (16, 16))

    origs = jax.vmap(gmb)(mb_r, mb_c).astype(jnp.float32)

    def corr_with(kernels):
        # kernels [n, kh, kw] -> per-MB correlation maps
        return jax.lax.conv_general_dilated(
            windows[None], kernels[:, None],
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=n)[0]

    def energy(kh, kw):
        ones = jnp.ones((1, 1, kh, kw), jnp.float32)
        return jax.lax.conv_general_dilated(
            (windows * windows)[:, None], ones,
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]

    bits = jnp.asarray(mv_bits_table(r), dtype=jnp.float32)
    prior = bits[None, :, None] + bits[None, None, :]

    out = {}
    w2h = energy(8, 16)                      # [n, 2r+9, 2r+1]
    w2v = energy(16, 8)                      # [n, 2r+1, 2r+9]
    for key, blk, w2, off in (
            ("top", origs[:, :8, :], w2h, (0, 0)),
            ("bot", origs[:, 8:, :], w2h, (8, 0)),
            ("left", origs[:, :, :8], w2v, (0, 0)),
            ("right", origs[:, :, 8:], w2v, (0, 8))):
        corr = corr_with(blk)
        dy0, dx0 = off
        span = 2 * r + 1
        c = jax.lax.dynamic_slice_in_dim(corr, dy0, span, 1)
        c = jax.lax.dynamic_slice_in_dim(c, dx0, span, 2)
        w = jax.lax.dynamic_slice_in_dim(w2, dy0, span, 1)
        w = jax.lax.dynamic_slice_in_dim(w, dx0, span, 2)
        o2 = (blk * blk).sum(axis=(1, 2))
        ssd = w - 2.0 * c + o2[:, None, None]
        flat = (ssd + lam * prior).reshape(n, -1)
        best = jnp.argmin(flat, axis=1).astype(jnp.int32)
        out[key] = jnp.stack([best // span - r, best % span - r], axis=1)
    return out


def full_search_quads(orig_y, ref_pad, pad: int, search_range: int,
                      lam: int, width_mbs: int, height_mbs: int):
    """Integer full search for the four 8x8 quadrants of every MB
    (P_8x8 sub-MB tree, sub_mb_type = 8x8).

    Same window-anchored sweep as `full_search_parts` with 8x8 kernels;
    quadrant q's SSD map reads the window at its (dy0, dx0) origin.
    Returns {"q0".."q3": mv_int [n, 2]} in raster quadrant order.
    """
    r = search_range
    n = width_mbs * height_mbs
    mb_r = jnp.arange(n, dtype=jnp.int32) // width_mbs
    mb_c = jnp.arange(n, dtype=jnp.int32) % width_mbs
    win = 16 + 2 * r

    def gwin(rr, cc):
        return jax.lax.dynamic_slice(
            ref_pad, (rr * 16 + pad - r, cc * 16 + pad - r), (win, win))

    windows = jax.vmap(gwin)(mb_r, mb_c).astype(jnp.float32)

    def gmb(rr, cc):
        return jax.lax.dynamic_slice(orig_y, (rr * 16, cc * 16), (16, 16))

    origs = jax.vmap(gmb)(mb_r, mb_c).astype(jnp.float32)

    ones = jnp.ones((1, 1, 8, 8), jnp.float32)
    w2 = jax.lax.conv_general_dilated(
        (windows * windows)[:, None], ones,
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]  # [n,2r+9,2r+9]

    bits = jnp.asarray(mv_bits_table(r), dtype=jnp.float32)
    prior = bits[None, :, None] + bits[None, None, :]
    span = 2 * r + 1

    out = {}
    for q in range(4):
        dy0, dx0 = (q // 2) * 8, (q % 2) * 8
        blk = origs[:, dy0:dy0 + 8, dx0:dx0 + 8]
        corr = jax.lax.conv_general_dilated(
            windows[None], blk[:, None],
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=n)[0]
        c = jax.lax.dynamic_slice_in_dim(corr, dy0, span, 1)
        c = jax.lax.dynamic_slice_in_dim(c, dx0, span, 2)
        w = jax.lax.dynamic_slice_in_dim(w2, dy0, span, 1)
        w = jax.lax.dynamic_slice_in_dim(w, dx0, span, 2)
        o2 = (blk * blk).sum(axis=(1, 2))
        ssd = w - 2.0 * c + o2[:, None, None]
        flat = (ssd + lam * prior).reshape(n, -1)
        best = jnp.argmin(flat, axis=1).astype(jnp.int32)
        out[f"q{q}"] = jnp.stack([best // span - r, best % span - r],
                                 axis=1)
    return out


def subpel_refine(orig_y, planes, pad: int, mv_int, lam: int,
                  width_mbs: int, height_mbs: int,
                  oy: int = 0, ox: int = 0, bh: int = 16, bw: int = 16):
    """Half- then quarter-pel refinement with SATD cost (JM style).

    mv_int: [nMB, 2] full-pel. Returns mv_q [nMB, 2] quarter-pel.
    (oy, ox, bh, bw) select a partition of each MB (default: whole MB).
    """
    n = width_mbs * height_mbs
    mb_r = jnp.arange(n, dtype=jnp.int32) // width_mbs
    mb_c = jnp.arange(n, dtype=jnp.int32) % width_mbs
    y0 = mb_r * 16 + oy + pad
    x0 = mb_c * 16 + ox + pad

    def gmb(rr, cc):
        return jax.lax.dynamic_slice(
            orig_y, (rr * 16 + oy, cc * 16 + ox), (bh, bw))

    origs = jax.vmap(gmb)(mb_r, mb_c).astype(jnp.int32)

    def satd_at(mv_q):
        pred = ki.mc_luma(planes, y0, x0, mv_q, bh=bh, bw=bw)
        diff = origs - pred
        blk = diff.reshape(n, bh // 4, 4, bw // 4, 4)\
            .transpose(0, 1, 3, 2, 4)
        return kt.satd4x4(blk).sum(axis=(1, 2))

    def refine(mv_q, step: int):
        best_cost = satd_at(mv_q) + lam * _mv_cost(mv_q)
        best_mv = mv_q
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dy == 0 and dx == 0:
                    continue
                cand = mv_q + jnp.asarray([dy, dx], dtype=jnp.int32)[None]
                cost = satd_at(cand) + lam * _mv_cost(cand)
                better = cost < best_cost
                best_mv = jnp.where(better[:, None], cand, best_mv)
                best_cost = jnp.minimum(cost, best_cost)
        return best_mv

    def _mv_cost(mv_q):
        k = jnp.where(mv_q > 0, 2 * mv_q - 1, -2 * mv_q)
        return (2 * jnp.floor(jnp.log2(k.astype(jnp.float32) + 1.0))
                .astype(jnp.int32) + 1).sum(axis=1)

    mv_q = mv_int * 4
    mv_q = refine(mv_q, 2)
    mv_q = refine(mv_q, 1)
    return mv_q
