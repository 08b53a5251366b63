"""Interpolation + motion estimation kernels vs scalar oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu264.kernels import interp as kint
from tpu264.kernels import me as kme
from tpu264.ref import interp as rip
from tpu264.coding import mvpred


def test_halfpel_planes_match_ref():
    rng = np.random.default_rng(0)
    g = rng.integers(0, 256, (48, 56))
    g_pad = rip.pad_plane(g, 8)
    b_ref, h_ref, j_ref = rip.half_pel_planes(g_pad)
    planes = np.asarray(kint.luma_planes(jnp.asarray(g_pad)))
    # interior only (roll wrap contaminates a 3-sample border both ways)
    s = np.s_[4:-4, 4:-4]
    np.testing.assert_array_equal(planes[0][s], g_pad[s])
    np.testing.assert_array_equal(planes[1][s], b_ref[s])
    np.testing.assert_array_equal(planes[2][s], h_ref[s])
    np.testing.assert_array_equal(planes[3][s], j_ref[s])


def test_mc_luma_all_subpel_positions():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, (64, 64))
    pad = 24
    g_pad = rip.pad_plane(g, pad)
    planes_ref = (g_pad,) + rip.half_pel_planes(g_pad)
    planes = kint.luma_planes(jnp.asarray(g_pad))
    mvs, origins = [], []
    for fy in range(4):
        for fx in range(4):
            for base in [(-6, 3), (0, 0), (9, -11)]:
                mvs.append((base[0] * 4 + fy, base[1] * 4 + fx))
                origins.append((16 + pad, 32 + pad))
    mvs = np.array(mvs, dtype=np.int32)
    origins = np.array(origins, dtype=np.int32)
    got = np.asarray(kint.mc_luma(planes, jnp.asarray(origins[:, 0]),
                                  jnp.asarray(origins[:, 1]),
                                  jnp.asarray(mvs)))
    for i, (mv, o) in enumerate(zip(mvs, origins)):
        want = rip.mc_luma_block(planes_ref, int(o[0]), int(o[1]),
                                 int(mv[0]), int(mv[1]))
        np.testing.assert_array_equal(got[i], want, err_msg=str(mv))


def test_mc_chroma_positions():
    rng = np.random.default_rng(2)
    c = rng.integers(0, 256, (32, 32))
    pad = 12
    c_pad = rip.pad_plane(c, pad)
    mvs = np.array([[0, 0], [1, 0], [0, 1], [7, 7], [-5, 13], [22, -9],
                    [3, 5], [-1, -1]], dtype=np.int32)
    o = np.full((len(mvs),), 8 + pad, dtype=np.int32)
    got = np.asarray(kint.mc_chroma(jnp.asarray(c_pad), jnp.asarray(o),
                                    jnp.asarray(o), jnp.asarray(mvs)))
    for i, mv in enumerate(mvs):
        want = rip.mc_chroma_block(c_pad, 8 + pad, 8 + pad,
                                   int(mv[0]), int(mv[1]))
        np.testing.assert_array_equal(got[i], want, err_msg=str(mv))


def test_full_search_finds_translation():
    """A purely translated frame must yield the exact shift for interior
    MBs (boundary MBs may prefer cheaper mvs due to edge padding)."""
    rng = np.random.default_rng(3)
    ref = rng.integers(0, 256, (64, 96)).astype(np.int64)
    dy, dx = 3, -5
    cur = np.roll(np.roll(ref, dy, axis=0), dx, axis=1)
    pad = 24
    ref_pad = rip.pad_plane(ref, pad)
    mv, cost = kme.full_search_16x16(
        jnp.asarray(cur), jnp.asarray(ref_pad), pad, 8, lam=1,
        width_mbs=6, height_mbs=4)
    mv = np.asarray(mv).reshape(4, 6, 2)
    # interior MBs (not affected by roll wrap / padding)
    for r in range(1, 3):
        for c in range(1, 5):
            assert tuple(mv[r, c]) == (-dy, -dx), (r, c, mv[r, c])


def test_subpel_refine_finds_halfpel():
    """Current frame built by half-pel interpolation of the reference →
    refinement should recover the sub-pel offset for interior MBs."""
    rng = np.random.default_rng(4)
    ref = rng.integers(0, 256, (64, 64)).astype(np.int64)
    pad = 24
    ref_pad = rip.pad_plane(ref, pad)
    planes_ref = (ref_pad,) + rip.half_pel_planes(ref_pad)
    mv_true = (2, 1)  # qpel: half down, quarter right
    cur = np.zeros_like(ref)
    for r in range(4):
        for c in range(4):
            cur[r * 16:r * 16 + 16, c * 16:c * 16 + 16] = rip.mc_luma_block(
                planes_ref, r * 16 + pad, c * 16 + pad, *mv_true)
    planes = kint.luma_planes(jnp.asarray(ref_pad))
    mv_int = jnp.zeros((16, 2), jnp.int32)
    mv_q = np.asarray(kme.subpel_refine(
        jnp.asarray(cur), planes, pad, mv_int, 1, 4, 4))
    interior = mv_q.reshape(4, 4, 2)[1:3, 1:3]
    assert (interior.reshape(-1, 2) == np.array(mv_true)).all(axis=1).mean() > 0.7


def test_mvpred_np_jnp_agree():
    rng = np.random.default_rng(5)
    for _ in range(200):
        mvs = rng.integers(-40, 41, (3, 2))
        refs = rng.choice([-2, -1, 0], 3)
        mvs[refs < 0] = 0
        a = mvpred.predict_mv_np(mvs[0], refs[0], mvs[1], refs[1],
                                 mvs[2], refs[2])
        b = np.asarray(mvpred.predict_mv_jnp(
            jnp.asarray(mvs[0]), jnp.asarray(refs[0]), jnp.asarray(mvs[1]),
            jnp.asarray(refs[1]), jnp.asarray(mvs[2]), jnp.asarray(refs[2])))
        np.testing.assert_array_equal(a, b)
        s_np = mvpred.skip_mv_np(a, mvs[0], refs[0], mvs[1], refs[1])
        s_j = np.asarray(mvpred.skip_mv_jnp(
            jnp.asarray(a), jnp.asarray(mvs[0]), jnp.asarray(refs[0]),
            jnp.asarray(mvs[1]), jnp.asarray(refs[1])))
        np.testing.assert_array_equal(s_np, s_j)
