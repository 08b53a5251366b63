"""JAX kernels vs scalar reference oracles (SURVEY.md §4.1)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu264.kernels import intra as ki
from tpu264.kernels import transform as kt
from tpu264.ref import intra as ri
from tpu264.ref import transform as rt


def test_fdct_quant_dequant_idct_match_ref():
    rng = np.random.default_rng(0)
    x = rng.integers(-255, 256, (64, 4, 4))
    for qp in [0, 17, 28, 51]:
        w_ref = np.stack([rt.fdct4x4(b) for b in x])
        w_jax = np.asarray(kt.fdct4x4(jnp.asarray(x)))
        np.testing.assert_array_equal(w_jax, w_ref)
        for intra in (True, False):
            c_ref = np.stack([rt.quant4x4(b, qp, intra) for b in w_ref])
            c_jax = np.asarray(kt.quant4x4(jnp.asarray(w_jax), qp, intra))
            np.testing.assert_array_equal(c_jax, c_ref)
        c = c_ref
        d_ref = np.stack([rt.dequant4x4(b, qp) for b in c])
        np.testing.assert_array_equal(np.asarray(kt.dequant4x4(jnp.asarray(c), qp)), d_ref)
        r_ref = np.stack([rt.idct4x4(b) for b in d_ref])
        np.testing.assert_array_equal(np.asarray(kt.idct4x4(jnp.asarray(d_ref))), r_ref)


def test_dc_paths_match_ref():
    rng = np.random.default_rng(1)
    for qp in [8, 28, 40, 51]:
        wdc = rng.integers(-4000, 4000, (16, 4, 4))
        lv_ref = np.stack([rt.hadamard4x4_fwd_quant_dc(b, qp) for b in wdc])
        lv_jax = np.asarray(kt.hadamard4x4_fwd_quant_dc(jnp.asarray(wdc), qp))
        np.testing.assert_array_equal(lv_jax, lv_ref)
        dq_ref = np.stack([rt.hadamard4x4_inv_dequant_dc(b, qp) for b in lv_ref])
        np.testing.assert_array_equal(
            np.asarray(kt.hadamard4x4_inv_dequant_dc(jnp.asarray(lv_ref), qp)), dq_ref)
        c2 = rng.integers(-2000, 2000, (16, 2, 2))
        lv2_ref = np.stack([rt.hadamard2x2_fwd_quant_dc(b, qp, True) for b in c2])
        np.testing.assert_array_equal(
            np.asarray(kt.hadamard2x2_fwd_quant_dc(jnp.asarray(c2), qp, True)), lv2_ref)
        dq2_ref = np.stack([rt.hadamard2x2_inv_dequant_dc(b, qp) for b in lv2_ref])
        np.testing.assert_array_equal(
            np.asarray(kt.hadamard2x2_inv_dequant_dc(jnp.asarray(lv2_ref), qp)), dq2_ref)


def test_satd_matches_ref():
    rng = np.random.default_rng(2)
    d = rng.integers(-255, 256, (32, 4, 4))
    ref = np.array([rt.satd4x4(b) for b in d])
    np.testing.assert_array_equal(np.asarray(kt.satd4x4(jnp.asarray(d))), ref)


def test_zigzag_roundtrip():
    rng = np.random.default_rng(3)
    b = rng.integers(-100, 100, (10, 4, 4))
    s = kt.zigzag_scan(jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(kt.zigzag_unscan(s)), b)


def test_intra4x4_all_modes_match_ref():
    rng = np.random.default_rng(4)
    n = 40
    top = rng.integers(0, 256, (n, 8))
    left = rng.integers(0, 256, (n, 4))
    tl = rng.integers(0, 256, n)
    preds = np.asarray(ki.predict4x4_all(
        jnp.asarray(top), jnp.asarray(left), jnp.asarray(tl)))
    for i in range(n):
        for mode in range(9):
            ref = ri.predict_4x4(mode, top[i], left[i], int(tl[i]),
                                 True, True, True)
            np.testing.assert_array_equal(preds[i, mode], ref, err_msg=f"mode {mode}")


def test_intra4x4_dc_availability():
    rng = np.random.default_rng(5)
    n = 20
    top = rng.integers(0, 256, (n, 8))
    left = rng.integers(0, 256, (n, 4))
    for at in (False, True):
        for al in (False, True):
            dc = np.asarray(ki.predict4x4_dc(
                jnp.asarray(top), jnp.asarray(left),
                jnp.full(n, at), jnp.full(n, al)))
            for i in range(n):
                ref = ri.predict_4x4(2, top[i], left[i], 0, at, al, False)
                assert dc[i] == ref[0, 0]


@pytest.mark.parametrize("at,al", [(True, True), (True, False),
                                   (False, True), (False, False)])
def test_intra16_matches_ref(at, al):
    rng = np.random.default_rng(6)
    n = 10
    top = rng.integers(0, 256, (n, 16))
    left = rng.integers(0, 256, (n, 16))
    tl = rng.integers(0, 256, n)
    preds = np.asarray(ki.predict16x16_all(
        jnp.asarray(top), jnp.asarray(left), jnp.asarray(tl),
        jnp.full(n, at), jnp.full(n, al)))
    valid = np.asarray(ki.mode_valid16(jnp.full(n, at), jnp.full(n, al),
                                       jnp.full(n, at and al)))
    for i in range(n):
        for mode in range(4):
            if not valid[i, mode]:
                continue
            ref = ri.predict_16x16(mode, top[i], left[i], int(tl[i]), at, al,
                                   at and al)
            np.testing.assert_array_equal(preds[i, mode], ref,
                                          err_msg=f"mode {mode}")


@pytest.mark.parametrize("at,al", [(True, True), (True, False),
                                   (False, True), (False, False)])
def test_chroma_matches_ref(at, al):
    rng = np.random.default_rng(7)
    n = 10
    top = rng.integers(0, 256, (n, 8))
    left = rng.integers(0, 256, (n, 8))
    tl = rng.integers(0, 256, n)
    preds = np.asarray(ki.predict_chroma_all(
        jnp.asarray(top), jnp.asarray(left), jnp.asarray(tl),
        jnp.full(n, at), jnp.full(n, al)))
    valid = np.asarray(ki.mode_valid_chroma(jnp.full(n, at), jnp.full(n, al),
                                            jnp.full(n, at and al)))
    for i in range(n):
        for mode in range(4):
            if not valid[i, mode]:
                continue
            ref = ri.predict_chroma8x8(mode, top[i], left[i], int(tl[i]),
                                       at, al, at and al)
            np.testing.assert_array_equal(preds[i, mode], ref,
                                          err_msg=f"mode {mode}")
