"""8x8 transform/quant (High profile): table verification against
libavcodec's own rodata, roundtrip sanity, jnp/scalar equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu264.ref import transform8 as r8
from tpu264.kernels import transform8 as k8

LAVC = "/lib/x86_64-linux-gnu/libavcodec.so.59"


def test_dequant_tables_match_libavcodec_rodata():
    data = open(LAVC, "rb").read()
    pat = bytes(np.asarray(r8._V8_SIX, np.uint8).reshape(-1))
    assert data.find(pat) >= 0, "dequant8_coeff_init mismatch"
    # position-class scan map (dequant8_coeff_init_scan)
    scan = bytes(r8._pos_class8(i % 4, i // 4) for i in range(16))
    scan_t = bytes(r8._pos_class8(i // 4, i % 4) for i in range(16))
    assert data.find(scan) >= 0 or data.find(scan_t) >= 0


def test_roundtrip_error_within_qstep():
    rng = np.random.default_rng(0)
    x = rng.integers(-255, 256, (200, 8, 8))
    for qp in range(0, 52, 3):
        rec, _ = r8.roundtrip_recon(x, qp, intra=True)
        err = np.abs(rec - x).max()
        assert err <= max(3, 3 * 2 ** ((qp - 4) / 6)), (qp, err)


def test_unity_gain_every_frequency():
    """quant(qp0) -> dequant -> idct reproduces each DCT basis pattern."""
    for i in range(8):
        for j in range(8):
            ci = np.cos((2 * np.arange(8) + 1) * i * np.pi / 16)
            cj = np.cos((2 * np.arange(8) + 1) * j * np.pi / 16)
            x = np.round(100 * np.outer(ci, cj)).astype(np.int64)
            rec, _ = r8.roundtrip_recon(x[None], 0, intra=True)
            g = (rec[0] * x).sum() / max((x * x).sum(), 1)
            assert abs(g - 1.0) < 0.05, (i, j, g)


@pytest.mark.parametrize("qp", [0, 11, 26, 39, 51])
def test_jnp_matches_scalar(qp):
    rng = np.random.default_rng(qp)
    x = rng.integers(-255, 256, (64, 8, 8))
    w_ref = r8.fdct8x8(x)
    w_j = np.asarray(k8.fdct8x8(jnp.asarray(x, jnp.int32)))
    np.testing.assert_array_equal(w_j, w_ref)
    lev_ref = r8.quant8x8(w_ref, qp, intra=True)
    lev_j = np.asarray(k8.quant8x8(jnp.asarray(w_j), qp, intra=True))
    np.testing.assert_array_equal(lev_j, lev_ref)
    d_ref = r8.dequant8x8(lev_ref, qp)
    d_j = np.asarray(k8.dequant8x8(jnp.asarray(lev_j), qp))
    np.testing.assert_array_equal(d_j, d_ref)
    rec_ref = r8.idct8x8(d_ref)
    rec_j = np.asarray(k8.idct8x8(jnp.asarray(d_j)))
    np.testing.assert_array_equal(rec_j, rec_ref)


def test_zigzag8_invertible():
    x = np.arange(64).reshape(1, 8, 8)
    s = k8.zigzag_scan8(jnp.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(k8.zigzag_unscan8(s))[0], x[0])
