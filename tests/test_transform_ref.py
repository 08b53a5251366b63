import numpy as np

from tpu264.ref import transform as T


def test_quant_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    for qp in [0, 6, 12, 22, 28, 36, 44, 51]:
        step = 2 ** (qp / 6) * 0.625
        worst = 0
        for _ in range(200):
            x = rng.integers(-255, 256, (4, 4))
            c = T.quant4x4(T.fdct4x4(x), qp, intra=True)
            r = T.residual_block_recon(c, qp)
            worst = max(worst, np.abs(r - x).max())
        # dead-zone quantizer: error bounded by ~1.3x step + rounding
        assert worst <= step * 1.4 + 2, (qp, worst, step)


def test_lossless_at_qp0_inter():
    rng = np.random.default_rng(1)
    for _ in range(100):
        x = rng.integers(-255, 256, (4, 4))
        c = T.quant4x4(T.fdct4x4(x), 0, intra=False)
        r = T.residual_block_recon(c, 0)
        assert np.abs(r - x).max() <= 1


def test_idct_matches_float_oracle():
    ci = np.array([[1, 1, 1, 0.5], [1, 0.5, -1, -1],
                   [1, -0.5, -1, 1], [1, -1, 1, -0.5]])
    rng = np.random.default_rng(2)
    for _ in range(100):
        d = rng.integers(-100000, 100000, (4, 4))
        got = T.idct4x4(d)
        want = ci @ d @ ci.T / 64.0
        assert np.abs(got - want).max() < 1.0


def test_dc_paths_error_bounded():
    rng = np.random.default_rng(3)
    for qp in [10, 16, 28, 40, 51]:
        dcstep = 2 ** (qp / 6) * 0.625 * 4
        for _ in range(50):
            wdc = rng.integers(-4000, 4000, (4, 4))
            lv = T.hadamard4x4_fwd_quant_dc(wdc, qp)
            dcy = T.hadamard4x4_inv_dequant_dc(lv, qp)
            assert np.abs(dcy / 4 - wdc).max() <= dcstep * 1.5 + 4
        for _ in range(50):
            wdc = rng.integers(-4000, 4000, (2, 2))
            lv = T.hadamard2x2_fwd_quant_dc(wdc, qp, True)
            dcc = T.hadamard2x2_inv_dequant_dc(lv, qp)
            assert np.abs(dcc / 4 - wdc).max() <= dcstep * 1.5 + 4


def test_chroma_qp_table():
    assert T.chroma_qp(0) == 0
    assert T.chroma_qp(29) == 29
    assert T.chroma_qp(30) == 29
    assert T.chroma_qp(39) == 35
    assert T.chroma_qp(51) == 39
    assert T.chroma_qp(51, 0) == 39


def test_zigzag_scan_is_permutation():
    assert sorted(T.ZIGZAG_4x4.tolist()) == list(range(16))
    # spec 8.5.6 order: first entries 0,1,4,8,5,2
    assert T.ZIGZAG_4x4[:6].tolist() == [0, 1, 4, 8, 5, 2]
