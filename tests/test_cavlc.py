import numpy as np
import pytest

from tpu264.bits.bitreader import BitReader
from tpu264.bits.bitwriter import pack_bits
from tpu264.entropy import cavlc


def _roundtrip(coeffs, nc, max_coeff):
    v, l, tc = cavlc.encode_blocks(coeffs, np.asarray(nc), max_coeff)
    packed, nbits = pack_bits(v.ravel(), l.ravel())
    r = BitReader(packed.tobytes())
    out = np.zeros_like(coeffs)
    for b in range(coeffs.shape[0]):
        out[b] = cavlc.decode_block(r, int(nc[b]), max_coeff)
    assert r.pos == nbits
    return out


def test_richardson_worked_example():
    """Published CAVLC example (Richardson, 'H.264 and MPEG-4 Video
    Compression', example 6.x): TotalCoeffs=5, T1s=3, nC=0."""
    scanned = np.array([[0, 3, 0, 1, -1, -1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0]])
    v, l, tc = cavlc.encode_blocks(scanned, np.array([0]), 16)
    assert tc[0] == 5
    packed, nbits = pack_bits(v.ravel(), l.ravel())
    bits = "".join(map(str, np.unpackbits(packed)[:nbits]))
    assert bits == "000010001110010111101101"


def test_empty_block():
    scanned = np.zeros((3, 16), dtype=np.int64)
    v, l, tc = cavlc.encode_blocks(scanned, np.array([0, 3, 9]), 16)
    assert (tc == 0).all()
    # coeff_token for tc=0 only; everything else length 0
    assert (l[:, 0] > 0).all() and (l[:, 1:] == 0).all()


@pytest.mark.parametrize("max_coeff", [16, 15, 4])
def test_random_roundtrip(max_coeff):
    rng = np.random.default_rng(42 + max_coeff)
    n = 300
    density = rng.random((n, 1)) * (0.9 if max_coeff == 4 else 0.6)
    mag = np.where(rng.random((n, 1)) < 0.8, 4, 2000)
    coeffs = (rng.integers(-1, 2, (n, max_coeff))
              * rng.integers(1, mag + 1, (n, max_coeff))
              * (rng.random((n, max_coeff)) < density)).astype(np.int64)
    if max_coeff == 4:
        nc = np.full(n, -1)
    else:
        nc = rng.integers(0, 17, n)
    out = _roundtrip(coeffs, nc, max_coeff)
    np.testing.assert_array_equal(out, coeffs)


def test_full_density_blocks():
    rng = np.random.default_rng(7)
    coeffs = rng.integers(-30, 31, (50, 16))
    coeffs[coeffs == 0] = 1  # TotalCoeff == max_coeff: no total_zeros coded
    nc = rng.integers(0, 20, 50)
    out = _roundtrip(coeffs, nc, 16)
    np.testing.assert_array_equal(out, coeffs)


def test_trailing_ones_cases():
    cases = [
        [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [-1, 1, -1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],   # 4 ones: T1=3
        [5, -1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    ]
    coeffs = np.array(cases, dtype=np.int64)
    nc = np.zeros(len(cases), dtype=np.int64)
    out = _roundtrip(coeffs, nc, 16)
    np.testing.assert_array_equal(out, coeffs)


def test_level_escape_boundaries():
    # levels around the suffixLength-0 escape thresholds (|v|=8 → lc=14)
    for v0 in [7, 8, 15, 16, 2063, -2063]:
        coeffs = np.zeros((1, 16), dtype=np.int64)
        coeffs[0, 0] = v0
        out = _roundtrip(coeffs, np.array([0]), 16)
        np.testing.assert_array_equal(out, coeffs)


def test_out_of_range_level_raises():
    coeffs = np.zeros((1, 16), dtype=np.int64)
    coeffs[0, 0] = 100000  # beyond single-escape CAVLC range
    with pytest.raises(ValueError):
        cavlc.encode_blocks(coeffs, np.array([0]), 16)
