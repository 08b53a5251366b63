"""Device CAVLC serializer must mirror the host path bit-for-bit:
same element grids and identical packed slice bytes."""

import numpy as np
import pytest
import jax.numpy as jnp

from tpu264.bits.bitwriter import pack_bits
from tpu264.entropy import device_cavlc as dc
from tpu264.entropy import slice_writer


def random_mb(rng, wm, hm, p_frame=False, max_mag=18):
    n = wm * hm
    sel16 = rng.random(n) < 0.4
    mb = {
        "sel16": sel16,
        "i16mode": rng.integers(0, 4, n),
        "modes": rng.integers(0, 9, (n, 16)),
        "cmode": rng.integers(0, 4, n),
        "luma_dc": np.where(sel16[:, None],
                            rng.integers(-max_mag, max_mag, (n, 16)), 0),
        "luma_ac": rng.integers(-max_mag, max_mag, (n, 16, 16))
        * (rng.random((n, 16, 16)) < 0.3),
        "chroma_dc": rng.integers(-max_mag, max_mag, (n, 2, 4))
        * (rng.random((n, 2, 4)) < 0.5),
        "chroma_ac": rng.integers(-max_mag, max_mag, (n, 2, 4, 16))
        * (rng.random((n, 2, 4, 16)) < 0.3),
    }
    # I16 MBs: AC position 0 zero; all-or-nothing per the encoder contract
    mb["luma_ac"][sel16, :, 0] = 0
    mb["chroma_ac"][..., 0] = 0
    if p_frame:
        is_inter = rng.random(n) < 0.6
        mb["is_inter"] = is_inter
        mb["mv"] = rng.integers(-32, 32, (n, 2))
        mb["mv_skip"] = rng.integers(-32, 32, (n, 2))
        # make some true skips: mv == mv_skip and zero residual
        mk = is_inter & (rng.random(n) < 0.4)
        mb["mv"][mk] = mb["mv_skip"][mk]
        mb["luma_ac"][mk] = 0
        mb["chroma_dc"][mk] = 0
        mb["chroma_ac"][mk] = 0
    return mb


def to_dev(mb):
    return {k: jnp.asarray(v) for k, v in mb.items()}


@pytest.mark.parametrize("seed,slices", [(0, 1), (1, 1), (2, 2), (3, 3)])
def test_i_frame_grids_match(seed, slices):
    rng = np.random.default_rng(seed)
    wm, hm = 4, 3 * slices
    rows = [r * (hm // slices) for r in range(slices)]
    mb = random_mb(rng, wm, hm)
    hv, hl = slice_writer.serialize_frame_mbs(mb, wm, hm, rows)
    dv, dl = dc.serialize_frame_j(to_dev(mb), wm, hm, rows)
    np.testing.assert_array_equal(np.asarray(dl), hl)
    np.testing.assert_array_equal(np.asarray(dv).astype(np.uint64), hv)


@pytest.mark.parametrize("seed,slices", [(0, 1), (5, 2)])
def test_p_frame_grids_match(seed, slices):
    rng = np.random.default_rng(seed)
    wm, hm = 4, 2 * slices
    rows = [r * (hm // slices) for r in range(slices)]
    mb = random_mb(rng, wm, hm, p_frame=True)
    hv, hl, hskip = slice_writer.serialize_frame_mbs_p(mb, wm, hm, rows)
    dv, dl, dskip = dc.serialize_frame_p_j(to_dev(mb), wm, hm, rows)
    np.testing.assert_array_equal(np.asarray(dskip), hskip)
    np.testing.assert_array_equal(np.asarray(dl), hl)
    np.testing.assert_array_equal(np.asarray(dv).astype(np.uint64), hv)


@pytest.mark.parametrize("slices", [1, 2])
def test_pack_matches_host(slices):
    rng = np.random.default_rng(9)
    wm, hm = 4, 2 * slices
    rows = [r * (hm // slices) for r in range(slices)]
    mb = random_mb(rng, wm, hm)
    dv, dl = dc.serialize_frame_j(to_dev(mb), wm, hm, rows)
    words, nbits = dc.pack_slices_j(dv, dl, slices, cap_words=8192)
    hv, hl = slice_writer.serialize_frame_mbs(mb, wm, hm, rows)
    per = (wm * hm) // slices
    for s in range(slices):
        hb, ht = pack_bits(hv[s * per:(s + 1) * per],
                           hl[s * per:(s + 1) * per])
        assert int(nbits[s]) == ht
        db = np.asarray(words[s]).astype(">u4").view(np.uint8)[
            : (ht + 7) // 8]
        np.testing.assert_array_equal(db, hb)


def test_words_to_rbsp_roundtrip():
    from tpu264.bits.bitwriter import BitSink
    rng = np.random.default_rng(3)
    mb = random_mb(rng, 4, 2)
    dv, dl = dc.serialize_frame_j(to_dev(mb), 4, 2, [0])
    words, nbits = dc.pack_slices_j(dv, dl, 1, cap_words=8192)
    sink = BitSink()
    sink.put(0b1010101, 7)                       # odd-length fake header
    out = dc.words_to_rbsp(np.asarray(words[0]), int(nbits[0]), sink)
    # host reference
    hv, hl = slice_writer.serialize_frame_mbs(mb, 4, 2, [0])
    sink2 = BitSink()
    sink2.put(0b1010101, 7)
    ref = slice_writer.pack_slice(hv, hl, sink2)
    assert out == ref
