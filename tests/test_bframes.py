"""B-slice conformance: hierarchical / flat B-GOP streams must decode
bit-exactly in libavcodec AND in our own decoder (BASELINE.json config 4;
VERDICT r2 task #4: GOP-8 two-layer hierarchical stream).
"""

import numpy as np
import pytest

from lavc_util import lavc_decode
from tpu264.config import EncoderConfig
from tpu264.coding.encoder import Encoder
from tpu264.decode.decoder import decode_annexb
from tpu264.media.synth import synth_frame

W, H = 176, 144


def _roundtrip(nb, qp, slices, nfr, period=0):
    cfg = EncoderConfig(width=W, height=H, qp=qp, intra_period=period,
                        num_b_frames=nb, slices_per_frame=slices)
    enc = Encoder(cfg)
    frames = [synth_frame(W, H, t) for t in range(nfr)]
    stream = enc.encode_sequence(frames)
    dec, errors = lavc_decode(stream, W, H)
    assert not errors, errors[:2]
    assert len(dec) == nfr
    for i, (dy, du, dv) in enumerate(dec):
        assert np.array_equal(
            dy, np.asarray(enc.recons[i][0]).astype(np.uint8)), ("lavcY", i)
        assert np.array_equal(
            du, np.asarray(enc.recons[i][1]).astype(np.uint8)), ("lavcU", i)
        assert np.array_equal(
            dv, np.asarray(enc.recons[i][2]).astype(np.uint8)), ("lavcV", i)
    own = decode_annexb(stream)
    assert len(own) == nfr
    for i, (dy, du, dv) in enumerate(own):
        assert np.array_equal(
            dy, np.asarray(enc.recons[i][0]).astype(np.uint8)), ("ownY", i)
        assert np.array_equal(
            du, np.asarray(enc.recons[i][1]).astype(np.uint8)), ("ownU", i)
        assert np.array_equal(
            dv, np.asarray(enc.recons[i][2]).astype(np.uint8)), ("ownV", i)
    return enc


def test_ibpbp_flat():
    enc = _roundtrip(nb=1, qp=28, slices=1, nfr=5)
    kinds = [s.slice_type for s in enc.stats]
    assert kinds == ["IDR", "B", "P", "B", "P"]


def test_gop8_two_layer_hierarchical():
    """GOP-8: anchors every 4, layer-1 reference B at the midpoint,
    layer-2 non-reference Bs (the VERDICT 'done' gate)."""
    enc = _roundtrip(nb=3, qp=28, slices=1, nfr=9)
    kinds = [s.slice_type for s in enc.stats]
    assert kinds == ["IDR", "B", "Bref", "B", "P", "B", "Bref", "B", "P"]


def test_hierarchical_qp_sweep_multislice():
    _roundtrip(nb=3, qp=12, slices=3, nfr=9)
    _roundtrip(nb=2, qp=40, slices=1, nfr=7)


def test_cabac_b_hierarchical():
    """CABAC B slices (mb_type Table 9-37, per-list mvd ctx) — validated
    against libavcodec only (no per-bin host twin for B)."""
    cfg = EncoderConfig(width=W, height=H, qp=30, intra_period=0,
                        num_b_frames=3, symbol_mode="CABAC")
    enc = Encoder(cfg)
    frames = [synth_frame(W, H, t) for t in range(9)]
    stream = enc.encode_sequence(frames)
    dec, errors = lavc_decode(stream, W, H)
    assert not errors, errors[:2]
    assert len(dec) == 9
    for i, (dy, du, dv) in enumerate(dec):
        assert np.array_equal(
            dy, np.asarray(enc.recons[i][0]).astype(np.uint8)), i
        assert np.array_equal(
            du, np.asarray(enc.recons[i][1]).astype(np.uint8)), i
    own = decode_annexb(stream)
    assert len(own) == 9
    for i, (dy, du, dv) in enumerate(own):
        assert np.array_equal(
            dy, np.asarray(enc.recons[i][0]).astype(np.uint8)), ("own", i)


def test_closed_gop_periodic_idr():
    enc = _roundtrip(nb=2, qp=28, slices=1, nfr=10, period=2)
    assert sum(s.slice_type == "IDR" for s in enc.stats) >= 2


def test_b_partitions_chosen_and_bit_exact():
    """B 16x8/8x16 partitions (Table 7-14 mb_type 4..21): content with
    opposing half-MB motion must make the encoder pick partitioned B
    MBs on non-reference Bs, and the streams stay bit-exact in both
    entropy coders (decoder + libavcodec)."""
    import jax.numpy as jnp
    from tpu264.coding.encoder import jax_to_np
    from tpu264.coding.intra_frame import reorder_wave_outputs_j

    W, H = 64, 48
    rng = np.random.RandomState(11)
    base = rng.randint(0, 255, (H + 32, W + 64)).astype(np.uint8)
    frames = []
    for t in range(5):
        y = np.zeros((H, W), np.uint8)
        # top half pans right, bottom half pans left (8 px / frame)
        y[:H // 2] = base[:H // 2, 4 * t:4 * t + W]
        y[H // 2:] = base[16 + H // 2:16 + H, 32 - 4 * t:32 - 4 * t + W]
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 130, np.uint8)
        frames.append((y, u, v))
    for mode in ("CAVLC", "CABAC"):
        cfg = EncoderConfig(width=W, height=H, qp=30, symbol_mode=mode,
                            intra_period=0, num_b_frames=1)
        enc = Encoder(cfg)
        caps = []
        orig = enc._encode_b

        def wrap(*args, orig=orig, enc=enc, caps=caps):
            out, ys = orig(*args)
            caps.append(jax_to_np(reorder_wave_outputs_j(enc.sched, ys)))
            return out, ys

        enc._encode_b = wrap
        stream = enc.encode_sequence(frames)
        n_part = sum(int((c["btype"] == 5).sum()) for c in caps)
        assert n_part > 0, f"{mode}: no partitioned B MBs chosen"
        got = decode_annexb(stream)
        for i in range(len(frames)):
            for j in range(3):
                np.testing.assert_array_equal(
                    got[i][j], np.asarray(enc.recons[i][j]),
                    err_msg=f"{mode} own frame {i}")
        ff, errors = lavc_decode(stream)
        assert errors == []
        for i in range(len(frames)):
            for j in range(3):
                np.testing.assert_array_equal(
                    ff[i][j], np.asarray(enc.recons[i][j]),
                    err_msg=f"{mode} lavc frame {i}")
