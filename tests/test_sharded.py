"""Distributed determinism (SURVEY.md §4.4): the mesh-sharded encoder must
produce byte-identical bitstreams to the single-device encoder with one
slice per tile band — races, stale halos, or collective bugs would show
up as bitstream diffs.  Covers the full production path: IPPP GOPs with
ref-pixel halo exchange (ppermute), in-loop deblocking, and on-device
CAVLC serialize/pack, with the `gop` mesh axis carrying independent
sequences (DP)."""

import numpy as np
import pytest

import jax

from tpu264.config import EncoderConfig
from tpu264.coding.encoder import Encoder
from tpu264.media.synth import synth_frame
from tpu264.runtime.tiled import TiledEncoder, make_mesh

W, H, QP = 48, 128, 30           # 4 tile bands of 2 MB rows


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs >=8 devices")
def test_tiled_ippp_deblock_matches_single_device_bitstream():
    mesh = make_mesh(8, gop=2)   # gop=2 x tile=4
    n_tiles = mesh.shape["tile"]
    cfg = EncoderConfig(width=W, height=H, qp=QP,
                        slices_per_frame=n_tiles, intra_period=4,
                        deblock=True)
    tenc = TiledEncoder(cfg, mesh)
    seqs = [[synth_frame(W, H, t + 10 * g) for t in range(6)]
            for g in range(2)]
    streams = tenc.encode_sequence(seqs)
    for g in range(2):
        enc = Encoder(cfg, gop_mode="ippp")
        ref = enc.encode_sequence(seqs[g])
        assert streams[g] == ref, (g, len(streams[g]), len(ref))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_tiled_intra_matches_single_device_bitstream():
    mesh = make_mesh(4, gop=1)   # tile=4
    n_tiles = mesh.shape["tile"]
    cfg = EncoderConfig(width=W, height=H, qp=QP,
                        slices_per_frame=n_tiles, intra_period=1,
                        deblock=True)
    tenc = TiledEncoder(cfg, mesh)
    seq = [synth_frame(W, H, t) for t in range(2)]
    streams = tenc.encode_sequence([seq])
    enc = Encoder(cfg)
    import os
    os.environ["TPU264_BATCH"] = "1"     # per-frame path for identity
    try:
        ref = enc.encode_sequence(seq)
    finally:
        del os.environ["TPU264_BATCH"]
    assert streams[0] == ref


@pytest.mark.parametrize("sym", ["CAVLC", "CABAC"])
def test_tiled_config4_bgop_matches_single_device(sym):
    """BASELINE config-4 shape through the mesh: hierarchical B + deblock
    + (CAVLC|CABAC), 2 tile bands — byte-identical to the single-device
    Encoder with slices_per_frame == n_tiles (VERDICT r3 task #1)."""
    W, H = 96, 96
    frames = [synth_frame(W, H, t) for t in range(9)]
    cfg1 = EncoderConfig(width=W, height=H, qp=30, intra_period=0,
                         num_b_frames=3, symbol_mode=sym,
                         slices_per_frame=2)
    ref_stream = Encoder(cfg1).encode_sequence(frames)
    cfg2 = EncoderConfig(width=W, height=H, qp=30, intra_period=0,
                         num_b_frames=3, symbol_mode=sym)
    te = TiledEncoder(cfg2, make_mesh(2, gop=1))
    assert te.encode_sequence([frames])[0] == ref_stream


def test_tiled_bgop_rate_control():
    """Config 4's rate controller through the tiled path: sequence rate
    within 8% of target (per-lane JVT-G012, anchors absorb the sub-GOP
    budget)."""
    W, H = 96, 96
    frames = [synth_frame(W, H, t) for t in range(17)]
    br = 300_000
    cfg = EncoderConfig(width=W, height=H, qp=30, intra_period=0,
                        num_b_frames=2, symbol_mode="CABAC",
                        rate_control=True, bitrate=br)
    te = TiledEncoder(cfg, make_mesh(2, gop=1))
    stream = te.encode_sequence([frames])[0]
    from tpu264.decode.decoder import decode_annexb
    assert len(decode_annexb(stream)) == 17
    target = br * 17 / cfg.frame_rate
    actual = 8 * len(stream)
    assert abs(actual - target) / target < 0.08, (actual, target)


def test_tiled_cabac_overflow_fallback_byte_identical():
    """When a band's CABAC record count exceeds the device compaction
    cap, the tiled path must degrade to the exact host re-encode — not
    assert (ADVICE r4).  Force-trip the host-side overflow check and
    require the stream to stay byte-identical to the untripped run."""
    W, H = 96, 96
    frames = [synth_frame(W, H, t) for t in range(5)]
    cfg = EncoderConfig(width=W, height=H, qp=30, intra_period=0,
                        num_b_frames=2, symbol_mode="CABAC")
    te = TiledEncoder(cfg, make_mesh(2, gop=1))
    ref = te.encode_sequence([frames])[0]
    te2 = TiledEncoder(cfg, make_mesh(2, gop=1))
    te2._cabac_cap = 1          # every band "overflows" -> fallback path
    assert te2.encode_sequence([frames])[0] == ref


def test_tiled_cabac_ippp_t8_matches_single_device():
    """CABAC IPPP with the High-profile 8x8 transform through the mesh
    (transform_size_8x8_flag + cat-5 records in the device binarizer)
    — byte-identical to the single-device encoder."""
    from tpu264.media.synth import natural_frame
    W, H = 96, 96
    frames = [natural_frame(W, H, t) for t in range(5)]
    cfg1 = EncoderConfig(width=W, height=H, qp=30, intra_period=0,
                         symbol_mode="CABAC", slices_per_frame=2)
    ref_stream = Encoder(cfg1, gop_mode="ippp").encode_sequence(frames)
    cfg2 = EncoderConfig(width=W, height=H, qp=30, intra_period=0,
                         symbol_mode="CABAC")
    te = TiledEncoder(cfg2, make_mesh(2, gop=1))
    assert te.t8_mode
    assert te.encode_sequence([frames])[0] == ref_stream
