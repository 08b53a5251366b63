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
