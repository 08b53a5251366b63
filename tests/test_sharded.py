"""Distributed determinism (SURVEY.md §4.4): a tile-sharded encode over a
virtual device mesh must produce the byte-identical bitstream of a
single-device encode with one slice per tile band — races or halo bugs
would show up as bitstream diffs."""

import numpy as np
import pytest

import jax

from tpu264.bits import nal
from tpu264.bits.params import PPS, SPS
from tpu264.bits.slicehdr import SLICE_I, SliceHeader
from tpu264.config import EncoderConfig
from tpu264.coding.encoder import Encoder
from tpu264.entropy import slice_writer
from tpu264.media.synth import synth_frame
from tpu264.runtime.tiled import (make_mesh, make_tiled_intra_encoder,
                                  tiled_ys_to_mb)

W, H, QP = 48, 32, 30  # 2 tile bands of 1 MB row... (32 = 2 rows)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_tiled_encode_matches_single_device_bitstream():
    mesh = make_mesh(4, gop=2)         # gop=2 x tile=2
    n_tiles = mesh.shape["tile"]
    band_h = H // n_tiles
    step = make_tiled_intra_encoder(W, H, qp=QP, mesh=mesh)

    frames = [synth_frame(W, H, t) for t in range(2)]
    y = np.stack([f[0] for f in frames]).astype(np.int32)
    u = np.stack([f[1] for f in frames]).astype(np.int32)
    v = np.stack([f[2] for f in frames]).astype(np.int32)
    out, ys, stats = step(y, u, v)

    # reference: single-device encoder with slices_per_frame == n_tiles
    # (deblock off: the tiled path compares unfiltered recon; the filter
    # itself is covered by test_deblock.py)
    cfg = EncoderConfig(width=W, height=H, qp=QP, slices_per_frame=n_tiles,
                        deblock=False)
    enc = Encoder(cfg)
    ref_stream = enc.encode_sequence(frames)

    # rebuild the bitstream from the sharded outputs via the same writer
    sps, pps = enc.sps, enc.pps
    parts = [nal.make_nalu(3, nal.NAL_SPS, sps.write_rbsp()),
             nal.make_nalu(3, nal.NAL_PPS, pps.write_rbsp())]
    for g in range(2):
        mb = tiled_ys_to_mb(ys, W, band_h, n_tiles, g=g)
        values, lengths = slice_writer.serialize_frame_mbs(
            mb, cfg.width_mbs, cfg.height_mbs, enc.sched.slice_starts.tolist())
        rows_per = cfg.height_mbs // n_tiles
        for s in range(n_tiles):
            first = s * rows_per * cfg.width_mbs
            last = first + rows_per * cfg.width_mbs
            hdr = SliceHeader(first_mb_in_slice=first, slice_type=SLICE_I,
                              frame_num=0, idr_pic_id=g % 2, slice_qp=QP,
                              disable_deblocking_filter_idc=1, is_idr=True)
            sink = hdr.write_rbsp_head(sps, pps)
            rbsp = slice_writer.pack_slice(values[first:last],
                                           lengths[first:last], sink)
            parts.append(nal.make_nalu(3, nal.NAL_IDR, rbsp))
        # recon must match the single-device recon exactly
        np.testing.assert_array_equal(
            np.asarray(out["recon_y"])[g].astype(np.uint8), enc.recons[g][0])
    sharded_stream = b"".join(parts)
    assert sharded_stream == ref_stream
