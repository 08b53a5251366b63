"""Tile-sharded frame encoding over a device mesh (SURVEY.md §2b TP/DP).

Each chip owns a horizontal band of MB rows and encodes it as an
independent H.264 slice — the codec-native tensor-parallel axis: slice
boundaries cut the intra/MV-pred/deblock dependencies by construction,
so the only inter-chip traffic is the reference-frame halo (24 luma /
12 chroma rows) exchanged via `ppermute` for motion search across band
edges (SURVEY.md §2c).  The full per-band pipeline — wavefront encode,
in-loop deblock, CAVLC serialize + bit pack — runs inside one
`shard_map`-ped step; the `gop` mesh axis carries independent sequences
(data parallel).

The tiled encode produces byte-identical bitstreams to a single-device
encode with `slices_per_frame = n_tiles` (tests/test_sharded.py), which
is the determinism/race gate of SURVEY.md §4.4.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu264.coding.intra_frame import make_intra_encoder
from tpu264.coding.wavefront import build_schedule


def make_mesh(n_devices: int | None = None, gop: int | None = None):
    """Default 2-axis mesh (gop × tile) over the available devices."""
    devs = np.array(jax.devices())
    n = n_devices or devs.size
    devs = devs[:n]
    if gop is None:
        gop = 2 if n % 2 == 0 and n > 1 else 1
    tile = n // gop
    return Mesh(devs.reshape(gop, tile), ("gop", "tile"))


# ======================================================================
# Productionized tiled pipeline (round 3): full encode step per tile band
# — wavefront encode + deblock + CAVLC serialize/pack INSIDE shard_map,
# ref-frame halo rows exchanged via ppermute for P frames (SURVEY.md §2c),
# bitstream assembled by the encoder.  Byte-identical to the single-device
# Encoder with slices_per_frame == n_tiles (tests/test_sharded.py).
# ======================================================================

from tpu264.bits import nal as _nal
from tpu264.bits.params import PPS as _PPS, SPS as _SPS
from tpu264.bits.slicehdr import (SLICE_I as _SI, SLICE_P as _SP,
                                  SliceHeader as _SliceHeader)
from tpu264.coding.inter_frame import PAD as _PAD, make_inter_encoder
from tpu264.coding.intra_frame import reorder_wave_outputs_j
from tpu264.entropy import device_cavlc as _dcav
from tpu264.entropy import slice_writer as _slice_writer


class TiledEncoder:
    """Mesh-sharded CAVLC encoder: `tile` axis = frame bands (H.264
    slices), `gop` axis = independent sequences (data parallel).

    encode_sequence(seqs) takes `G` sequences (lists of (y, u, v)) and
    returns `G` Annex-B streams, each byte-identical to the single-device
    `Encoder` output with slices_per_frame == n_tiles.
    """

    def __init__(self, cfg, mesh: Mesh, tile_axis: str = "tile",
                 gop_axis: str = "gop"):
        from tpu264.coding.intra_frame import make_intra_encoder
        from tpu264.kernels import pallas_kernels as pk
        cfg.validate()
        pk.set_enabled(cfg.use_pallas if cfg.use_pallas is not None
                       else jax.default_backend() == "tpu")
        self.cfg = cfg
        self.mesh = mesh
        self.tile_axis = tile_axis
        self.gop_axis = gop_axis
        self.gop_size = mesh.shape[gop_axis]
        n_tiles = mesh.shape[tile_axis]
        self.n_tiles = n_tiles
        assert cfg.height_mbs % n_tiles == 0, "bands must be whole MB rows"
        self.band_hm = cfg.height_mbs // n_tiles
        # single-hop ppermute halos: the 24-px luma / 12-px chroma ref
        # margin must fit in one neighbor band
        assert self.band_hm >= 2, "tile bands need >= 2 MB rows"
        wm = cfg.width_mbs
        band_sched = build_schedule(wm, self.band_hm, 1)
        self.band_sched = band_sched
        self._enc_i = make_intra_encoder(band_sched)
        self._enc_p = make_inter_encoder(band_sched,
                                         search_range=cfg.search_range,
                                         ref_prepadded=True)
        self.deblock_idc = (1 if not cfg.deblock else 2)
        self._deblock = None
        if cfg.deblock:
            from tpu264.kernels.deblock import make_deblocker_skewed
            self._deblock = make_deblocker_skewed(
                band_sched, filter_across_slices=False)
        # mirrors Encoder's SPS/PPS for bit-identical headers
        self.sps = _SPS(profile_idc=cfg.profile_idc,
                        constraint_flags=0xC0 if cfg.profile_idc == 66 else 0,
                        level_idc=cfg.level_idc, pic_order_cnt_type=2,
                        max_num_ref_frames=max(1, cfg.num_ref_frames),
                        pic_width_in_mbs=wm,
                        pic_height_in_map_units=cfg.height_mbs)
        self.pps = _PPS(entropy_coding_mode_flag=0, pic_init_qp=26,
                        deblocking_filter_control_present_flag=1)
        cap_words = wm * self.band_hm * 100
        self._cap_words = cap_words
        rows = [0]

        def band_recon(dev_out, mbd, qp, is_inter=None, mv=None):
            if self._deblock is None:
                return (dev_out["recon_y"].astype(jnp.uint8),
                        dev_out["recon_u"].astype(jnp.uint8),
                        dev_out["recon_v"].astype(jnp.uint8))
            from tpu264.coding import mvpred
            from tpu264.entropy.device_cavlc import (_compute_cbp_j,
                                                     luma_tc_grid_j)
            from tpu264.ref.transform import chroma_qp as _cqp_fn
            n = wm * self.band_hm
            sel16 = mbd["sel16"].astype(bool)
            if is_inter is None:
                is_inter = jnp.zeros(n, dtype=bool)
            cbp_luma, _, _ = _compute_cbp_j(
                sel16, mbd["luma_ac"].astype(jnp.int32), mbd["chroma_dc"],
                mbd["chroma_ac"])
            tc = luma_tc_grid_j(mbd, cbp_luma, wm, self.band_hm)
            intra_mb = (~is_inter).reshape(self.band_hm, wm)
            if mv is None:
                mv = jnp.zeros((n, 2), dtype=jnp.int32)
            mv_grid = jnp.where(is_inter[:, None], mv, 0).reshape(
                self.band_hm, wm, 2)
            ref_grid = jnp.where(is_inter, 0, mvpred.INTRA).reshape(
                self.band_hm, wm)
            cqp_t = jnp.asarray(
                np.array([_cqp_fn(q) for q in range(52)]), jnp.int32)[
                jnp.clip(qp, 0, 51)]
            fy, fu, fv = self._deblock(
                dev_out["recon_y"], dev_out["recon_u"], dev_out["recon_v"],
                intra_mb, tc, mv_grid, ref_grid, qp, cqp_t)
            return (fy.astype(jnp.uint8), fu.astype(jnp.uint8),
                    fv.astype(jnp.uint8))

        def step_i(y, u, v, qp):
            # local shapes [1(g), 1(t), band_h, W]
            y, u, v = y[0, 0], u[0, 0], v[0, 0]
            dev_out, ys = self._enc_i(y, u, v, qp)
            mbd = reorder_wave_outputs_j(band_sched, ys)
            words, nbits = _dcav.serialize_frame_j(
                mbd, wm, self.band_hm, rows)
            words, nbits = _dcav.pack_slices_j(words, nbits, 1, cap_words)
            ry, ru, rv = band_recon(dev_out, mbd, qp)
            z = jnp.zeros((1, 1, wm * self.band_hm), bool)
            return (ry[None, None], ru[None, None], rv[None, None],
                    words[None, None], nbits[None, None], z)

        def step_p(y, u, v, ry, ru, rv, qp):
            y, u, v = y[0, 0], u[0, 0], v[0, 0]
            ry = ry[0, 0].astype(jnp.int32)
            ru = ru[0, 0].astype(jnp.int32)
            rv = rv[0, 0].astype(jnp.int32)
            t = jax.lax.axis_index(tile_axis)
            n = n_tiles

            def halo_ext(plane, pad):
                if n > 1:
                    from_above = jax.lax.ppermute(
                        plane[-pad:], tile_axis,
                        [(i, (i + 1) % n) for i in range(n)])
                    from_below = jax.lax.ppermute(
                        plane[:pad], tile_axis,
                        [(i, (i - 1) % n) for i in range(n)])
                else:
                    from_above = plane[-pad:]
                    from_below = plane[:pad]
                top = jnp.where(t == 0,
                                jnp.repeat(plane[:1], pad, axis=0),
                                from_above)
                bot = jnp.where(t == n - 1,
                                jnp.repeat(plane[-1:], pad, axis=0),
                                from_below)
                ext = jnp.concatenate([top, plane, bot], axis=0)
                return jnp.pad(ext, ((0, 0), (pad, pad)), mode="edge")

            ry_pad = halo_ext(ry, _PAD)
            ru_pad = halo_ext(ru, _PAD // 2)
            rv_pad = halo_ext(rv, _PAD // 2)
            dev_out, ys = self._enc_p(y, u, v, ry_pad, ru_pad, rv_pad, qp)
            mbd = reorder_wave_outputs_j(band_sched, ys)
            words, nbits, skipped = _dcav.serialize_frame_p_j(
                mbd, wm, self.band_hm, rows)
            words, nbits = _dcav.pack_slices_j(words, nbits, 1, cap_words)
            ry2, ru2, rv2 = band_recon(
                dev_out, mbd, qp, is_inter=mbd["is_inter"].astype(bool),
                mv=mbd["mv"].astype(jnp.int32))
            return (ry2[None, None], ru2[None, None], rv2[None, None],
                    words[None, None], nbits[None, None],
                    skipped[None, None])

        gspec = P(gop_axis, tile_axis, None, None)
        out_spec = (gspec, gspec, gspec,
                    P(gop_axis, tile_axis, None, None),
                    P(gop_axis, tile_axis, None),
                    P(gop_axis, tile_axis, None))
        self._step_i = jax.jit(jax.shard_map(
            step_i, mesh=mesh, in_specs=(gspec,) * 3 + (P(),),
            out_specs=out_spec, check_vma=False))
        self._step_p = jax.jit(jax.shard_map(
            step_p, mesh=mesh, in_specs=(gspec,) * 6 + (P(),),
            out_specs=out_spec, check_vma=False))

    def encode_sequence(self, seqs) -> list[bytes]:
        """seqs: list of G sequences of (y, u, v). Returns G streams."""
        cfg = self.cfg
        G = len(seqs)
        assert G == self.gop_size, "one sequence per gop mesh lane"
        nfr = len(seqs[0])
        assert all(len(s) == nfr for s in seqs)
        outs = [[_nal.make_nalu(3, _nal.NAL_SPS, self.sps.write_rbsp()),
                 _nal.make_nalu(3, _nal.NAL_PPS, self.pps.write_rbsp())]
                for _ in range(G)]
        band_mbs = self.band_hm * cfg.width_mbs
        recon = None
        frame_num = [0] * G
        idr_count = 0
        for i in range(nfr):
            y = np.stack([np.asarray(seqs[g][i][0]) for g in range(G)])
            u = np.stack([np.asarray(seqs[g][i][1]) for g in range(G)])
            v = np.stack([np.asarray(seqs[g][i][2]) for g in range(G)])
            y = y.reshape(G, self.n_tiles, -1, y.shape[-1])
            u = u.reshape(G, self.n_tiles, -1, u.shape[-1])
            v = v.reshape(G, self.n_tiles, -1, v.shape[-1])
            period = cfg.intra_period
            is_idr = (i == 0 or period == 1
                      or (period > 1 and i % period == 0))
            qp = np.int32(cfg.qp if is_idr else cfg.qp_inter)
            if is_idr:
                ry, ru, rv, words, nbits, skipped = self._step_i(
                    y, u, v, qp)
            else:
                ry, ru, rv, words, nbits, skipped = self._step_p(
                    y, u, v, recon[0], recon[1], recon[2], qp)
            recon = (ry, ru, rv)
            nbits_np = np.asarray(nbits)
            words_np = np.asarray(words)
            skipped_np = np.asarray(skipped)
            for g in range(G):
                for s in range(self.n_tiles):
                    hdr = _SliceHeader(
                        first_mb_in_slice=s * band_mbs,
                        slice_type=_SI if is_idr else _SP,
                        frame_num=0 if is_idr else frame_num[g],
                        idr_pic_id=idr_count % 2,
                        slice_qp=int(qp),
                        disable_deblocking_filter_idc=self.deblock_idc,
                        is_idr=is_idr,
                        nal_ref_idc=3 if is_idr else 2,
                    )
                    sink = hdr.write_rbsp_head(self.sps, self.pps)
                    nb = int(nbits_np[g, s, 0])
                    wsl = words_np[g, s, 0, : (nb + 31) // 32]
                    if is_idr:
                        rbsp = _dcav.words_to_rbsp(wsl, nb, sink)
                        outs[g].append(_nal.make_nalu(3, _nal.NAL_IDR,
                                                      rbsp))
                    else:
                        tail = _slice_writer.trailing_skip_run(
                            skipped_np[g, s], 0, band_mbs)
                        rbsp = _dcav.words_to_rbsp(wsl, nb, sink,
                                                   final_skip_run=tail)
                        outs[g].append(_nal.make_nalu(2, _nal.NAL_SLICE,
                                                      rbsp))
                if is_idr:
                    frame_num[g] = 1
                else:
                    frame_num[g] = (frame_num[g] + 1) % (
                        1 << self.sps.log2_max_frame_num)
            if is_idr:
                idr_count += 1
        self.recons = recon
        return [b"".join(o) for o in outs]
