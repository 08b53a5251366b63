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

Round 4 (BASELINE.json config 4): the tiled path covers the full
flagship configuration — I/P/B GOPs incl. the dyadic hierarchical
pyramid (shared `build_bgop_plan`), CABAC (per-band host payloads from
the sharded element grids), JVT-G012 rate control per sequence lane,
and B deblocking with two-list bS.  Dual reference halos (past + future
anchors) ride the same ppermute exchange; the colZeroFlag map for
spatial direct stays sharded on device between frames.

The tiled encode produces byte-identical bitstreams to a single-device
encode with `slices_per_frame = n_tiles` (tests/test_sharded.py), which
is the determinism/race gate of SURVEY.md §4.4.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu264.bits import nal as _nal
from tpu264.bits.slicehdr import (SLICE_B as _SB, SLICE_I as _SI,
                                  SLICE_P as _SP, SliceHeader as _SliceHeader)
from tpu264.coding.b_frame import make_b_encoder
from tpu264.coding.encoder import (build_bgop_plan, build_params,
                                   colstate_of)
from tpu264.coding.inter_frame import PAD as _PAD, make_inter_encoder
from tpu264.coding.intra_frame import (make_intra_encoder,
                                       reorder_wave_outputs_j)
from tpu264.coding.wavefront import build_schedule
from tpu264.entropy import device_cavlc as _dcav
from tpu264.entropy import slice_writer as _slice_writer


def make_mesh(n_devices: int | None = None, gop: int | None = None):
    """Default 2-axis mesh (gop × tile) over the available devices."""
    devs = np.array(jax.devices())
    n = n_devices or devs.size
    devs = devs[:n]
    if gop is None:
        gop = 2 if n % 2 == 0 and n > 1 else 1
    tile = n // gop
    return Mesh(devs.reshape(gop, tile), ("gop", "tile"))


def _cabac_fin(pay: bytes):
    def fin(sink, pay=pay):
        sink.cabac_align()
        return sink.to_bytes() + pay
    return fin


class TiledEncoder:
    """Mesh-sharded encoder: `tile` axis = frame bands (H.264 slices),
    `gop` axis = independent sequences (data parallel).

    Supports all-intra / IPPP / hierarchical-B GOPs, CAVLC and CABAC,
    rate control, and in-loop deblocking — BASELINE.json config 4 as one
    runnable path.  encode_sequence(seqs) takes `G` sequences (lists of
    (y, u, v)) and returns `G` Annex-B streams, each byte-identical to
    the single-device `Encoder` output with slices_per_frame == n_tiles.
    """

    def __init__(self, cfg, mesh: Mesh, tile_axis: str = "tile",
                 gop_axis: str = "gop"):
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
        self.wm = wm
        band_sched = build_schedule(wm, self.band_hm, 1)
        self.band_sched = band_sched
        if cfg.num_b_frames > 0 and cfg.intra_period != 1:
            self.gop_mode = "bgop"
        elif cfg.intra_period == 1:
            self.gop_mode = "intra"
        else:
            self.gop_mode = "ippp"
        self.sps, self.pps, self.cabac = build_params(cfg, self.gop_mode)
        self._enc_i = make_intra_encoder(band_sched)
        # 16x8/8x16 + P_8x8 partitions: same auto rule as Encoder
        # (IPPP and B-GOP anchors, both entropy coders)
        self.partitions = (cfg.inter_partitions
                           if cfg.inter_partitions is not None
                           else self.gop_mode in ("ippp", "bgop"))
        forced_off = (self.partitions
                      and self.gop_mode not in ("ippp", "bgop"))
        self.partitions = (self.partitions
                           and self.gop_mode in ("ippp", "bgop"))
        if forced_off and cfg.inter_partitions:
            import warnings
            warnings.warn(
                "inter_partitions requested but only supported for "
                "IPPP / B GOPs; encoding without partitions",
                stacklevel=2)
        # High-profile 8x8 transform: same auto rule as Encoder
        self.t8_mode = (cfg.transform_8x8
                        if cfg.transform_8x8 is not None
                        else self.gop_mode in ("ippp", "bgop"))
        self.t8_mode = (self.t8_mode
                        and self.gop_mode in ("ippp", "bgop"))
        if self.t8_mode:
            self.sps, self.pps, self.cabac = build_params(
                cfg, self.gop_mode, t8=True)
        # P_8x8 sub-MB tree: same rule as Encoder
        self.p8x8 = self.partitions
        self._enc_p = make_inter_encoder(band_sched,
                                         search_range=cfg.search_range,
                                         ref_prepadded=True,
                                         partitions=self.partitions,
                                         t8=self.t8_mode,
                                         p8x8=self.p8x8)
        self._enc_b = None
        # B 16x8/8x16 partitions: same auto rule as Encoder (non-ref Bs)
        self.b_partitions = (self.gop_mode == "bgop"
                             and cfg.inter_partitions is not False)
        if self.gop_mode == "bgop":
            self._enc_b = make_b_encoder(band_sched,
                                         search_range=cfg.search_range,
                                         ref_prepadded=True,
                                         partitions=self.b_partitions)
        self.deblock_idc = (1 if not cfg.deblock else 2)
        self._deblock = None
        if cfg.deblock:
            from tpu264.kernels.deblock import make_deblocker_skewed
            self._deblock = make_deblocker_skewed(
                band_sched, filter_across_slices=False)
        self.rcs = None
        if cfg.rate_control and cfg.bitrate > 0:
            from tpu264.runtime.ratectl import RateController
            self.rcs = [RateController(
                bitrate=cfg.bitrate, frame_rate=cfg.frame_rate,
                n_mbs=wm * cfg.height_mbs, init_qp=cfg.qp)
                for _ in range(self.gop_size)]
        cap_words = wm * self.band_hm * 100
        self._cap_words = cap_words
        rows = [0]
        band_n = wm * self.band_hm
        self._cengine = None
        if self.cabac:
            # device CABAC per band: binarize + compact inside the step;
            # on TPU the Pallas lane-serial coder runs in-step too, so
            # only packed payloads cross the link (BASELINE.json north
            # star); host backends replay records through the C engine
            from tpu264.entropy import cabac_pallas as _cpal
            chunk = 8192
            self._cabac_cap = -(-band_n * 768 // chunk) * chunk
            self._cpal = _cpal
            if pk.enabled() and _cpal.engine_compiles():
                self._cengine = _cpal.make_slice_encoder(
                    self._cabac_cap, cap_words, chunk=chunk)

        def band_recon(dev_out, mbd, qp, mode: str):
            """Optional in-loop deblock of the band recon; `mode` picks
            the bS motion form (i: none, p: single-list, b: two-list)."""
            if self._deblock is None:
                return (dev_out["recon_y"].astype(jnp.uint8),
                        dev_out["recon_u"].astype(jnp.uint8),
                        dev_out["recon_v"].astype(jnp.uint8))
            from tpu264.coding import mvpred
            from tpu264.entropy.device_cavlc import (_compute_cbp_j,
                                                     luma_tc_grid_j)
            from tpu264.ref.transform import chroma_qp as _cqp_fn
            bh = self.band_hm
            sel16 = mbd["sel16"].astype(bool)
            cbp_luma, _, _ = _compute_cbp_j(
                sel16, mbd["luma_ac"].astype(jnp.int32), mbd["chroma_dc"],
                mbd["chroma_ac"])
            tc = luma_tc_grid_j(mbd, cbp_luma, wm, bh)
            t8_grid = None
            if "t8" in mbd:
                t8_grid = mbd["t8"].reshape(bh, wm)
                tc8 = tc.reshape(bh * 2, 2, wm * 2, 2).sum(axis=(1, 3))
                tc8 = jnp.repeat(jnp.repeat(tc8, 2, 0), 2, 1)
                t8r = jnp.repeat(jnp.repeat(t8_grid, 4, 0), 4, 1)
                tc = jnp.where(t8r, tc8, tc)
            if mode == "b":
                btype = mbd["btype"]
                is_inter = btype != 4
                use0 = mbd["use0"].astype(bool)
                use1 = mbd["use1"].astype(bool)
                if "bptype" in mbd:
                    # partitioned B: per-4x4 two-list grids
                    partd = btype == 5
                    cu0 = jnp.asarray(np.array([1, 0, 1], np.bool_))
                    cu1 = jnp.asarray(np.array([0, 1, 1], np.bool_))
                    c1b = mbd["c1"].astype(jnp.int32)
                    use0b = jnp.where(partd, cu0[c1b], use0)
                    use1b = jnp.where(partd, cu1[c1b], use1)
                    up4 = lambda a: jnp.repeat(jnp.repeat(a, 4, 0), 4, 1)
                    bt4 = up4(mbd["bptype"].astype(jnp.int32)
                              .reshape(bh, wm))
                    rsel = (jnp.arange(bh * 4) % 4 >= 2)[:, None]
                    csel = (jnp.arange(wm * 4) % 4 >= 2)[None, :]
                    p1cell = jnp.where(bt4 == 1, rsel,
                                       jnp.where(bt4 == 2, csel, False))

                    def lgrids(mvp0, up0, mvp1, up1, pid):
                        m0 = up4(jnp.where((up0 & is_inter)[:, None],
                                           mvp0, 0)
                                 .reshape(bh, wm, 2).astype(jnp.int32))
                        m1 = up4(jnp.where((up1 & is_inter)[:, None],
                                           mvp1, 0)
                                 .reshape(bh, wm, 2).astype(jnp.int32))
                        r0g = up4(jnp.where(up0 & is_inter, pid, -1)
                                  .reshape(bh, wm).astype(jnp.int32))
                        r1g = up4(jnp.where(up1 & is_inter, pid, -1)
                                  .reshape(bh, wm).astype(jnp.int32))
                        return (jnp.where(p1cell[..., None], m1, m0),
                                jnp.where(p1cell, r1g, r0g))

                    ml0, rl0 = lgrids(mbd["mv0"], use0, mbd["mv0b"],
                                      use0b, 0)
                    ml1, rl1 = lgrids(mbd["mv1"], use1, mbd["mv1b"],
                                      use1b, 1)
                    mv_grid = jnp.stack([ml0, ml1], axis=2)
                    ref_grid = jnp.stack([rl0, rl1], axis=2)
                else:
                    mv_grid = jnp.stack(
                        [jnp.where(use0[:, None], mbd["mv0"], 0),
                         jnp.where(use1[:, None], mbd["mv1"], 0)],
                        axis=1).reshape(bh, wm, 2, 2).astype(jnp.int32)
                    ref_grid = jnp.stack(
                        [jnp.where(use0, 0, -1), jnp.where(use1, 1, -1)],
                        axis=1).reshape(bh, wm, 2).astype(jnp.int32)
            elif mode == "p":
                is_inter = mbd["is_inter"].astype(bool)
                mv = mbd["mv"].astype(jnp.int32)
                if "ptype" in mbd:
                    # per-4x4 single-list grids for partitioned MBs
                    m0 = jnp.where(is_inter[:, None], mv, 0)\
                        .reshape(bh, wm, 2)
                    m2 = jnp.where(is_inter[:, None],
                                   mbd["mv2"].astype(jnp.int32), 0)\
                        .reshape(bh, wm, 2)
                    pt4 = jnp.repeat(jnp.repeat(
                        mbd["ptype"].reshape(bh, wm), 4, 0), 4, 1)
                    rsel = (jnp.arange(bh * 4) % 4 >= 2)[:, None]
                    csel = (jnp.arange(wm * 4) % 4 >= 2)[None, :]
                    use2 = jnp.where(pt4 == 1, rsel,
                                     jnp.where(pt4 == 2, csel, False))
                    up = lambda a: jnp.repeat(jnp.repeat(a, 4, 0), 4, 1)
                    mv_grid = jnp.where(use2[..., None], up(m2), up(m0))
                    if "mvq" in mbd:
                        # P_8x8: quadrant per 4x4 cell
                        mq = jnp.where(is_inter[:, None, None],
                                       mbd["mvq"].astype(jnp.int32), 0)\
                            .reshape(bh, wm, 4, 2)
                        qsel = (rsel.astype(jnp.int32) * 2
                                + csel.astype(jnp.int32))
                        mq4 = up(mq)
                        mvq_grid = jnp.take_along_axis(
                            mq4, qsel[..., None, None], axis=2)[..., 0, :]
                        mv_grid = jnp.where((pt4 == 3)[..., None],
                                            mvq_grid, mv_grid)
                    ref_grid = jnp.where(
                        up(is_inter.reshape(bh, wm)), 0, mvpred.INTRA)
                else:
                    mv_grid = jnp.where(is_inter[:, None], mv, 0)\
                        .reshape(bh, wm, 2)
                    ref_grid = jnp.where(is_inter, 0, mvpred.INTRA)\
                        .reshape(bh, wm)
            else:
                is_inter = jnp.zeros(band_n, dtype=bool)
                mv_grid = jnp.zeros((bh, wm, 2), jnp.int32)
                ref_grid = jnp.full((bh, wm), mvpred.INTRA, jnp.int32)
            intra_mb = (~is_inter).reshape(bh, wm)
            cqp_t = jnp.asarray(
                np.array([_cqp_fn(q) for q in range(52)]), jnp.int32)[
                jnp.clip(qp, 0, 51)]
            fy, fu, fv = self._deblock(
                dev_out["recon_y"], dev_out["recon_u"], dev_out["recon_v"],
                intra_mb, tc, mv_grid, ref_grid, qp, cqp_t,
                t8_mb=t8_grid)
            return (fy.astype(jnp.uint8), fu.astype(jnp.uint8),
                    fv.astype(jnp.uint8))

        def halo_ext(plane, pad):
            """Extend a band vertically with real neighbor rows via a
            ring ppermute (frame edges replicate), then pad laterally."""
            t = jax.lax.axis_index(tile_axis)
            n = n_tiles
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

        def ref_halos(ry, ru, rv):
            return (halo_ext(ry.astype(jnp.int32), _PAD),
                    halo_ext(ru.astype(jnp.int32), _PAD // 2),
                    halo_ext(rv.astype(jnp.int32), _PAD // 2))

        def payload_of(mbd, kind: str, qp=None):
            """Per-band entropy payload on device (leading (gop, tile)
            dims added for the out_specs): CAVLC words/bits + skip map;
            CABAC: device binarize + compaction, then either the in-step
            Pallas coder (TPU: payload words out) or the record streams
            for the host C replay."""
            if self.t8_mode and "t8" not in mbd:
                # B (and t8-less I) mbds still carry the flag syntax
                mbd = dict(mbd, t8=jnp.zeros(band_n, bool))
            if self.cabac:
                from tpu264.entropy import cabac_binarize_j as cbj
                k, a, b, v, _ = cbj.binarize_frame_j(
                    mbd, wm, self.band_hm, rows, 0,
                    p_slice=(kind == "p"), b_slice=(kind == "b"))
                recs, counts = cbj.compact_slices_j(
                    k, a, b, v, wm, rows, self.band_hm, self._cabac_cap)
                if self._cengine is not None:
                    table = 0 if kind == "i" else 1
                    init = self._cpal.init_packed_states_j(table, qp)
                    words, nbytes = self._cengine(recs, counts, init)
                    return (words[None, None], nbytes[None, None],
                            counts[None, None])
                return (recs[None, None], counts[None, None])
            if kind == "i":
                v, l = _dcav.serialize_frame_j(mbd, wm, self.band_hm, rows,
                                               t8_mode=self.t8_mode)
                skipped = jnp.zeros(band_n, dtype=bool)
            elif kind == "p":
                v, l, skipped = _dcav.serialize_frame_p_j(
                    mbd, wm, self.band_hm, rows)
            else:
                v, l, skipped = _dcav.serialize_frame_b_j(
                    mbd, wm, self.band_hm, rows)
            words, nbits = _dcav.pack_slices_j(v, l, 1, cap_words)
            return (words[None, None], nbits[None, None],
                    skipped[None, None])

        def step_i(y, u, v, qp):
            y, u, v = y[0, 0], u[0, 0], v[0, 0]
            qp = qp[0]
            dev_out, ys = self._enc_i(y, u, v, qp)
            mbd = reorder_wave_outputs_j(band_sched, ys)
            payload = payload_of(mbd, "i", qp)
            ry, ru, rv = band_recon(dev_out, mbd, qp, "i")
            colstate = jnp.zeros(band_n, dtype=jnp.int32)
            sad = jnp.abs(y.astype(jnp.int32) - ry.astype(jnp.int32)).sum()
            return (ry[None, None], ru[None, None], rv[None, None],
                    payload, colstate[None, None], sad[None, None])

        def step_p(y, u, v, ry, ru, rv, qp):
            y, u, v = y[0, 0], u[0, 0], v[0, 0]
            qp = qp[0]
            ry_pad, ru_pad, rv_pad = ref_halos(ry[0, 0], ru[0, 0], rv[0, 0])
            dev_out, ys = self._enc_p(y, u, v, ry_pad, ru_pad, rv_pad, qp)
            mbd = reorder_wave_outputs_j(band_sched, ys)
            payload = payload_of(mbd, "p", qp)
            ry2, ru2, rv2 = band_recon(dev_out, mbd, qp, "p")
            # packed colocated state: bit0 = colZeroFlag (all cells),
            # bit1 = cells disagree (partitioned anchor)
            cz, czm = colstate_of(mbd)
            colstate = cz.astype(jnp.int32) | (czm.astype(jnp.int32) << 1)
            sad = jnp.abs(y.astype(jnp.int32) - ry2.astype(jnp.int32)).sum()
            return (ry2[None, None], ru2[None, None], rv2[None, None],
                    payload, colstate[None, None], sad[None, None])

        def step_b(y, u, v, r0y, r0u, r0v, r1y, r1u, r1v, colstate_in,
                   qp, allow_parts):
            y, u, v = y[0, 0], u[0, 0], v[0, 0]
            qp = qp[0]
            p0 = ref_halos(r0y[0, 0], r0u[0, 0], r0v[0, 0])
            p1 = ref_halos(r1y[0, 0], r1u[0, 0], r1v[0, 0])
            cs = colstate_in[0, 0]
            dev_out, ys = self._enc_b(y, u, v, *p0, *p1,
                                      (cs & 1).astype(bool),
                                      ((cs >> 1) & 1).astype(bool),
                                      qp, allow_parts)
            mbd = reorder_wave_outputs_j(band_sched, ys)
            payload = payload_of(mbd, "b", qp)
            ry2, ru2, rv2 = band_recon(dev_out, mbd, qp, "b")
            use0 = mbd["use0"].astype(bool)
            use1 = mbd["use1"].astype(bool)
            mvu = jnp.where(use0[:, None], mbd["mv0"], mbd["mv1"])
            # reference Bs stay 16x16 (allow_parts off) -> never mixed
            colstate = ((use0 | use1)
                        & (jnp.abs(mvu) <= 1).all(axis=1))\
                .astype(jnp.int32)
            sad = jnp.abs(y.astype(jnp.int32) - ry2.astype(jnp.int32)).sum()
            return (ry2[None, None], ru2[None, None], rv2[None, None],
                    payload, colstate[None, None], sad[None, None])

        gspec = P(gop_axis, tile_axis, None, None)
        pt = P(gop_axis, tile_axis)
        qspec = P(gop_axis)
        out_spec = (gspec, gspec, gspec, pt, pt, pt)
        self._step_i = jax.jit(jax.shard_map(
            step_i, mesh=mesh, in_specs=(gspec,) * 3 + (qspec,),
            out_specs=out_spec, check_vma=False))
        self._step_p = jax.jit(jax.shard_map(
            step_p, mesh=mesh, in_specs=(gspec,) * 6 + (qspec,),
            out_specs=out_spec, check_vma=False))
        if self._enc_b is not None:
            self._step_b = jax.jit(jax.shard_map(
                step_b, mesh=mesh,
                in_specs=(gspec,) * 9 + (P(gop_axis, tile_axis, None),
                                         qspec, P()),
                out_specs=out_spec, check_vma=False))

    # ------------------------------------------------------------ host side

    def _shard_frame(self, seqs, i):
        G = len(seqs)
        y = np.stack([np.asarray(seqs[g][i][0]) for g in range(G)])
        u = np.stack([np.asarray(seqs[g][i][1]) for g in range(G)])
        v = np.stack([np.asarray(seqs[g][i][2]) for g in range(G)])
        y = y.reshape(G, self.n_tiles, -1, y.shape[-1])
        u = u.reshape(G, self.n_tiles, -1, u.shape[-1])
        v = v.reshape(G, self.n_tiles, -1, v.shape[-1])
        return y, u, v

    def _reencode_band_cabac(self, g: int, t: int, kind: str, qp,
                             fb: dict) -> bytes:
        """Exact host fallback for one band whose CABAC record count
        overflowed the device compaction cap (pathological dense content):
        re-run the (deterministic) band encode outside the sharded step
        and binarize + range-code on the host with no cap.  Slow but
        byte-identical to what the device path would produce uncapped —
        mirrors Encoder._cabac_payloads' fallback."""
        from tpu264.entropy.cabac_slice import encode_frame_cabac_fast
        bh, wm = self.band_hm, self.wm
        qpg = int(qp[g])
        y = np.asarray(fb["y"])[g, t]
        u = np.asarray(fb["u"])[g, t]
        v = np.asarray(fb["v"])[g, t]

        def pad_band(planes, pad):
            # host twin of the in-step ref_halos/halo_ext: vertical
            # extension with real neighbor-band rows (frame edges
            # replicate), then lateral edge padding
            p = np.asarray(planes)[g].astype(np.int32)
            full = p.reshape(-1, p.shape[-1])
            bhpx = p.shape[-2]
            s, e = t * bhpx, (t + 1) * bhpx
            top = np.clip(np.arange(s - pad, s), 0, full.shape[0] - 1)
            bot = np.clip(np.arange(e, e + pad), 0, full.shape[0] - 1)
            ext = np.concatenate([full[top], full[s:e], full[bot]], 0)
            return np.pad(ext, ((0, 0), (pad, pad)), mode="edge")

        if kind == "i":
            _, ys = self._enc_i(y, u, v, qpg)
        elif kind == "p":
            r0 = fb["r0"]
            _, ys = self._enc_p(y, u, v, pad_band(r0[0], _PAD),
                                pad_band(r0[1], _PAD // 2),
                                pad_band(r0[2], _PAD // 2), qpg)
        else:
            r0, r1 = fb["r0"], fb["r1"]
            cs = np.asarray(fb["cz"])[g, t].astype(np.int32)
            _, ys = self._enc_b(y, u, v, pad_band(r0[0], _PAD),
                                pad_band(r0[1], _PAD // 2),
                                pad_band(r0[2], _PAD // 2),
                                pad_band(r1[0], _PAD),
                                pad_band(r1[1], _PAD // 2),
                                pad_band(r1[2], _PAD // 2),
                                (cs & 1).astype(bool),
                                ((cs >> 1) & 1).astype(bool), qpg,
                                fb.get("ap", np.True_))
        mbd = reorder_wave_outputs_j(self.band_sched, ys)
        mb = {k2: np.asarray(v2) for k2, v2 in mbd.items()}
        if self.t8_mode and "t8" not in mb:
            mb["t8"] = np.zeros(self.band_hm * wm, bool)
        payloads, _ = encode_frame_cabac_fast(
            mb, wm, bh, [0], qpg,
            p_slice=(kind == "p"), b_slice=(kind == "b"))
        return payloads[0]

    def _band_payloads(self, payload, qp, kind: str, fb: dict | None = None):
        """Host entropy finish: per-(lane, band) slice payload bytes.

        CAVLC: device-packed words → RBSP with the trailing skip run.
        CABAC: binarize the band's element grids and replay them through
        the native range coder (same path as the single-device Encoder).
        Returns [G][T] of (payload_bytes_fn, ) where the fn is applied
        with the band's header sink.  `fb` carries the step inputs so an
        overflowing band can be re-encoded on the host."""
        G, T = self.gop_size, self.n_tiles
        band_mbs = self.band_hm * self.wm
        out = [[None] * T for _ in range(G)]
        if not self.cabac:
            words_np = np.asarray(payload[0])
            nbits_np = np.asarray(payload[1])
            skipped_np = np.asarray(payload[2])
            for g in range(G):
                for t in range(T):
                    nb = int(nbits_np[g, t, 0])
                    wsl = words_np[g, t, 0, : (nb + 31) // 32]
                    tail = _slice_writer.trailing_skip_run(
                        skipped_np[g, t], 0, band_mbs)

                    def fin(sink, wsl=wsl, nb=nb, tail=tail, kind=kind):
                        if kind == "i":
                            return _dcav.words_to_rbsp(wsl, nb, sink)
                        return _dcav.words_to_rbsp(wsl, nb, sink,
                                                   final_skip_run=tail)
                    out[g][t] = fin
            return out
        table = 0 if kind == "i" else 1
        counts_np = np.asarray(
            payload[2] if self._cengine is not None else payload[1])
        # device compaction truncates records at the cap — those bands'
        # payloads are unusable; degrade to an exact host re-encode
        for g in range(G):
            for t in range(T):
                if int(counts_np[g, t, 0]) > self._cabac_cap:
                    assert fb is not None, "overflow without step inputs"
                    out[g][t] = _cabac_fin(
                        self._reencode_band_cabac(g, t, kind, qp, fb))
        if self._cengine is not None:
            words_np = np.asarray(payload[0])
            nb_np = np.asarray(payload[1])
            for g in range(G):
                for t in range(T):
                    if out[g][t] is None:
                        out[g][t] = _cabac_fin(
                            words_np[g, t, 0].astype(">u4").tobytes()[
                                :int(nb_np[g, t, 0])])
            return out
        from tpu264.entropy import cabac_native
        # pow2-bucketed transfer of the padded packed record streams
        from tpu264.entropy.cabac_binarize_j import unpack_records_np
        need = max([int(counts_np[g, t, 0]) for g in range(G)
                    for t in range(T) if out[g][t] is None], default=1)
        bucket = 4096
        while bucket < need:
            bucket *= 2
        bucket = min(bucket, self._cabac_cap)
        recs_np = np.asarray(payload[0][..., :bucket])
        for g in range(G):
            for t in range(T):
                if out[g][t] is not None:
                    continue
                c = int(counts_np[g, t, 0])
                kk, aa, bb = unpack_records_np(recs_np[g, t, 0, :c])
                out[g][t] = _cabac_fin(cabac_native.encode_records(
                    kk, aa.astype(np.int32), bb.astype(np.int32),
                    table, int(qp[g])))
        return out

    def _emit_frame(self, outs, fins, slice_type, frame_num, qp,
                    idr_pic_id=0, poc_lsb=None, is_idr=False,
                    nal_ref_idc=2, reorder_l0=()):
        band_mbs = self.band_hm * self.wm
        for g in range(self.gop_size):
            for t in range(self.n_tiles):
                hdr = _SliceHeader(
                    first_mb_in_slice=t * band_mbs,
                    slice_type=slice_type,
                    frame_num=frame_num[g] if isinstance(frame_num, list)
                    else frame_num,
                    idr_pic_id=idr_pic_id,
                    slice_qp=int(qp[g]),
                    pic_order_cnt_lsb=0 if poc_lsb is None else poc_lsb,
                    disable_deblocking_filter_idc=self.deblock_idc,
                    is_idr=is_idr,
                    nal_ref_idc=nal_ref_idc,
                    reorder_l0=reorder_l0,
                )
                sink = hdr.write_rbsp_head(self.sps, self.pps)
                rbsp = fins[g][t](sink)
                outs[g].append(_nal.make_nalu(
                    nal_ref_idc if not is_idr else 3,
                    _nal.NAL_IDR if is_idr else _nal.NAL_SLICE, rbsp))

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
        if self.gop_mode == "bgop":
            self._encode_bgop(seqs, outs, nfr)
        else:
            self._encode_ip(seqs, outs, nfr)
        return [b"".join(o) for o in outs]

    def _rc_qps(self, ftype: str, num_b: int = 0):
        cfg = self.cfg
        if self.rcs is None:
            base = cfg.qp if ftype == "I" else cfg.qp_inter
            return np.full(self.gop_size, base, np.int32)
        return np.asarray(
            [rc.frame_qp(ftype, num_b=num_b) for rc in self.rcs],
            np.int32)

    def _rc_update(self, ftype: str, outs, marks, sad, n_px):
        if self.rcs is None:
            return
        sad_np = np.asarray(sad).reshape(self.gop_size, self.n_tiles)
        for g, rc in enumerate(self.rcs):
            bits = 8 * sum(len(b) for b in outs[g][marks[g]:])
            rc.update(ftype, bits, float(sad_np[g].sum()) / n_px)

    def _encode_ip(self, seqs, outs, nfr):
        cfg = self.cfg
        recon = None
        frame_num = [0] * self.gop_size
        idr_count = 0
        n_px = cfg.width * cfg.height
        for i in range(nfr):
            y, u, v = self._shard_frame(seqs, i)
            period = cfg.intra_period
            is_idr = (i == 0 or period == 1
                      or (period > 1 and i % period == 0))
            qp = self._rc_qps("I" if is_idr else "P")
            marks = [len(o) for o in outs]
            if is_idr:
                ry, ru, rv, payload, cz, sad = self._step_i(y, u, v, qp)
                fins = self._band_payloads(payload, qp, "i",
                                           fb=dict(y=y, u=u, v=v))
                self._emit_frame(outs, fins, _SI, 0, qp,
                                 idr_pic_id=idr_count % 2, is_idr=True)
                idr_count += 1
                frame_num = [1] * self.gop_size
            else:
                ry, ru, rv, payload, cz, sad = self._step_p(
                    y, u, v, recon[0], recon[1], recon[2], qp)
                fins = self._band_payloads(
                    payload, qp, "p", fb=dict(y=y, u=u, v=v, r0=recon))
                self._emit_frame(outs, fins, _SP, list(frame_num), qp,
                                 nal_ref_idc=2)
                frame_num = [(f + 1) % (1 << self.sps.log2_max_frame_num)
                             for f in frame_num]
            self._rc_update("I" if is_idr else "P", outs, marks, sad, n_px)
            recon = (ry, ru, rv)
        self.recons = recon

    def _encode_bgop(self, seqs, outs, nfr):
        """Hierarchical-B coding over the mesh: same plan, headers and
        QP ladder as Encoder._encode_sequence_bgop (byte-identity)."""
        cfg = self.cfg
        plan = build_bgop_plan(nfr, cfg.num_b_frames, cfg.intra_period)
        hier = cfg.num_b_frames >= 2
        G = self.gop_size
        recons = {}                    # display idx -> sharded planes
        cz_of = {}                     # display idx -> sharded colzero
        n_px = cfg.width * cfg.height
        fn = 0
        idr_count = 0
        disp_base = 0
        fn_of = {}
        last_ref_fn = 0
        max_lsb = 1 << self.sps.log2_max_pic_order_cnt_lsb
        max_fn = 1 << self.sps.log2_max_frame_num
        anchor_qp = np.full(G, cfg.qp_inter, np.int32)
        # live set per plan position (free reference planes eagerly)
        needed_until = {}
        for pi, (disp, kind, r0, r1, layer) in enumerate(plan):
            for r in (r0, r1):
                if r is not None:
                    needed_until[r] = pi
        for pi, (disp, kind, r0, r1, layer) in enumerate(plan):
            y, u, v = self._shard_frame(seqs, disp)
            marks = [len(o) for o in outs]
            if kind == "I":
                qp = self._rc_qps("I")
                anchor_qp = qp
                disp_base = disp
                ry, ru, rv, payload, cz, sad = self._step_i(y, u, v, qp)
                fins = self._band_payloads(payload, qp, "i",
                                           fb=dict(y=y, u=u, v=v))
                self._emit_frame(outs, fins, _SI, 0, qp,
                                 idr_pic_id=idr_count % 2, is_idr=True,
                                 poc_lsb=0)
                idr_count += 1
                fn_of[disp] = 0
                last_ref_fn = 0
                fn = 1
                ftype = "I"
            elif kind == "P":
                qp = self._rc_qps("P", num_b=cfg.num_b_frames)
                anchor_qp = qp
                poc = (2 * (disp - disp_base)) % max_lsb
                reorder = ()
                if hier and fn_of.get(r0) is not None \
                        and last_ref_fn != fn_of[r0]:
                    diff = (fn - fn_of[r0]) % max_fn
                    reorder = ((0, diff - 1),)
                ry, ru, rv, payload, cz, sad = self._step_p(
                    y, u, v, *recons[r0], qp)
                fins = self._band_payloads(
                    payload, qp, "p", fb=dict(y=y, u=u, v=v,
                                              r0=recons[r0]))
                self._emit_frame(outs, fins, _SP, fn, qp, poc_lsb=poc,
                                 nal_ref_idc=2, reorder_l0=reorder)
                fn_of[disp] = fn
                last_ref_fn = fn
                fn = (fn + 1) % max_fn
                ftype = "P"
            else:
                base_b = (np.minimum(anchor_qp + 2, 51) if self.rcs
                          else np.full(G, cfg.qp_bslice, np.int32))
                qp = np.minimum(base_b + layer - 1, 51).astype(np.int32)
                poc = (2 * (disp - disp_base)) % max_lsb
                is_ref = kind == "Bref"
                ap = jnp.asarray(not is_ref)
                ry, ru, rv, payload, cz, sad = self._step_b(
                    y, u, v, *recons[r0], *recons[r1], cz_of[r1], qp, ap)
                fins = self._band_payloads(
                    payload, qp, "b", fb=dict(y=y, u=u, v=v, r0=recons[r0],
                                              r1=recons[r1], cz=cz_of[r1],
                                              ap=ap))
                self._emit_frame(outs, fins, _SB, fn, qp, poc_lsb=poc,
                                 nal_ref_idc=2 if is_ref else 0)
                if is_ref:
                    fn_of[disp] = fn
                    last_ref_fn = fn
                    fn = (fn + 1) % max_fn
                ftype = "B"
            self._rc_update(ftype, outs, marks, sad, n_px)
            recons[disp] = (ry, ru, rv)
            cz_of[disp] = cz
            # free planes that no later plan entry references
            for r in list(recons):
                if needed_until.get(r, -1) <= pi and r != disp:
                    del recons[r]
                    cz_of.pop(r, None)
        self.recons = recons