"""Sequence-level encoder orchestration (JM `lencod` main loop parity —
SURVEY.md §3.1): parameter-set emission, per-frame device encode, host
entropy serialization, Annex-B assembly, per-frame stats logging.
"""

from __future__ import annotations

import dataclasses
import itertools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpu264.bits import nal
from tpu264.bits.params import PPS, SPS
from tpu264.bits.slicehdr import (SLICE_B, SLICE_I, SLICE_P,
                                  SliceHeader)
from tpu264.config import EncoderConfig
from tpu264.entropy import slice_writer
from .inter_frame import make_inter_encoder
from .intra_frame import make_intra_encoder, reorder_wave_outputs_j
from .wavefront import build_schedule


@dataclasses.dataclass
class FrameStats:
    frame: int
    slice_type: str
    bits: int
    psnr_y: float
    psnr_u: float
    psnr_v: float
    seconds: float


def build_bgop_plan(nfr: int, num_b: int, intra_period: int):
    """Coding-order plan for B GOPs (shared by Encoder and TiledEncoder).

    Returns a list of (display, kind, ref0, ref1, layer): kind "I"/"P"
    anchors (layer 0), "Bref" pyramid midpoints, "B" leaves; layer is the
    pyramid depth (1 = directly between anchors).  num_b >= 2 builds the
    dyadic hierarchy (JM `explicit_gop.c`); IDR cadence counts display
    frames (JM IntraPeriod), with chained-P tails before each closed-GOP
    IDR."""
    step = num_b + 1
    hier = num_b >= 2
    anchors = list(range(0, nfr, step))
    if anchors[-1] != nfr - 1:
        anchors.append(nfr - 1)

    def fill_gap(lo, hi, plan, depth):
        if hi - lo <= 1:
            return
        if not hier:
            for d in range(lo + 1, hi):
                plan.append((d, "B", lo, hi, depth))
            return
        mid = (lo + hi) // 2
        is_ref = (mid - lo > 1) or (hi - mid > 1)
        plan.append((mid, "Bref" if is_ref else "B", lo, hi, depth))
        fill_gap(lo, mid, plan, depth + 1)
        fill_gap(mid, hi, plan, depth + 1)

    plan = []
    prev = None
    last_idr = 0
    for ai, a in enumerate(anchors):
        is_idr = ai == 0 or (intra_period > 1
                             and a - last_idr >= intra_period)
        if is_idr:
            last_idr = a
        if prev is None:
            plan.append((a, "I", None, None, 0))
        elif is_idr:
            # closed GOP: an IDR flushes the DPB, so the gap frames
            # before it cannot be coded after it — emit them as a
            # chained-P tail in display order, then the IDR
            for d in range(prev + 1, a):
                plan.append((d, "P", d - 1, None, 0))
            plan.append((a, "I", None, None, 0))
        else:
            plan.append((a, "P", prev, None, 0))
            fill_gap(prev, a, plan, 1)
        prev = a
    return plan


def build_params(cfg: EncoderConfig, gop_mode: str, t8: bool = False,
                 wp: bool = False):
    """SPS/PPS for a config + GOP mode (shared by Encoder and
    TiledEncoder so tiled streams carry bit-identical parameter sets).
    `t8`: High-profile 8x8 transform is emitted — signal High profile
    and set the PPS transform_8x8_mode_flag."""
    poc_type = 0 if gop_mode == "bgop" else 2
    sps = SPS(
        profile_idc=(77 if gop_mode == "bgop" and cfg.profile_idc == 66
                     else cfg.profile_idc),
        constraint_flags=(0xC0 if cfg.profile_idc == 66
                          and gop_mode != "bgop" else 0),
        level_idc=cfg.level_idc,
        pic_order_cnt_type=poc_type,
        max_num_ref_frames=max(
            (4 if cfg.num_b_frames >= 2 else 2)
            if gop_mode == "bgop" else 1, cfg.num_ref_frames),
        pic_width_in_mbs=cfg.width_mbs,
        pic_height_in_map_units=cfg.height_mbs,
        num_reorder_frames=(None if gop_mode != "bgop"
                            else (2 if cfg.num_b_frames >= 2 else 1)),
    )
    cabac = cfg.symbol_mode.upper() == "CABAC"
    if cabac and sps.profile_idc == 66:
        # CABAC requires Main/High (spec A.2.1); JM errors out — we
        # upgrade the signalled profile instead
        sps.profile_idc = 77
        sps.constraint_flags = 0
    if t8:
        sps.profile_idc = 100            # High (transform_8x8 needs it)
        sps.constraint_flags = 0
    pps = PPS(
        entropy_coding_mode_flag=1 if cabac else 0,
        pic_init_qp=26,
        deblocking_filter_control_present_flag=1,
        transform_8x8_mode_flag=1 if t8 else 0,
        weighted_pred_flag=1 if wp else 0,
    )
    return sps, pps, cabac


def colstate_of(mbd):
    """Per-MB colocated state for spatial direct (spec 8.4.1.2.2) from
    a P frame's final decided maps: (colzero, colmixed) [n] bools.

    colzero: every 4x4 cell of the MB has colZeroFlag = 1 (inter, ref 0,
    |mv| <= 1 both components).  colmixed: the cells DISAGREE — a later
    B frame must not choose direct/skip on that MB because its per-MB
    direct derivation would diverge from the decoder's per-4x4 one.
    16x16 MBs are never mixed; 16x8/8x16 use both partition mvs; P_8x8
    uses all four quadrant mvs."""
    is_inter = mbd["is_inter"].astype(bool)

    def cz(m):
        return (jnp.abs(jnp.asarray(m, jnp.int32)) <= 1).all(axis=1)

    c0 = cz(mbd["mv"])
    all_c = any_c = c0
    if "ptype" in mbd:
        pt = mbd["ptype"].astype(jnp.int32)
        c1 = cz(mbd["mv2"])
        two = (pt == 1) | (pt == 2)
        all_c = jnp.where(two, c0 & c1, all_c)
        any_c = jnp.where(two, c0 | c1, any_c)
        if "mvq" in mbd:
            cq = [cz(mbd["mvq"][:, i]) for i in range(4)]
            all_c = jnp.where(pt == 3, cq[0] & cq[1] & cq[2] & cq[3],
                              all_c)
            any_c = jnp.where(pt == 3, cq[0] | cq[1] | cq[2] | cq[3],
                              any_c)
    return is_inter & all_c, is_inter & any_c & ~all_c


def psnr(orig: np.ndarray, recon: np.ndarray) -> float:
    mse = np.mean((orig.astype(np.float64) - recon.astype(np.float64)) ** 2)
    if mse == 0:
        return 99.99
    return 10 * np.log10(255.0 ** 2 / mse)


class Encoder:
    """H.264 encoder: all-intra or IPPP GOPs, CAVLC or CABAC, optional
    in-loop deblocking and JVT-G012 rate control (BASELINE.json configs
    1-3).

    `gop_mode`: "intra" = every frame IDR; "ippp" = first frame IDR, rest
    P (JM IntraPeriod semantics: cfg.intra_period > 0 inserts periodic
    IDR frames).
    """

    def __init__(self, cfg: EncoderConfig, gop_mode: str | None = None):
        cfg.validate()
        self.cfg = cfg
        from tpu264.kernels import pallas_kernels as pk
        # use_pallas None → auto: enabled on the TPU backend, off on the
        # CPU/interpret backends (config.py `use_pallas`)
        pk.set_enabled(cfg.use_pallas if cfg.use_pallas is not None
                       else jax.default_backend() == "tpu")
        if gop_mode is None:
            if cfg.num_b_frames > 0 and cfg.intra_period != 1:
                gop_mode = "bgop"
            else:
                gop_mode = "intra" if cfg.intra_period == 1 else "ippp"
        self.gop_mode = gop_mode
        self.sched = build_schedule(cfg.width_mbs, cfg.height_mbs,
                                    cfg.slices_per_frame)
        # B GOPs need display-order POC (type 0); I/P streams keep the
        # decode-order type 2 (bit-identical to earlier rounds)
        self.sps, self.pps, self.cabac = build_params(cfg, gop_mode)
        self._encode_frame = make_intra_encoder(self.sched)
        self._encode_p = None
        self._encode_b = None
        # 16x8/8x16 + P_8x8 partitions: auto-on for IPPP and for the P
        # anchors of B GOPs (both entropy coders); B direct/skip stays
        # exact via the per-4x4 colocated-uniformity mask (colmixed)
        self.partitions = (cfg.inter_partitions
                           if cfg.inter_partitions is not None
                           else gop_mode in ("ippp", "bgop"))
        forced_off = self.partitions and gop_mode not in ("ippp", "bgop")
        self.partitions = (self.partitions
                           and gop_mode in ("ippp", "bgop"))
        if forced_off and cfg.inter_partitions:
            import warnings
            warnings.warn(
                "inter_partitions requested but only supported for "
                "IPPP / B GOPs; encoding without partitions",
                stacklevel=2)
        # High-profile 8x8 transform: auto-on for IPPP and B GOPs (both
        # entropy coders); selection runs on P/anchor MBs, B slices
        # emit transform_size_8x8_flag = 0 (engines are 4x4-only there)
        self.t8_mode = (cfg.transform_8x8
                        if cfg.transform_8x8 is not None
                        else gop_mode in ("ippp", "bgop"))
        t8_forced_off = self.t8_mode and gop_mode not in ("ippp", "bgop")
        self.t8_mode = self.t8_mode and gop_mode in ("ippp", "bgop")
        if t8_forced_off and cfg.transform_8x8:
            import warnings
            warnings.warn(
                "transform_8x8 requested but only supported for IPPP / "
                "B GOPs; encoding with the 4x4 transform", stacklevel=2)
        # explicit P weighted prediction (opt-in; fades)
        self.wp_mode = bool(cfg.weighted_pred) and gop_mode == "ippp"
        if self.t8_mode or self.wp_mode:
            self.sps, self.pps, self.cabac = build_params(
                cfg, gop_mode, t8=self.t8_mode, wp=self.wp_mode)
        # P_8x8 sub-MB tree (sub_mb_type = P_L0_8x8 per quadrant):
        # follows the partitions rule for both entropy coders
        self.p8x8 = self.partitions
        if gop_mode in ("ippp", "bgop"):
            self._encode_p = make_inter_encoder(
                self.sched, search_range=cfg.search_range,
                partitions=self.partitions, t8=self.t8_mode,
                weighted=self.wp_mode, p8x8=self.p8x8)
        # B 16x8/8x16 partitions: auto-on for B GOPs (restricted to
        # NON-REFERENCE Bs at encode time — see b_frame docstring)
        self.b_partitions = (gop_mode == "bgop"
                             and cfg.inter_partitions is not False)
        if gop_mode == "bgop":
            from .b_frame import make_b_encoder
            self._encode_b = make_b_encoder(
                self.sched, search_range=cfg.search_range,
                partitions=self.b_partitions)
        # in-loop deblocking: idc 0 (on) single-slice, idc 2 (slice-local)
        # multi-slice, idc 1 (off) when disabled
        self.deblock_idc = (1 if not cfg.deblock
                            else (0 if cfg.slices_per_frame == 1 else 2))
        self._deblock = None
        if cfg.deblock:
            from tpu264.kernels.deblock import make_deblocker_skewed
            self._deblock = make_deblocker_skewed(
                self.sched,
                filter_across_slices=(self.deblock_idc == 0))
        # rate control (JVT-G012 quadratic model, host-side)
        self.rc = None
        if cfg.rate_control and cfg.bitrate > 0:
            from tpu264.runtime.ratectl import RateController
            self.rc = RateController(
                bitrate=cfg.bitrate, frame_rate=cfg.frame_rate,
                n_mbs=cfg.width_mbs * cfg.height_mbs, init_qp=cfg.qp)
        self.stats: list[FrameStats] = []

        # on-device entropy path (CAVLC): serialize + pack in one jit so
        # only packed payloads (~stream size) cross the device link
        wm, hm = cfg.width_mbs, cfg.height_mbs
        rows = self.sched.slice_starts.tolist()
        n_slices = cfg.slices_per_frame
        per_slice = (wm * hm) // n_slices
        cap_words = per_slice * 100      # 3200 bits/MB ceiling (spec A.3.1)
        if self.cabac:
            # device CABAC: binarize + per-slice record compaction run
            # inside jit (cabac_binarize_j); the range coder is the
            # Pallas lane-serial kernel on TPU, the native C replay on
            # host backends.  The numpy binarizer remains the oracle and
            # the fallback when a slice overflows the record cap.
            from tpu264.entropy import cabac_binarize_j as cbj
            from tpu264.entropy import cabac_pallas as cpal
            chunk = 8192
            cap = -(-per_slice * 768 // chunk) * chunk
            self._cabac_cap = cap
            self._cabac_chunk = chunk

            t8m = self.t8_mode

            def _mk(kind):
                p_slice = kind == "p"
                b_slice = kind == "b"

                @jax.jit
                def f(mbd):
                    if t8m and "t8" not in mbd:
                        # I slices in a t8 PPS still carry the flag bit
                        # (value 0) on every I_NxN MB
                        mbd = dict(mbd, t8=jnp.zeros(wm * hm, bool))
                    k, a, b, v, sk = cbj.binarize_frame_j(
                        mbd, wm, hm, rows, 0, p_slice=p_slice,
                        b_slice=b_slice)
                    recs, counts = cbj.compact_slices_j(
                        k, a, b, v, wm, rows, hm, cap)
                    return recs, counts, sk
                return f

            self._crec = {"i": _mk("i"), "p": _mk("p"), "b": _mk("b")}
            from tpu264.kernels import pallas_kernels as _pk
            self._cabac_engine = None
            if _pk.enabled() and cpal.engine_compiles():
                self._cabac_engine = jax.jit(cpal.make_slice_encoder(
                    cap, cap_words, chunk=chunk))
            self._cabac_init = cpal.init_packed_states
        if not self.cabac:
            from tpu264.entropy import device_cavlc as dcav
            self._dcav = dcav

            t8m = self.t8_mode

            @jax.jit
            def _ser_i(mbd):
                v, l = dcav.serialize_frame_j(mbd, wm, hm, rows,
                                              t8_mode=t8m)
                return dcav.pack_slices_j(v, l, n_slices, cap_words)

            @jax.jit
            def _ser_p(mbd):
                v, l, skipped = dcav.serialize_frame_p_j(mbd, wm, hm, rows)
                w, nb = dcav.pack_slices_j(v, l, n_slices, cap_words)
                return w, nb, skipped

            @jax.jit
            def _ser_b(mbd):
                v, l, skipped = dcav.serialize_frame_b_j(mbd, wm, hm, rows)
                w, nb = dcav.pack_slices_j(v, l, n_slices, cap_words)
                return w, nb, skipped

            self._ser_i, self._ser_p, self._ser_b = _ser_i, _ser_p, _ser_b

        @jax.jit
        def _sse3(oy, ou, ov, ry, ru, rv):
            def s(a, b):
                d = a.astype(jnp.int32) - b.astype(jnp.int32)
                return (d * d).sum()
            dy = oy.astype(jnp.int32) - ry.astype(jnp.int32)
            return jnp.stack([s(oy, ry), s(ou, ru), s(ov, rv),
                              jnp.abs(dy).sum()])

        self._sse3 = _sse3

    def _cabac_payloads(self, mbd, qp: int, kind: str, rec=None):
        """CABAC slice payloads from the device record path.

        Binarization + compaction ran on device; the arithmetic coder is
        the Pallas lane-serial kernel (TPU) or the native C replay
        (host).  Falls back to the host numpy binarizer if a slice
        overflows the record cap (pathological content).  `rec`: the
        already-dispatched `self._crec[kind](mbd)` result (PP path)."""
        recs, counts, skipped = (rec if rec is not None
                                 else self._crec[kind](mbd))
        counts_np = np.asarray(counts)
        table = 0 if kind == "i" else 1
        if int(counts_np.max()) > self._cabac_cap:
            from tpu264.entropy.cabac_slice import encode_frame_cabac_fast
            mb = jax_to_np(mbd)
            if self.t8_mode and "t8" not in mb:
                mb["t8"] = np.zeros(self.cfg.width_mbs
                                    * self.cfg.height_mbs, bool)
            payloads, sk = encode_frame_cabac_fast(
                mb, self.cfg.width_mbs, self.cfg.height_mbs,
                self.sched.slice_starts.tolist(), qp,
                p_slice=(kind == "p"), b_slice=(kind == "b"))
            return payloads, sk
        init = self._cabac_init(table, qp)
        if self._cabac_engine is not None:
            words, nbytes = self._cabac_engine(recs, counts,
                                               jnp.asarray(init))
            words_np = np.asarray(words)
            nb = np.asarray(nbytes)
            payloads = [words_np[s].astype(">u4").tobytes()[:int(nb[s])]
                        for s in range(words_np.shape[0])]
        else:
            from tpu264.entropy import cabac_native
            from tpu264.entropy.cabac_binarize_j import unpack_records_np
            # pow2-bucketed transfer: exact data-dependent slices would
            # compile one XLA program per record count
            need = int(counts_np.max())
            bucket = 4096
            while bucket < need:
                bucket *= 2
            bucket = min(bucket, self._cabac_cap)
            recs_np = np.asarray(recs[:, :bucket])
            payloads = []
            for s, c in enumerate(counts_np):
                kk, aa, bb = unpack_records_np(recs_np[s, :c])
                payloads.append(cabac_native.encode_records(
                    kk, aa.astype(np.int32), bb.astype(np.int32),
                    table, qp))
        return payloads, np.asarray(skipped)

    def _apply_deblock_j(self, dev_out, mbd, qp: int, is_inter=None,
                         mv=None, b_motion=None, p_motion=None):
        """Device twin of `_apply_deblock`: bS inputs derived on device from
        the raster mb dict, filtered planes stay on device.

        `b_motion` = (mv0, use0, mv1, use1) raster arrays for B frames —
        two-list bS form (spec 8.7.2.1); `mv` is the single-list P form."""
        from tpu264.entropy.device_cavlc import (_compute_cbp_j,
                                                 luma_tc_grid_j)
        from tpu264.coding import mvpred
        cfg = self.cfg
        wm, hm = cfg.width_mbs, cfg.height_mbs
        n = wm * hm
        sel16 = mbd["sel16"].astype(bool)
        if is_inter is None:
            is_inter = jnp.zeros(n, dtype=bool)
        cbp_luma, _, _ = _compute_cbp_j(
            sel16, mbd["luma_ac"].astype(jnp.int32), mbd["chroma_dc"],
            mbd["chroma_ac"])
        tc = luma_tc_grid_j(mbd, cbp_luma, wm, hm)
        t8_grid = None
        if "t8" in mbd:
            # transform-8x8 MBs: the deblock coefficient condition uses
            # the covering 8x8 block's total count on every cell
            t8_grid = mbd["t8"].reshape(hm, wm)
            tc8 = tc.reshape(hm * 2, 2, wm * 2, 2).sum(axis=(1, 3))
            tc8 = jnp.repeat(jnp.repeat(tc8, 2, 0), 2, 1)
            t8r = jnp.repeat(jnp.repeat(t8_grid, 4, 0), 4, 1)
            tc = jnp.where(t8r, tc8, tc)
        intra_mb = (~is_inter).reshape(hm, wm)
        if b_motion is not None and len(b_motion) > 4:
            # partitioned B: per-4x4 two-list grids (part1 covers the
            # bottom rows of a 16x8 / right cols of an 8x16 MB)
            (mv0, use0, mv1, use1, bpt, mv0b, use0b, mv1b,
             use1b) = b_motion

            def up(a):
                return jnp.repeat(jnp.repeat(a, 4, 0), 4, 1)

            bt4 = up(bpt.astype(jnp.int32).reshape(hm, wm))
            rsel = (jnp.arange(hm * 4) % 4 >= 2)[:, None]
            csel = (jnp.arange(wm * 4) % 4 >= 2)[None, :]
            p1cell = jnp.where(bt4 == 1, rsel,
                               jnp.where(bt4 == 2, csel, False))

            def list_grids(mvp0, up0, mvp1, up1, pid):
                m0 = up(jnp.where((up0 & is_inter)[:, None], mvp0, 0)
                        .reshape(hm, wm, 2).astype(jnp.int32))
                m1 = up(jnp.where((up1 & is_inter)[:, None], mvp1, 0)
                        .reshape(hm, wm, 2).astype(jnp.int32))
                r0 = up(jnp.where(up0 & is_inter, pid, -1)
                        .reshape(hm, wm).astype(jnp.int32))
                r1 = up(jnp.where(up1 & is_inter, pid, -1)
                        .reshape(hm, wm).astype(jnp.int32))
                return (jnp.where(p1cell[..., None], m1, m0),
                        jnp.where(p1cell, r1, r0))

            mvl0, refl0 = list_grids(mv0, use0, mv0b, use0b, 0)
            mvl1, refl1 = list_grids(mv1, use1, mv1b, use1b, 1)
            mv_grid = jnp.stack([mvl0, mvl1], axis=2)
            ref_grid = jnp.stack([refl0, refl1], axis=2)
        elif b_motion is not None:
            mv0, use0, mv1, use1 = b_motion
            mv_grid = jnp.stack(
                [jnp.where(use0[:, None], mv0, 0),
                 jnp.where(use1[:, None], mv1, 0)],
                axis=1).reshape(hm, wm, 2, 2).astype(jnp.int32)
            ref_grid = jnp.stack(
                [jnp.where(use0, 0, -1), jnp.where(use1, 1, -1)],
                axis=1).reshape(hm, wm, 2).astype(jnp.int32)
        elif p_motion is not None:
            # 16x8/8x16/P_8x8 partitions: per-4x4 single-list grids
            ptype, mv0, mv2p = p_motion[:3]
            mvq = p_motion[3] if len(p_motion) > 3 else None
            m0 = jnp.where(is_inter[:, None], mv0, 0).reshape(hm, wm, 2)
            m2 = jnp.where(is_inter[:, None], mv2p, 0).reshape(hm, wm, 2)
            pt = ptype.reshape(hm, wm)
            rsel = (jnp.arange(hm * 4) % 4 >= 2)[:, None]
            csel = (jnp.arange(wm * 4) % 4 >= 2)[None, :]
            up = jnp.repeat
            pt4 = up(up(pt, 4, 0), 4, 1)
            use2 = jnp.where(pt4 == 1, rsel,
                             jnp.where(pt4 == 2, csel, False))
            mv_grid = jnp.where(use2[..., None],
                                up(up(m2, 4, 0), 4, 1),
                                up(up(m0, 4, 0), 4, 1))
            if mvq is not None:
                # P_8x8: quadrant index per 4x4 cell
                mq = jnp.where(is_inter[:, None, None], mvq, 0)\
                    .reshape(hm, wm, 4, 2)
                qsel = (rsel.astype(jnp.int32) * 2
                        + csel.astype(jnp.int32))       # [4hm, 4wm]
                mq4 = up(up(mq, 4, 0), 4, 1)            # [4hm, 4wm, 4, 2]
                mvq_grid = jnp.take_along_axis(
                    mq4, qsel[..., None, None], axis=2)[..., 0, :]
                mv_grid = jnp.where((pt4 == 3)[..., None], mvq_grid,
                                    mv_grid)
            ref_grid = jnp.where(
                up(up(is_inter.reshape(hm, wm), 4, 0), 4, 1), 0,
                mvpred.INTRA)
        else:
            if mv is None:
                mv = jnp.zeros((n, 2), dtype=jnp.int32)
            mv_grid = jnp.where(is_inter[:, None], mv, 0).reshape(hm, wm, 2)
            ref_grid = jnp.where(is_inter, 0, mvpred.INTRA).reshape(hm, wm)
        from tpu264.ref.transform import chroma_qp
        fy, fu, fv = self._deblock(
            dev_out["recon_y"], dev_out["recon_u"], dev_out["recon_v"],
            intra_mb, tc, mv_grid, ref_grid, np.int32(qp),
            np.int32(chroma_qp(qp)), t8_mb=t8_grid)
        return (fy.astype(jnp.uint8), fu.astype(jnp.uint8),
                fv.astype(jnp.uint8))

    def _apply_deblock(self, dev_out, mb, qp: int, is_inter=None, mv=None,
                       b_motion=None):
        """Filter the reconstructed picture for output/DPB (intra
        prediction already consumed the unfiltered samples)."""
        import jax.numpy as jnp
        from tpu264.coding import mvpred
        from tpu264.entropy import mb_syntax
        cfg = self.cfg
        n = cfg.width_mbs * cfg.height_mbs
        sel16 = mb["sel16"].astype(bool)
        if is_inter is None:
            is_inter = np.zeros(n, dtype=bool)
        cbp_luma, _, _ = mb_syntax.compute_cbp(
            sel16, mb["luma_ac"].astype(np.int64), mb["chroma_dc"],
            mb["chroma_ac"])
        tc = mb_syntax.luma_tc_grid(sel16, cbp_luma,
                                    mb["luma_ac"].astype(np.int64),
                                    cfg.width_mbs, cfg.height_mbs)
        intra_mb = (~is_inter).reshape(cfg.height_mbs, cfg.width_mbs)
        if b_motion is not None:
            mv0, use0, mv1, use1 = b_motion
            mv_grid = np.stack(
                [np.where(use0[:, None], mv0, 0),
                 np.where(use1[:, None], mv1, 0)],
                axis=1).reshape(cfg.height_mbs, cfg.width_mbs, 2, 2)
            ref_grid = np.stack(
                [np.where(use0, 0, -1), np.where(use1, 1, -1)],
                axis=1).reshape(cfg.height_mbs, cfg.width_mbs, 2)
        else:
            if mv is None:
                mv = np.zeros((n, 2), dtype=np.int64)
            mv_grid = np.where(is_inter[:, None], mv, 0).reshape(
                cfg.height_mbs, cfg.width_mbs, 2)
            ref_grid = np.where(is_inter, 0, mvpred.INTRA).reshape(
                cfg.height_mbs, cfg.width_mbs)
        from tpu264.ref.transform import chroma_qp
        fy, fu, fv = self._deblock(
            dev_out["recon_y"], dev_out["recon_u"], dev_out["recon_v"],
            jnp.asarray(intra_mb), jnp.asarray(tc), jnp.asarray(mv_grid),
            jnp.asarray(ref_grid), np.int32(qp), np.int32(chroma_qp(qp)))
        return (np.asarray(fy, dtype=np.uint8),
                np.asarray(fu, dtype=np.uint8),
                np.asarray(fv, dtype=np.uint8))

    def _get_intra_batch_fn(self, batch: int, qp: int):
        """One jitted program: vmap over `batch` independent IDR frames of
        (wavefront encode → reorder → CAVLC serialize+pack → deblock →
        SSE).  Batching amortizes the per-wave dispatch/overhead of the
        anti-diagonal scans across frames — the single-chip throughput
        lever for all-intra sequences (frames are independent)."""
        if not hasattr(self, "_batch_fns"):
            self._batch_fns = {}
        key = (batch, qp)
        if key not in self._batch_fns:
            cfg = self.cfg
            sched = self.sched

            def one(y, u, v):
                dev_out, ys = self._encode_frame(y, u, v, jnp.int32(qp))
                mbd = reorder_wave_outputs_j(sched, ys)
                words, nbits = self._ser_i(mbd)
                if cfg.deblock:
                    ry, ru, rv = self._apply_deblock_j(dev_out, mbd, qp)
                else:
                    ry = dev_out["recon_y"].astype(jnp.uint8)
                    ru = dev_out["recon_u"].astype(jnp.uint8)
                    rv = dev_out["recon_v"].astype(jnp.uint8)
                sse = self._sse3(y, u, v, ry, ru, rv)
                return words, nbits, ry, ru, rv, sse

            self._batch_fns[key] = jax.jit(jax.vmap(one))
        return self._batch_fns[key]

    def _encode_sequence_intra_batched(self, frames, batch: int) -> bytes:
        """All-IDR fixed-QP sequence through the batched device pipeline.
        Produces the identical bitstream to the per-frame path."""
        cfg = self.cfg
        qp = cfg.qp
        out = self._header_nalus()
        self.recons = []
        fn = self._get_intra_batch_fn(batch, qp)
        rows_per_slice = cfg.height_mbs // cfg.slices_per_frame
        it = iter(frames)
        c0 = 0
        while True:
            chunk = list(itertools.islice(it, batch))
            if not chunk:
                break
            t0 = time.monotonic()
            pad = batch - len(chunk)
            ys = np.stack([np.asarray(f[0]) for f in chunk]
                          + [np.asarray(chunk[-1][0])] * pad)
            us = np.stack([np.asarray(f[1]) for f in chunk]
                          + [np.asarray(chunk[-1][1])] * pad)
            vs = np.stack([np.asarray(f[2]) for f in chunk]
                          + [np.asarray(chunk[-1][2])] * pad)
            words, nbits, ry, ru, rv, sse = fn(ys, us, vs)
            nbits_np = np.asarray(nbits)   # syncs the device
            sse_np = np.asarray(sse)
            # bucketed fixed-shape transfer: data-dependent device
            # slices would compile a fresh XLA program per distinct
            # stream length; pow2 buckets keep it to a handful of
            # executables and ~stream-sized transfers
            words_np = _bucketed_words(words, nbits_np)
            per_frame_s = (time.monotonic() - t0) / len(chunk)
            for b in range(len(chunk)):
                i = c0 + b
                nalus = []
                for s in range(cfg.slices_per_frame):
                    hdr = SliceHeader(
                        first_mb_in_slice=(s * rows_per_slice
                                           * cfg.width_mbs),
                        slice_type=SLICE_I,
                        frame_num=0,
                        idr_pic_id=i % 2,
                        slice_qp=qp,
                        disable_deblocking_filter_idc=self.deblock_idc,
                        is_idr=True,
                    )
                    sink = hdr.write_rbsp_head(self.sps, self.pps)
                    nb = int(nbits_np[b, s])
                    wslice = words_np[b, s, : (nb + 31) // 32]
                    rbsp = self._dcav.words_to_rbsp(wslice, nb, sink)
                    nalus.append(nal.make_nalu(3, nal.NAL_IDR, rbsp))
                out.extend(nalus)
                self.recons.append((ry[b], ru[b], rv[b]))
                bits = sum(8 * len(x) for x in nalus)
                npx = (chunk[b][0].size, chunk[b][1].size, chunk[b][2].size)
                ps = tuple(
                    99.99 if sv == 0 else
                    10 * np.log10(255.0 ** 2 * n / float(sv))
                    for sv, n in zip(sse_np[b, :3], npx))
                self.stats.append(FrameStats(
                    i, "IDR", bits, ps[0], ps[1], ps[2], per_frame_s))
            c0 += len(chunk)
        return b"".join(out)

    def encode_sequence(self, frames) -> bytes:
        """frames: iterable of (y, u, v) uint8 planes. Returns Annex-B."""
        try:
            batch = max(1, int(os.environ.get("TPU264_BATCH", "4")))
        except ValueError:
            batch = 4
        if (self.gop_mode == "intra" and self.rc is None
                and not self.cabac and batch > 1):
            # batched path: consume the iterable in batch-sized chunks
            # (frames stay streamed; nothing is materialized up front)
            it = iter(frames)
            head = list(itertools.islice(it, 2))
            if len(head) > 1:
                return self._encode_sequence_intra_batched(
                    itertools.chain(head, it), batch)
            frames = head
        if self.gop_mode == "bgop":
            return self._encode_sequence_bgop(frames)
        out = self._header_nalus()
        self.recons = []
        frame_num = 0
        idr_count = 0
        # PP frame pipelining (SURVEY.md §2b): with no rate control the
        # entropy pull + NAL assembly of frame k runs while the device
        # computes frame k+1 (RC needs frame k's bits before choosing
        # frame k+1's QP, so it finishes eagerly)
        pipeline = self.rc is None
        pending = None     # (index, is_idr, finish, sse_handle, sizes, t0)

        def drain():
            nonlocal pending
            if pending is None:
                return
            i0, idr0, fin, sse, sizes, t0 = pending
            pending = None
            nalus = fin()
            out.extend(nalus)
            bits = sum(8 * len(b) for b in nalus)
            st = np.asarray(sse)
            ps = tuple(
                99.99 if s == 0 else
                10 * np.log10(255.0 ** 2 * npx / float(s))
                for s, npx in zip(st[:3], sizes))
            self.stats.append(FrameStats(
                i0, "IDR" if idr0 else "P", bits, ps[0], ps[1], ps[2],
                time.monotonic() - t0))

        for i, (y, u, v) in enumerate(frames):
            t0 = time.monotonic()
            period = self.cfg.intra_period
            is_idr = (self.gop_mode == "intra" or i == 0
                      or (period > 1 and i % period == 0))
            qp = None
            if self.rc is not None:
                qp = self.rc.frame_qp("I" if is_idr else "P")
            if is_idr:
                fin, recon = self.encode_intra_frame(
                    y, u, v, frame_num=0, idr_pic_id=idr_count % 2,
                    qp=qp, defer=True)
                idr_count += 1
                frame_num = 1
            else:
                fin, recon = self.encode_p_frame(
                    y, u, v, self.recons[-1], frame_num=frame_num,
                    qp=qp, defer=True)
                frame_num = (frame_num + 1) % (1 << self.sps.log2_max_frame_num)
            self.recons.append(recon)
            sse = self._sse3(self._dev_orig[0], self._dev_orig[1],
                             self._dev_orig[2], *recon)
            sizes = (y.size, u.size, v.size)
            if pipeline:
                # device now works on THIS frame; finish the previous
                drain()
                pending = (i, is_idr, fin, sse, sizes, t0)
                continue
            nalus = fin()
            out.extend(nalus)
            bits = sum(8 * len(b) for b in nalus)
            st = np.asarray(sse)
            ps = tuple(
                99.99 if s == 0 else
                10 * np.log10(255.0 ** 2 * npx / float(s))
                for s, npx in zip(st[:3], sizes))
            mad = float(st[3]) / y.size
            if self.rc is not None:
                self.rc.update("I" if is_idr else "P", bits, mad)
            self.stats.append(FrameStats(
                i, "IDR" if is_idr else "P", bits, ps[0], ps[1], ps[2],
                time.monotonic() - t0))
        drain()
        return b"".join(out)


    def _encode_sequence_bgop(self, frames) -> bytes:
        """B-GOP sequence (display-order POC type 0, closed GOPs).

        num_b_frames == 1: classic IbPbP.  num_b_frames >= 2: dyadic
        hierarchical pyramid — the midpoint of each anchor gap is coded
        as a *reference* B (layer 1), recursing into the halves until
        leaf non-reference Bs (JM `explicit_gop.c` hierarchical coding).
        P anchors carry a ref_pic_list_modification command so list0[0]
        stays the previous anchor (the default order would pick the most
        recently decoded mid-B).  B QPs follow the pyramid layer
        (QPBSlice + layer - 1); with rate control, anchors take the
        JVT-G012 QP and Bs offset from it."""
        cfg = self.cfg
        frames = list(frames)
        nfr = len(frames)
        plan = build_bgop_plan(nfr, cfg.num_b_frames, cfg.intra_period)
        hier = cfg.num_b_frames >= 2

        out = self._header_nalus()
        self.recons = [None] * nfr
        stats = [None] * nfr
        fn = 0
        idr_count = 0
        disp_base = 0
        fn_of = {}                     # display idx -> frame_num (refs)
        cz_of = {}                     # display idx -> colZeroFlag [n] map
        czm_of = {}                    # display idx -> col-mixed [n] map
        last_ref_fn = 0
        max_lsb = 1 << self.sps.log2_max_pic_order_cnt_lsb
        max_fn = 1 << self.sps.log2_max_frame_num
        anchor_qp = cfg.qp_inter
        for disp, kind, r0, r1, layer in plan:
            t0 = time.monotonic()
            y, u, v = frames[disp]
            if kind == "I":
                qp = self.rc.frame_qp("I") if self.rc else cfg.qp
                anchor_qp = qp
                disp_base = disp
                poc = 0
                nalus, recon = self.encode_intra_frame(
                    y, u, v, frame_num=0, idr_pic_id=idr_count % 2,
                    poc_lsb=0, qp=qp)
                idr_count += 1
                fn_of[disp] = 0
                last_ref_fn = 0
                fn = 1
            elif kind == "P":
                qp = (self.rc.frame_qp("P", num_b=cfg.num_b_frames)
                      if self.rc else cfg.qp_inter)
                anchor_qp = qp
                poc = (2 * (disp - disp_base)) % max_lsb
                reorder = ()
                if hier and fn_of.get(r0) is not None \
                        and last_ref_fn != fn_of[r0]:
                    # point list0[0] back at the previous anchor
                    diff = (fn - fn_of[r0]) % max_fn
                    reorder = ((0, diff - 1),)
                nalus, recon = self.encode_p_frame(
                    y, u, v, self.recons[r0], frame_num=fn, poc_lsb=poc,
                    reorder_l0=reorder, qp=qp)
                fn_of[disp] = fn
                last_ref_fn = fn
                fn = (fn + 1) % max_fn
            else:
                # pyramid QP ladder: QPBSlice at layer 1, +1 per layer
                # below; with RC the ladder rides the anchor QP
                base_b = (min(anchor_qp + 2, 51) if self.rc
                          else cfg.qp_bslice)
                qp = min(base_b + layer - 1, 51)
                poc = (2 * (disp - disp_base)) % max_lsb
                is_ref = kind == "Bref"
                nalus, recon = self.encode_b_frame(
                    y, u, v, self.recons[r0], self.recons[r1],
                    frame_num=fn, poc_lsb=poc, is_ref=is_ref,
                    colzero=cz_of.get(r1), colmixed=czm_of.get(r1),
                    qp=qp)
                if is_ref:
                    fn_of[disp] = fn
                    last_ref_fn = fn
                    fn = (fn + 1) % max_fn
            cz_of[disp] = self._last_colzero
            czm_of[disp] = self._last_colmixed
            out.extend(nalus)
            self.recons[disp] = recon
            bits = sum(8 * len(b) for b in nalus)
            st = np.asarray(self._sse3(self._dev_orig[0], self._dev_orig[1],
                                       self._dev_orig[2], *recon))
            ps = tuple(
                99.99 if s == 0 else
                10 * np.log10(255.0 ** 2 * npx / float(s))
                for s, npx in zip(st[:3], (y.size, u.size, v.size)))
            if self.rc is not None:
                self.rc.update("I" if kind == "I" else
                               ("P" if kind == "P" else "B"),
                               bits, float(st[3]) / y.size)
            stats[disp] = FrameStats(
                disp, "IDR" if kind == "I" else kind, bits,
                ps[0], ps[1], ps[2], time.monotonic() - t0)
        self.stats.extend(s for s in stats if s is not None)
        return b"".join(out)


    def _header_nalus(self) -> list:
        """SPS + PPS (+ optional SEI: encoder tag and recovery point,
        Annex D / JM `sei.c`) that open every stream."""
        out = [nal.make_nalu(3, nal.NAL_SPS, self.sps.write_rbsp()),
               nal.make_nalu(3, nal.NAL_PPS, self.pps.write_rbsp())]
        if self.cfg.sei_messages:
            from tpu264.bits import sei
            rbsp = sei.make_sei_rbsp(
                sei.write_user_data(
                    f"tpu264 - {self.gop_mode} "
                    f"{self.cfg.symbol_mode.upper()}"),
                sei.write_recovery_point(0))
            out.append(nal.make_nalu(0, nal.NAL_SEI, rbsp))
        return out

    def encode_b_frame(self, y, u, v, ref0, ref1, frame_num: int,
                       poc_lsb: int, qp: int | None = None,
                       is_ref: bool = False, colzero=None,
                       colmixed=None):
        """Encode one B frame against (past, future) recon refs with
        in-loop deblocking per the config (two-list bS, spec 8.7.2.1).

        `colzero`: [n_mbs] bool — per-MB colZeroFlag input derived from
        the list1 reference's stored motion (spatial direct, spec
        8.4.1.2.2); None disables the zeroing (treated all-False).
        `colmixed`: [n_mbs] bool — colocated MBs whose 4x4 cells
        disagree on colZeroFlag (partitioned anchors); direct/skip is
        never chosen there so the per-MB derivation stays exact."""
        cfg = self.cfg
        n_mbs = cfg.width_mbs * cfg.height_mbs
        if qp is None:
            qp = cfg.qp_inter
        if colzero is None:
            colzero = jnp.zeros(n_mbs, dtype=bool)
        if colmixed is None:
            colmixed = jnp.zeros(n_mbs, dtype=bool)
        yd, ud, vd = jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)
        self._dev_orig = (yd, ud, vd)
        args = (yd, ud, vd, ref0[0], ref0[1], ref0[2],
                ref1[0], ref1[1], ref1[2], jnp.asarray(colzero),
                jnp.asarray(colmixed), np.int32(qp))
        if self.b_partitions:
            # partitions only on non-reference Bs (per-MB colZeroFlag
            # plumbing needs MB-constant colocated motion)
            args += (jnp.asarray(not is_ref),)
        dev_out, ys = self._encode_b(*args)
        rows_per_slice = cfg.height_mbs // cfg.slices_per_frame

        def hdr_sink(s):
            hdr = SliceHeader(
                first_mb_in_slice=s * rows_per_slice * cfg.width_mbs,
                slice_type=SLICE_B,
                frame_num=frame_num,
                slice_qp=qp,
                pic_order_cnt_lsb=poc_lsb,
                disable_deblocking_filter_idc=self.deblock_idc,
                is_idr=False,
                nal_ref_idc=2 if is_ref else 0,
            )
            return hdr.write_rbsp_head(self.sps, self.pps)

        def b_motion_of(mb):
            btype = mb["btype"]
            is_inter = btype != 4
            use0 = mb["use0"].astype(bool)
            use1 = mb["use1"].astype(bool)
            if "bptype" in mb:
                cu0 = jnp.asarray(np.array([1, 0, 1], np.bool_))
                cu1 = jnp.asarray(np.array([0, 1, 1], np.bool_))
                partd = btype == 5
                c1 = mb["c1"].astype(jnp.int32)
                use0b = jnp.where(partd, cu0[c1], use0)
                use1b = jnp.where(partd, cu1[c1], use1)
                return (is_inter,
                        (mb["mv0"], use0, mb["mv1"], use1,
                         mb["bptype"], mb["mv0b"], use0b,
                         mb["mv1b"], use1b))
            return (is_inter,
                    (mb["mv0"], use0, mb["mv1"], use1))

        def note_colzero(mb, xp):
            # this frame's colZeroFlag contribution when it later serves
            # as a colocated (list1[0]) reference: inter MBs with the
            # used-list mv within +-1 quarter-pel (spec 8.4.1.2.2)
            use0 = mb["use0"].astype(bool)
            use1 = mb["use1"].astype(bool)
            mv = xp.where(use0[:, None], mb["mv0"], mb["mv1"])
            self._last_colzero = ((use0 | use1)
                                  & (xp.abs(mv) <= 1).all(axis=1))
            # reference Bs are 16x16/direct/intra only (allow_parts
            # off) -> never cell-mixed as a colocated picture
            self._last_colmixed = xp.zeros(mv.shape[0], dtype=bool)

        if self.cabac:
            mbd = reorder_wave_outputs_j(self.sched, ys)
            if self.t8_mode and "t8" not in mbd:
                mbd = dict(mbd, t8=jnp.zeros(n_mbs, bool))
            payloads, _ = self._cabac_payloads(mbd, qp, "b")
            note_colzero(mbd, jnp)
            nalus = []
            for s in range(cfg.slices_per_frame):
                sink = hdr_sink(s)
                sink.cabac_align()
                nalus.append(nal.make_nalu(
                    2 if is_ref else 0, nal.NAL_SLICE,
                    sink.to_bytes() + payloads[s]))
            if cfg.deblock:
                is_inter, bmo = b_motion_of(mbd)
                recon = self._apply_deblock_j(dev_out, mbd, qp,
                                              is_inter=is_inter,
                                              b_motion=bmo)
            else:
                recon = (dev_out["recon_y"].astype(jnp.uint8),
                         dev_out["recon_u"].astype(jnp.uint8),
                         dev_out["recon_v"].astype(jnp.uint8))
            return nalus, recon
        mbd = reorder_wave_outputs_j(self.sched, ys)
        if self.t8_mode and "t8" not in mbd:
            mbd = dict(mbd, t8=jnp.zeros(n_mbs, bool))
        words, nbits, skipped_d = self._ser_b(mbd)
        note_colzero(mbd, jnp)
        nbits_np = np.asarray(nbits)
        words_np = _bucketed_words(words, nbits_np)
        skipped = np.asarray(skipped_d)
        nalus = []
        for s in range(cfg.slices_per_frame):
            first_mb = s * rows_per_slice * cfg.width_mbs
            last_mb = first_mb + rows_per_slice * cfg.width_mbs
            tail = slice_writer.trailing_skip_run(skipped, first_mb, last_mb)
            nb = int(nbits_np[s])
            wslice = words_np[s, : (nb + 31) // 32]
            rbsp = self._dcav.words_to_rbsp(wslice, nb, hdr_sink(s),
                                            final_skip_run=tail)
            nalus.append(nal.make_nalu(2 if is_ref else 0,
                                       nal.NAL_SLICE, rbsp))
        if cfg.deblock:
            is_inter, bmo = b_motion_of(mbd)
            recon = self._apply_deblock_j(dev_out, mbd, qp,
                                          is_inter=is_inter, b_motion=bmo)
        else:
            recon = (dev_out["recon_y"].astype(jnp.uint8),
                     dev_out["recon_u"].astype(jnp.uint8),
                     dev_out["recon_v"].astype(jnp.uint8))
        return nalus, recon

    def encode_intra_frame(self, y, u, v, frame_num: int = 0,
                           idr_pic_id: int = 0, qp: int | None = None,
                           poc_lsb: int = 0, defer: bool = False):
        """Encode one IDR frame → ([nalu bytes...], (recY, recU, recV));
        `defer` returns (finish, recon) for PP frame pipelining."""
        cfg = self.cfg
        if qp is None:
            qp = cfg.qp
        yd, ud, vd = jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)
        self._dev_orig = (yd, ud, vd)
        dev_out, ys = self._encode_frame(yd, ud, vd, np.int32(qp))
        # all-intra picture: colZeroFlag never set over it (refIdxCol -1)
        self._last_colzero = np.zeros(cfg.width_mbs * cfg.height_mbs,
                                      dtype=bool)
        self._last_colmixed = self._last_colzero
        slice_rows = self.sched.slice_starts.tolist()

        def hdr_sink(s):
            hdr = SliceHeader(
                first_mb_in_slice=s * (cfg.height_mbs
                                       // cfg.slices_per_frame)
                * cfg.width_mbs,
                slice_type=SLICE_I,
                frame_num=frame_num,
                idr_pic_id=idr_pic_id,
                slice_qp=qp,
                pic_order_cnt_lsb=poc_lsb,
                disable_deblocking_filter_idc=self.deblock_idc,
                is_idr=True,
            )
            return hdr.write_rbsp_head(self.sps, self.pps)

        mbd = reorder_wave_outputs_j(self.sched, ys)
        if self.cabac:
            recs = self._crec["i"](mbd)
        else:
            words, nbits = self._ser_i(mbd)
        if cfg.deblock:
            recon = self._apply_deblock_j(dev_out, mbd, qp)
        else:
            recon = (dev_out["recon_y"].astype(jnp.uint8),
                     dev_out["recon_u"].astype(jnp.uint8),
                     dev_out["recon_v"].astype(jnp.uint8))

        def finish():
            nalus = []
            if self.cabac:
                payloads, _ = self._cabac_payloads(mbd, qp, "i", rec=recs)
                for s in range(cfg.slices_per_frame):
                    sink = hdr_sink(s)
                    sink.cabac_align()
                    nalus.append(nal.make_nalu(
                        3, nal.NAL_IDR, sink.to_bytes() + payloads[s]))
                return nalus
            nbits_np = np.asarray(nbits)
            words_np = _bucketed_words(words, nbits_np)
            for s in range(cfg.slices_per_frame):
                nb = int(nbits_np[s])
                wslice = words_np[s, : (nb + 31) // 32]
                rbsp = self._dcav.words_to_rbsp(wslice, nb, hdr_sink(s))
                nalus.append(nal.make_nalu(3, nal.NAL_IDR, rbsp))
            return nalus
        if defer:
            return finish, recon
        return finish(), recon

    def _estimate_wp(self, y, ref_y):
        """Per-frame explicit-WP luma weights: least-squares gain/offset
        of the current frame against the reference recon (JM
        `weighted_prediction.c` ComputeExplicitWPParams analog), denom
        6.  Near-identity estimates collapse to (64, 0) so headers stay
        cheap on non-fade content."""
        a = np.asarray(y).astype(np.float64)
        rf = np.asarray(ref_y).astype(np.float64)
        var = rf.var()
        gain = 1.0 if var < 1e-3 else float(
            ((a - a.mean()) * (rf - rf.mean())).mean() / var)
        w = int(np.clip(round(gain * 64), 1, 127))
        o = int(np.clip(round(a.mean() - w * rf.mean() / 64.0), -128, 127))
        if abs(w - 64) < 2 and abs(o) < 2:
            return 64, 0
        return w, o

    def encode_p_frame(self, y, u, v, ref, frame_num: int,
                       qp: int | None = None, poc_lsb: int = 0,
                       reorder_l0: tuple = (), mmco: tuple = (),
                       defer: bool = False):
        """Encode one P frame against `ref` = (y, u, v) recon planes.

        `defer`: return (finish, recon) instead of (nalus, recon) —
        recon is dispatched on device immediately (the next frame's
        encode can start), while `finish()` does the host entropy pull
        + NAL assembly later (PP frame pipelining, SURVEY.md §2b)."""
        cfg = self.cfg
        if qp is None:
            qp = cfg.qp_inter
        yd, ud, vd = jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)
        self._dev_orig = (yd, ud, vd)
        pred_weights = None
        if self.wp_mode:
            wy_i, oy_i = self._estimate_wp(yd, ref[0])
            pred_weights = (6, 6, [(wy_i, oy_i, 64, 0, 64, 0)], [])
            dev_out, ys = self._encode_p(yd, ud, vd, ref[0], ref[1],
                                         ref[2], np.int32(qp),
                                         np.int32(wy_i), np.int32(oy_i))
        else:
            dev_out, ys = self._encode_p(yd, ud, vd, ref[0], ref[1],
                                         ref[2], np.int32(qp))
        slice_rows = self.sched.slice_starts.tolist()
        rows_per_slice = cfg.height_mbs // cfg.slices_per_frame

        def hdr_sink(s):
            hdr = SliceHeader(
                first_mb_in_slice=s * rows_per_slice * cfg.width_mbs,
                slice_type=SLICE_P,
                frame_num=frame_num,
                slice_qp=qp,
                pic_order_cnt_lsb=poc_lsb,
                disable_deblocking_filter_idc=self.deblock_idc,
                is_idr=False,
                nal_ref_idc=2,
                reorder_l0=reorder_l0,
                mmco=mmco,
                pred_weights=pred_weights,
            )
            return hdr.write_rbsp_head(self.sps, self.pps)

        if self.cabac:
            mbd = reorder_wave_outputs_j(self.sched, ys)
            recs = self._crec["p"](mbd)       # async device dispatch
            self._last_colzero, self._last_colmixed = colstate_of(mbd)
            if cfg.deblock:
                pm = None
                if "ptype" in mbd:
                    pm = (mbd["ptype"].astype(jnp.int32),
                          mbd["mv"].astype(jnp.int32),
                          mbd["mv2"].astype(jnp.int32))
                    if "mvq" in mbd:
                        pm = pm + (mbd["mvq"].astype(jnp.int32),)
                recon = self._apply_deblock_j(
                    dev_out, mbd, qp,
                    is_inter=mbd["is_inter"].astype(bool),
                    mv=mbd["mv"].astype(jnp.int32), p_motion=pm)
            else:
                recon = (dev_out["recon_y"].astype(jnp.uint8),
                         dev_out["recon_u"].astype(jnp.uint8),
                         dev_out["recon_v"].astype(jnp.uint8))

            def finish():
                payloads, _ = self._cabac_payloads(mbd, qp, "p",
                                                   rec=recs)
                nalus = []
                for s in range(cfg.slices_per_frame):
                    sink = hdr_sink(s)
                    sink.cabac_align()
                    nalus.append(nal.make_nalu(
                        2, nal.NAL_SLICE, sink.to_bytes() + payloads[s]))
                return nalus
            if defer:
                return finish, recon
            return finish(), recon

        mbd = reorder_wave_outputs_j(self.sched, ys)
        words, nbits, skipped_d = self._ser_p(mbd)
        self._last_colzero, self._last_colmixed = colstate_of(mbd)
        if cfg.deblock:
            pm = None
            if "ptype" in mbd:
                pm = (mbd["ptype"].astype(jnp.int32),
                      mbd["mv"].astype(jnp.int32),
                      mbd["mv2"].astype(jnp.int32))
                if "mvq" in mbd:
                    pm = pm + (mbd["mvq"].astype(jnp.int32),)
            recon_d = self._apply_deblock_j(
                dev_out, mbd, qp,
                is_inter=mbd["is_inter"].astype(bool),
                mv=mbd["mv"].astype(jnp.int32), p_motion=pm)
        else:
            recon_d = (dev_out["recon_y"].astype(jnp.uint8),
                       dev_out["recon_u"].astype(jnp.uint8),
                       dev_out["recon_v"].astype(jnp.uint8))

        def finish():
            nalus = []
            nbits_np = np.asarray(nbits)
            words_np = _bucketed_words(words, nbits_np)
            skipped = np.asarray(skipped_d)
            for s in range(cfg.slices_per_frame):
                first_mb = s * rows_per_slice * cfg.width_mbs
                last_mb = first_mb + rows_per_slice * cfg.width_mbs
                tail = slice_writer.trailing_skip_run(skipped, first_mb,
                                                      last_mb)
                nb = int(nbits_np[s])
                wslice = words_np[s, : (nb + 31) // 32]
                rbsp = self._dcav.words_to_rbsp(wslice, nb, hdr_sink(s),
                                                final_skip_run=tail)
                nalus.append(nal.make_nalu(2, nal.NAL_SLICE, rbsp))
            return nalus
        if defer:
            return finish, recon_d
        return finish(), recon_d


def _bucketed_words(words, nbits_np) -> np.ndarray:
    """Device->host transfer of packed slice words, truncated to the
    next power-of-two word count that covers every slice (last axis).
    Data-dependent exact slices would compile one XLA slice program per
    distinct stream length; pow2 buckets cap that at ~log2(cap)."""
    need = (int(nbits_np.max()) + 31) // 32
    cap = words.shape[-1]
    bucket = 64
    while bucket < need:
        bucket *= 2
    bucket = min(bucket, cap)
    return np.asarray(words[..., :bucket])


def jax_to_np(tree):
    return {k: np.asarray(val) for k, val in tree.items()}
