"""Wavefront P-frame encoder (JAX): IPPP with full-search 16x16 ME + qpel.

TPU-first restructuring of JM's P-slice `encode_one_macroblock`
(SURVEY.md §3.1): motion estimation is hoisted OUT of the serial MB loop —
every MB full-searches and sub-pel-refines in parallel against the
reference frame (kernels/me.py, MXU-shaped SSD sweep) — and only the
decision pass (mv prediction, skip inference, inter-vs-intra choice,
reconstruction) runs in the anti-diagonal wavefront scan, batched per
wave.  Candidates per MB: P_Skip (skip-mv MC), P_L0_16x16 (ME mv),
Intra_16x16 and Intra_4x4 (shared `intra_frame.eval_*` machinery).

Reference-frame half-pel planes are precomputed per frame (JM `img_luma.c`
strategy — three separable 6-tap convolutions, bulk TPU work).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpu264.kernels import interp as kint
from tpu264.kernels import me as kme
from tpu264.kernels import transform as kt
from tpu264.kernels import transform8 as kt8
from tpu264.ref.transform import chroma_qp
from . import mvpred
from .intra_frame import (CQP_J, ZZ_COLS, ZZ_ROWS,
                          assemble_plane, eval_chroma, eval_i16, eval_i4x4,
                          chroma_residual_recon, gather_border_ctx,
                          init_border_buffers, lambda_mode, lambda_terms_j,
                          tile_origin_xs, update_border_ctx)
from .wavefront import WaveSchedule

PAD = 24  # ref padding: search range + subpel taps margin


def mvd_bits(mvd):
    """ue(se(v)) bit length per component, summed over (y, x)."""
    k = jnp.where(mvd > 0, 2 * mvd - 1, -2 * mvd)
    return (2 * jnp.floor(jnp.log2(k.astype(jnp.float32) + 1.0))
            .astype(jnp.int32) + 1).sum(axis=-1)


# channel indices of the per-MB neighbor cell maps: the three 4x4 cells
# of an MB that later MVP derivations can read (spec 8.4.1.3 neighbors
# always hit one of these): top-right cell (A of the right MB), bottom-
# left (B/C of MBs below), bottom-right (D below; also A rows 2-3)
CH_TR, CH_BL, CH_BR = 0, 1, 2


def make_inter_encoder(sched: WaveSchedule,
                       chroma_qp_offset: int = 0, search_range: int = 16,
                       ref_prepadded: bool = False,
                       partitions: bool = False, t8: bool = False,
                       weighted: bool = False, p8x8: bool = False):
    """Build a jitted P-frame encoder: fn(y,u,v, ref_y,ref_u,ref_v, qp).

    qp is a traced scalar (rate control varies it per frame).
    `ref_prepadded`: ref planes arrive already PAD-extended (the tiled
    path supplies real ppermute'd halo rows from neighbor tiles instead
    of edge replication — SURVEY.md §2c ref-pixel collectives).
    `partitions`: adds 16x8 / 8x16 candidates (per-half ME sweeps +
    partition mode decision; ys gains ptype / mv2).
    `p8x8`: adds the P_8x8 sub-MB candidate (sub_mb_type = P_L0_8x8:
    one MV per 8x8 quadrant, per-quadrant ME sweeps; ys gains
    mvq [B, 4, 2] and ptype value 3).  Requires `partitions`.
    `t8`: High-profile transform_size_8x8_flag selection for 16x16
    inter MBs — both transforms are evaluated batched and the per-MB
    winner picked by SSD + lambda * coefficient-bits (ys gains t8;
    luma_ac carries the CAVLC-interleaved pseudo-4x4 blocks,
    spec 7.4.5.3.3, for transform-8x8 MBs).
    `weighted`: explicit luma weighted prediction (spec 8.4.2.3.2,
    denom 6) — encode() gains traced (wy, oy); every luma MC
    prediction is weighted AFTER interpolation (exactly what the
    decoder computes), and motion search runs against a pre-weighted
    reference so fades do not defeat the SAD sweep.  Chroma keeps
    default weights."""
    if p8x8 and not partitions:
        raise ValueError("p8x8 requires partitions")
    wm, hm = sched.width_mbs, sched.height_mbs
    h, w = hm * 16, wm * 16
    cqp_off = chroma_qp_offset
    # clamp search so windows stay inside the padded plane
    rng = min(search_range, PAD - 8)

    xs = dict(
        coords=jnp.asarray(sched.coords),
        valid=jnp.asarray(sched.valid),
        avail=jnp.asarray(sched.avail),
    )

    def wave_body(planes, cu_pad, cv_pad, qp, cqp, lam4, lam24, lam_me,
                  wy, oy, carry, x):
        bd, mv_map, ref_map = carry

        def wl(pred):
            """Explicit luma weighting of an interpolated prediction
            (spec 8.4.2.3.2, denom 6); identity when disabled."""
            if not weighted:
                return pred
            return jnp.clip(((pred * wy + 32) >> 6) + oy, 0, 255)
        coords = x["coords"]
        r, c = coords[:, 0], coords[:, 1]
        at, al, atl, atr = (x["avail"][:, i] for i in range(4))
        mv_me = x["mv_me"]                        # [B,2] qpel
        b = r.shape[0]
        gy, gu, gv = x["gy"], x["gu"], x["gv"]
        (ltop, lleft, tctx_u, lctx_u, tctx_v, lctx_v,
         modes_top, modes_left) = gather_border_ctx(bd, r, c)

        # ---- neighbor MVs from the maps (padded: +1 row/col, +1 right;
        # channel picks which 4x4 cell of the neighbor MB) ----
        def gmv(ch, rr, cc):
            return jax.lax.dynamic_slice(
                mv_map, (ch, rr, cc, 0), (1, 1, 1, 2))[0, 0, 0]

        def gref(ch, rr, cc):
            return jax.lax.dynamic_slice(
                ref_map, (ch, rr, cc), (1, 1, 1))[0, 0, 0]

        def nbr(ch, dr, dc):
            rr = r + dr
            cc = c + dc
            return (jax.vmap(lambda a, b2: gmv(ch, a, b2))(rr, cc),
                    jax.vmap(lambda a, b2: gref(ch, a, b2))(rr, cc))

        mv_a, ref_a = nbr(CH_TR, 1, 0)            # left MB, rows 0-1
        mv_b, ref_b = nbr(CH_BL, 0, 1)            # top MB, bottom-left
        mv_c, ref_c = nbr(CH_BL, 0, 2)            # top-right MB
        mv_d, ref_d = nbr(CH_BR, 0, 0)            # top-left MB
        # slice-boundary masking (maps may hold other slices' data)
        ref_a = jnp.where(al, ref_a, mvpred.UNAVAIL)
        ref_b = jnp.where(at, ref_b, mvpred.UNAVAIL)
        ref_c = jnp.where(atr, ref_c, mvpred.UNAVAIL)
        ref_d = jnp.where(atl, ref_d, mvpred.UNAVAIL)
        mv_a = jnp.where((ref_a >= 0)[:, None], mv_a, 0)
        mv_b = jnp.where((ref_b >= 0)[:, None], mv_b, 0)
        mv_c = jnp.where((ref_c >= 0)[:, None], mv_c, 0)
        mv_d = jnp.where((ref_d >= 0)[:, None], mv_d, 0)
        # C → D substitution when top-right unavailable
        use_d = ref_c == mvpred.UNAVAIL
        mv_c = jnp.where(use_d[:, None], mv_d, mv_c)
        ref_c = jnp.where(use_d, ref_d, ref_c)

        mv_pred = mvpred.predict_mv_jnp(mv_a, ref_a, mv_b, ref_b, mv_c, ref_c)
        mv_skip = mvpred.skip_mv_jnp(mv_pred, mv_a, ref_a, mv_b, ref_b)

        # ---- inter candidates: MC + SATD + rate ----
        y0 = r * 16 + PAD
        x0 = c * 16 + PAD

        def inter_cost(mv):
            pred = wl(kint.mc_luma(planes, y0, x0, mv))
            diff = gy - pred
            blk = diff.reshape(b, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4)
            satd = kt.satd4x4(blk).sum(axis=(1, 2))
            return pred, satd + lam_me * mvd_bits(mv - mv_pred)

        pred_me, j_me = inter_cost(mv_me)
        pred_skip, j_skip_raw = inter_cost(mv_skip)
        # bias skip slightly (its true rate is ~0 when residual is empty)
        j_skip = j_skip_raw - lam4
        use_skip_mv = j_skip < j_me
        mv_sel = jnp.where(use_skip_mv[:, None], mv_skip, mv_me)
        pred_inter = jnp.where(use_skip_mv[:, None, None], pred_skip, pred_me)
        j_inter = jnp.minimum(j_skip, j_me)

        ptype = jnp.zeros(b, jnp.int32)
        mv2_sel = mv_sel
        if partitions:
            # ---- 16x8 / 8x16 candidates (per-half refined MVs) ----
            mvT, mvB = x["mv_top"], x["mv_bot"]
            mvL, mvR = x["mv_left"], x["mv_right"]
            p16x8 = wl(jnp.concatenate(
                [kint.mc_luma(planes, y0, x0, mvT, bh=8, bw=16),
                 kint.mc_luma(planes, y0 + 8, x0, mvB, bh=8, bw=16)],
                axis=1))
            p8x16 = wl(jnp.concatenate(
                [kint.mc_luma(planes, y0, x0, mvL, bh=16, bw=8),
                 kint.mc_luma(planes, y0, x0 + 8, mvR, bh=16, bw=8)],
                axis=2))

            def satd_full(pred):
                diff = gy - pred
                blk = diff.reshape(b, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4)
                return kt.satd4x4(blk).sum(axis=(1, 2))

            # rate estimate: part0 vs the MB predictor, part1 vs part0
            # (the exact per-partition predictors are recomputed by the
            # serializer/decoder from the final maps) + ue(mb_type)
            j_16x8 = satd_full(p16x8) + lam_me * (
                mvd_bits(mvT - mv_pred) + mvd_bits(mvB - mvT) + 3)
            j_8x16 = satd_full(p8x16) + lam_me * (
                mvd_bits(mvL - mv_pred) + mvd_bits(mvR - mvL) + 3)
            use_16x8 = (j_16x8 < j_inter) & (j_16x8 <= j_8x16)
            use_8x16 = (j_8x16 < j_inter) & (j_8x16 < j_16x8)
            ptype = jnp.where(use_16x8, 1, jnp.where(use_8x16, 2, 0))
            pred_inter = jnp.where(
                use_16x8[:, None, None], p16x8,
                jnp.where(use_8x16[:, None, None], p8x16, pred_inter))
            j_inter = jnp.minimum(j_inter,
                                  jnp.minimum(j_16x8, j_8x16))
            mv_sel = jnp.where(use_16x8[:, None], mvT,
                               jnp.where(use_8x16[:, None], mvL, mv_sel))
            mv2_sel = jnp.where(use_16x8[:, None], mvB,
                                jnp.where(use_8x16[:, None], mvR,
                                          mv2_sel))

        mvq_sel = None
        if p8x8:
            # ---- P_8x8 candidate: one MV per 8x8 quadrant ----
            mvQ = [x[f"mv_q{i}"] for i in range(4)]
            p8 = jnp.concatenate([
                jnp.concatenate(
                    [wl(kint.mc_luma(planes, y0, x0, mvQ[0], bh=8, bw=8)),
                     wl(kint.mc_luma(planes, y0, x0 + 8, mvQ[1],
                                     bh=8, bw=8))], axis=2),
                jnp.concatenate(
                    [wl(kint.mc_luma(planes, y0 + 8, x0, mvQ[2],
                                     bh=8, bw=8)),
                     wl(kint.mc_luma(planes, y0 + 8, x0 + 8, mvQ[3],
                                     bh=8, bw=8))], axis=2)], axis=1)
            diff8 = gy - p8
            blk8s = diff8.reshape(b, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4)
            satd8s = kt.satd4x4(blk8s).sum(axis=(1, 2))
            # rate estimate: q0 vs the MB predictor, later quadrants vs
            # their raster-order sibling (the exact spec-8.4.1.3
            # predictors are recomputed by the serializer/decoder);
            # + ue(mb_type=3) + 4x ue(sub_mb_type=0) = 9 header bits
            j_p8 = satd8s + lam_me * (
                mvd_bits(mvQ[0] - mv_pred) + mvd_bits(mvQ[1] - mvQ[0])
                + mvd_bits(mvQ[2] - mvQ[0]) + mvd_bits(mvQ[3] - mvQ[1])
                + 9)
            use_p8 = j_p8 < j_inter
            ptype = jnp.where(use_p8, 3, ptype)
            pred_inter = jnp.where(use_p8[:, None, None], p8, pred_inter)
            j_inter = jnp.minimum(j_inter, j_p8)
            mv_sel = jnp.where(use_p8[:, None], mvQ[0], mv_sel)
            mv2_sel = jnp.where(use_p8[:, None], mvQ[1], mv2_sel)
            mvq_sel = jnp.stack(mvQ, axis=1)          # [B, 4, 2]

        # ---- intra candidates (shared machinery) ----
        mb4, modebuf, modes_zz, coeffs4, j4 = eval_i4x4(
            gy, ltop, lleft, modes_top, modes_left, at, al, atl, atr,
            qp, lam4, lam24)
        m16, j16, rec16, dc_lev, ac_lev = eval_i16(
            gy, ltop, lleft, at, al, atl, qp)
        j_intra = jnp.minimum(j16, j4 )
        sel16 = j16 < j4

        # inter-vs-intra: intra pays the larger mb_type cost in P slices
        is_inter = j_inter < j_intra + lam24
        is_i16 = (~is_inter) & sel16

        # ---- luma residual for the inter path ----
        resid = gy - pred_inter
        blk = resid.reshape(b, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4)
        lev_inter = kt.fdct_quant4x4(blk, qp, intra=False)
        rec_inter = kt.clip1(
            pred_inter
            + kt.block_recon(lev_inter, qp)
            .transpose(0, 1, 3, 2, 4).reshape(b, 16, 16))
        inter_zz = kt.zigzag_scan(lev_inter[:, ZZ_ROWS, ZZ_COLS])  # [B,16,16]

        t8_sel = jnp.zeros(b, dtype=bool)
        if t8:
            # ---- 8x8-transform candidate (High profile, 16x16 MBs) ----
            blk8 = resid.reshape(b, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4)
            lev8 = kt8.quant8x8(kt8.fdct8x8(blk8), qp, intra=False)
            rec8 = kt.clip1(
                pred_inter
                + kt8.idct8x8(kt8.dequant8x8(lev8, qp))
                .transpose(0, 1, 3, 2, 4).reshape(b, 16, 16))

            def rbits(lev):
                a = jnp.abs(lev).astype(jnp.float32)
                bits = jnp.where(
                    a > 0, 2.0 * jnp.ceil(jnp.log2(a + 1.0)) + 1.0, 0.0)
                return bits.reshape(b, -1).sum(axis=1)

            # SSD-domain lambda (0.85 * 2^((qp-12)/3), the JM J=D+lam*R
            # convention) over the exact reconstructions
            lam_ssd = 0.85 * jnp.exp2((qp.astype(jnp.float32) - 12.0) / 3)
            ssd4 = ((gy - rec_inter) ** 2).reshape(b, -1)\
                .sum(axis=1).astype(jnp.float32)
            ssd8 = ((gy - rec8) ** 2).reshape(b, -1)\
                .sum(axis=1).astype(jnp.float32)
            j8_better = (ssd8 + lam_ssd * rbits(lev8)
                         < ssd4 + lam_ssd * rbits(lev_inter))
            t8_sel = (is_inter & (ptype == 0) & j8_better
                      & (lev8 != 0).any(axis=(1, 2, 3, 4)))
            # CAVLC interleave: coefficient 4k+i of the 8x8 scan becomes
            # coefficient k of pseudo-4x4 block i (spec 7.4.5.3.3); the
            # pseudo blocks land at BLK_ORDER rows 4n..4n+3 of luma_ac,
            # so cbp / nC chaining / token serialization are unchanged.
            scan64 = kt8.zigzag_scan8(lev8).reshape(b, 4, 64)
            pseudo = scan64.reshape(b, 4, 16, 4).transpose(0, 1, 3, 2)
            inter_zz = jnp.where(t8_sel[:, None, None],
                                 pseudo.reshape(b, 16, 16), inter_zz)
            rec_inter = jnp.where(t8_sel[:, None, None], rec8, rec_inter)

        # ---- select luma outputs ----
        recon_mb = jnp.where(is_inter[:, None, None], rec_inter,
                             jnp.where(sel16[:, None, None], rec16, mb4))
        ac16_zz = kt.zigzag_scan(ac_lev[:, ZZ_ROWS, ZZ_COLS])
        luma_ac = jnp.where(is_inter[:, None, None], inter_zz,
                            jnp.where(sel16[:, None, None], ac16_zz, coeffs4))
        luma_dc = jnp.where(is_i16[:, None], kt.zigzag_scan(dc_lev), 0)

        # ---- chroma: intra modes or MC prediction ----
        cmode, intra_outs = eval_chroma(
            gu, gv, tctx_u, lctx_u, tctx_v, lctx_v, at, al, atl, cqp)
        cy0 = r * 8 + PAD // 2
        cx0 = c * 8 + PAD // 2
        cpred_u = kint.mc_chroma(cu_pad, cy0, cx0, mv_sel)
        cpred_v = kint.mc_chroma(cv_pad, cy0, cx0, mv_sel)
        if partitions:
            def cparts(cpad):
                c16x8 = jnp.concatenate(
                    [kint.mc_chroma(cpad, cy0, cx0, mvT, bh=4, bw=8),
                     kint.mc_chroma(cpad, cy0 + 4, cx0, mvB, bh=4, bw=8)],
                    axis=1)
                c8x16 = jnp.concatenate(
                    [kint.mc_chroma(cpad, cy0, cx0, mvL, bh=8, bw=4),
                     kint.mc_chroma(cpad, cy0, cx0 + 4, mvR, bh=8, bw=4)],
                    axis=2)
                return c16x8, c8x16

            for_u = cparts(cu_pad)
            for_v = cparts(cv_pad)
            cpred_u = jnp.where(
                use_16x8[:, None, None], for_u[0],
                jnp.where(use_8x16[:, None, None], for_u[1], cpred_u))
            cpred_v = jnp.where(
                use_16x8[:, None, None], for_v[0],
                jnp.where(use_8x16[:, None, None], for_v[1], cpred_v))
        if p8x8:
            # per-quadrant 4x4 chroma MC overrides the two-partition
            # chain (ptype == 3 is decided after 16x8/8x16)
            def cquad(cpad):
                return jnp.concatenate([
                    jnp.concatenate(
                        [kint.mc_chroma(cpad, cy0, cx0, mvQ[0],
                                        bh=4, bw=4),
                         kint.mc_chroma(cpad, cy0, cx0 + 4, mvQ[1],
                                        bh=4, bw=4)], axis=2),
                    jnp.concatenate(
                        [kint.mc_chroma(cpad, cy0 + 4, cx0, mvQ[2],
                                        bh=4, bw=4),
                         kint.mc_chroma(cpad, cy0 + 4, cx0 + 4, mvQ[3],
                                        bh=4, bw=4)], axis=2)], axis=1)

            on8 = (ptype == 3)[:, None, None]
            cpred_u = jnp.where(on8, cquad(cu_pad), cpred_u)
            cpred_v = jnp.where(on8, cquad(cv_pad), cpred_v)
        inter_u = chroma_residual_recon(gu, cpred_u, cqp, intra=False)
        inter_v = chroma_residual_recon(gv, cpred_v, cqp, intra=False)
        chroma = []
        for (i_rec, i_dc, i_ac), (p_rec, p_dc, p_ac) in (
                (intra_outs[0], inter_u), (intra_outs[1], inter_v)):
            rec = jnp.where(is_inter[:, None, None], p_rec, i_rec)
            dc = jnp.where(is_inter[:, None], p_dc, i_dc)
            ac = jnp.where(is_inter[:, None, None], p_ac, i_ac)
            chroma.append((rec, dc, ac))

        # ---- write back border state ----
        mode_tiles = jnp.where((is_inter | sel16)[:, None, None], -1, modebuf)
        bd = update_border_ctx(bd, r, c, recon_mb, chroma[0][0],
                               chroma[1][0], mode_tiles)
        # channel cell values (which partition covers each boundary cell):
        #   tr (rows 0-1, right col): 16x8 -> part0, 8x16 -> part1
        #   bl (bottom row, col 0-1): 16x8 -> part1, 8x16 -> part0
        #   br (bottom row, right col): part1 for both shapes
        mv_tr = jnp.where((ptype == 2)[:, None], mv2_sel, mv_sel)
        mv_bl = jnp.where((ptype == 1)[:, None], mv2_sel, mv_sel)
        mv_br = jnp.where((ptype > 0)[:, None], mv2_sel, mv_sel)
        if p8x8:
            # P_8x8 quadrant cells: tr <- q1, bl <- q2, br <- q3
            on8v = (ptype == 3)[:, None]
            mv_tr = jnp.where(on8v, mvq_sel[:, 1], mv_tr)
            mv_bl = jnp.where(on8v, mvq_sel[:, 2], mv_bl)
            mv_br = jnp.where(on8v, mvq_sel[:, 3], mv_br)
        ref_cell = jnp.where(is_inter, 0, mvpred.INTRA)
        for ch, mvv in ((CH_TR, mv_tr), (CH_BL, mv_bl), (CH_BR, mv_br)):
            mv_map = mv_map.at[ch, r + 1, c + 1].set(
                jnp.where(is_inter[:, None], mvv, 0), mode="drop")
            ref_map = ref_map.at[ch, r + 1, c + 1].set(ref_cell,
                                                       mode="drop")

        ys = dict(is_inter=is_inter, mv=mv_sel, mv_pred=mv_pred,
                  mv_skip=mv_skip,
                  sel16=is_i16, i16mode=m16, modes=modes_zz, cmode=cmode,
                  luma_ac=luma_ac, luma_dc=luma_dc,
                  chroma_dc=jnp.stack([chroma[0][1], chroma[1][1]], axis=1),
                  chroma_ac=jnp.stack([chroma[0][2], chroma[1][2]], axis=1),
                  recon_mb=recon_mb, rec_u=chroma[0][0], rec_v=chroma[1][0])
        if partitions:
            ys["ptype"] = jnp.where(is_inter, ptype, 0)
            ys["mv2"] = mv2_sel
        if p8x8:
            ys["mvq"] = mvq_sel
        if t8:
            ys["t8"] = t8_sel
        return (bd, mv_map, ref_map), ys

    @jax.jit
    def encode(y, u, v, ref_y, ref_u, ref_v, qp, wy=None, oy=None):
        y = y.astype(jnp.int32)
        u = u.astype(jnp.int32)
        v = v.astype(jnp.int32)
        qp = jnp.asarray(qp, jnp.int32)
        cqp = CQP_J[jnp.clip(qp + cqp_off, 0, 51)]
        lam4, lam24, lam_me = lambda_terms_j(qp)
        if weighted:
            wy = jnp.asarray(wy, jnp.int32)
            oy = jnp.asarray(oy, jnp.int32)
        if ref_prepadded:
            ref_pad = ref_y.astype(jnp.int32)
            cu_pad = ref_u.astype(jnp.int32)
            cv_pad = ref_v.astype(jnp.int32)
        else:
            ref_pad = kint.pad_plane(ref_y.astype(jnp.int32), PAD)
            cu_pad = kint.pad_plane(ref_u.astype(jnp.int32), PAD // 2)
            cv_pad = kint.pad_plane(ref_v.astype(jnp.int32), PAD // 2)
        planes = kint.luma_planes(ref_pad)

        # ---- phase 1: parallel full-search + subpel for every MB ----
        if weighted:
            # search against the pre-weighted reference (decision only;
            # exact predictions are weighted post-interpolation)
            me_ref = jnp.clip(((ref_pad * wy + 32) >> 6) + oy, 0, 255)
            me_planes = kint.luma_planes(me_ref)
        else:
            me_ref, me_planes = ref_pad, planes
        mv_int, _ = kme.full_search_16x16(y, me_ref, PAD, rng, lam_me, wm, hm)
        mv_q = kme.subpel_refine(y, me_planes, PAD, mv_int, lam_me, wm, hm)
        # rearrange per wave: [n_waves, Bmax, 2]
        idx = jnp.asarray(np.minimum(sched.mb_index, sched.n_mbs - 1))
        mv_wave = mv_q[idx]

        bd = init_border_buffers(hm, wm)
        mv_map = jnp.zeros((3, 1 + hm, 1 + wm + 1, 2), jnp.int32)
        ref_map = jnp.full((3, 1 + hm, 1 + wm + 1), mvpred.UNAVAIL,
                           jnp.int32)
        gy_all, gu_all, gv_all = tile_origin_xs(sched, y, u, v)
        xs_full = dict(xs, mv_me=mv_wave, gy=gy_all, gu=gu_all, gv=gv_all)
        if partitions:
            halves = kme.full_search_parts(y, me_ref, PAD, rng, lam_me,
                                           wm, hm)
            geo = dict(top=(0, 0, 8, 16), bot=(8, 0, 8, 16),
                       left=(0, 0, 16, 8), right=(0, 8, 16, 8))
            for key, (py_, px_, bh, bw) in geo.items():
                mvq = kme.subpel_refine(y, me_planes, PAD, halves[key],
                                        lam_me, wm, hm, oy=py_, ox=px_,
                                        bh=bh, bw=bw)
                xs_full[f"mv_{key}"] = mvq[idx]
        if p8x8:
            quads = kme.full_search_quads(y, me_ref, PAD, rng, lam_me,
                                          wm, hm)
            for q in range(4):
                mvqq = kme.subpel_refine(
                    y, me_planes, PAD, quads[f"q{q}"], lam_me, wm, hm,
                    oy=(q // 2) * 8, ox=(q % 2) * 8, bh=8, bw=8)
                xs_full[f"mv_q{q}"] = mvqq[idx]
        carry, ys = jax.lax.scan(
            lambda cr, xx: wave_body(planes, cu_pad, cv_pad, qp, cqp,
                                     lam4, lam24, lam_me, wy, oy, cr, xx),
            (bd, mv_map, ref_map), xs_full)
        out = dict(
            recon_y=assemble_plane(sched, ys.pop("recon_mb"), 16),
            recon_u=assemble_plane(sched, ys.pop("rec_u"), 8),
            recon_v=assemble_plane(sched, ys.pop("rec_v"), 8),
        )
        return out, ys

    return encode
