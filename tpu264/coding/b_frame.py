"""Wavefront B-frame encoder (JAX): bi-predictive 16x16, 16x8/8x16
partitions, spatial direct/skip, and intra modes.

JM's B-slice `encode_one_macroblock` restructured like the P engine
(`inter_frame.py`): both reference frames are full-searched and
sub-pel-refined for every MB in parallel (phase 1), then the wavefront
decision pass picks per MB among B_L0_16x16 / B_L1_16x16 / B_Bi_16x16
(average bi-prediction, weighted_bipred_idc 0), B_Direct_16x16
(spatial direct, spec 8.4.1.2.2 — the in-scan median predictors double
as the direct MVs, with colZeroFlag zeroing supplied per MB from the
list1 reference's stored motion), the two-partition 16x8 / 8x16 shapes
with a per-partition L0/L1/Bi choice (Table 7-14 mb_type 4..21), and
the intra modes.  Per-list MV prediction is carried through the scan on
3-channel boundary-cell maps exactly as the P engine does (spec 8.4.1.3
neighbors always hit a tr/bl/br cell of a neighbor MB).

btype codes in the output dict: 0 = L0, 1 = L1, 2 = Bi, 3 = Direct,
4 = intra, 5 = two-partition (see bptype/c0/c1); `use0`/`use1` are the
final per-list use flags of the MB (part0's for btype 5) and mv0/mv1
the final per-list MVs (part0's for btype 5; mv0b/mv1b carry part1).
Direct MBs whose cbp is 0 are emitted as B_Skip by the serializers.

Partitioned MBs are restricted to NON-REFERENCE B frames (the traced
`allow_parts` input): our colZeroFlag plumbing for spatial direct is
per-MB, which is exact only while colocated references stay
MB-constant in motion.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpu264.kernels import interp as kint
from tpu264.kernels import me as kme
from tpu264.kernels import transform as kt
from . import mvpred
from .intra_frame import (CQP_J, ZZ_COLS, ZZ_ROWS, assemble_plane,
                          eval_chroma, eval_i16, eval_i4x4,
                          chroma_residual_recon, gather_border_ctx,
                          init_border_buffers, lambda_terms_j,
                          tile_origin_xs, update_border_ctx)
from .inter_frame import CH_BL, CH_BR, CH_TR, PAD, mvd_bits
from .wavefront import WaveSchedule

# ue(mb_type) bit lengths for B_L0/B_L1/B_Bi (Table 7-14 mb_type 1, 2, 3
# → ue codewords '010', '011', '00100': 3, 3, 5 bits)
TYPE_BITS = (3, 3, 5)


def _ue_len(v: int) -> int:
    return 2 * int(np.floor(np.log2(v + 1))) + 1


# (c0, c1) with c in {0=L0, 1=L1, 2=Bi} → Table 7-14 combo index
# ((mb_type - 4) // 2); flat index = c0 * 3 + c1
COMBO_IDX = np.array([0, 2, 4, 3, 1, 5, 6, 7, 8], dtype=np.int32)


def part_mb_type(c0, c1, shape8x16):
    """Spec Table 7-14 mb_type for a two-partition B MB."""
    return 4 + 2 * COMBO_IDX[c0 * 3 + c1] + shape8x16


# ue(mb_type) lengths per (c0, c1) and shape (0 = 16x8, 1 = 8x16)
TB_PART = np.array(
    [[_ue_len(int(part_mb_type(c0, c1, s))) for c0 in range(3)
      for c1 in range(3)] for s in range(2)], dtype=np.int32)


def make_b_encoder(sched: WaveSchedule, chroma_qp_offset: int = 0,
                   search_range: int = 16, ref_prepadded: bool = False,
                   partitions: bool = False):
    """fn(y,u,v, r0y,r0u,r0v, r1y,r1u,r1v, colzero, colmixed, qp
    [, allow_parts]) -> (dev_out, ys).

    `colmixed` [n]: colocated MBs whose 4x4 cells disagree on
    colZeroFlag (partitioned anchors) — the direct candidate is
    disabled there (per-MB derivation would diverge from the decoder's
    per-4x4 one).

    `ref_prepadded`: both refs arrive already PAD-extended (tiled path:
    real ppermute'd halo rows instead of edge replication).
    `partitions`: adds the 16x8 / 8x16 two-partition candidates; the
    traced `allow_parts` bool gates them per frame (off for reference
    Bs — see module docstring)."""
    wm, hm = sched.width_mbs, sched.height_mbs
    cqp_off = chroma_qp_offset
    rng = min(search_range, PAD - 8)

    xs = dict(
        coords=jnp.asarray(sched.coords),
        valid=jnp.asarray(sched.valid),
        avail=jnp.asarray(sched.avail),
    )
    tb_part = jnp.asarray(TB_PART)
    combo_use0 = jnp.asarray(np.array([1, 0, 1], np.bool_))   # c → uses l0
    combo_use1 = jnp.asarray(np.array([0, 1, 1], np.bool_))

    def neighbor_mvs(mv_map, ref_map, r, c, al, at, atl, atr):
        """Median MV predictor for ref 0 plus the spatial-direct
        MinPositive flag (any A/B/C neighbor using this list), from the
        3-channel boundary-cell maps (A = left MB tr cell, B = top MB
        bl cell, C = top-right MB bl cell, D = top-left MB br cell)."""
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

        mv_a, ref_a = nbr(CH_TR, 1, 0)
        mv_b, ref_b = nbr(CH_BL, 0, 1)
        mv_c, ref_c = nbr(CH_BL, 0, 2)
        mv_d, ref_d = nbr(CH_BR, 0, 0)
        ref_a = jnp.where(al, ref_a, mvpred.UNAVAIL)
        ref_b = jnp.where(at, ref_b, mvpred.UNAVAIL)
        ref_c = jnp.where(atr, ref_c, mvpred.UNAVAIL)
        ref_d = jnp.where(atl, ref_d, mvpred.UNAVAIL)
        mv_a = jnp.where((ref_a >= 0)[:, None], mv_a, 0)
        mv_b = jnp.where((ref_b >= 0)[:, None], mv_b, 0)
        mv_c = jnp.where((ref_c >= 0)[:, None], mv_c, 0)
        mv_d = jnp.where((ref_d >= 0)[:, None], mv_d, 0)
        use_d = ref_c == mvpred.UNAVAIL
        mv_c = jnp.where(use_d[:, None], mv_d, mv_c)
        ref_c = jnp.where(use_d, ref_d, ref_c)
        pred = mvpred.predict_mv_jnp(mv_a, ref_a, mv_b, ref_b, mv_c, ref_c)
        any_used = (ref_a == 0) | (ref_b == 0) | (ref_c == 0)
        return pred, any_used

    def wave_body(planes0, planes1, c0u, c0v, c1u, c1v, qp, cqp,
                  lam4, lam24, lam_me, allow_parts, carry, x):
        bd, mv0_map, ref0_map, mv1_map, ref1_map = carry
        coords = x["coords"]
        r, c = coords[:, 0], coords[:, 1]
        at, al, atl, atr = (x["avail"][:, i] for i in range(4))
        b = r.shape[0]
        gy, gu, gv = x["gy"], x["gu"], x["gv"]
        (ltop, lleft, tctx_u, lctx_u, tctx_v, lctx_v,
         modes_top, modes_left) = gather_border_ctx(bd, r, c)

        mv_pred0, nb_use0 = neighbor_mvs(mv0_map, ref0_map, r, c,
                                         al, at, atl, atr)
        mv_pred1, nb_use1 = neighbor_mvs(mv1_map, ref1_map, r, c,
                                         al, at, atl, atr)
        mv_me0 = x["mv_me0"]
        mv_me1 = x["mv_me1"]

        y0 = r * 16 + PAD
        x0 = c * 16 + PAD
        pred0 = kint.mc_luma(planes0, y0, x0, mv_me0)
        pred1 = kint.mc_luma(planes1, y0, x0, mv_me1)
        pred_bi = (pred0 + pred1 + 1) >> 1

        # ---- spatial direct candidate (spec 8.4.1.2.2) ----
        colzero = x["colzero"]
        colmixed = x["colmixed"]
        zero_pred = ~nb_use0 & ~nb_use1
        duse0 = zero_pred | nb_use0
        duse1 = zero_pred | nb_use1
        dmv0 = jnp.where((zero_pred | colzero)[:, None], 0, mv_pred0)
        dmv1 = jnp.where((zero_pred | colzero)[:, None], 0, mv_pred1)
        pred_d0 = kint.mc_luma(planes0, y0, x0, dmv0)
        pred_d1 = kint.mc_luma(planes1, y0, x0, dmv1)
        pred_dir = jnp.where(
            (duse0 & duse1)[:, None, None], (pred_d0 + pred_d1 + 1) >> 1,
            jnp.where(duse0[:, None, None], pred_d0, pred_d1))

        def satd_of(pred):
            diff = gy - pred
            blk = diff.reshape(b, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4)
            return kt.satd4x4(blk).sum(axis=(1, 2))

        rb0 = mvd_bits(mv_me0 - mv_pred0)
        rb1 = mvd_bits(mv_me1 - mv_pred1)
        j0 = satd_of(pred0) + lam_me * (rb0 + TYPE_BITS[0])
        j1 = satd_of(pred1) + lam_me * (rb1 + TYPE_BITS[1])
        jbi = satd_of(pred_bi) + lam_me * (rb0 + rb1 + TYPE_BITS[2])
        jd = satd_of(pred_dir) + lam_me * 1          # ue(0): 1 bit, no mvd
        # colocated cells disagree on colZeroFlag (partitioned anchor):
        # the decoder derives direct per 4x4 — never choose direct there
        jd = jnp.where(colmixed, jnp.asarray(2 ** 30, jd.dtype), jd)

        # ---- intra candidates ----
        mb4, modebuf, modes_zz, coeffs4, j4 = eval_i4x4(
            gy, ltop, lleft, modes_top, modes_left, at, al, atl, atr,
            qp, lam4, lam24)
        m16, j16, rec16, dc_lev, ac_lev = eval_i16(
            gy, ltop, lleft, at, al, atl, qp)
        j_intra = jnp.minimum(j16, j4)
        sel16 = j16 < j4

        js = jnp.stack([j0, j1, jbi, jd, j_intra + lam24], axis=1)
        btype = jnp.argmin(js, axis=1).astype(jnp.int32)
        j_16 = jnp.min(js, axis=1)
        mv0_fin = jnp.where((btype == 3)[:, None], dmv0, mv_me0)
        mv1_fin = jnp.where((btype == 3)[:, None], dmv1, mv_me1)

        pred_16fam = jnp.where(
            (btype == 0)[:, None, None], pred0,
            jnp.where((btype == 1)[:, None, None], pred1,
                      jnp.where((btype == 2)[:, None, None], pred_bi,
                                pred_dir)))

        bptype = jnp.zeros(b, jnp.int32)
        c0 = jnp.zeros(b, jnp.int32)
        c1 = jnp.zeros(b, jnp.int32)
        mv0b = mv0_fin
        mv1b = mv1_fin
        pred_inter = pred_16fam
        if partitions:
            # ---- 16x8 / 8x16 two-partition candidates ----
            geo = dict(top=(0, 0, 8, 16), bot=(8, 0, 8, 16),
                       left=(0, 0, 16, 8), right=(0, 8, 16, 8))

            def satd_half(diff, bh, bw):
                blk = diff.reshape(b, bh // 4, 4, bw // 4, 4)\
                    .transpose(0, 1, 3, 2, 4)
                return kt.satd4x4(blk).sum(axis=(1, 2))

            half = {}
            for key, (py_, px_, bh, bw) in geo.items():
                mvh0 = x[f"mv_me0_{key}"]
                mvh1 = x[f"mv_me1_{key}"]
                p0h = kint.mc_luma(planes0, y0 + py_, x0 + px_, mvh0,
                                   bh=bh, bw=bw)
                p1h = kint.mc_luma(planes1, y0 + py_, x0 + px_, mvh1,
                                   bh=bh, bw=bw)
                pbih = (p0h + p1h + 1) >> 1
                gh = gy[:, py_:py_ + bh, px_:px_ + bw]
                r0h = mvd_bits(mvh0 - mv_pred0)
                r1h = mvd_bits(mvh1 - mv_pred1)
                jh = jnp.stack(
                    [satd_half(gh - p0h, bh, bw) + lam_me * r0h,
                     satd_half(gh - p1h, bh, bw) + lam_me * r1h,
                     satd_half(gh - pbih, bh, bw) + lam_me * (r0h + r1h)],
                    axis=1)
                half[key] = dict(mv0=mvh0, mv1=mvh1, j=jh,
                                 c=jnp.argmin(jh, axis=1)
                                 .astype(jnp.int32),
                                 jmin=jnp.min(jh, axis=1),
                                 preds=(p0h, p1h, pbih))

            def shape_cost(k0, k1, shape):
                tb = tb_part[shape, half[k0]["c"] * 3 + half[k1]["c"]]
                return half[k0]["jmin"] + half[k1]["jmin"] + lam_me * tb

            j_p1 = shape_cost("top", "bot", 0)
            j_p2 = shape_cost("left", "right", 1)
            big = jnp.asarray(2 ** 30, j_p1.dtype)
            j_p1 = jnp.where(allow_parts, j_p1, big)
            j_p2 = jnp.where(allow_parts, j_p2, big)
            use_p1 = (j_p1 < j_16) & (j_p1 <= j_p2)
            use_p2 = (j_p2 < j_16) & (j_p2 < j_p1)
            partd = use_p1 | use_p2
            bptype = jnp.where(use_p1, 1, jnp.where(use_p2, 2, 0))
            btype = jnp.where(partd, 5, btype)
            c0 = jnp.where(use_p1, half["top"]["c"],
                           jnp.where(use_p2, half["left"]["c"], 0))
            c1 = jnp.where(use_p1, half["bot"]["c"],
                           jnp.where(use_p2, half["right"]["c"], 0))
            mv0_fin = jnp.where(
                use_p1[:, None], half["top"]["mv0"],
                jnp.where(use_p2[:, None], half["left"]["mv0"], mv0_fin))
            mv1_fin = jnp.where(
                use_p1[:, None], half["top"]["mv1"],
                jnp.where(use_p2[:, None], half["left"]["mv1"], mv1_fin))
            mv0b = jnp.where(
                use_p1[:, None], half["bot"]["mv0"],
                jnp.where(use_p2[:, None], half["right"]["mv0"], mv0b))
            mv1b = jnp.where(
                use_p1[:, None], half["bot"]["mv1"],
                jnp.where(use_p2[:, None], half["right"]["mv1"], mv1b))

            def part_pred(k, cc):
                p0h, p1h, pbih = half[k]["preds"]
                return jnp.where((cc == 0)[:, None, None], p0h,
                                 jnp.where((cc == 1)[:, None, None],
                                           p1h, pbih))

            p16x8 = jnp.concatenate(
                [part_pred("top", c0), part_pred("bot", c1)], axis=1)
            p8x16 = jnp.concatenate(
                [part_pred("left", c0), part_pred("right", c1)], axis=2)
            pred_inter = jnp.where(
                use_p1[:, None, None], p16x8,
                jnp.where(use_p2[:, None, None], p8x16, pred_16fam))

        is_inter = btype != 4
        is_direct = btype == 3
        partd_f = btype == 5
        # final per-list use flags; for btype 5 these are PART0's
        use0 = jnp.where(partd_f, combo_use0[c0],
                         (btype == 0) | (btype == 2)
                         | (is_direct & duse0))
        use1 = jnp.where(partd_f, combo_use1[c0],
                         (btype == 1) | (btype == 2)
                         | (is_direct & duse1))
        use0b = jnp.where(partd_f, combo_use0[c1], use0)
        use1b = jnp.where(partd_f, combo_use1[c1], use1)
        is_i16 = (~is_inter) & sel16

        resid = gy - pred_inter
        blk = resid.reshape(b, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4)
        lev_inter = kt.fdct_quant4x4(blk, qp, intra=False)
        rec_inter = kt.clip1(
            pred_inter
            + kt.block_recon(lev_inter, qp)
            .transpose(0, 1, 3, 2, 4).reshape(b, 16, 16))
        inter_zz = kt.zigzag_scan(lev_inter[:, ZZ_ROWS, ZZ_COLS])

        recon_mb = jnp.where(is_inter[:, None, None], rec_inter,
                             jnp.where(sel16[:, None, None], rec16, mb4))
        ac16_zz = kt.zigzag_scan(ac_lev[:, ZZ_ROWS, ZZ_COLS])
        luma_ac = jnp.where(is_inter[:, None, None], inter_zz,
                            jnp.where(sel16[:, None, None], ac16_zz,
                                      coeffs4))
        luma_dc = jnp.where(is_i16[:, None], kt.zigzag_scan(dc_lev), 0)

        # ---- chroma ----
        cmode, intra_outs = eval_chroma(
            gu, gv, tctx_u, lctx_u, tctx_v, lctx_v, at, al, atl, cqp)
        cy0 = r * 8 + PAD // 2
        cx0 = c * 8 + PAD // 2
        cpred = []
        for cpad0, cpad1 in ((c0u, c1u), (c0v, c1v)):
            p0 = kint.mc_chroma(cpad0, cy0, cx0, mv_me0)
            p1 = kint.mc_chroma(cpad1, cy0, cx0, mv_me1)
            d0 = kint.mc_chroma(cpad0, cy0, cx0, dmv0)
            d1 = kint.mc_chroma(cpad1, cy0, cx0, dmv1)
            pdir = jnp.where((duse0 & duse1)[:, None, None],
                             (d0 + d1 + 1) >> 1,
                             jnp.where(duse0[:, None, None], d0, d1))
            cp = jnp.where(
                (btype == 0)[:, None, None], p0,
                jnp.where((btype == 1)[:, None, None], p1,
                          jnp.where((btype == 2)[:, None, None],
                                    (p0 + p1 + 1) >> 1, pdir)))
            if partitions:
                cgeo = dict(top=(0, 0, 4, 8), bot=(4, 0, 4, 8),
                            left=(0, 0, 8, 4), right=(0, 4, 8, 4))

                def cpart(k, cc):
                    py_, px_, bh, bw = cgeo[k]
                    q0 = kint.mc_chroma(cpad0, cy0 + py_, cx0 + px_,
                                        x[f"mv_me0_{k}"], bh=bh, bw=bw)
                    q1 = kint.mc_chroma(cpad1, cy0 + py_, cx0 + px_,
                                        x[f"mv_me1_{k}"], bh=bh, bw=bw)
                    return jnp.where((cc == 0)[:, None, None], q0,
                                     jnp.where((cc == 1)[:, None, None],
                                               q1, (q0 + q1 + 1) >> 1))

                c16x8 = jnp.concatenate(
                    [cpart("top", c0), cpart("bot", c1)], axis=1)
                c8x16 = jnp.concatenate(
                    [cpart("left", c0), cpart("right", c1)], axis=2)
                cp = jnp.where(
                    (bptype == 1)[:, None, None], c16x8,
                    jnp.where((bptype == 2)[:, None, None], c8x16, cp))
            cpred.append(cp)
        inter_u = chroma_residual_recon(gu, cpred[0], cqp, intra=False)
        inter_v = chroma_residual_recon(gv, cpred[1], cqp, intra=False)
        chroma = []
        for (i_rec, i_dc, i_ac), (p_rec, p_dc, p_ac) in (
                (intra_outs[0], inter_u), (intra_outs[1], inter_v)):
            rec = jnp.where(is_inter[:, None, None], p_rec, i_rec)
            dc = jnp.where(is_inter[:, None], p_dc, i_dc)
            ac = jnp.where(is_inter[:, None, None], p_ac, i_ac)
            chroma.append((rec, dc, ac))

        # ---- state write-back (3-channel cells per list) ----
        mode_tiles = jnp.where((is_inter | sel16)[:, None, None], -1,
                               modebuf)
        bd = update_border_ctx(bd, r, c, recon_mb, chroma[0][0],
                               chroma[1][0], mode_tiles)

        for lx, (mv_p0, mv_p1, u_p0, u_p1, mvm, refm) in enumerate((
                (mv0_fin, mv0b, use0, use0b, mv0_map, ref0_map),
                (mv1_fin, mv1b, use1, use1b, mv1_map, ref1_map))):
            # cell channel → covering partition: tr = part1 iff 8x16,
            # bl = part1 iff 16x8, br = part1 iff partitioned
            for ch, sel1 in ((CH_TR, bptype == 2), (CH_BL, bptype == 1),
                             (CH_BR, bptype > 0)):
                mvv = jnp.where(sel1[:, None], mv_p1, mv_p0)
                uu = jnp.where(sel1, u_p1, u_p0) & is_inter
                mvm = mvm.at[ch, r + 1, c + 1].set(
                    jnp.where(uu[:, None], mvv, 0), mode="drop")
                refm = refm.at[ch, r + 1, c + 1].set(
                    jnp.where(uu, 0, mvpred.INTRA), mode="drop")
            if lx == 0:
                mv0_map, ref0_map = mvm, refm
            else:
                mv1_map, ref1_map = mvm, refm

        ys = dict(btype=btype, mv0=mv0_fin, mv1=mv1_fin,
                  use0=use0, use1=use1,
                  sel16=is_i16, i16mode=m16, modes=modes_zz, cmode=cmode,
                  luma_ac=luma_ac, luma_dc=luma_dc,
                  chroma_dc=jnp.stack([chroma[0][1], chroma[1][1]], axis=1),
                  chroma_ac=jnp.stack([chroma[0][2], chroma[1][2]], axis=1),
                  recon_mb=recon_mb, rec_u=chroma[0][0], rec_v=chroma[1][0])
        if partitions:
            ys["bptype"] = bptype
            ys["c0"] = c0
            ys["c1"] = c1
            ys["mv0b"] = mv0b
            ys["mv1b"] = mv1b
        return (bd, mv0_map, ref0_map, mv1_map, ref1_map), ys

    @jax.jit
    def encode(y, u, v, r0y, r0u, r0v, r1y, r1u, r1v, colzero, colmixed,
               qp, allow_parts=np.True_):
        y = y.astype(jnp.int32)
        u = u.astype(jnp.int32)
        v = v.astype(jnp.int32)
        qp = jnp.asarray(qp, jnp.int32)
        allow_parts = jnp.asarray(allow_parts, bool)
        cqp = CQP_J[jnp.clip(qp + cqp_off, 0, 51)]
        lam4, lam24, lam_me = lambda_terms_j(qp)
        if ref_prepadded:
            r0y_pad = r0y.astype(jnp.int32)
            r1y_pad = r1y.astype(jnp.int32)
            c0u = r0u.astype(jnp.int32)
            c0v = r0v.astype(jnp.int32)
            c1u = r1u.astype(jnp.int32)
            c1v = r1v.astype(jnp.int32)
        else:
            r0y_pad = kint.pad_plane(r0y.astype(jnp.int32), PAD)
            r1y_pad = kint.pad_plane(r1y.astype(jnp.int32), PAD)
            c0u = kint.pad_plane(r0u.astype(jnp.int32), PAD // 2)
            c0v = kint.pad_plane(r0v.astype(jnp.int32), PAD // 2)
            c1u = kint.pad_plane(r1u.astype(jnp.int32), PAD // 2)
            c1v = kint.pad_plane(r1v.astype(jnp.int32), PAD // 2)
        planes0 = kint.luma_planes(r0y_pad)
        planes1 = kint.luma_planes(r1y_pad)

        idx = jnp.asarray(np.minimum(sched.mb_index, sched.n_mbs - 1))
        mvs = []
        halves = []
        for ry_pad, planes in ((r0y_pad, planes0), (r1y_pad, planes1)):
            mv_int, _ = kme.full_search_16x16(
                y, ry_pad, PAD, rng, lam_me, wm, hm)
            mvs.append(kme.subpel_refine(y, planes, PAD, mv_int, lam_me,
                                         wm, hm))
            if partitions:
                hv = kme.full_search_parts(y, ry_pad, PAD, rng, lam_me,
                                           wm, hm)
                geo = dict(top=(0, 0, 8, 16), bot=(8, 0, 8, 16),
                           left=(0, 0, 16, 8), right=(0, 8, 16, 8))
                halves.append({
                    key: kme.subpel_refine(y, planes, PAD, hv[key],
                                           lam_me, wm, hm, oy=py_,
                                           ox=px_, bh=bh, bw=bw)[idx]
                    for key, (py_, px_, bh, bw) in geo.items()})
        bd = init_border_buffers(hm, wm)
        zmv = jnp.zeros((3, 1 + hm, 1 + wm + 1, 2), jnp.int32)
        zref = jnp.full((3, 1 + hm, 1 + wm + 1), mvpred.UNAVAIL,
                        jnp.int32)
        gy_all, gu_all, gv_all = tile_origin_xs(sched, y, u, v)
        xs_full = dict(xs, mv_me0=mvs[0][idx], mv_me1=mvs[1][idx],
                       colzero=colzero.astype(bool)[idx],
                       colmixed=colmixed.astype(bool)[idx],
                       gy=gy_all, gu=gu_all, gv=gv_all)
        if partitions:
            for lx in range(2):
                for key, mvq in halves[lx].items():
                    xs_full[f"mv_me{lx}_{key}"] = mvq
        carry, ys = jax.lax.scan(
            lambda cr, xx: wave_body(planes0, planes1, c0u, c0v, c1u, c1v,
                                     qp, cqp, lam4, lam24, lam_me,
                                     allow_parts, cr, xx),
            (bd, zmv, zref, zmv.copy(), zref.copy()), xs_full)
        out = dict(
            recon_y=assemble_plane(sched, ys.pop("recon_mb"), 16),
            recon_u=assemble_plane(sched, ys.pop("rec_u"), 8),
            recon_v=assemble_plane(sched, ys.pop("rec_v"), 8),
        )
        return out, ys

    return encode
