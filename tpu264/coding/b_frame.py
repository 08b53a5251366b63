"""Wavefront B-frame encoder (JAX): bi-predictive 16x16, spatial
direct/skip, and intra modes.

JM's B-slice `encode_one_macroblock` restructured like the P engine
(`inter_frame.py`): both reference frames are full-searched and
sub-pel-refined for every MB in parallel (phase 1), then the wavefront
decision pass picks per MB among B_L0_16x16 / B_L1_16x16 / B_Bi_16x16
(average bi-prediction, weighted_bipred_idc 0), B_Direct_16x16
(spatial direct, spec 8.4.1.2.2 — the in-scan median predictors double
as the direct MVs, with colZeroFlag zeroing supplied per MB from the
list1 reference's stored motion), and the intra modes.  Per-list median
MV prediction is carried through the scan exactly as the decoder
derives it (spec 8.4.1.3: a neighbor not using list X contributes
mv 0 / ref -1).  Direct MBs whose cbp is 0 are emitted as B_Skip by
the serializers.

btype codes in the output dict: 0 = L0, 1 = L1, 2 = Bi, 3 = Direct,
4 = intra; `use0`/`use1` are the FINAL per-list use flags (direct
included) and mv0/mv1 the final per-list MVs — exactly the motion
state a decoder reconstructs.
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
from .inter_frame import PAD, mvd_bits
from .wavefront import WaveSchedule

# ue(mb_type) bit lengths for B_L0/B_L1/B_Bi (Table 7-14 mb_type 1, 2, 3
# → ue codewords '010', '011', '00100': 3, 3, 5 bits)
TYPE_BITS = (3, 3, 5)


def make_b_encoder(sched: WaveSchedule, chroma_qp_offset: int = 0,
                   search_range: int = 16, ref_prepadded: bool = False):
    """fn(y,u,v, r0y,r0u,r0v, r1y,r1u,r1v, colzero, qp) -> (dev_out, ys).

    `ref_prepadded`: both refs arrive already PAD-extended (tiled path:
    real ppermute'd halo rows instead of edge replication)."""
    wm, hm = sched.width_mbs, sched.height_mbs
    cqp_off = chroma_qp_offset
    rng = min(search_range, PAD - 8)

    xs = dict(
        coords=jnp.asarray(sched.coords),
        valid=jnp.asarray(sched.valid),
        avail=jnp.asarray(sched.avail),
    )

    def neighbor_mvs(mv_map, ref_map, r, c, al, at, atl, atr):
        """Median MV predictor for ref 0 plus the spatial-direct
        MinPositive flag (any A/B/C neighbor using this list)."""
        def gmv(rr, cc):
            return jax.lax.dynamic_slice(mv_map, (rr, cc, 0), (1, 1, 2))[0, 0]

        def gref(rr, cc):
            return jax.lax.dynamic_slice(ref_map, (rr, cc), (1, 1))[0, 0]

        mv_a = jax.vmap(gmv)(r + 1, c)
        ref_a = jax.vmap(gref)(r + 1, c)
        mv_b = jax.vmap(gmv)(r, c + 1)
        ref_b = jax.vmap(gref)(r, c + 1)
        mv_c = jax.vmap(gmv)(r, c + 2)
        ref_c = jax.vmap(gref)(r, c + 2)
        mv_d = jax.vmap(gmv)(r, c)
        ref_d = jax.vmap(gref)(r, c)
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
                  lam4, lam24, lam_me, carry, x):
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
        # MinPositive refIdx per list collapses to "any neighbor uses the
        # list" (single-ref encoder); colZeroFlag comes per MB from the
        # list1 ref's stored motion (MB-constant in our streams, so the
        # per-8x8 inference collapses to per-MB)
        colzero = x["colzero"]
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
        is_inter = btype < 4
        is_direct = btype == 3
        use0 = (btype == 0) | (btype == 2) | (is_direct & duse0)
        use1 = (btype == 1) | (btype == 2) | (is_direct & duse1)
        mv0_fin = jnp.where(is_direct[:, None], dmv0, mv_me0)
        mv1_fin = jnp.where(is_direct[:, None], dmv1, mv_me1)
        is_i16 = (~is_inter) & sel16

        pred_inter = jnp.where(
            (btype == 0)[:, None, None], pred0,
            jnp.where((btype == 1)[:, None, None], pred1,
                      jnp.where((btype == 2)[:, None, None], pred_bi,
                                pred_dir)))

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
            cpred.append(jnp.where(
                (btype == 0)[:, None, None], p0,
                jnp.where((btype == 1)[:, None, None], p1,
                          jnp.where((btype == 2)[:, None, None],
                                    (p0 + p1 + 1) >> 1, pdir))))
        inter_u = chroma_residual_recon(gu, cpred[0], cqp, intra=False)
        inter_v = chroma_residual_recon(gv, cpred[1], cqp, intra=False)
        chroma = []
        for (i_rec, i_dc, i_ac), (p_rec, p_dc, p_ac) in (
                (intra_outs[0], inter_u), (intra_outs[1], inter_v)):
            rec = jnp.where(is_inter[:, None, None], p_rec, i_rec)
            dc = jnp.where(is_inter[:, None], p_dc, i_dc)
            ac = jnp.where(is_inter[:, None, None], p_ac, i_ac)
            chroma.append((rec, dc, ac))

        # ---- state write-back ----
        mode_tiles = jnp.where((is_inter | sel16)[:, None, None], -1,
                               modebuf)
        bd = update_border_ctx(bd, r, c, recon_mb, chroma[0][0],
                               chroma[1][0], mode_tiles)
        mv0_map = mv0_map.at[r + 1, c + 1].set(
            jnp.where(use0[:, None], mv0_fin, 0), mode="drop")
        ref0_map = ref0_map.at[r + 1, c + 1].set(
            jnp.where(use0, 0, mvpred.INTRA), mode="drop")
        mv1_map = mv1_map.at[r + 1, c + 1].set(
            jnp.where(use1[:, None], mv1_fin, 0), mode="drop")
        ref1_map = ref1_map.at[r + 1, c + 1].set(
            jnp.where(use1, 0, mvpred.INTRA), mode="drop")

        ys = dict(btype=btype, mv0=mv0_fin, mv1=mv1_fin,
                  use0=use0, use1=use1,
                  sel16=is_i16, i16mode=m16, modes=modes_zz, cmode=cmode,
                  luma_ac=luma_ac, luma_dc=luma_dc,
                  chroma_dc=jnp.stack([chroma[0][1], chroma[1][1]], axis=1),
                  chroma_ac=jnp.stack([chroma[0][2], chroma[1][2]], axis=1),
                  recon_mb=recon_mb, rec_u=chroma[0][0], rec_v=chroma[1][0])
        return (bd, mv0_map, ref0_map, mv1_map, ref1_map), ys

    @jax.jit
    def encode(y, u, v, r0y, r0u, r0v, r1y, r1u, r1v, colzero, qp):
        y = y.astype(jnp.int32)
        u = u.astype(jnp.int32)
        v = v.astype(jnp.int32)
        qp = jnp.asarray(qp, jnp.int32)
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

        mvs = []
        for ry_pad, planes in ((r0y_pad, planes0), (r1y_pad, planes1)):
            mv_int, _ = kme.full_search_16x16(
                y, ry_pad, PAD, rng, lam_me, wm, hm)
            mvs.append(kme.subpel_refine(y, planes, PAD, mv_int, lam_me,
                                         wm, hm))
        idx = jnp.asarray(np.minimum(sched.mb_index, sched.n_mbs - 1))
        bd = init_border_buffers(hm, wm)
        zmv = jnp.zeros((1 + hm, 1 + wm + 1, 2), jnp.int32)
        zref = jnp.full((1 + hm, 1 + wm + 1), mvpred.UNAVAIL, jnp.int32)
        gy_all, gu_all, gv_all = tile_origin_xs(sched, y, u, v)
        xs_full = dict(xs, mv_me0=mvs[0][idx], mv_me1=mvs[1][idx],
                       colzero=colzero.astype(bool)[idx],
                       gy=gy_all, gu=gu_all, gv=gv_all)
        carry, ys = jax.lax.scan(
            lambda cr, xx: wave_body(planes0, planes1, c0u, c0v, c1u, c1v,
                                     qp, cqp, lam4, lam24, lam_me, cr, xx),
            (bd, zmv, zref, zmv.copy(), zref.copy()), xs_full)
        out = dict(
            recon_y=assemble_plane(sched, ys.pop("recon_mb"), 16),
            recon_u=assemble_plane(sched, ys.pop("rec_u"), 8),
            recon_v=assemble_plane(sched, ys.pop("rec_v"), 8),
        )
        return out, ys

    return encode
