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


def make_inter_encoder(sched: WaveSchedule,
                       chroma_qp_offset: int = 0, search_range: int = 16,
                       ref_prepadded: bool = False):
    """Build a jitted P-frame encoder: fn(y,u,v, ref_y,ref_u,ref_v, qp).

    qp is a traced scalar (rate control varies it per frame).
    `ref_prepadded`: ref planes arrive already PAD-extended (the tiled
    path supplies real ppermute'd halo rows from neighbor tiles instead
    of edge replication — SURVEY.md §2c ref-pixel collectives)."""
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
                  carry, x):
        bd, mv_map, ref_map = carry
        coords = x["coords"]
        r, c = coords[:, 0], coords[:, 1]
        at, al, atl, atr = (x["avail"][:, i] for i in range(4))
        mv_me = x["mv_me"]                        # [B,2] qpel
        b = r.shape[0]
        gy, gu, gv = x["gy"], x["gu"], x["gv"]
        (ltop, lleft, tctx_u, lctx_u, tctx_v, lctx_v,
         modes_top, modes_left) = gather_border_ctx(bd, r, c)

        # ---- neighbor MVs from the maps (padded: +1 row/col, +1 right) ----
        def gmv(rr, cc):
            return jax.lax.dynamic_slice(mv_map, (rr, cc, 0), (1, 1, 2))[0, 0]

        def gref(rr, cc):
            return jax.lax.dynamic_slice(ref_map, (rr, cc), (1, 1))[0, 0]

        mv_a = jax.vmap(gmv)(r + 1, c)            # left  (r, c-1) -> padded
        ref_a = jax.vmap(gref)(r + 1, c)
        mv_b = jax.vmap(gmv)(r, c + 1)            # top
        ref_b = jax.vmap(gref)(r, c + 1)
        mv_c = jax.vmap(gmv)(r, c + 2)            # top-right
        ref_c = jax.vmap(gref)(r, c + 2)
        mv_d = jax.vmap(gmv)(r, c)                # top-left
        ref_d = jax.vmap(gref)(r, c)
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
            pred = kint.mc_luma(planes, y0, x0, mv)
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
        mv_tiles = jnp.where(is_inter[:, None], mv_sel, 0)
        mv_map = mv_map.at[r + 1, c + 1].set(mv_tiles, mode="drop")
        ref_map = ref_map.at[r + 1, c + 1].set(
            jnp.where(is_inter, 0, mvpred.INTRA), mode="drop")

        ys = dict(is_inter=is_inter, mv=mv_sel, mv_pred=mv_pred,
                  mv_skip=mv_skip,
                  sel16=is_i16, i16mode=m16, modes=modes_zz, cmode=cmode,
                  luma_ac=luma_ac, luma_dc=luma_dc,
                  chroma_dc=jnp.stack([chroma[0][1], chroma[1][1]], axis=1),
                  chroma_ac=jnp.stack([chroma[0][2], chroma[1][2]], axis=1),
                  recon_mb=recon_mb, rec_u=chroma[0][0], rec_v=chroma[1][0])
        return (bd, mv_map, ref_map), ys

    @jax.jit
    def encode(y, u, v, ref_y, ref_u, ref_v, qp):
        y = y.astype(jnp.int32)
        u = u.astype(jnp.int32)
        v = v.astype(jnp.int32)
        qp = jnp.asarray(qp, jnp.int32)
        cqp = CQP_J[jnp.clip(qp + cqp_off, 0, 51)]
        lam4, lam24, lam_me = lambda_terms_j(qp)
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
        mv_int, _ = kme.full_search_16x16(y, ref_pad, PAD, rng, lam_me, wm, hm)
        mv_q = kme.subpel_refine(y, planes, PAD, mv_int, lam_me, wm, hm)
        # rearrange per wave: [n_waves, Bmax, 2]
        mv_wave = mv_q[jnp.asarray(np.minimum(sched.mb_index, sched.n_mbs - 1))]

        bd = init_border_buffers(hm, wm)
        mv_map = jnp.zeros((1 + hm, 1 + wm + 1, 2), jnp.int32)
        ref_map = jnp.full((1 + hm, 1 + wm + 1), mvpred.UNAVAIL, jnp.int32)
        gy_all, gu_all, gv_all = tile_origin_xs(sched, y, u, v)
        xs_full = dict(xs, mv_me=mv_wave, gy=gy_all, gu=gu_all, gv=gv_all)
        carry, ys = jax.lax.scan(
            lambda cr, xx: wave_body(planes, cu_pad, cv_pad, qp, cqp,
                                     lam4, lam24, lam_me, cr, xx),
            (bd, mv_map, ref_map), xs_full)
        out = dict(
            recon_y=assemble_plane(sched, ys.pop("recon_mb"), 16),
            recon_u=assemble_plane(sched, ys.pop("rec_u"), 8),
            recon_v=assemble_plane(sched, ys.pop("rec_v"), 8),
        )
        return out, ys

    return encode
