"""Wavefront intra-macroblock evaluation + all-intra frame encoder (JAX).

JM's `encode_one_macroblock` raster loop with per-block intra mode search
(SURVEY.md §3.1, §3.3) restructured TPU-first: a `lax.scan` over
anti-diagonal waves; within a wave every MB of the diagonal is a batch
lane, and all candidate modes are evaluated SIMD-parallel.  Only the 16
in-MB 4x4 blocks remain sequential (statically unrolled — the standard's
reconstruction dependency).  Mode decision is JM low-complexity style:
SATD + lambda * mode bits (rdopt.c / md_low.c parity), with real
transform/quant/recon applied once per selected mode — entropy coding
consumes the decisions afterwards on the host (no CABAC-state trial
re-encoding; see SURVEY.md §3.3 design note).

The module-level `eval_*` functions are shared with the inter (P-frame)
engine, which adds ME/MC candidates on top of the same intra machinery.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpu264.kernels import intra as ki
from tpu264.kernels import transform as kt
from tpu264.ref.transform import chroma_qp
from .wavefront import BLK_ORDER, WaveSchedule, block_availability

BIG = jnp.int32(1 << 28)
BLK_RULES = [block_availability(i) for i in range(16)]
# block spatial position (brow, bcol) per zig-zag idx
ZZ_ROWS = np.array([r for r, _ in BLK_ORDER])
ZZ_COLS = np.array([c for _, c in BLK_ORDER])


def lambda_mode(qp: int) -> float:
    """JM mode-decision lambda (rdopt.c): 0.85 * 2^((QP-12)/3)."""
    return 0.85 * 2.0 ** ((qp - 12) / 3.0)


def _gather_tile(img, r0, c0, h: int, w: int):
    return jax.lax.dynamic_slice(img, (r0, c0), (h, w))


def _scatter_tile(img, tiles, rows0, cols0, h: int, w: int):
    """Scatter B tiles of [h,w] at (rows0[b], cols0[b]) (disjoint)."""
    rr = rows0[:, None, None] + jnp.arange(h, dtype=jnp.int32)[None, :, None]
    cc = cols0[:, None, None] + jnp.arange(w, dtype=jnp.int32)[None, None, :]
    return img.at[rr, cc].set(tiles, mode="drop")


def _blk_avail(rule_key, rule, at, al, atl, atr):
    v = rule[rule_key]
    if v is True:
        return jnp.ones_like(at)
    if v is False:
        return jnp.zeros_like(at)
    return {"mb_top": at, "mb_left": al, "mb_tl": atl, "mb_tr": atr}[v]


def eval_i4x4(orig, ltop, lleft, modes_top, modes_left, at, al, atl, atr,
              qp: int, lam4: int, lam24: int):
    """Sequential 16-block I4x4 search + recon for a wave of B MBs.

    Returns (recon mb [B,16,16], mode grid [B,4,4], modes in zig-zag order
    [B,16], scanned levels [B,16,16], total cost [B]).
    """
    b = orig.shape[0]
    mbbuf = jnp.zeros((b, 16, 16), dtype=jnp.int32)
    modebuf = jnp.full((b, 4, 4), -1, dtype=jnp.int32)
    coeffs = []
    modes_out = []
    cost = jnp.zeros(b, dtype=jnp.int32)
    for idx in range(16):
        rule = BLK_RULES[idx]
        by, bx = rule["by"], rule["bx"]
        y0, x0 = by * 4, bx * 4
        # --- neighbor samples ---
        if by == 0:
            top8 = ltop[:, 1 + x0:9 + x0]
        else:
            if bx < 3:
                top8 = mbbuf[:, y0 - 1, x0:x0 + 8]
            else:
                t4 = mbbuf[:, y0 - 1, x0:x0 + 4]
                top8 = jnp.concatenate(
                    [t4, jnp.repeat(t4[:, 3:4], 4, axis=1)], axis=1)
        if bx == 0:
            left4 = lleft[:, y0:y0 + 4]
        else:
            left4 = mbbuf[:, y0:y0 + 4, x0 - 1]
        if by == 0 and bx == 0:
            tl = ltop[:, 0]
        elif by == 0:
            tl = ltop[:, x0]
        elif bx == 0:
            tl = lleft[:, y0 - 1]
        else:
            tl = mbbuf[:, y0 - 1, x0 - 1]
        # --- availability + top-right substitution ---
        b_at = _blk_avail("top", rule, at, al, atl, atr)
        b_al = _blk_avail("left", rule, at, al, atl, atr)
        b_atl = _blk_avail("tl", rule, at, al, atl, atr)
        b_atr = _blk_avail("tr", rule, at, al, atl, atr)
        top8 = jnp.where(b_atr[:, None],
                         top8,
                         jnp.concatenate([top8[:, :4],
                                          jnp.repeat(top8[:, 3:4], 4, axis=1)],
                                         axis=1))
        # --- all 9 modes ---
        preds = ki.predict4x4_all(top8, left4, tl)
        dc = ki.predict4x4_dc(top8, left4, b_at, b_al)
        preds = preds.at[:, 2].set(
            jnp.broadcast_to(dc[:, None, None], (b, 4, 4)))
        valid9 = ki.mode_valid4(b_at, b_al, b_atl)
        oblk = orig[:, y0:y0 + 4, x0:x0 + 4]
        satd = kt.satd4x4(oblk[:, None] - preds)
        # --- most probable mode (spec 8.3.1.1): -2 = neighbor unavailable
        # → MPM is DC outright; -1 = available non-I4x4 MB → that side
        # counts as DC.  Slice-boundary masking: the maps may hold another
        # slice's modes. ---
        ma = (jnp.where(al, modes_left[:, by], -2) if bx == 0
              else modebuf[:, by, bx - 1])
        mb_ = (jnp.where(at, modes_top[:, bx], -2) if by == 0
               else modebuf[:, by - 1, bx])
        a = jnp.where(ma == -1, 2, ma)
        b_side = jnp.where(mb_ == -1, 2, mb_)
        mpm = jnp.where((a < 0) | (b_side < 0), 2, jnp.minimum(a, b_side))
        mode_ids = jnp.arange(9, dtype=jnp.int32)[None, :]
        j = satd + jnp.where(mode_ids == mpm[:, None], 0, lam4)
        j = jnp.where(valid9, j, BIG)
        best = jnp.argmin(j, axis=1).astype(jnp.int32)
        cost = cost + jnp.min(j, axis=1)
        modebuf = modebuf.at[:, by, bx].set(best)
        modes_out.append(best)
        # --- transform / quant / recon ---
        pred = jnp.take_along_axis(
            preds, best[:, None, None, None], axis=1)[:, 0]
        wcoef = kt.fdct4x4(oblk - pred)
        lev = kt.quant4x4(wcoef, qp, intra=True)
        coeffs.append(kt.zigzag_scan(lev))
        rec = kt.clip1(pred + kt.block_recon(lev, qp))
        mbbuf = jax.lax.dynamic_update_slice(
            mbbuf, rec, (jnp.int32(0), jnp.int32(y0), jnp.int32(x0)))
    return (mbbuf, modebuf, jnp.stack(modes_out, axis=1),
            jnp.stack(coeffs, axis=1), cost + lam24)


def eval_i16(orig, ltop, lleft, at, al, atl, qp: int):
    """I16x16 mode search + recon. Returns (mode, cost, recon, dc levels
    [B,4,4], ac levels [B,4,4,4,4] with position 0 zeroed)."""
    b = orig.shape[0]
    top16 = ltop[:, 1:17]
    left16 = lleft
    tl = ltop[:, 0]
    preds = ki.predict16x16_all(top16, left16, tl, at, al)
    valid = ki.mode_valid16(at, al, atl)
    diff = orig[:, None] - preds                        # [B,4,16,16]
    dblk = diff.reshape(b, 4, 4, 4, 4, 4).transpose(0, 1, 2, 4, 3, 5)
    m = kt._mm(dblk, kt.H4, kt.H4)
    sat = jnp.abs(m).sum(axis=(-3, -2, -1)).sum(axis=-1)
    satdc = jnp.abs(m[..., 0, 0]).sum(axis=(-2, -1))
    j = (sat - satdc + 1) >> 1                          # JM find_sad_16x16
    j = jnp.where(valid, j, BIG)
    best = jnp.argmin(j, axis=1).astype(jnp.int32)
    cost = jnp.min(j, axis=1)
    pred = jnp.take_along_axis(
        preds, best[:, None, None, None], axis=1)[:, 0]
    resid = orig - pred
    blk = resid.reshape(b, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4)  # [B,br,bc,4,4]
    wcoef = kt.fdct4x4(blk)
    dc_lev = kt.hadamard4x4_fwd_quant_dc(wcoef[..., 0, 0], qp)
    dc_deq = kt.hadamard4x4_inv_dequant_dc(dc_lev, qp)
    ac_lev = kt.quant4x4(wcoef, qp, intra=True).at[..., 0, 0].set(0)
    res_rec = kt.block_recon(ac_lev, qp, dc=dc_deq)
    rec = kt.clip1(pred + res_rec.transpose(0, 1, 3, 2, 4).reshape(b, 16, 16))
    return best, cost, rec, dc_lev, ac_lev


def eval_chroma(orig_u, orig_v, tctx_u, lctx_u, tctx_v, lctx_v, at, al, atl,
                cqp: int, pred_mc=None):
    """Chroma mode decision + recon for both components.

    When `pred_mc` (a pair of [B,8,8] inter predictions) is given, the
    residual path is applied to it instead of an intra prediction and the
    returned mode is meaningless for MC lanes (caller selects).
    Returns (mode [B], [(rec, dc [B,4], ac [B,4,16]) for U, V]).
    """
    b = orig_u.shape[0]
    outs = []
    preds_u = ki.predict_chroma_all(tctx_u[:, 1:9], lctx_u, tctx_u[:, 0], at, al)
    preds_v = ki.predict_chroma_all(tctx_v[:, 1:9], lctx_v, tctx_v[:, 0], at, al)
    valid = ki.mode_valid_chroma(at, al, atl)
    satd = jnp.zeros((b, 4), dtype=jnp.int32)
    for orig, preds in ((orig_u, preds_u), (orig_v, preds_v)):
        diff = orig[:, None] - preds
        dblk = diff.reshape(b, 4, 2, 4, 2, 4).transpose(0, 1, 2, 4, 3, 5)
        satd = satd + kt.satd4x4(dblk).sum(axis=(-2, -1))
    jcost = jnp.where(valid, satd, BIG)
    best = jnp.argmin(jcost, axis=1).astype(jnp.int32)
    for ci, (orig, preds) in enumerate(((orig_u, preds_u), (orig_v, preds_v))):
        pred = jnp.take_along_axis(
            preds, best[:, None, None, None], axis=1)[:, 0]
        if pred_mc is not None:
            pred = pred_mc[ci]
        rec, dc, ac = chroma_residual_recon(orig, pred, cqp)
        outs.append((rec, dc, ac))
    return best, outs


def chroma_residual_recon(orig, pred, cqp: int, intra: bool = True):
    """Chroma residual transform path for a given prediction.

    Returns (recon [B,8,8], dc levels [B,4] raster, ac scanned [B,4,16]
    with position 0 zeroed)."""
    b = orig.shape[0]
    resid = orig - pred
    blk = resid.reshape(b, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4)
    wcoef = kt.fdct4x4(blk)
    dc_lev = kt.hadamard2x2_fwd_quant_dc(wcoef[..., 0, 0], cqp, intra)
    dc_deq = kt.hadamard2x2_inv_dequant_dc(dc_lev, cqp)
    ac_lev = kt.quant4x4(wcoef, cqp, intra=intra).at[..., 0, 0].set(0)
    res_rec = kt.block_recon(ac_lev, cqp, dc=dc_deq)
    rec = kt.clip1(pred + res_rec.transpose(0, 1, 3, 2, 4).reshape(b, 8, 8))
    return (rec, dc_lev.reshape(b, 4), kt.zigzag_scan(ac_lev).reshape(b, 4, 16))


def init_border_buffers(hm: int, wm: int):
    """Compact wavefront carry: 1-px-deep borders instead of full planes.

    Intra prediction of MB (r, c) only ever reads (a) the bottom pixel
    row of MB row r-1 (incl. the top-left corner and top-right run) and
    (b) the right pixel column of MB (r, c-1) — which, on the 2r+c
    anti-diagonal schedule, is always the MB finished one wave earlier
    in the same row.  Carrying just these borders (≈1% of the planes)
    keeps the per-wave scan state tiny; full recon planes are assembled
    once after the scan from the per-wave MB tiles.

    Layouts mirror the old padded planes column-wise so gathered values
    are bit-identical (left border col 0 = 0 / -2, +8 right trash band):
      row_y  [hm+2, 1+W+8]   row r = pixel row r*16 of the padded plane
      col_y  [hm+1, 16]      right column of the last finished MB in row r
      row_u/v [hm+2, 1+W/2+8], col_u/v [hm+1, 8]
      modes_row [hm+2, 1+wm*4+4], modes_col [hm+1, 4] (fill -2)
    """
    w = wm * 16
    row_y = jnp.zeros((hm + 2, 1 + w + 8), jnp.int32)
    col_y = jnp.zeros((hm + 1, 16), jnp.int32)
    row_u = jnp.zeros((hm + 2, 1 + w // 2 + 8), jnp.int32)
    row_v = jnp.zeros_like(row_u)
    col_u = jnp.zeros((hm + 1, 8), jnp.int32)
    col_v = jnp.zeros_like(col_u)
    modes_row = jnp.full((hm + 2, 1 + wm * 4 + 4), -2, jnp.int32)
    modes_col = jnp.full((hm + 1, 4), -2, jnp.int32)
    return dict(row_y=row_y, col_y=col_y, row_u=row_u, col_u=col_u,
                row_v=row_v, col_v=col_v, modes_row=modes_row,
                modes_col=modes_col)


def gather_border_ctx(bd, r, c):
    """Per-MB neighbor context for one wave from the border carry."""
    c16, c8, c4 = c * 16, c * 8, c * 4
    ltop = jax.vmap(lambda rr, cc: _gather_tile(bd["row_y"], rr, cc, 1, 25))(
        r, c16)[:, 0]
    lleft = jnp.take(bd["col_y"], r, axis=0)
    tctx_u = jax.vmap(lambda rr, cc: _gather_tile(bd["row_u"], rr, cc, 1, 9))(
        r, c8)[:, 0]
    lctx_u = jnp.take(bd["col_u"], r, axis=0)
    tctx_v = jax.vmap(lambda rr, cc: _gather_tile(bd["row_v"], rr, cc, 1, 9))(
        r, c8)[:, 0]
    lctx_v = jnp.take(bd["col_v"], r, axis=0)
    modes_top = jax.vmap(
        lambda rr, cc: _gather_tile(bd["modes_row"], rr, cc, 1, 4))(
        r, c4 + 1)[:, 0]
    modes_left = jnp.take(bd["modes_col"], r, axis=0)
    return (ltop, lleft, tctx_u, lctx_u, tctx_v, lctx_v,
            modes_top, modes_left)


def update_border_ctx(bd, r, c, recon_mb, rec_u, rec_v, mode_tiles):
    """Write the finished wave's MB borders back into the carry."""
    rr = r + 1
    a16 = jnp.arange(16, dtype=jnp.int32)
    a8 = jnp.arange(8, dtype=jnp.int32)
    a4 = jnp.arange(4, dtype=jnp.int32)
    out = dict(bd)
    out["row_y"] = bd["row_y"].at[
        rr[:, None], 1 + c[:, None] * 16 + a16].set(recon_mb[:, 15, :])
    out["col_y"] = bd["col_y"].at[r].set(recon_mb[:, :, 15], mode="drop")
    out["row_u"] = bd["row_u"].at[
        rr[:, None], 1 + c[:, None] * 8 + a8].set(rec_u[:, 7, :])
    out["col_u"] = bd["col_u"].at[r].set(rec_u[:, :, 7], mode="drop")
    out["row_v"] = bd["row_v"].at[
        rr[:, None], 1 + c[:, None] * 8 + a8].set(rec_v[:, 7, :])
    out["col_v"] = bd["col_v"].at[r].set(rec_v[:, :, 7], mode="drop")
    out["modes_row"] = bd["modes_row"].at[
        rr[:, None], 1 + c[:, None] * 4 + a4].set(mode_tiles[:, 3, :])
    out["modes_col"] = bd["modes_col"].at[r].set(mode_tiles[:, :, 3],
                                                 mode="drop")
    return out


def tile_origin_xs(sched: WaveSchedule, y, u, v):
    """Pre-gather original MB tiles per (wave, lane) with static indices.

    Hoists the per-wave dynamic-slice gathers of the source frame out of
    the scan body: the schedule is static, so this is one big gather."""
    hm, wm = sched.height_mbs, sched.width_mbs
    rs = np.minimum(sched.coords[:, :, 0], hm - 1)
    cs = sched.coords[:, :, 1]
    yt = y.reshape(hm, 16, wm, 16).transpose(0, 2, 1, 3)
    ut = u.reshape(hm, 8, wm, 8).transpose(0, 2, 1, 3)
    vt = v.reshape(hm, 8, wm, 8).transpose(0, 2, 1, 3)
    return yt[rs, cs], ut[rs, cs], vt[rs, cs]


def assemble_plane(sched: WaveSchedule, tiles, px: int):
    """[n_waves, max_wave, px, px] wave-major MB tiles → [H, W] plane via
    a static-permutation gather (TPU-friendly; no scatter)."""
    hm, wm = sched.height_mbs, sched.width_mbs
    perm = _raster_perm(sched)
    t = tiles.reshape((-1,) + tiles.shape[2:])[perm]
    return t.reshape(hm, wm, px, px).transpose(0, 2, 1, 3).reshape(
        hm * px, wm * px)


CQP_J = jnp.asarray(
    np.array([chroma_qp(q) for q in range(52)]), jnp.int32)


def lambda_terms_j(qp):
    """Traced (lam4, lam24, lam_me) from a traced/int QP scalar.

    Costs here are SATD-domain (distortion ~ amplitude, not energy), so
    rate terms scale with sqrt(lambda_mode) = sqrt(0.85)*2^((qp-12)/6)
    (JM lambda_motion / x264 lambda convention).  Round 2 used the
    SSD-domain lambda_mode directly, which over-penalized mv/mode bits
    ~15x at high QP and collapsed motion search to the predictor."""
    lam = jnp.sqrt(0.85) * 2.0 ** ((jnp.asarray(qp, jnp.float32) - 12.0)
                                   / 6.0)
    lam_me = jnp.maximum(1, jnp.round(lam)).astype(jnp.int32)
    lam4 = jnp.maximum(1, jnp.round(4 * lam)).astype(jnp.int32)
    lam24 = jnp.maximum(1, jnp.round(24 * lam)).astype(jnp.int32)
    return lam4, lam24, lam_me


def make_intra_encoder(sched: WaveSchedule, chroma_qp_offset: int = 0):
    """Build a jitted all-intra frame encoder for a fixed geometry.

    fn(y, u, v, qp) — qp is a traced scalar so rate control can vary it
    per frame without recompiling.
    """
    wm, hm = sched.width_mbs, sched.height_mbs
    h, w = hm * 16, wm * 16
    cqp_off = chroma_qp_offset
    xs = dict(
        coords=jnp.asarray(sched.coords),
        valid=jnp.asarray(sched.valid),
        avail=jnp.asarray(sched.avail),
    )

    def wave_body(qp, cqp, lam4, lam24, bd, x):
        coords = x["coords"]
        r, c = coords[:, 0], coords[:, 1]
        at, al, atl, atr = (x["avail"][:, i] for i in range(4))
        gy, gu, gv = x["gy"], x["gu"], x["gv"]
        (ltop, lleft, tctx_u, lctx_u, tctx_v, lctx_v,
         modes_top, modes_left) = gather_border_ctx(bd, r, c)

        mb4, modebuf, modes_zz, coeffs4, j4 = eval_i4x4(
            gy, ltop, lleft, modes_top, modes_left, at, al, atl, atr,
            qp, lam4, lam24)
        m16, j16, rec16, dc_lev, ac_lev = eval_i16(
            gy, ltop, lleft, at, al, atl, qp)
        sel16 = j16 < j4

        recon_mb = jnp.where(sel16[:, None, None], rec16, mb4)
        ac16_zz = kt.zigzag_scan(ac_lev[:, ZZ_ROWS, ZZ_COLS])     # [B,16,16]
        luma_ac = jnp.where(sel16[:, None, None], ac16_zz, coeffs4)
        luma_dc = jnp.where(sel16[:, None], kt.zigzag_scan(dc_lev), 0)

        cmode, ((rec_u, dc_u, ac_u), (rec_v, dc_v, ac_v)) = eval_chroma(
            gu, gv, tctx_u, lctx_u, tctx_v, lctx_v, at, al, atl, cqp)

        mode_tiles = jnp.where(sel16[:, None, None], -1, modebuf)
        bd = update_border_ctx(bd, r, c, recon_mb, rec_u, rec_v, mode_tiles)

        ys = dict(sel16=sel16, i16mode=m16, modes=modes_zz, cmode=cmode,
                  luma_ac=luma_ac, luma_dc=luma_dc,
                  chroma_dc=jnp.stack([dc_u, dc_v], axis=1),
                  chroma_ac=jnp.stack([ac_u, ac_v], axis=1),
                  recon_mb=recon_mb, rec_u=rec_u, rec_v=rec_v)
        return bd, ys

    @jax.jit
    def encode(y, u, v, qp):
        """y: [H,W] uint8/int32, u/v: [H/2, W/2]. Returns (recon, per-wave ys)."""
        y = y.astype(jnp.int32)
        u = u.astype(jnp.int32)
        v = v.astype(jnp.int32)
        qp = jnp.asarray(qp, jnp.int32)
        cqp = CQP_J[jnp.clip(qp + cqp_off, 0, 51)]
        lam4, lam24, _ = lambda_terms_j(qp)
        gy_all, gu_all, gv_all = tile_origin_xs(sched, y, u, v)
        xs_full = dict(xs, gy=gy_all, gu=gu_all, gv=gv_all)
        bd = init_border_buffers(hm, wm)
        _, ys = jax.lax.scan(
            lambda cr, xx: wave_body(qp, cqp, lam4, lam24, cr, xx),
            bd, xs_full)
        out = dict(
            recon_y=assemble_plane(sched, ys.pop("recon_mb"), 16),
            recon_u=assemble_plane(sched, ys.pop("rec_u"), 8),
            recon_v=assemble_plane(sched, ys.pop("rec_v"), 8),
        )
        return out, ys

    return encode


def reorder_wave_outputs(sched: WaveSchedule, ys) -> dict:
    """Flatten per-wave stacked outputs into [n_mbs, ...] raster order."""
    flat_idx = sched.mb_index.reshape(-1)
    valid = sched.valid.reshape(-1)
    out = {}
    for k, arr in ys.items():
        a = np.asarray(arr)
        a = a.reshape((-1,) + a.shape[2:])
        dst = np.zeros((sched.n_mbs,) + a.shape[1:], dtype=a.dtype)
        dst[flat_idx[valid]] = a[valid]
        out[k] = dst
    return out


_PERM_CACHE: dict = {}


def _raster_perm(sched: WaveSchedule) -> np.ndarray:
    """perm[mb_raster_idx] = flat wave-major lane index (static).

    Keyed on the schedule geometry (not `id(sched)`: CPython reuses ids
    after GC, which could alias a stale permutation onto a new schedule
    with different geometry)."""
    key = (sched.width_mbs, sched.height_mbs,
           tuple(sched.slice_starts.tolist()))
    if key not in _PERM_CACHE:
        flat_idx = sched.mb_index.reshape(-1)
        valid = sched.valid.reshape(-1)
        perm = np.zeros(sched.n_mbs, np.int32)
        perm[flat_idx[valid]] = np.flatnonzero(valid).astype(np.int32)
        _PERM_CACHE[key] = perm
    return _PERM_CACHE[key]


def reorder_wave_outputs_j(sched: WaveSchedule, ys) -> dict:
    """Device twin of `reorder_wave_outputs`: static-permutation gather
    (every raster MB has exactly one valid lane), output stays on device
    (feeds the on-device entropy serializer)."""
    perm = jnp.asarray(_raster_perm(sched))
    out = {}
    for k, arr in ys.items():
        a = arr.reshape((-1,) + arr.shape[2:])
        out[k] = a[perm]
    return out
