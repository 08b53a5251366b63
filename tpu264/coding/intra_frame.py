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


def gather_wave_ctx(recon_y, recon_u, recon_v, modes_map, orig_y, orig_u,
                    orig_v, r, c):
    """All per-MB context gathers for one wave (padded-buffer layouts)."""
    r16, c16 = r * 16, c * 16
    r8, c8 = r * 8, c * 8
    r4, c4 = r * 4, c * 4
    gy = jax.vmap(lambda rr, cc: _gather_tile(orig_y, rr, cc, 16, 16))(r16, c16)
    gu = jax.vmap(lambda rr, cc: _gather_tile(orig_u, rr, cc, 8, 8))(r8, c8)
    gv = jax.vmap(lambda rr, cc: _gather_tile(orig_v, rr, cc, 8, 8))(r8, c8)
    ltop = jax.vmap(lambda rr, cc: _gather_tile(recon_y, rr, cc, 1, 25))(r16, c16)[:, 0]
    lleft = jax.vmap(lambda rr, cc: _gather_tile(recon_y, rr, cc, 16, 1))(r16 + 1, c16)[:, :, 0]
    tctx_u = jax.vmap(lambda rr, cc: _gather_tile(recon_u, rr, cc, 1, 9))(r8, c8)[:, 0]
    lctx_u = jax.vmap(lambda rr, cc: _gather_tile(recon_u, rr, cc, 8, 1))(r8 + 1, c8)[:, :, 0]
    tctx_v = jax.vmap(lambda rr, cc: _gather_tile(recon_v, rr, cc, 1, 9))(r8, c8)[:, 0]
    lctx_v = jax.vmap(lambda rr, cc: _gather_tile(recon_v, rr, cc, 8, 1))(r8 + 1, c8)[:, :, 0]
    modes_top = jax.vmap(lambda rr, cc: _gather_tile(modes_map, rr, cc, 1, 4))(r4, c4 + 1)[:, 0]
    modes_left = jax.vmap(lambda rr, cc: _gather_tile(modes_map, rr, cc, 4, 1))(r4 + 1, c4)[:, :, 0]
    return (gy, gu, gv, ltop, lleft, tctx_u, lctx_u, tctx_v, lctx_v,
            modes_top, modes_left)


def init_frame_buffers(hm: int, wm: int):
    """Padded recon planes + modes map with trash bands for invalid lanes."""
    h, w, h4, w4 = hm * 16, wm * 16, hm * 4, wm * 4
    recon_y = jnp.zeros((1 + h + 16, 1 + w + 8), jnp.int32)
    recon_u = jnp.zeros((1 + h // 2 + 8, 1 + w // 2 + 8), jnp.int32)
    recon_v = jnp.zeros_like(recon_u)
    modes_map = jnp.full((1 + h4 + 4, 1 + w4), -2, jnp.int32)
    return recon_y, recon_u, recon_v, modes_map


CQP_J = jnp.asarray(
    np.array([chroma_qp(q) for q in range(52)]), jnp.int32)


def lambda_terms_j(qp):
    """Traced (lam4, lam24, lam_me) from a traced/int QP scalar."""
    lam = 0.85 * 2.0 ** ((jnp.asarray(qp, jnp.float32) - 12.0) / 3.0)
    lam4 = jnp.round(4 * lam).astype(jnp.int32)
    lam24 = jnp.round(24 * lam).astype(jnp.int32)
    lam_me = jnp.maximum(1, jnp.round(lam)).astype(jnp.int32)
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

    def wave_body(qp, cqp, lam4, lam24, carry, x):
        recon_y, recon_u, recon_v, modes_map, orig_y, orig_u, orig_v = carry
        coords = x["coords"]
        r, c = coords[:, 0], coords[:, 1]
        at, al, atl, atr = (x["avail"][:, i] for i in range(4))
        (gy, gu, gv, ltop, lleft, tctx_u, lctx_u, tctx_v, lctx_v,
         modes_top, modes_left) = gather_wave_ctx(
            recon_y, recon_u, recon_v, modes_map, orig_y, orig_u, orig_v, r, c)

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

        r16, c16, r8, c8, r4, c4 = r * 16, c * 16, r * 8, c * 8, r * 4, c * 4
        recon_y = _scatter_tile(recon_y, recon_mb, r16 + 1, c16 + 1, 16, 16)
        recon_u = _scatter_tile(recon_u, rec_u, r8 + 1, c8 + 1, 8, 8)
        recon_v = _scatter_tile(recon_v, rec_v, r8 + 1, c8 + 1, 8, 8)
        mode_tiles = jnp.where(sel16[:, None, None], -1, modebuf)
        modes_map = _scatter_tile(modes_map, mode_tiles, r4 + 1, c4 + 1, 4, 4)

        ys = dict(sel16=sel16, i16mode=m16, modes=modes_zz, cmode=cmode,
                  luma_ac=luma_ac, luma_dc=luma_dc,
                  chroma_dc=jnp.stack([dc_u, dc_v], axis=1),
                  chroma_ac=jnp.stack([ac_u, ac_v], axis=1))
        return (recon_y, recon_u, recon_v, modes_map,
                orig_y, orig_u, orig_v), ys

    @jax.jit
    def encode(y, u, v, qp):
        """y: [H,W] uint8/int32, u/v: [H/2, W/2]. Returns (recon, per-wave ys)."""
        y = y.astype(jnp.int32)
        u = u.astype(jnp.int32)
        v = v.astype(jnp.int32)
        qp = jnp.asarray(qp, jnp.int32)
        cqp = CQP_J[jnp.clip(qp + cqp_off, 0, 51)]
        lam4, lam24, _ = lambda_terms_j(qp)
        recon_y, recon_u, recon_v, modes_map = init_frame_buffers(hm, wm)
        carry = (recon_y, recon_u, recon_v, modes_map, y, u, v)
        carry, ys = jax.lax.scan(
            lambda cr, xx: wave_body(qp, cqp, lam4, lam24, cr, xx),
            carry, xs)
        recon_y, recon_u, recon_v = carry[0], carry[1], carry[2]
        out = dict(
            recon_y=recon_y[1:1 + h, 1:1 + w],
            recon_u=recon_u[1:1 + h // 2, 1:1 + w // 2],
            recon_v=recon_v[1:1 + h // 2, 1:1 + w // 2],
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


def reorder_wave_outputs_j(sched: WaveSchedule, ys) -> dict:
    """Device twin of `reorder_wave_outputs`: static-index scatter, output
    stays on device (feeds the on-device entropy serializer)."""
    flat_idx = sched.mb_index.reshape(-1)
    valid = sched.valid.reshape(-1)
    src = jnp.asarray(np.flatnonzero(valid))
    dst = jnp.asarray(flat_idx[valid])
    out = {}
    for k, arr in ys.items():
        a = arr.reshape((-1,) + arr.shape[2:])
        out[k] = jnp.zeros((sched.n_mbs,) + a.shape[1:],
                           dtype=a.dtype).at[dst].set(a[src])
    return out
