"""Wavefront deblocking filter (JAX) — bit-exact with `ref.deblock`.

The normative filter is sequential (each edge reads already-filtered
samples, MB raster order — SURVEY.md §3.4), but MB (r,c) depends only on
MBs (r, c-1), (r-1, c) and (r-1, c+1): the SAME anti-diagonal wavefront
d = 2r + c as the encode engine.  Each wave filters all its MBs' edges
batched: per MB a 20x20 luma window (12x12 chroma) is gathered, the 4
vertical then 4 horizontal edge phases are applied sequentially within
the window (16/8 lines per edge vectorized), and the modified 19x19
region is scattered back.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpu264.ref import deblock as rd
from tpu264.coding.wavefront import WaveSchedule

ALPHA = jnp.asarray(rd.ALPHA_TABLE, jnp.int32)
BETA = jnp.asarray(rd.BETA_TABLE, jnp.int32)
TC0 = jnp.asarray(rd.TC0_TABLE, jnp.int32)


def _clip3(lo, hi, x):
    return jnp.minimum(jnp.maximum(x, lo), hi)


def filter_luma_lines(win, bs, alpha: int, beta: int, tc0_row):
    """win [..., 8] = p3..q3 per line; bs broadcastable to win[..., 0]."""
    p3, p2, p1, p0 = win[..., 0], win[..., 1], win[..., 2], win[..., 3]
    q0, q1, q2, q3 = win[..., 4], win[..., 5], win[..., 6], win[..., 7]
    fflag = ((jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
             & (jnp.abs(q1 - q0) < beta) & (bs > 0))
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta

    tc0 = tc0_row[jnp.clip(bs, 1, 3) - 1]
    tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
    np0 = jnp.clip(p0 + delta, 0, 255)
    nq0 = jnp.clip(q0 - delta, 0, 255)
    np1 = p1 + _clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)
    nq1 = q1 + _clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)
    use_n = fflag & (bs < 4)

    strong = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = fflag & (bs == 4) & strong & ap
    sq = fflag & (bs == 4) & strong & aq
    weak4 = fflag & (bs == 4)
    o_p0 = jnp.where(use_n, np0,
                     jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                               jnp.where(weak4, (2 * p1 + p0 + q1 + 2) >> 2, p0)))
    o_p1 = jnp.where(use_n & ap, np1,
                     jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1))
    o_p2 = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    o_q0 = jnp.where(use_n, nq0,
                     jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                               jnp.where(weak4, (2 * q1 + q0 + p1 + 2) >> 2, q0)))
    o_q1 = jnp.where(use_n & aq, nq1,
                     jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1))
    o_q2 = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    return jnp.stack([p3, o_p2, o_p1, o_p0, o_q0, o_q1, o_q2, q3], axis=-1)


def filter_chroma_lines(win, bs, alpha: int, beta: int, tc0_row):
    """win [..., 4] = p1 p0 q0 q1 per line."""
    p1, p0, q0, q1 = win[..., 0], win[..., 1], win[..., 2], win[..., 3]
    fflag = ((jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
             & (jnp.abs(q1 - q0) < beta) & (bs > 0))
    tc = tc0_row[jnp.clip(bs, 1, 3) - 1] + 1
    delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
    use_n = fflag & (bs < 4)
    s4 = fflag & (bs == 4)
    o_p0 = jnp.where(use_n, jnp.clip(p0 + delta, 0, 255),
                     jnp.where(s4, (2 * p1 + p0 + q1 + 2) >> 2, p0))
    o_q0 = jnp.where(use_n, jnp.clip(q0 - delta, 0, 255),
                     jnp.where(s4, (2 * q1 + q0 + p1 + 2) >> 2, q0))
    return jnp.stack([p1, o_p0, o_q0, q1], axis=-1)


def compute_bs_maps(intra_mb, tc_luma, mv, ref):
    """jnp version of ref.deblock.compute_bs_maps → (bs_v, bs_h).

    Accepts the same motion forms as the scalar reference: single-list
    (mv [..., 2] / ref [...]) or two-list B motion (mv [..., 2, 2] /
    ref [..., 2] per-list picture ids, -1 = unused)."""
    hm, wm = intra_mb.shape
    h4, w4 = hm * 4, wm * 4
    intra4 = jnp.repeat(jnp.repeat(intra_mb, 4, axis=0), 4, axis=1)
    if mv.ndim == 3:
        mv, ref = rd.as_two_list_motion(mv, ref, xp=jnp)
    if mv.shape[0] == hm:
        mv4 = jnp.repeat(jnp.repeat(mv, 4, axis=0), 4, axis=1)
        ref4 = jnp.repeat(jnp.repeat(ref, 4, axis=0), 4, axis=1)
    else:
        mv4, ref4 = mv, ref

    def edge_bs(pi, qi, pt, qt, pm, qm, pr, qr, mb_edge):
        either_intra = pi | qi
        coeff = (pt > 0) | (qt > 0)
        interd = rd.inter_bs1_mask(pm, pr, qm, qr, xp=jnp)
        return jnp.where(either_intra, jnp.where(mb_edge, 4, 3),
                         jnp.where(coeff, 2,
                                   jnp.where(interd, 1, 0))).astype(jnp.int32)

    bs_v = jnp.zeros((h4, w4), jnp.int32)
    cols = np.arange(1, w4)
    bs_v = bs_v.at[:, 1:].set(edge_bs(
        intra4[:, :-1], intra4[:, 1:], tc_luma[:, :-1], tc_luma[:, 1:],
        mv4[:, :-1], mv4[:, 1:], ref4[:, :-1], ref4[:, 1:],
        jnp.asarray((cols % 4) == 0)[None, :]))
    rows = np.arange(1, h4)
    bs_h = jnp.zeros((h4, w4), jnp.int32)
    bs_h = bs_h.at[1:, :].set(edge_bs(
        intra4[:-1], intra4[1:], tc_luma[:-1], tc_luma[1:],
        mv4[:-1], mv4[1:], ref4[:-1], ref4[1:],
        jnp.asarray((rows % 4) == 0)[:, None]))
    return bs_v, bs_h


def make_deblocker_skewed(sched: WaveSchedule, qp=None, cqp=None,
                          filter_across_slices: bool = True):
    """Skewed-wavefront picture deblocker (bit-exact with `ref.deblock`).

    MB (r, c) is stored at skewed MB column c' = c + 2r, so every 2:1
    anti-diagonal wave becomes one contiguous column strip: a wave step is
    three dynamic slices + vectorized edge filters over all MB rows at
    once, instead of per-MB vmapped gathers/scatters.  Neighbor windows
    stay local in skew space (left -> c'-1, top/top-right -> band above at
    c'-2).  fn(y, u, v, intra_mb, tc_luma, mv, ref) -> filtered planes.
    """
    wm, hm = sched.width_mbs, sched.height_mbs
    h, w = hm * 16, wm * 16
    n_waves = wm + 2 * (hm - 1)
    OF = 3          # left pad in MBs (c'-2 strip reads at c'=0 reach -36px)
    skw = OF + n_waves + 1

    # rows whose top MB edge is never filtered (picture / slice boundary)
    zero_top_rows = {0}
    if not filter_across_slices:
        zero_top_rows |= {int(r) for r in sched.slice_starts.tolist() if r}

    bands = np.arange(hm)

    def _skew_cols(mb_px: int):
        """Per-pixel-row source-column map: skewed col of true col x in
        band b is x + (OF + 2b)*mb_px."""
        rows = np.repeat(np.arange(hm), mb_px)
        cols = (np.arange(wm * mb_px)[None, :]
                + (OF + 2 * rows)[:, None] * mb_px)
        return jnp.asarray(cols)                      # [hm*mb_px, wm*mb_px]

    _SKC = {16: _skew_cols(16), 8: _skew_cols(8), 4: _skew_cols(4)}

    def _skew(plane, mb_px: int):
        """[hm*mb_px, wm*mb_px] -> [hm*mb_px, skw*mb_px] skewed layout."""
        out = jnp.zeros((hm * mb_px, skw * mb_px), plane.dtype)
        rr = jnp.arange(hm * mb_px)[:, None]
        return out.at[rr, _SKC[mb_px]].set(plane)

    def _unskew(buf, mb_px: int):
        rr = jnp.arange(hm * mb_px)[:, None]
        return buf[rr, _SKC[mb_px]]

    def _edges_v(win, bs, flt, alpha, beta, tc0r, mb_px, n_edges, estep):
        # win [hm, mb_px(+pad rows), W]; edges at local cols pad + estep*k
        pad = estep
        for k in range(n_edges):
            b = bs[:, :, k]
            b_lines = jnp.repeat(b, mb_px // 4, axis=1)
            e = pad + estep * k
            seg = win[:, -mb_px:, e - estep:e + estep]
            fil = flt(seg, b_lines, alpha, beta, tc0r)
            win = win.at[:, -mb_px:, e - estep:e + estep].set(fil)
        return win

    @jax.jit
    def deblock(y, u, v, intra_mb, tc_luma, mv, ref, qp_t, cqp_t,
                t8_mb=None):
        qi = jnp.clip(jnp.asarray(qp_t, jnp.int32), 0, 51)
        ci = jnp.clip(jnp.asarray(cqp_t, jnp.int32), 0, 51)
        alpha, beta = ALPHA[qi], BETA[qi]
        tc0_row = TC0[qi]
        calpha, cbeta = ALPHA[ci], BETA[ci]
        ctc0_row = TC0[ci]
        bs_v, bs_h = compute_bs_maps(intra_mb.astype(bool),
                                     tc_luma.astype(jnp.int32),
                                     mv.astype(jnp.int32),
                                     ref.astype(jnp.int32))
        if t8_mb is not None:
            # transform-8x8 MBs have no internal 4x4 edges: their luma
            # edges at x/y = 4 and 12 within the MB are not filtered
            t8r = jnp.repeat(jnp.repeat(t8_mb.astype(bool), 4, 0), 4, 1)
            odd_c = (jnp.arange(wm * 4) % 2 == 1)[None, :]
            odd_r = (jnp.arange(hm * 4) % 2 == 1)[:, None]
            bs_v = jnp.where(t8r & odd_c, 0, bs_v)
            bs_h = jnp.where(t8r & odd_r, 0, bs_h)
        for r in zero_top_rows:
            bs_h = bs_h.at[r * 4, :].set(0)
        yb = _skew(y.astype(jnp.int32), 16)
        ub = _skew(u.astype(jnp.int32), 8)
        vb = _skew(v.astype(jnp.int32), 8)
        bvs = _skew(bs_v, 4)
        bhs = _skew(bs_h, 4)

        def step(carry, cp):
            yb, ub, vb = carry
            base = (OF + cp) * 16
            base2 = (OF + cp - 2) * 16

            BV = jax.lax.dynamic_slice(
                bvs, (0, (OF + cp) * 4), (hm * 4, 4)).reshape(hm, 4, 4)
            BH = jax.lax.dynamic_slice(
                bhs, (0, (OF + cp) * 4), (hm * 4, 4)).reshape(hm, 4, 4)

            # ---- luma ----
            M = jax.lax.dynamic_slice(
                yb, (0, base - 4), (hm * 16, 20)).reshape(hm, 16, 20)
            A = jax.lax.dynamic_slice(
                yb, (0, base2 - 4), (hm * 16, 20)).reshape(hm, 16, 20)
            top4 = jnp.concatenate(
                [jnp.zeros((1, 4, 20), jnp.int32), A[:-1, 12:16]], axis=0)
            win = jnp.concatenate([top4, M], axis=1)       # [hm, 20, 20]
            win = _edges_v(win, BV, filter_luma_lines, alpha, beta,
                           tc0_row, 16, 4, 4)
            # horizontal: transpose lines<->cols inside the window
            winT = win.transpose(0, 2, 1)                  # [hm, 20, 20]
            for k in range(4):
                b_lines = jnp.repeat(BH[:, k, :], 4, axis=1)
                e = 4 + 4 * k
                seg = winT[:, 4:20, e - 4:e + 4]
                fil = filter_luma_lines(seg, b_lines, alpha, beta, tc0_row)
                winT = winT.at[:, 4:20, e - 4:e + 4].set(fil)
            win = winT.transpose(0, 2, 1)
            yb = jax.lax.dynamic_update_slice(
                yb, win[:, 4:20].reshape(hm * 16, 20), (0, base - 4))
            A_upd = A.at[:-1, 12:16].set(win[1:, 0:4])
            yb = jax.lax.dynamic_update_slice(
                yb, A_upd.reshape(hm * 16, 20), (0, base2 - 4))

            # ---- chroma ----
            cb = (OF + cp) * 8
            cb2 = (OF + cp - 2) * 8
            for plane_i, pb in enumerate((ub, vb)):
                Mc = jax.lax.dynamic_slice(
                    pb, (0, cb - 4), (hm * 8, 12)).reshape(hm, 8, 12)
                Ac = jax.lax.dynamic_slice(
                    pb, (0, cb2 - 4), (hm * 8, 12)).reshape(hm, 8, 12)
                top2 = jnp.concatenate(
                    [jnp.zeros((1, 2, 12), jnp.int32), Ac[:-1, 6:8]], axis=0)
                cwin = jnp.concatenate([top2, Mc], axis=1)  # [hm, 10, 12]
                # vertical chroma edges at local cols 4 (MB) and 8 (internal)
                for k in (0, 2):
                    b_lines = jnp.repeat(BV[:, :, k], 2, axis=1)
                    e = 4 + 2 * k
                    seg = cwin[:, 2:10, e - 2:e + 2]
                    fil = filter_chroma_lines(seg, b_lines, calpha, cbeta,
                                              ctc0_row)
                    cwin = cwin.at[:, 2:10, e - 2:e + 2].set(fil)
                cwinT = cwin.transpose(0, 2, 1)            # [hm, 12, 10]
                for k in (0, 2):
                    b_lines = jnp.repeat(BH[:, k, :], 2, axis=1)
                    e = 2 + 2 * k
                    seg = cwinT[:, 4:12, e - 2:e + 2]
                    fil = filter_chroma_lines(seg, b_lines, calpha, cbeta,
                                              ctc0_row)
                    cwinT = cwinT.at[:, 4:12, e - 2:e + 2].set(fil)
                cwin = cwinT.transpose(0, 2, 1)
                pb = jax.lax.dynamic_update_slice(
                    pb, cwin[:, 2:10].reshape(hm * 8, 12), (0, cb - 4))
                Ac_upd = Ac.at[:-1, 6:8].set(cwin[1:, 0:2])
                pb = jax.lax.dynamic_update_slice(
                    pb, Ac_upd.reshape(hm * 8, 12), (0, cb2 - 4))
                if plane_i == 0:
                    ub = pb
                else:
                    vb = pb
            return (yb, ub, vb), None

        (yb, ub, vb), _ = jax.lax.scan(
            step, (yb, ub, vb), jnp.arange(n_waves, dtype=jnp.int32))
        return _unskew(yb, 16), _unskew(ub, 8), _unskew(vb, 8)

    if qp is None:
        return deblock
    # fixed-QP convenience wrapper (legacy signature)
    return lambda y, u, v, intra_mb, tc_luma, mv, ref: deblock(
        y, u, v, intra_mb, tc_luma, mv, ref, qp, cqp)


def make_deblocker(sched: WaveSchedule, qp: int, cqp: int,
                   filter_across_slices: bool = True):
    """Jitted picture deblocker for fixed geometry/QP.

    fn(y, u, v, intra_mb, tc_luma, mv, ref) → filtered (y, u, v).
    """
    wm, hm = sched.width_mbs, sched.height_mbs
    h, w = hm * 16, wm * 16
    ia = int(np.clip(qp, 0, 51))
    alpha, beta = int(rd.ALPHA_TABLE[ia]), int(rd.BETA_TABLE[ia])
    tc0_row = jnp.asarray(rd.TC0_TABLE[ia], jnp.int32)
    ca = int(np.clip(cqp, 0, 51))
    calpha, cbeta = int(rd.ALPHA_TABLE[ca]), int(rd.BETA_TABLE[ca])
    ctc0_row = jnp.asarray(rd.TC0_TABLE[ca], jnp.int32)

    # per-MB edge-filtering availability (host-static)
    slice_starts = set(sched.slice_starts.tolist())
    left_ok = np.zeros((hm, wm), dtype=bool)
    left_ok[:, 1:] = True
    top_ok = np.zeros((hm, wm), dtype=bool)
    top_ok[1:, :] = True
    if not filter_across_slices:
        for r in slice_starts:
            if r > 0:
                top_ok[r, :] = False
    lo_w = np.zeros(sched.valid.shape, dtype=bool)
    to_w = np.zeros(sched.valid.shape, dtype=bool)
    for wi in range(sched.n_waves):
        for k in range(sched.max_wave):
            if sched.valid[wi, k]:
                r, c = sched.coords[wi, k]
                lo_w[wi, k] = left_ok[r, c]
                to_w[wi, k] = top_ok[r, c]

    xs = dict(coords=jnp.asarray(sched.coords),
              valid=jnp.asarray(sched.valid),
              left_ok=jnp.asarray(lo_w), top_ok=jnp.asarray(to_w))

    def wave_body(carry, x):
        yb, ub, vb, bs_v, bs_h = carry
        r, c = x["coords"][:, 0], x["coords"][:, 1]
        valid = x["valid"]
        lok, tok = x["left_ok"], x["top_ok"]
        # invalid lanes scatter into the trash band below the frame (the
        # +1 scatter offset is inside the 4-pad, so the pad-row default
        # coordinates would overlap real rows)
        sc_y = jnp.where(valid, r * 16 + 1, 4 + h)
        sc_c = jnp.where(valid, r * 8 + 1, 4 + h // 2)
        b = r.shape[0]

        gwin = jax.vmap(lambda rr, cc: jax.lax.dynamic_slice(
            yb, (rr, cc), (20, 20)))(r * 16, c * 16)
        gbs_v = jax.vmap(lambda rr, cc: jax.lax.dynamic_slice(
            bs_v, (rr, cc), (4, 4)))(r * 4, c * 4)
        gbs_h = jax.vmap(lambda rr, cc: jax.lax.dynamic_slice(
            bs_h, (rr, cc), (4, 4)))(r * 4, c * 4)

        def do_edges(win, bs_tab, ok0):
            # win [B, 20(lines... rows), 20(cols)]; edges at local cols
            # 4, 8, 12, 16
            for k in range(4):
                bs = bs_tab[:, :, k]                     # [B, 4]
                if k == 0:
                    bs = jnp.where(ok0[:, None], bs, 0)
                bs16 = jnp.repeat(bs, 4, axis=1)         # [B, 16]
                e = 4 + 4 * k
                seg = win[:, 4:20, e - 4:e + 4]
                fil = filter_luma_lines(seg, bs16, alpha, beta, tc0_row)
                win = win.at[:, 4:20, e - 4:e + 4].set(fil)
            return win

        # vertical edges: bs_tab[:, j, k] = strength of edge k, block row j
        gwin = do_edges(gwin, gbs_v.transpose(0, 1, 2), lok)
        # horizontal edges: transpose, reuse, transpose back
        gwin = do_edges(gwin.transpose(0, 2, 1),
                        gbs_h.transpose(0, 2, 1), tok).transpose(0, 2, 1)
        yb = _scatter19(yb, gwin, sc_y, c * 16 + 1)

        # ---- chroma ----
        gcu = jax.vmap(lambda rr, cc: jax.lax.dynamic_slice(
            ub, (rr, cc), (12, 12)))(r * 8, c * 8)
        gcv = jax.vmap(lambda rr, cc: jax.lax.dynamic_slice(
            vb, (rr, cc), (12, 12)))(r * 8, c * 8)

        def do_chroma(win, bs_tab, ok0):
            for k in (0, 2):
                bs = bs_tab[:, :, k]
                if k == 0:
                    bs = jnp.where(ok0[:, None], bs, 0)
                bs8 = jnp.repeat(bs, 2, axis=1)
                e = 4 + 2 * k
                seg = win[:, 4:12, e - 2:e + 2]
                fil = filter_chroma_lines(seg, bs8, calpha, cbeta, ctc0_row)
                win = win.at[:, 4:12, e - 2:e + 2].set(fil)
            return win

        gcu = do_chroma(gcu, gbs_v, lok)
        gcu = do_chroma(gcu.transpose(0, 2, 1), gbs_h.transpose(0, 2, 1),
                        tok).transpose(0, 2, 1)
        gcv = do_chroma(gcv, gbs_v, lok)
        gcv = do_chroma(gcv.transpose(0, 2, 1), gbs_h.transpose(0, 2, 1),
                        tok).transpose(0, 2, 1)
        ub = _scatter11(ub, gcu, sc_c, c * 8 + 1)
        vb = _scatter11(vb, gcv, sc_c, c * 8 + 1)
        return (yb, ub, vb, bs_v, bs_h), None

    def _scatter19(img, wins, rows0, cols0):
        rr = rows0[:, None, None] + jnp.arange(19, dtype=jnp.int32)[None, :, None]
        cc = cols0[:, None, None] + jnp.arange(19, dtype=jnp.int32)[None, None, :]
        return img.at[rr, cc].set(wins[:, 1:20, 1:20], mode="drop")

    def _scatter11(img, wins, rows0, cols0):
        rr = rows0[:, None, None] + jnp.arange(11, dtype=jnp.int32)[None, :, None]
        cc = cols0[:, None, None] + jnp.arange(11, dtype=jnp.int32)[None, None, :]
        return img.at[rr, cc].set(wins[:, 1:12, 1:12], mode="drop")

    @jax.jit
    def deblock(y, u, v, intra_mb, tc_luma, mv, ref):
        bs_v, bs_h = compute_bs_maps(intra_mb.astype(bool),
                                     tc_luma.astype(jnp.int32),
                                     mv.astype(jnp.int32),
                                     ref.astype(jnp.int32))
        yb = jnp.zeros((4 + h + 16, 4 + w), jnp.int32)
        yb = yb.at[4:4 + h, 4:4 + w].set(y.astype(jnp.int32))
        ub = jnp.zeros((4 + h // 2 + 8, 4 + w // 2), jnp.int32)
        ub = ub.at[4:4 + h // 2, 4:4 + w // 2].set(u.astype(jnp.int32))
        vb = jnp.zeros_like(ub).at[4:4 + h // 2, 4:4 + w // 2].set(
            v.astype(jnp.int32))
        carry = (yb, ub, vb, bs_v, bs_h)
        carry, _ = jax.lax.scan(wave_body, carry, xs)
        yb, ub, vb = carry[0], carry[1], carry[2]
        return (yb[4:4 + h, 4:4 + w], ub[4:4 + h // 2, 4:4 + w // 2],
                vb[4:4 + h // 2, 4:4 + w // 2])

    return deblock
