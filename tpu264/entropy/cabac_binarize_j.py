"""On-device CABAC binarization (jnp twin of `cabac_binarize`).

BASELINE.json north star: "binarization + ctx-index derivation
vectorized per-MB ... CABAC range-coder as a lane-serialized per-slice
loop".  This module builds the (kind, a, b) record grids for a whole
frame INSIDE the jitted encode program — the final syntax maps never
leave the device — and compacts them per slice into the dense
[cap, 3] streams the Pallas engine (`cabac_pallas`) replays.  The
numpy twin (`cabac_binarize` + native C replay) remains the host
fallback and the bit-exactness oracle (tests assert identical records
and payloads).

Implementation note: the numpy twin appends one [n] row per record
slot (~3.5k rows).  Tracing 3.5k separate row computations would blow
up the XLA graph, so the per-coefficient loops are emitted as BLOCKED
rows ([15, n] significance maps, [16, 6, n] level groups, ...) that
lower to a handful of fused ops each; the row ORDER inside each block
matches the numpy twin exactly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpu264.coding.wavefront import BLK_ORDER
from tpu264.coding import mvpred
from .cabac_ctx import (CBF_CAT_OFF, LVL_CAT_OFF, SIG_CAT_OFF,
                        K_SKIP, K_INTER, K_I4, K_I16, K_DIRECT)
from .cabac_binarize import K_CTX, K_BYP, K_TERM
from .cabac_ctx import LAST8_MAP, SIG8_MAP
from .device_cavlc import (_compute_cbp_j, _mpm_grid_j, _neighbor_mvs_j)


class RecordRows:
    """Accumulates [rows, n] record blocks; stacked to [S, n] grids."""

    def __init__(self, n: int):
        self.n = n
        self.ks: list = []
        self.as_: list = []
        self.bs: list = []
        self.vs: list = []

    def _row(self, x, dtype=jnp.int32):
        x = jnp.asarray(x, dtype)
        if x.ndim == 0:
            x = jnp.full((self.n,), x, dtype)
        return x[None, :]

    def put_block(self, kind, a, b, valid):
        """a/b/valid: [m, n] blocks (row-major record order)."""
        a = jnp.asarray(a, jnp.int32)
        self.ks.append(jnp.full(a.shape, kind, jnp.int32))
        self.as_.append(a)
        self.bs.append(jnp.asarray(b, jnp.int32))
        self.vs.append(jnp.asarray(valid, bool))

    def ctx_bin(self, ctx, binv, valid):
        self.put_block(K_CTX, self._row(ctx),
                       self._row((jnp.asarray(binv, jnp.int32) & 1) | 2),
                       self._row(valid, bool))

    def ctx_run(self, ctx, binv, count, valid):
        b = ((jnp.asarray(binv, jnp.int32) & 1)
             | (jnp.asarray(count, jnp.int32) << 1))
        self.put_block(K_CTX, self._row(ctx), self._row(b),
                       self._row(valid & (jnp.asarray(count) > 0), bool))

    def bypass(self, value, nbits, valid):
        self.put_block(K_BYP, self._row(value), self._row(nbits),
                       self._row(valid & (jnp.asarray(nbits) > 0), bool))

    def terminate(self, binv, valid):
        self.put_block(K_TERM, self._row(binv), self._row(0),
                       self._row(valid, bool))

    def stacked(self):
        return (jnp.concatenate(self.ks, 0), jnp.concatenate(self.as_, 0),
                jnp.concatenate(self.bs, 0), jnp.concatenate(self.vs, 0))


def _eg_parts(v, k0: int):
    """Exp-Golomb order-k0 escape, vectorized over any shape: returns
    (pre_val, pre_bits, suffix_val, suffix_bits) int32 arrays."""
    v = jnp.asarray(v, jnp.int32)
    t = ((v >> k0) + 1).astype(jnp.float32)
    m = jnp.floor(jnp.log2(t)).astype(jnp.int32)
    vv = v - (((1 << jnp.minimum(m, 30)) - 1) << k0)
    k = k0 + m
    pre_bits = m + 1
    pre_val = ((1 << jnp.minimum(m, 30)) - 1) << 1
    return pre_val, pre_bits, vv, k


def _left2(g, fill=0):
    return jnp.full_like(g, fill).at[:, 1:].set(g[:, :-1])


def _top2(g, slice_rows, mask, fill=0):
    out = jnp.full_like(g, fill).at[1:, :].set(g[:-1, :])
    return jnp.where(mask, fill, out)


def _residual_group_j(grid: RecordRows, scanned, mc, sig_base, last_base,
                      lvl_base, cbf_ctx, coded, cdc_inc: bool):
    """Blocked twin of cabac_binarize._residual_group (127 rows)."""
    scanned = jnp.asarray(scanned, jnp.int32)
    n = scanned.shape[0]
    nz = scanned != 0
    cbf = nz.any(axis=1)
    grid.ctx_bin(cbf_ctx, cbf.astype(jnp.int32), coded)
    pos = jnp.arange(16)
    last = jnp.where(cbf, (nz * (pos + 1)[None, :]).max(axis=1) - 1, -1)
    on_res = coded & cbf
    mc = jnp.broadcast_to(jnp.asarray(mc, jnp.int32), (n,))

    # ---- significance / last maps: [15, 2, n] interleaved rows ----
    i_arr = np.arange(15)
    inc = np.minimum(i_arr, 2) if cdc_inc else i_arr          # [15]
    on_i = (on_res[None, :] & (i_arr[:, None] <= last[None, :])
            & (i_arr[:, None] <= (mc - 2)[None, :]))          # [15, n]
    sig = nz.T[:15]                                           # [15, n]
    sig_a = jnp.broadcast_to(sig_base, (n,))[None, :] + \
        jnp.asarray(inc, jnp.int32)[:, None]
    last_a = jnp.broadcast_to(last_base, (n,))[None, :] + \
        jnp.asarray(inc, jnp.int32)[:, None]
    is_last = (i_arr[:, None] == last[None, :])
    a_blk = jnp.stack([sig_a, last_a], 1).reshape(30, n)
    b_blk = jnp.stack([sig.astype(jnp.int32) | 2,
                       is_last.astype(jnp.int32) | 2], 1).reshape(30, n)
    v_blk = jnp.stack([on_i, on_i & sig], 1).reshape(30, n)
    grid.put_block(K_CTX, a_blk, b_blk, v_blk)

    # ---- levels + signs, i = 15..0 (6 rows per coefficient) ----
    absv = jnp.abs(scanned)
    gt1 = (absv > 1) & nz
    eq1 = (absv == 1) & nz

    def sfx(msk):
        c = jnp.cumsum(msk[:, ::-1].astype(jnp.int32), axis=1)[:, ::-1]
        return c - msk

    num_gt1 = sfx(gt1)
    num_eq1 = sfx(eq1)
    lvl_b = jnp.broadcast_to(lvl_base, (n,))
    ctx0 = lvl_b[:, None] + jnp.where(num_gt1 > 0, 0,
                                      jnp.minimum(4, 1 + num_eq1))
    ctxn = lvl_b[:, None] + 5 + jnp.minimum(4, num_gt1)
    order = np.arange(15, -1, -1)                             # [16]
    onT = on_res[None, :] & nz.T[order]                       # [16, n]
    a_abs = jnp.where(onT, absv.T[order] - 1, 0)              # [16, n]
    ctx0T = ctx0.T[order]
    ctxnT = ctxn.T[order]
    egp, egpb, egs, egsb = _eg_parts(jnp.maximum(a_abs - 14, 0), 0)
    sgn = (scanned.T[order] < 0).astype(jnp.int32)
    run_cnt = jnp.minimum(a_abs, 14) - 1
    rows_a = jnp.stack([ctx0T, ctxnT, ctxnT, egp, egs, sgn], 1)
    rows_b = jnp.stack([(a_abs > 0).astype(jnp.int32) | 2,
                        1 | (run_cnt << 1),
                        jnp.full_like(a_abs, 2),
                        egpb, egsb, jnp.ones_like(a_abs)], 1)
    rows_v = jnp.stack([onT,
                        onT & (a_abs >= 2) & (run_cnt > 0),
                        onT & (a_abs >= 1) & (a_abs < 14),
                        onT & (a_abs >= 14) & (egpb > 0),
                        onT & (a_abs >= 14) & (egsb > 0),
                        onT], 1)
    rows_k = jnp.stack([jnp.full_like(a_abs, K_CTX)] * 3
                       + [jnp.full_like(a_abs, K_BYP)] * 3, 1)
    grid.ks.append(rows_k.reshape(96, n))
    grid.as_.append(rows_a.reshape(96, n))
    grid.bs.append(rows_b.reshape(96, n))
    grid.vs.append(rows_v.reshape(96, n))


def _residual_group8_j(grid: RecordRows, scan64, on_res):
    """Blocked twin of cabac_binarize._residual_group8: cat-5 luma 8x8
    (63 sig/last rows + 64 x 6 level rows, no coded_block_flag)."""
    scan64 = jnp.asarray(scan64, jnp.int32)
    n = scan64.shape[0]
    nz = scan64 != 0
    pos = jnp.arange(64)
    last = (nz * (pos + 1)[None, :]).max(axis=1) - 1

    i_arr = np.arange(63)
    on_i = on_res[None, :] & (i_arr[:, None] <= last[None, :])
    sig = nz.T[:63]
    sig_a = jnp.broadcast_to(
        jnp.asarray(402 + np.asarray(SIG8_MAP), jnp.int32)[:, None],
        (63, n))
    last_a = jnp.broadcast_to(
        jnp.asarray(417 + np.asarray(LAST8_MAP[:63]), jnp.int32)[:, None],
        (63, n))
    is_last = (i_arr[:, None] == last[None, :])
    a_blk = jnp.stack([sig_a, last_a], 1).reshape(126, n)
    b_blk = jnp.stack([sig.astype(jnp.int32) | 2,
                       is_last.astype(jnp.int32) | 2], 1).reshape(126, n)
    v_blk = jnp.stack([on_i, on_i & sig], 1).reshape(126, n)
    grid.put_block(K_CTX, a_blk, b_blk, v_blk)

    absv = jnp.abs(scan64)
    gt1 = (absv > 1) & nz
    eq1 = (absv == 1) & nz

    def sfx(msk):
        c = jnp.cumsum(msk[:, ::-1].astype(jnp.int32), axis=1)[:, ::-1]
        return c - msk

    num_gt1 = sfx(gt1)
    num_eq1 = sfx(eq1)
    ctx0 = 426 + jnp.where(num_gt1 > 0, 0, jnp.minimum(4, 1 + num_eq1))
    ctxn = 426 + 5 + jnp.minimum(4, num_gt1)
    order = np.arange(63, -1, -1)
    onT = on_res[None, :] & nz.T[order]
    a_abs = jnp.where(onT, absv.T[order] - 1, 0)
    ctx0T = ctx0.T[order]
    ctxnT = ctxn.T[order]
    egp, egpb, egs, egsb = _eg_parts(jnp.maximum(a_abs - 14, 0), 0)
    sgn = (scan64.T[order] < 0).astype(jnp.int32)
    run_cnt = jnp.minimum(a_abs, 14) - 1
    rows_a = jnp.stack([ctx0T, ctxnT, ctxnT, egp, egs, sgn], 1)
    rows_b = jnp.stack([(a_abs > 0).astype(jnp.int32) | 2,
                        1 | (run_cnt << 1),
                        jnp.full_like(a_abs, 2),
                        egpb, egsb, jnp.ones_like(a_abs)], 1)
    rows_v = jnp.stack([onT,
                        onT & (a_abs >= 2) & (run_cnt > 0),
                        onT & (a_abs >= 1) & (a_abs < 14),
                        onT & (a_abs >= 14) & (egpb > 0),
                        onT & (a_abs >= 14) & (egsb > 0),
                        onT], 1)
    rows_k = jnp.stack([jnp.full_like(a_abs, K_CTX)] * 3
                       + [jnp.full_like(a_abs, K_BYP)] * 3, 1)
    grid.ks.append(rows_k.reshape(64 * 6, n))
    grid.as_.append(rows_a.reshape(64 * 6, n))
    grid.bs.append(rows_b.reshape(64 * 6, n))
    grid.vs.append(rows_v.reshape(64 * 6, n))


def binarize_frame_j(mb, wm: int, hm: int, slice_rows, qp: int,
                     p_slice: bool = False, b_slice: bool = False):
    """Device twin of `cabac_binarize.binarize_frame`.

    Returns (kind [S, n] int32, a, b, valid [S, n] bool,
    skipped [n] bool) — slot-major, identical record semantics/order to
    the numpy twin (tests assert record + payload equality)."""
    n = wm * hm
    sel16_raw = jnp.asarray(mb["sel16"]).astype(bool)
    t8_mode = "t8" in mb
    is_direct = jnp.zeros(n, bool)
    b_parts = b_slice and "bptype" in mb
    if b_slice:
        btype = jnp.asarray(mb["btype"], jnp.int32)
        is_inter = btype != 4
        is_direct = btype == 3
        partd = btype == 5
        use0 = jnp.asarray(mb["use0"]).astype(bool)
        use1 = jnp.asarray(mb["use1"]).astype(bool)
        if b_parts:
            bptype = jnp.asarray(mb["bptype"], jnp.int32)
            bc0 = jnp.asarray(mb["c0"], jnp.int32)
            bc1 = jnp.asarray(mb["c1"], jnp.int32)
            cu0 = jnp.asarray(np.array([1, 0, 1], np.bool_))
            cu1 = jnp.asarray(np.array([0, 1, 1], np.bool_))
            use0b = jnp.where(partd, cu0[bc1], use0)
            use1b = jnp.where(partd, cu1[bc1], use1)
            exp0 = jnp.where(partd, cu0[bc0],
                             (btype == 0) | (btype == 2))
            exp1 = jnp.where(partd, cu1[bc0],
                             (btype == 1) | (btype == 2))
            exp0b = partd & cu0[bc1]
            exp1b = partd & cu1[bc1]
        else:
            bptype = jnp.zeros(n, jnp.int32)
            exp0 = (btype == 0) | (btype == 2)
            exp1 = (btype == 1) | (btype == 2)
    else:
        is_inter = (jnp.asarray(mb["is_inter"]).astype(bool) if p_slice
                    else jnp.zeros(n, bool))
    sel16 = sel16_raw & ~is_inter
    luma_ac = jnp.asarray(mb["luma_ac"], jnp.int32)
    luma_dc = jnp.asarray(mb["luma_dc"], jnp.int32)
    chroma_dc = jnp.asarray(mb["chroma_dc"], jnp.int32)
    chroma_ac = jnp.asarray(mb["chroma_ac"], jnp.int32)
    modes = jnp.asarray(mb["modes"], jnp.int32)
    cmode = jnp.asarray(mb["cmode"], jnp.int32)
    i16mode = jnp.asarray(mb["i16mode"], jnp.int32)
    cbp_luma, cbp_chroma, cbp = _compute_cbp_j(
        sel16, luma_ac, chroma_dc, chroma_ac)

    mb_r = np.arange(n) // wm
    mb_c = np.arange(n) % wm
    is_i4 = ~sel16 & ~is_inter
    modes_grid = jnp.full((hm * 4, wm * 4), -1, jnp.int32)
    for idx, (by, bx) in enumerate(BLK_ORDER):
        modes_grid = modes_grid.at[mb_r * 4 + by, mb_c * 4 + bx].set(
            jnp.where(is_i4, modes[:, idx], -1))
    mpm = _mpm_grid_j(modes_grid, [int(r) * 4 for r in slice_rows])

    mvds = [jnp.zeros((n, 2), jnp.int32), jnp.zeros((n, 2), jnp.int32)]
    uses = [jnp.zeros(n, bool), jnp.zeros(n, bool)]
    if p_slice or b_slice:
        def list_mvd(mv, use):
            mv_map = jnp.where(use[:, None], mv, 0).reshape(hm, wm, 2)
            ref_map = jnp.where(use, 0, mvpred.INTRA).reshape(hm, wm)\
                .astype(jnp.int32)
            nbm = _neighbor_mvs_j(mv_map, ref_map, wm, hm, slice_rows)
            pred = mvpred.predict_mv_jnp(nbm["mv_a"], nbm["ref_a"],
                                         nbm["mv_b"], nbm["ref_b"],
                                         nbm["mv_c"], nbm["ref_c"])
            return mv - pred

    parts_mode = p_slice and "ptype" in mb
    p8x8_mode = parts_mode and "mvq" in mb
    ptype = jnp.zeros(n, jnp.int32)
    mvd1 = jnp.zeros((n, 2), jnp.int32)
    mvdq = None
    if p_slice:
        mv = jnp.asarray(mb["mv"], jnp.int32)
        if p8x8_mode:
            # + P_8x8 quadrants (q0/q1 merged into mvd0/mvd1)
            from .device_cavlc import _partition_mvds_j
            ptype = jnp.asarray(mb["ptype"], jnp.int32)
            mvds[0], mvd1, mvdq, _ = _partition_mvds_j(mb, wm, hm,
                                                       slice_rows)
        elif parts_mode:
            # 16x8 / 8x16 partitions: per-partition mvds from the exact
            # spec-8.4.1.3 derivation shared with the CAVLC serializer
            from .device_cavlc import _partition_mvds_j
            ptype = jnp.asarray(mb["ptype"], jnp.int32)
            mvds[0], mvd1, _ = _partition_mvds_j(mb, wm, hm, slice_rows)
        else:
            mvds[0] = list_mvd(mv, is_inter)
        uses[0] = is_inter
        mv_skip = jnp.asarray(mb["mv_skip"], jnp.int32)
        skipped = is_inter & (ptype == 0) \
            & (mv == mv_skip).all(axis=1) & (cbp == 0)
    elif b_slice:
        if b_parts:
            # per-list per-partition mvds from the exact 8.4.1.3 core
            # shared with the CAVLC serializer (channel-cell grids)
            from .device_cavlc import (_cell_grids2_j,
                                       _partition_mvds_core_j)
            bmvd = []
            for mv_key, mvb_key, u_p0, u_p1, e_p0, e_p1 in (
                    ("mv0", "mv0b", use0, use0b, exp0, exp0b),
                    ("mv1", "mv1b", use1, use1b, exp1, exp1b)):
                mv_p0 = jnp.asarray(mb[mv_key], jnp.int32)
                mv_p1 = jnp.asarray(mb[mvb_key], jnp.int32)
                tr, rtr, bl_, rbl, br, rbr = _cell_grids2_j(
                    bptype, mv_p0, mv_p1, u_p0, u_p1, is_inter, wm, hm)
                p0_ref = jnp.where(is_inter & u_p0, 0, mvpred.INTRA)\
                    .astype(jnp.int32)
                d0, d1, _ = _partition_mvds_core_j(
                    bptype, mv_p0, mv_p1, p0_ref,
                    tr, rtr, bl_, rbl, br, rbr, wm, hm, slice_rows)
                bmvd.append((jnp.where(e_p0[:, None], d0, 0),
                             jnp.where(e_p1[:, None], d1, 0)))
            mvds[0], mvds[1] = bmvd[0][0], bmvd[1][0]
        else:
            mvds[0] = jnp.where(
                exp0[:, None],
                list_mvd(jnp.asarray(mb["mv0"], jnp.int32), use0), 0)
            mvds[1] = jnp.where(
                exp1[:, None],
                list_mvd(jnp.asarray(mb["mv1"], jnp.int32), use1), 0)
        uses = [exp0, exp1]
        skipped = is_direct & (cbp == 0)
    else:
        skipped = jnp.zeros(n, bool)
    coded = ~skipped
    intra_cur = ~is_inter

    # ---- final-state neighbor grids (2D [hm, wm]) ----
    kind_g = jnp.where(skipped, K_SKIP,
                       jnp.where(is_direct, K_DIRECT,
                                 jnp.where(is_inter, K_INTER,
                                           jnp.where(sel16, K_I16, K_I4))))\
        .reshape(hm, wm)
    cbp_l_g = jnp.where(coded, cbp_luma, 0).reshape(hm, wm)
    cbp_c_g = jnp.where(coded, cbp_chroma, 0).reshape(hm, wm)
    cpm_g = jnp.where(is_i4 | sel16, cmode, 0).reshape(hm, wm)
    absmvd_gl = [
        jnp.where((uses[lx] & coded)[:, None], jnp.abs(mvds[lx]), 0)
        .reshape(hm, wm, 2) for lx in range(2)]

    av_l = np.zeros((hm, wm), dtype=bool)
    av_l[:, 1:] = True
    av_t = np.zeros((hm, wm), dtype=bool)
    av_t[1:, :] = True
    for r in slice_rows:
        av_t[int(r), :] = False
    top_mask = np.zeros((hm, 1), dtype=bool)
    top_mask[0] = True
    for r in slice_rows:
        top_mask[int(r)] = True
    top_mask = jnp.asarray(top_mask)
    av_l = jnp.asarray(av_l)
    av_t = jnp.asarray(av_t)

    def left(g, fill=0):
        return _left2(g, fill)

    def top(g, fill=0):
        return _top2(g, slice_rows, top_mask, fill)

    grid = RecordRows(n)
    ones = jnp.ones(n, bool)
    if t8_mode:
        t8v = jnp.asarray(mb["t8"]).astype(bool) & is_inter & coded \
            & (cbp_luma > 0)
        t8_g = t8v.reshape(hm, wm)
        t8_inc = ((av_l & left(t8_g)).astype(jnp.int32)
                  + (av_t & top(t8_g)).astype(jnp.int32)).reshape(n)
    else:
        t8v = jnp.zeros(n, bool)

    # ---- mb_skip_flag ----
    ns_l = (av_l & (left(kind_g, K_SKIP) != K_SKIP)).astype(jnp.int32)
    ns_t = (av_t & (top(kind_g, K_SKIP) != K_SKIP)).astype(jnp.int32)
    if p_slice:
        grid.ctx_bin((11 + ns_l + ns_t).reshape(n),
                     skipped.astype(jnp.int32), ones)
    elif b_slice:
        grid.ctx_bin((24 + ns_l + ns_t).reshape(n),
                     skipped.astype(jnp.int32), ones)

    # ---- mb_type ----
    intra_coded = coded & intra_cur
    if b_slice:
        nd_l = (av_l & (left(kind_g, K_SKIP) != K_SKIP)
                & (left(kind_g, K_SKIP) != K_DIRECT)).astype(jnp.int32)
        nd_t = (av_t & (top(kind_g, K_SKIP) != K_SKIP)
                & (top(kind_g, K_SKIP) != K_DIRECT)).astype(jnp.int32)
        inc = (nd_l + nd_t).reshape(n)
        explicit = coded & ~is_direct
        inter_exp = explicit & is_inter
        grid.ctx_bin(27 + inc, (~is_direct).astype(jnp.int32), coded)
        one_list = inter_exp & ((btype == 0) | (btype == 1))
        on11 = (btype == 2) | (btype == 5) | ~is_inter
        grid.ctx_bin(30, on11.astype(jnp.int32), explicit)
        grid.ctx_bin(32, (btype == 1).astype(jnp.int32), one_list)
        tail = explicit & on11
        if b_parts:
            from tpu264.coding.b_frame import COMBO_IDX
            mbt_part = (4 + 2 * jnp.asarray(COMBO_IDX)[bc0 * 3 + bc1]
                        + (bptype == 2).astype(jnp.int32))
            # Table 9-37 '11' suffix: Bi → 0000; intra → 1101; types
            # 4..10 → value-3; 11 → 1110; 12..21 → (v+4)//2 + 1 extra
            bits13 = jnp.where(
                partd,
                jnp.where(mbt_part <= 10, mbt_part - 3,
                          jnp.where(mbt_part == 11, 14,
                                    (mbt_part + 4) // 2)),
                jnp.where(is_inter, 0, 13))
        else:
            bits13 = jnp.where(is_inter, 0, 13)
        grid.ctx_bin(31, ((bits13 >> 3) & 1).astype(jnp.int32), tail)
        grid.ctx_bin(32, ((bits13 >> 2) & 1).astype(jnp.int32), tail)
        grid.ctx_bin(32, ((bits13 >> 1) & 1).astype(jnp.int32), tail)
        grid.ctx_bin(32, (bits13 & 1).astype(jnp.int32), tail)
        if b_parts:
            has_extra = tail & partd & (mbt_part >= 12)
            grid.ctx_bin(32, (mbt_part & 1).astype(jnp.int32), has_extra)
        first_ctx = jnp.full(n, 32, jnp.int32)
        rest = (33, 34, 34, 35, 35)
    elif p_slice:
        grid.ctx_bin(14, intra_cur.astype(jnp.int32), coded)
        inter_coded = coded & is_inter
        # Table 9-37 P prefix: '000'=16x16, '011'=16x8, '010'=8x16,
        # '001'=P_8x8 (bin2 ctx is 16 after b1=0, 17 after b1=1)
        pb1 = (ptype == 1) | (ptype == 2)
        grid.ctx_bin(15, pb1.astype(jnp.int32), inter_coded)
        grid.ctx_bin(jnp.where(pb1, 17, 16),
                     ((ptype == 1) | (ptype == 3)).astype(jnp.int32),
                     inter_coded)
        if p8x8_mode:
            # sub_mb_type x4: P_L0_8x8 = '1' (ctx 21, Table 9-38)
            on_sub = inter_coded & (ptype == 3)
            for _ in range(4):
                grid.ctx_bin(21, 1, on_sub)
        first_ctx = jnp.full(n, 17, jnp.int32)
        rest = (18, 19, 19, 20, 20)
    else:
        i16_l = (av_l & (left(kind_g, -1) == K_I16)).astype(jnp.int32)
        i16_t = (av_t & (top(kind_g, -1) == K_I16)).astype(jnp.int32)
        first_ctx = (3 + i16_l + i16_t).reshape(n)
        rest = (6, 7, 8, 9, 10)
    grid.ctx_bin(first_ctx, sel16.astype(jnp.int32), intra_coded)
    on16 = intra_coded & sel16
    grid.terminate(0, on16)
    grid.ctx_bin(rest[0], (cbp_luma > 0).astype(jnp.int32), on16)
    grid.ctx_bin(rest[1], (cbp_chroma != 0).astype(jnp.int32), on16)
    grid.ctx_bin(rest[2], (cbp_chroma - 1).clip(0).astype(jnp.int32),
                 on16 & (cbp_chroma != 0))
    grid.ctx_bin(rest[3], (i16mode >> 1).astype(jnp.int32), on16)
    grid.ctx_bin(rest[4], (i16mode & 1).astype(jnp.int32), on16)

    # ---- intra 4x4 pred modes (16 x 4 rows) ----
    on_i4 = coded & is_i4
    if t8_mode:
        grid.ctx_bin(399 + t8_inc, 0, on_i4)   # I_NxN: 4x4 transform
    for idx, (by, bx) in enumerate(BLK_ORDER):
        m = modes[:, idx]
        p = mpm[mb_r * 4 + by, mb_c * 4 + bx]
        is_mpm = m == p
        grid.ctx_bin(68, is_mpm.astype(jnp.int32), on_i4)
        rem = m - (m > p)
        onr = on_i4 & ~is_mpm
        grid.ctx_bin(69, (rem & 1).astype(jnp.int32), onr)
        grid.ctx_bin(69, ((rem >> 1) & 1).astype(jnp.int32), onr)
        grid.ctx_bin(69, ((rem >> 2) & 1).astype(jnp.int32), onr)

    # ---- intra_chroma_pred_mode ----
    cpm_l = left(kind_g, K_SKIP)
    cpm_t = top(kind_g, K_SKIP)
    nb_l = (av_l & ((cpm_l == K_I4) | (cpm_l == K_I16))
            & (left(cpm_g) != 0)).astype(jnp.int32)
    nb_t = (av_t & ((cpm_t == K_I4) | (cpm_t == K_I16))
            & (top(cpm_g) != 0)).astype(jnp.int32)
    cpm_ctx = (64 + nb_l + nb_t).reshape(n)
    grid.ctx_bin(cpm_ctx, (cmode != 0).astype(jnp.int32), intra_coded)
    grid.ctx_bin(67, (cmode > 1).astype(jnp.int32),
                 intra_coded & (cmode != 0))
    grid.ctx_bin(67, (cmode == 3).astype(jnp.int32),
                 intra_coded & (cmode > 1))

    # ---- mvd: x (comp 1, base 40) then y (comp 0, base 47); with
    # partitions part0 then part1 (7.3.5.1 order), contexts from the
    # per-partition |mvd| neighbor cells (spec 9.3.3.1.1.7) ----
    if p_slice or b_slice:
        def emit_mvd(vals, s_of_comp, on_mv):
            for comp, base in ((1, 40), (0, 47)):
                s = s_of_comp(comp)
                inc = jnp.where(s < 3, 0, jnp.where(s <= 32, 1, 2))
                a = jnp.abs(vals[:, comp])
                grid.ctx_bin(base + inc, (a > 0).astype(jnp.int32), on_mv)
                for k in (1, 2, 3):
                    grid.ctx_bin(base + k + 2, (a > k).astype(jnp.int32),
                                 on_mv & (a >= k))
                grid.ctx_run(base + 6, 1, jnp.minimum(a, 9) - 4,
                             on_mv & (a >= 5))
                grid.ctx_bin(base + 6, 0, on_mv & (a >= 4) & (a < 9))
                egp, egpb, egs, egsb = _eg_parts(jnp.maximum(a - 9, 0), 3)
                on_eg = on_mv & (a >= 9)
                grid.bypass(egp, egpb, on_eg)
                grid.bypass(egs, egsb, on_eg & (egsb > 0))
                grid.bypass((vals[:, comp] < 0).astype(jnp.int32), 1,
                            on_mv & (a > 0))

        if parts_mode:
            on0 = coded & is_inter
            on1 = on0 & (ptype > 0)
            onq = on0 & (ptype == 3)
            a0 = jnp.where(on0[:, None], jnp.abs(mvds[0]), 0)
            a1 = jnp.where(on1[:, None], jnp.abs(mvd1), 0)
            # |mvd| at the boundary 4x4 cells later partitions consult:
            # tr (row 0, right col), bl (bottom row, col 0), br (bottom
            # row, right col) — same channel semantics as the MVP maps.
            # P_8x8 quadrant cells: tr <- q1 (== mvd1 row), bl <- q2,
            # br <- q3
            tr_g = jnp.where(((ptype == 2) | (ptype == 3))[:, None],
                             a1, a0).reshape(hm, wm, 2)
            bl_cell = jnp.where((ptype == 1)[:, None], a1, a0)
            br_cell = jnp.where((ptype > 0)[:, None], a1, a0)
            if p8x8_mode:
                a2 = jnp.where(onq[:, None], jnp.abs(mvdq[:, 2]), 0)
                a3 = jnp.where(onq[:, None], jnp.abs(mvdq[:, 3]), 0)
                bl_cell = jnp.where((ptype == 3)[:, None], a2, bl_cell)
                br_cell = jnp.where((ptype == 3)[:, None], a3, br_cell)
            bl_g = bl_cell.reshape(hm, wm, 2)
            br_g = br_cell.reshape(hm, wm, 2)

            def s_p0(comp):
                # part0 top-left cell: A = left MB row-0 right cell (tr),
                # B = top MB bottom-left cell (bl)
                return (jnp.where(av_l, left(tr_g[:, :, comp]), 0)
                        + jnp.where(av_t, top(bl_g[:, :, comp]), 0))\
                    .reshape(n)

            def s_p1(comp):
                # 16x8 bottom: A = left MB rows-2/3 right cell (br),
                #              B = own part0
                # 8x16 right:  A = own part0,
                #              B = top MB bottom cell col 2 (br)
                # P_8x8 q1:    A = own q0,
                #              B = top MB bottom cell col 2 (br)
                lbr = jnp.where(av_l, left(br_g[:, :, comp]), 0)\
                    .reshape(n)
                tbr = jnp.where(av_t, top(br_g[:, :, comp]), 0)\
                    .reshape(n)
                own = a0[:, comp]
                return jnp.where(ptype == 1, lbr + own, own + tbr)

            emit_mvd(mvds[0], s_p0, on0)
            emit_mvd(mvd1, s_p1, on1)
            if p8x8_mode:
                def s_q2(comp):
                    # q2: A = left MB rows-2/3 right cell (br), B = own q0
                    lbr = jnp.where(av_l, left(br_g[:, :, comp]), 0)\
                        .reshape(n)
                    return lbr + a0[:, comp]

                def s_q3(comp):
                    # q3: A = own q2, B = own q1
                    return a2[:, comp] + a1[:, comp]

                emit_mvd(mvdq[:, 2], s_q2, onq)
                emit_mvd(mvdq[:, 3], s_q3, onq)
        elif b_parts:
            exps = ((exp0, exp0b), (exp1, exp1b))
            for lx in range(2):
                on0 = coded & exps[lx][0]
                on1 = coded & exps[lx][1] & partd
                a0 = jnp.where(on0[:, None], jnp.abs(bmvd[lx][0]), 0)
                a1 = jnp.where(on1[:, None], jnp.abs(bmvd[lx][1]), 0)
                tr_g = jnp.where((bptype == 2)[:, None], a1, a0)\
                    .reshape(hm, wm, 2)
                bl_g = jnp.where((bptype == 1)[:, None], a1, a0)\
                    .reshape(hm, wm, 2)
                br_g = jnp.where((bptype > 0)[:, None], a1, a0)\
                    .reshape(hm, wm, 2)

                def s_p0(comp, tr_g=tr_g, bl_g=bl_g):
                    return (jnp.where(av_l, left(tr_g[:, :, comp]), 0)
                            + jnp.where(av_t, top(bl_g[:, :, comp]), 0))\
                        .reshape(n)

                def s_p1(comp, br_g=br_g, a0=a0):
                    lbr = jnp.where(av_l, left(br_g[:, :, comp]), 0)\
                        .reshape(n)
                    tbr = jnp.where(av_t, top(br_g[:, :, comp]), 0)\
                        .reshape(n)
                    own = a0[:, comp]
                    return jnp.where(bptype == 1, lbr + own, own + tbr)

                emit_mvd(bmvd[lx][0], s_p0, on0)
                emit_mvd(bmvd[lx][1], s_p1, on1)
        else:
            for lx in range(2 if b_slice else 1):
                on_mv = coded & uses[lx]

                def s_mb(comp, lx=lx):
                    return (jnp.where(av_l,
                                      left(absmvd_gl[lx][:, :, comp]), 0)
                            + jnp.where(av_t,
                                        top(absmvd_gl[lx][:, :, comp]), 0))\
                        .reshape(n)

                emit_mvd(mvds[lx], s_mb, on_mv)

    # ---- coded_block_pattern ----
    on_cbp = coded & ~sel16

    def cbp_cond_l(bit):
        v = ((left(cbp_l_g) >> bit) & 1) == 0
        return jnp.where(av_l, v.astype(jnp.int32), 0)

    def cbp_cond_t(bit):
        v = ((top(cbp_l_g) >> bit) & 1) == 0
        return jnp.where(av_t, v.astype(jnp.int32), 0)

    def own(bit):
        return (((cbp >> bit) & 1) == 0).astype(jnp.int32)

    ca0, cb0 = cbp_cond_l(1).reshape(n), cbp_cond_t(2).reshape(n)
    grid.ctx_bin(73 + ca0 + 2 * cb0, (cbp >> 0) & 1, on_cbp)
    ca1, cb1 = own(0), cbp_cond_t(3).reshape(n)
    grid.ctx_bin(73 + ca1 + 2 * cb1, (cbp >> 1) & 1, on_cbp)
    ca2, cb2 = cbp_cond_l(3).reshape(n), own(0)
    grid.ctx_bin(73 + ca2 + 2 * cb2, (cbp >> 2) & 1, on_cbp)
    ca3, cb3 = own(2), own(1)
    grid.ctx_bin(73 + ca3 + 2 * cb3, (cbp >> 3) & 1, on_cbp)
    cc = cbp >> 4
    ccl = jnp.where(av_l, (left(cbp_c_g) != 0).astype(jnp.int32), 0)\
        .reshape(n)
    cct = jnp.where(av_t, (top(cbp_c_g) != 0).astype(jnp.int32), 0)\
        .reshape(n)
    grid.ctx_bin(77 + ccl + 2 * cct, (cc != 0).astype(jnp.int32), on_cbp)
    ccl2 = jnp.where(av_l, (left(cbp_c_g) == 2).astype(jnp.int32), 0)\
        .reshape(n)
    cct2 = jnp.where(av_t, (top(cbp_c_g) == 2).astype(jnp.int32), 0)\
        .reshape(n)
    grid.ctx_bin(81 + ccl2 + 2 * cct2, (cc - 1).clip(0).astype(jnp.int32),
                 on_cbp & (cc != 0))

    if t8_mode:
        grid.ctx_bin(399 + t8_inc, t8v.astype(jnp.int32),
                     coded & is_inter & (cbp_luma > 0))

    # ---- mb_qp_delta (always 0 in this encoder) ----
    grid.ctx_bin(60, 0, coded & (sel16 | (cbp > 0)))

    # ---- residual blocks ----
    ic = intra_cur.astype(jnp.int32)
    cbf_ldc = (sel16 & coded & (luma_dc != 0).any(1)).reshape(hm, wm)
    l4_i16 = (luma_ac[:, :, 1:] != 0).any(2) & (cbp_luma > 0)[:, None]
    bit_of_idx = np.arange(16) // 4
    l4_reg = (luma_ac != 0).any(2) \
        & (((cbp_luma[:, None] >> bit_of_idx[None, :]) & 1) > 0)
    l4 = jnp.where(sel16[:, None], l4_i16, l4_reg) & coded[:, None]
    if t8_mode:
        bit8 = ((cbp_luma[:, None] >> jnp.asarray(bit_of_idx)[None, :])
                & 1) > 0
        l4 = jnp.where(t8v[:, None], bit8, l4)
    cbf_l4_g = jnp.zeros((hm * 4, wm * 4), jnp.int32)
    for idx, (by, bx) in enumerate(BLK_ORDER):
        cbf_l4_g = cbf_l4_g.at[mb_r * 4 + by, mb_c * 4 + bx].set(
            l4[:, idx].astype(jnp.int32))
    cbf_cdc_g = jnp.zeros((2, hm, wm), jnp.int32)
    cbf_cac_g = jnp.zeros((2, hm * 2, wm * 2), jnp.int32)
    for comp in range(2):
        cbf_cdc_g = cbf_cdc_g.at[comp].set(
            ((chroma_dc[:, comp] != 0).any(1)
             & (cbp_chroma >= 1) & coded).reshape(hm, wm)
            .astype(jnp.int32))
        cac_nz = (chroma_ac[:, comp, :, 1:] != 0).any(2) \
            & (cbp_chroma == 2)[:, None] & coded[:, None]
        for idx in range(4):
            cbf_cac_g = cbf_cac_g.at[
                comp, mb_r * 2 + idx // 2, mb_c * 2 + idx % 2].set(
                cac_nz[:, idx].astype(jnp.int32))

    # I16 luma DC (cat 0)
    v_l = jnp.where(left(kind_g, -1) == K_I16,
                    left(cbf_ldc.astype(jnp.int32)), 0)
    v_t = jnp.where(top(kind_g, -1) == K_I16,
                    top(cbf_ldc.astype(jnp.int32)), 0)
    ca = jnp.where(av_l, v_l, 1).reshape(n)
    cb = jnp.where(av_t, v_t, 1).reshape(n)
    _residual_group_j(grid, luma_dc, 16,
                      105 + SIG_CAT_OFF[0], 166 + SIG_CAT_OFF[0],
                      227 + LVL_CAT_OFF[0],
                      85 + CBF_CAT_OFF[0] + ca + 2 * cb,
                      coded & sel16, cdc_inc=False)

    # 16 luma blocks
    sig_b = jnp.where(sel16, 105 + SIG_CAT_OFF[1], 105 + SIG_CAT_OFF[2])
    last_b = jnp.where(sel16, 166 + SIG_CAT_OFF[1], 166 + SIG_CAT_OFF[2])
    lvl_b = jnp.where(sel16, 227 + LVL_CAT_OFF[1], 227 + LVL_CAT_OFF[2])
    cbf_off = jnp.where(sel16, CBF_CAT_OFF[1], CBF_CAT_OFF[2])
    mc_l = jnp.where(sel16, 15, 16)
    lac16 = jnp.where(sel16[:, None, None],
                      jnp.concatenate([luma_ac[:, :, 1:],
                                       jnp.zeros((n, 16, 1), jnp.int32)],
                                      2),
                      luma_ac)
    av_l_flat = av_l.reshape(-1)
    av_t_flat = av_t.reshape(-1)
    for idx, (by, bx) in enumerate(BLK_ORDER):
        g4r, g4c = mb_r * 4 + by, mb_c * 4 + bx
        av_a = jnp.ones(n, bool) if bx > 0 else av_l_flat
        av_b = jnp.ones(n, bool) if by > 0 else av_t_flat
        ca = jnp.where(av_a, cbf_l4_g[g4r, np.maximum(g4c - 1, 0)], ic)
        cb = jnp.where(av_b, cbf_l4_g[np.maximum(g4r - 1, 0), g4c], ic)
        coded_blk = coded & ~t8v & (sel16 & (cbp_luma > 0)
                                    | (~sel16
                                       & ((cbp_luma >> (idx // 4))
                                          & 1 > 0)))
        _residual_group_j(grid, lac16[:, idx], mc_l, sig_b, last_b, lvl_b,
                          85 + cbf_off + ca + 2 * cb, coded_blk,
                          cdc_inc=False)

    if t8_mode:
        # cat-5 8x8 residual for transform-8x8 MBs (their 4x4 groups
        # above are invalid, so coding order stays correct)
        ps = luma_ac.reshape(n, 4, 4, 16)
        scan64 = ps.transpose(0, 1, 3, 2).reshape(n, 4, 64)
        for b8 in range(4):
            _residual_group8_j(grid, scan64[:, b8],
                               t8v & (((cbp_luma >> b8) & 1) > 0))

    # chroma DC (cat 3)
    ic2 = ic.reshape(hm, wm)
    for comp in range(2):
        v_l = jnp.where(left(cbp_c_g) != 0, left(cbf_cdc_g[comp]), 0)
        v_t = jnp.where(top(cbp_c_g) != 0, top(cbf_cdc_g[comp]), 0)
        ca = jnp.where(av_l, v_l, ic2).reshape(n)
        cb = jnp.where(av_t, v_t, ic2).reshape(n)
        cdc16 = jnp.concatenate(
            [chroma_dc[:, comp], jnp.zeros((n, 12), jnp.int32)], 1)
        _residual_group_j(grid, cdc16, 4,
                          105 + SIG_CAT_OFF[3], 166 + SIG_CAT_OFF[3],
                          227 + LVL_CAT_OFF[3],
                          85 + CBF_CAT_OFF[3] + ca + 2 * cb,
                          coded & (cbp_chroma >= 1), cdc_inc=True)

    # chroma AC (cat 4)
    for comp in range(2):
        for idx in range(4):
            by, bx = idx // 2, idx % 2
            g2r, g2c = mb_r * 2 + by, mb_c * 2 + bx
            av_a = jnp.ones(n, bool) if bx > 0 else av_l_flat
            av_b = jnp.ones(n, bool) if by > 0 else av_t_flat
            ca = jnp.where(av_a,
                           cbf_cac_g[comp, g2r, np.maximum(g2c - 1, 0)],
                           ic)
            cb = jnp.where(av_b,
                           cbf_cac_g[comp, np.maximum(g2r - 1, 0), g2c],
                           ic)
            cac16 = jnp.concatenate(
                [chroma_ac[:, comp, idx, 1:],
                 jnp.zeros((n, 1), jnp.int32)], 1)
            _residual_group_j(grid, cac16, 15,
                              105 + SIG_CAT_OFF[4], 166 + SIG_CAT_OFF[4],
                              227 + LVL_CAT_OFF[4],
                              85 + CBF_CAT_OFF[4] + ca + 2 * cb,
                              coded & (cbp_chroma == 2), cdc_inc=False)

    # ---- end_of_slice_flag ----
    rows = [int(r) for r in slice_rows] + [hm]
    is_last = np.zeros(n, bool)
    for s in range(len(rows) - 1):
        is_last[rows[s + 1] * wm - 1] = True
    grid.terminate(jnp.asarray(is_last.astype(np.int32)), ones)

    k, a, b, v = grid.stacked()
    return k, a, b, v, skipped


def pack_records(k, a, b):
    """(kind, a, b) -> one int32 per record: kind<<30 | a<<14 | b.

    Ranges (by construction of the binarizer): kind <= 2, a < 2^16
    (ctxIdx < 460 or bypass value <= 16 bits), b < 2^14 (bin|run<<1
    <= 29, or bypass nbits <= 16)."""
    return (jnp.asarray(k, jnp.int32) << 30) | (jnp.asarray(a) << 14) \
        | jnp.asarray(b)


def unpack_records_np(p):
    """Host twin: packed int32 -> (kind int8, a int32, b int32)."""
    p = np.asarray(p)
    return ((p >> 30).astype(np.int8) & 3, (p >> 14) & 0xFFFF,
            p & 0x3FFF)


def compact_slices_j(k, a, b, v, wm: int, slice_rows, hm: int, cap: int):
    """Per-slice mb-major compaction of the slot-major record grids into
    dense PACKED [n_slices, cap] int32 streams + per-slice counts for
    the Pallas engine (or the host C replay after `unpack_records_np`).
    Records beyond `cap` are dropped — callers must check counts <= cap
    (host fallback)."""
    packed = pack_records(k, a, b)
    rows = [int(r) for r in slice_rows] + [hm]
    recs, counts = [], []
    for s in range(len(rows) - 1):
        lo, hi = rows[s] * wm, rows[s + 1] * wm
        vt = v[:, lo:hi].T.reshape(-1)
        data = packed[:, lo:hi].T.reshape(-1)
        pos = jnp.cumsum(vt.astype(jnp.int32)) - 1
        pos = jnp.where(vt, pos, cap)
        rec = jnp.zeros((cap + 1,), jnp.int32)
        rec = rec.at[pos].set(data, mode="drop")
        recs.append(rec[:cap])
        counts.append(vt.sum().astype(jnp.int32))
    return jnp.stack(recs), jnp.stack(counts)
