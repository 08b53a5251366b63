"""Vectorized CABAC binarization: per-MB (ctx, bin, run) record grids.

JM interleaves binarization with the arithmetic engine per bin
(`cabac.c` writeSE -> biari_encode_symbol — SURVEY.md §3.5).  TPU-first
restructuring (BASELINE.json: "binarization + ctx-index derivation
vectorized per-MB"): every syntax element's bins and context indices are
derived for ALL macroblocks at once from the final syntax maps —
neighbor context state (cbf / cbp / mb-kind / |mvd| grids) is causal in
raster order, so shifted final grids reproduce JM's sequential state
machine exactly.  The output is a dense [n_mbs, SLOTS] record grid in
exact coding order; masking + flattening the rows of one slice yields
that slice's record stream, which a lane-serial engine (native C
`cabac_core`, or the per-slice Pallas kernel) replays into the
arithmetic coder.

Record kinds:
  K_CTX  (0): `a` = ctxIdx, `b` = bin | (run_count << 1) — run_count
              consecutive bins of the same value on the SAME context
              (TU continuation runs; state still evolves per bin).
  K_BYP  (1): `a` = value (MSB-first), `b` = nbits (<= 16).
  K_TERM (2): `a` = bin (0 = not-I_PCM / continue, 1 = end of slice).

Bit-exactness oracle: `cabac_slice.encode_frame_cabac` (per-bin host
path); tests assert byte-identical payloads per slice.
"""

from __future__ import annotations

import numpy as np

from tpu264.coding.wavefront import BLK_ORDER
from . import mb_syntax
from .cabac_ctx import (CBF_CAT_OFF, LAST8_MAP, LVL_CAT_OFF,
                        SIG8_MAP, SIG_CAT_OFF,
                        K_SKIP, K_INTER, K_I4, K_I16, K_DIRECT)

K_CTX, K_BYP, K_TERM = 0, 1, 2


class RecordGrid:
    """Preallocated [SLOTS, n] record accumulator (rows are slots so
    each append is a contiguous write; consumed slot-major)."""

    # capacity: generous upper bound on slots per MB (asserted in stack);
    # transform-8x8 MBs add a parallel cat-5 luma region (~2100 slots)
    CAP = 4200
    CAP_T8 = 6400

    def __init__(self, n: int, cap: int | None = None):
        self.n = n
        self.s = 0
        self.CAP = cap or RecordGrid.CAP
        self._k = np.zeros((self.CAP, n), np.int8)
        self._a = np.zeros((self.CAP, n), np.int32)
        self._b = np.zeros((self.CAP, n), np.int32)
        self._v = np.zeros((self.CAP, n), bool)

    def put(self, kind: int, a, b, valid):
        j = self.s
        self._k[j] = kind
        self._a[j] = a
        self._b[j] = b
        self._v[j] = valid
        self.s = j + 1

    def ctx_bin(self, ctx, binv, valid):
        self.put(K_CTX, ctx, (np.asarray(binv, np.int32) & 1) | 2, valid)

    def ctx_run(self, ctx, binv, count, valid):
        b = ((np.asarray(binv, np.int32) & 1)
             | (np.asarray(count, np.int32) << 1))
        self.put(K_CTX, ctx, b, valid & (np.asarray(count) > 0))

    def bypass(self, value, nbits, valid):
        self.put(K_BYP, value, nbits, valid & (np.asarray(nbits) > 0))

    def terminate(self, binv, valid):
        self.put(K_TERM, np.asarray(binv, np.int32), 0, valid)

    def stack(self):
        """Slot-major [S, n] views (no copy); `slice_records` gathers the
        valid records in coding (mb-major) order directly."""
        assert self.s <= self.CAP
        s = self.s
        return self._k[:s], self._a[:s], self._b[:s], self._v[:s]


def _eg_suffix(grid: RecordGrid, v, k0: int, valid):
    """Exp-Golomb order-k0 bypass escape (spec 9.3.2.3 suffix):
    m ones, a zero, then (k0 + m) value bits.  Closed form of the
    subtract loop: m = floor(log2(v / 2^k0 + 1))."""
    v = np.asarray(v, np.int64)
    t = (v >> k0) + 1                       # exact for v < 2^52
    m = np.floor(np.log2(t)).astype(np.int64)
    vv = v - (((np.int64(1) << m) - 1) << k0)
    k = k0 + m
    pre_bits = m + 1
    pre_val = ((np.int64(1) << np.minimum(m, 30)) - 1) << 1
    if valid.any():
        assert int(pre_bits[valid].max()) <= 16, "EG prefix run > 16 bits"
        assert int(k[valid].max()) <= 16, "EG value bits > 16"
    grid.bypass(pre_val, pre_bits, valid)
    grid.bypass(vv, k, valid & (k > 0))


def _left(g, fill=0):
    out = np.full_like(g, fill)
    out[:, 1:] = g[:, :-1]
    return out


def _top(g, slice_rows, fill=0):
    out = np.full_like(g, fill)
    out[1:, :] = g[:-1, :]
    for r in slice_rows:
        out[int(r), :] = fill
    return out


def _residual_group(grid: RecordGrid, scanned, mc, sig_base, last_base,
                    lvl_base, cbf_ctx, coded, cdc_inc: bool):
    """One residual block group for all MBs: cbf + sig/last map + levels.

    scanned: [n, 16] zig-zag levels, zero-padded beyond mc[i] coeffs.
    mc: [n] coeffs-in-block (4, 15 or 16). *_base: [n] or scalar ctx
    bases.  Appends a fixed 1 + 30 + 16*6 slot group.
    """
    scanned = np.asarray(scanned, np.int64)
    n = scanned.shape[0]
    nz = scanned != 0
    cbf = nz.any(axis=1)
    grid.ctx_bin(cbf_ctx, cbf.astype(np.int32), coded)
    pos = np.arange(16)
    last = np.where(cbf, (nz * (pos + 1)[None, :]).max(axis=1) - 1, -1)
    on_res = coded & cbf
    mc = np.broadcast_to(np.asarray(mc, np.int64), (n,))

    for i in range(15):
        inc = min(i, 2) if cdc_inc else i
        on = on_res & (i <= last) & (i <= mc - 2)
        sig = nz[:, i]
        grid.ctx_bin(sig_base + inc, sig.astype(np.int32), on)
        grid.ctx_bin(last_base + inc, (i == last).astype(np.int32),
                     on & sig)

    absv = np.abs(scanned)
    gt1 = (absv > 1) & nz
    eq1 = (absv == 1) & nz

    def sfx(msk):
        c = np.cumsum(msk[:, ::-1].astype(np.int64), axis=1)[:, ::-1]
        return c - msk

    num_gt1 = sfx(gt1)
    num_eq1 = sfx(eq1)
    ctx0 = lvl_base[:, None] + np.where(num_gt1 > 0, 0,
                                        np.minimum(4, 1 + num_eq1))
    ctxn = lvl_base[:, None] + 5 + np.minimum(4, num_gt1)
    for i in range(15, -1, -1):
        on = on_res & nz[:, i]
        a = np.where(on, absv[:, i] - 1, 0)
        grid.ctx_bin(ctx0[:, i], (a > 0).astype(np.int32), on)
        grid.ctx_run(ctxn[:, i], 1, np.minimum(a, 14) - 1, on & (a >= 2))
        grid.ctx_bin(ctxn[:, i], 0, on & (a >= 1) & (a < 14))
        _eg_suffix(grid, np.maximum(a - 14, 0), 0, on & (a >= 14))
        grid.bypass((scanned[:, i] < 0).astype(np.int32), 1, on)


def _residual_group8(grid: RecordGrid, scan64, on_res):
    """One cat-5 (luma 8x8) residual block for all MBs: significance
    map over 63 positions with the Table 9-43 context maps, levels on
    426+ — no coded_block_flag (presence == the cbp bit, `on_res`)."""
    scan64 = np.asarray(scan64, np.int64)
    n = scan64.shape[0]
    nz = scan64 != 0
    pos = np.arange(64)
    last = (nz * (pos + 1)[None, :]).max(axis=1) - 1   # >= 0 when on_res

    for i in range(63):
        on = on_res & (i <= last)
        sig = nz[:, i]
        grid.ctx_bin(402 + SIG8_MAP[i], sig.astype(np.int32), on)
        grid.ctx_bin(417 + LAST8_MAP[i], (i == last).astype(np.int32),
                     on & sig)

    absv = np.abs(scan64)
    gt1 = (absv > 1) & nz
    eq1 = (absv == 1) & nz

    def sfx(msk):
        c = np.cumsum(msk[:, ::-1].astype(np.int64), axis=1)[:, ::-1]
        return c - msk

    num_gt1 = sfx(gt1)
    num_eq1 = sfx(eq1)
    ctx0 = 426 + np.where(num_gt1 > 0, 0, np.minimum(4, 1 + num_eq1))
    ctxn = 426 + 5 + np.minimum(4, num_gt1)
    for i in range(63, -1, -1):
        on = on_res & nz[:, i]
        a = np.where(on, absv[:, i] - 1, 0)
        grid.ctx_bin(ctx0[:, i], (a > 0).astype(np.int32), on)
        grid.ctx_run(ctxn[:, i], 1, np.minimum(a, 14) - 1, on & (a >= 2))
        grid.ctx_bin(ctxn[:, i], 0, on & (a >= 1) & (a < 14))
        _eg_suffix(grid, np.maximum(a - 14, 0), 0, on & (a >= 14))
        grid.bypass((scan64[:, i] < 0).astype(np.int32), 1, on)


def _deinterleave_scan64(luma_ac):
    """Invert the CAVLC 8x8 interleave (spec 7.4.5.3.3): pseudo-4x4
    block i, coeff k  ->  8x8 scan position 4k + i.  luma_ac [n,16,16]
    -> scan64 [n, 4, 64] per 8x8 (raster 8x8 order = BLK_ORDER groups)."""
    n = luma_ac.shape[0]
    ps = luma_ac.reshape(n, 4, 4, 16)        # [n, n8, i, k]
    return ps.transpose(0, 1, 3, 2).reshape(n, 4, 64)


def binarize_frame(mb, wm: int, hm: int, slice_rows, qp: int,
                   p_slice: bool = False, b_slice: bool = False):
    """Vectorized twin of `cabac_slice.encode_frame_cabac` (I/P), plus
    the B-slice syntax (mb_type Table 9-37, per-list mvd) validated
    directly against libavcodec.

    Returns (kind [n,S] int8, a [n,S] int32, b [n,S] int32,
    valid [n,S] bool, skipped [n] bool).
    """
    n = wm * hm
    sel16_raw = np.asarray(mb["sel16"]).astype(bool)
    t8_mode = "t8" in mb
    is_direct = np.zeros(n, bool)
    b_parts = b_slice and "bptype" in mb
    if b_slice:
        btype = np.asarray(mb["btype"], np.int64)
        is_inter = btype != 4
        is_direct = btype == 3
        partd = btype == 5
        use0 = np.asarray(mb["use0"]).astype(bool)   # final (incl. direct)
        use1 = np.asarray(mb["use1"]).astype(bool)
        if b_parts:
            bptype = np.asarray(mb["bptype"], np.int64)
            bc0 = np.asarray(mb["c0"], np.int64)
            bc1 = np.asarray(mb["c1"], np.int64)
            cu0 = np.array([1, 0, 1], bool)
            cu1 = np.array([0, 1, 1], bool)
            use0b = np.where(partd, cu0[bc1], use0)
            use1b = np.where(partd, cu1[bc1], use1)
            exp0 = np.where(partd, cu0[bc0],
                            (btype == 0) | (btype == 2))
            exp1 = np.where(partd, cu1[bc0],
                            (btype == 1) | (btype == 2))
            exp0b = partd & cu0[bc1]
            exp1b = partd & cu1[bc1]
        else:
            bptype = np.zeros(n, np.int64)
            exp0 = (btype == 0) | (btype == 2)       # explicit-mvd lists
            exp1 = (btype == 1) | (btype == 2)
    else:
        is_inter = (np.asarray(mb["is_inter"]).astype(bool) if p_slice
                    else np.zeros(n, bool))
    sel16 = sel16_raw & ~is_inter
    luma_ac = np.asarray(mb["luma_ac"], np.int64)
    luma_dc = np.asarray(mb["luma_dc"], np.int64)
    chroma_dc = np.asarray(mb["chroma_dc"], np.int64)
    chroma_ac = np.asarray(mb["chroma_ac"], np.int64)
    modes = np.asarray(mb["modes"], np.int64)
    cmode = np.asarray(mb["cmode"], np.int64)
    i16mode = np.asarray(mb["i16mode"], np.int64)
    cbp_luma, cbp_chroma, cbp = mb_syntax.compute_cbp(
        sel16, luma_ac, chroma_dc, chroma_ac)

    mb_r = np.arange(n) // wm
    mb_c = np.arange(n) % wm
    is_i4 = ~sel16 & ~is_inter
    modes_grid = np.full((hm * 4, wm * 4), -1, dtype=np.int64)
    for idx, (by, bx) in enumerate(BLK_ORDER):
        modes_grid[mb_r * 4 + by, mb_c * 4 + bx] = np.where(
            is_i4, modes[:, idx], -1)
    mpm = mb_syntax.mpm_grid(modes_grid, [int(r) * 4 for r in slice_rows])

    mvds = [np.zeros((n, 2), np.int64), np.zeros((n, 2), np.int64)]
    uses = [np.zeros(n, bool), np.zeros(n, bool)]
    if p_slice or b_slice:
        from tpu264.coding import mvpred

        def list_mvd(mv, use):
            mv_map = np.where(use[:, None], mv, 0).reshape(hm, wm, 2)
            ref_map = np.where(use, 0, mvpred.INTRA).reshape(hm, wm)
            nbm = mvpred.neighbor_mvs_np(mv_map, ref_map, wm, hm,
                                         slice_rows)
            pred = mvpred.predict_mv_np(nbm["mv_a"], nbm["ref_a"],
                                        nbm["mv_b"], nbm["ref_b"],
                                        nbm["mv_c"], nbm["ref_c"])
            return mv - pred

    parts_mode = p_slice and "ptype" in mb
    p8x8_mode = parts_mode and "mvq" in mb
    ptype = np.zeros(n, np.int64)
    mvd1 = np.zeros((n, 2), np.int64)
    mvdq = None
    if p_slice:
        mv = np.asarray(mb["mv"], np.int64)
        if p8x8_mode:
            # + P_8x8 quadrants (q0/q1 merged into mvd0/mvd1)
            from .device_cavlc import _partition_mvds_j
            ptype = np.asarray(mb["ptype"], np.int64)
            d0, d1, dq, _ = _partition_mvds_j(mb, wm, hm, slice_rows)
            mvds[0] = np.asarray(d0, np.int64)
            mvd1 = np.asarray(d1, np.int64)
            mvdq = np.asarray(dq, np.int64)
        elif parts_mode:
            # 16x8 / 8x16 partitions: per-partition mvds from the exact
            # spec-8.4.1.3 derivation shared with the CAVLC serializer
            # (single source of truth; jnp runs fine on host arrays)
            from .device_cavlc import _partition_mvds_j
            ptype = np.asarray(mb["ptype"], np.int64)
            d0, d1, _ = _partition_mvds_j(mb, wm, hm, slice_rows)
            mvds[0] = np.asarray(d0, np.int64)
            mvd1 = np.asarray(d1, np.int64)
        else:
            mvds[0] = list_mvd(mv, is_inter)
        uses[0] = is_inter
        mv_skip = np.asarray(mb["mv_skip"], np.int64)
        skipped = is_inter & (ptype == 0) \
            & (mv == mv_skip).all(axis=1) & (cbp == 0)
    elif b_slice:
        # predictor maps use the FINAL use flags / motion (direct MBs
        # participate as neighbors); mvd is coded for explicit lists only
        if b_parts:
            from .device_cavlc import (_cell_grids2_j,
                                       _partition_mvds_core_j)
            bmvd = []
            for mv_key, mvb_key, u_p0, u_p1, e_p0, e_p1 in (
                    ("mv0", "mv0b", use0, use0b, exp0, exp0b),
                    ("mv1", "mv1b", use1, use1b, exp1, exp1b)):
                mv_p0 = np.asarray(mb[mv_key], np.int64)
                mv_p1 = np.asarray(mb[mvb_key], np.int64)
                tr, rtr, bl_, rbl, br, rbr = _cell_grids2_j(
                    bptype, mv_p0, mv_p1, u_p0, u_p1, is_inter, wm, hm)
                p0_ref = np.where(is_inter & u_p0, 0, mvpred.INTRA)
                d0, d1, _ = _partition_mvds_core_j(
                    bptype, mv_p0, mv_p1, p0_ref,
                    tr, rtr, bl_, rbl, br, rbr, wm, hm, slice_rows)
                d0 = np.asarray(d0, np.int64)
                d1 = np.asarray(d1, np.int64)
                bmvd.append((np.where(e_p0[:, None], d0, 0),
                             np.where(e_p1[:, None], d1, 0)))
            mvds[0], mvds[1] = bmvd[0][0], bmvd[1][0]
        else:
            mvds[0] = np.where(
                exp0[:, None],
                list_mvd(np.asarray(mb["mv0"], np.int64), use0), 0)
            mvds[1] = np.where(
                exp1[:, None],
                list_mvd(np.asarray(mb["mv1"], np.int64), use1), 0)
        uses = [exp0, exp1]
        skipped = is_direct & (cbp == 0)
    else:
        skipped = np.zeros(n, bool)
    mvd = mvds[0]
    coded = ~skipped
    intra_cur = ~is_inter

    # ---- final-state neighbor grids (2D [hm, wm]) ----
    kind_g = np.where(skipped, K_SKIP,
                      np.where(is_direct, K_DIRECT,
                               np.where(is_inter, K_INTER,
                                        np.where(sel16, K_I16, K_I4)))) \
        .reshape(hm, wm)
    cbp_l_g = np.where(coded, cbp_luma, 0).reshape(hm, wm)
    cbp_c_g = np.where(coded, cbp_chroma, 0).reshape(hm, wm)
    cpm_g = np.where(is_i4 | sel16, cmode, 0).reshape(hm, wm)
    absmvd_gl = [
        np.where((uses[lx] & coded)[:, None], np.abs(mvds[lx]), 0)
        .reshape(hm, wm, 2) for lx in range(2)]
    absmvd_g = absmvd_gl[0]

    av_l = np.zeros((hm, wm), bool)
    av_l[:, 1:] = True
    av_t = np.zeros((hm, wm), bool)
    av_t[1:, :] = True
    for r in slice_rows:
        av_t[int(r), :] = False

    def left(g, fill=0):
        return _left(g, fill)

    def top(g, fill=0):
        return _top(g, slice_rows, fill)

    grid = RecordGrid(n, cap=RecordGrid.CAP_T8 if t8_mode else None)
    if t8_mode:
        t8v = np.asarray(mb["t8"]).astype(bool) & is_inter & coded \
            & (cbp_luma > 0)
        t8_g = t8v.reshape(hm, wm)
        t8_inc = ((av_l & left(t8_g)).astype(np.int32)
                  + (av_t & top(t8_g)).astype(np.int32)).reshape(n)
    else:
        t8v = np.zeros(n, bool)

    # ---- mb_skip_flag (P/B slices: every MB) ----
    ns_l = (av_l & (left(kind_g, K_SKIP) != K_SKIP)).astype(np.int32)
    ns_t = (av_t & (top(kind_g, K_SKIP) != K_SKIP)).astype(np.int32)
    if p_slice:
        grid.ctx_bin((11 + ns_l + ns_t).reshape(n),
                     skipped.astype(np.int32), np.ones(n, bool))
    elif b_slice:
        grid.ctx_bin((24 + ns_l + ns_t).reshape(n),
                     skipped.astype(np.int32), np.ones(n, bool))

    # ---- mb_type ----
    intra_coded = coded & intra_cur
    if b_slice:
        # Table 9-37: bin0 ctx 27+inc (neighbor coded non-direct/skip);
        # Direct='0'; L0='100', L1='101' (ctx 30, 32), Bi='11'+0000
        # (ctx 30,31,32x3), intra prefix '11'+1101 then the I tree on
        # ctx 32/33/34/35
        nd_l = (av_l & (left(kind_g, K_SKIP) != K_SKIP)
                & (left(kind_g, K_SKIP) != K_DIRECT)).astype(np.int32)
        nd_t = (av_t & (top(kind_g, K_SKIP) != K_SKIP)
                & (top(kind_g, K_SKIP) != K_DIRECT)).astype(np.int32)
        inc = (nd_l + nd_t).reshape(n)
        explicit = coded & ~is_direct
        inter_exp = explicit & is_inter
        grid.ctx_bin(27 + inc, (~is_direct).astype(np.int32), coded)
        one_list = inter_exp & ((btype == 0) | (btype == 1))
        on11 = (btype == 2) | (btype == 5) | ~is_inter
        grid.ctx_bin(30, on11.astype(np.int32), explicit)
        grid.ctx_bin(32, (btype == 1).astype(np.int32), one_list)
        tail = explicit & on11                        # 4-bin suffix
        if b_parts:
            from tpu264.coding.b_frame import COMBO_IDX
            mbt_part = (4 + 2 * COMBO_IDX[(bc0 * 3 + bc1).astype(int)]
                        + (bptype == 2).astype(np.int64))
            # Table 9-37 '11' suffix: Bi → 0000; intra → 1101; types
            # 4..10 → value-3; 11 → 1110; 12..21 → (v+4)//2 + 1 extra
            bits13 = np.where(
                partd,
                np.where(mbt_part <= 10, mbt_part - 3,
                         np.where(mbt_part == 11, 14,
                                  (mbt_part + 4) // 2)),
                np.where(is_inter, 0, 13))
        else:
            bits13 = np.where(is_inter, 0, 13)        # Bi -> 0, intra -> 13
        grid.ctx_bin(31, ((bits13 >> 3) & 1).astype(np.int32), tail)
        grid.ctx_bin(32, ((bits13 >> 2) & 1).astype(np.int32), tail)
        grid.ctx_bin(32, ((bits13 >> 1) & 1).astype(np.int32), tail)
        grid.ctx_bin(32, (bits13 & 1).astype(np.int32), tail)
        if b_parts:
            has_extra = tail & partd & (mbt_part >= 12)
            grid.ctx_bin(32, (mbt_part & 1).astype(np.int32), has_extra)
        first_ctx = np.full(n, 32, np.int32)
        rest = (33, 34, 34, 35, 35)
    elif p_slice:
        grid.ctx_bin(14, intra_cur.astype(np.int32), coded)
        inter_coded = coded & is_inter
        # Table 9-37 P prefix: '000'=16x16, '011'=16x8, '010'=8x16,
        # '001'=P_8x8 (bin2 ctx is 16 after b1=0, 17 after b1=1)
        pb1 = (ptype == 1) | (ptype == 2)
        grid.ctx_bin(15, pb1.astype(np.int32), inter_coded)
        grid.ctx_bin(np.where(pb1, 17, 16),
                     ((ptype == 1) | (ptype == 3)).astype(np.int32),
                     inter_coded)
        if p8x8_mode:
            # sub_mb_type x4: P_L0_8x8 = '1' (ctx 21, Table 9-38)
            on_sub = inter_coded & (ptype == 3)
            for _ in range(4):
                grid.ctx_bin(21, 1, on_sub)
        first_ctx = np.full(n, 17, np.int32)
        rest = (18, 19, 19, 20, 20)
    else:
        i16_l = (av_l & (left(kind_g, -1) == K_I16)).astype(np.int32)
        i16_t = (av_t & (top(kind_g, -1) == K_I16)).astype(np.int32)
        first_ctx = (3 + i16_l + i16_t).reshape(n)
        rest = (6, 7, 8, 9, 10)
    grid.ctx_bin(first_ctx, sel16.astype(np.int32), intra_coded)
    on16 = intra_coded & sel16
    grid.terminate(0, on16)                   # not I_PCM
    grid.ctx_bin(rest[0], (cbp_luma > 0).astype(np.int32), on16)
    grid.ctx_bin(rest[1], (cbp_chroma != 0).astype(np.int32), on16)
    grid.ctx_bin(rest[2], (cbp_chroma - 1).clip(0).astype(np.int32),
                 on16 & (cbp_chroma != 0))
    grid.ctx_bin(rest[3], (i16mode >> 1).astype(np.int32), on16)
    grid.ctx_bin(rest[4], (i16mode & 1).astype(np.int32), on16)

    # ---- intra 4x4 pred modes ----
    on_i4 = coded & is_i4
    if t8_mode:
        # transform_size_8x8_flag = 0 for I_NxN MBs (spec 7.3.5: the
        # flag precedes the intra pred modes)
        grid.ctx_bin(399 + t8_inc, 0, on_i4)
    for idx, (by, bx) in enumerate(BLK_ORDER):
        m = modes[:, idx]
        p = mpm[mb_r * 4 + by, mb_c * 4 + bx]
        is_mpm = m == p
        grid.ctx_bin(68, is_mpm.astype(np.int32), on_i4)
        rem = (m - (m > p)).astype(np.int64)
        onr = on_i4 & ~is_mpm
        grid.ctx_bin(69, (rem & 1).astype(np.int32), onr)
        grid.ctx_bin(69, ((rem >> 1) & 1).astype(np.int32), onr)
        grid.ctx_bin(69, ((rem >> 2) & 1).astype(np.int32), onr)

    # ---- intra_chroma_pred_mode (TU cMax=3) ----
    nb_l = (av_l & (left(kind_g, K_SKIP) >= K_I4)
            & (left(cpm_g) != 0)).astype(np.int32)
    nb_t = (av_t & (top(kind_g, K_SKIP) >= K_I4)
            & (top(cpm_g) != 0)).astype(np.int32)
    cpm_ctx = (64 + nb_l + nb_t).reshape(n)
    grid.ctx_bin(cpm_ctx, (cmode != 0).astype(np.int32), intra_coded)
    grid.ctx_bin(67, (cmode > 1).astype(np.int32),
                 intra_coded & (cmode != 0))
    grid.ctx_bin(67, (cmode == 3).astype(np.int32),
                 intra_coded & (cmode > 1))

    # ---- mvd: x (comp 1, base 40) then y (comp 0, base 47); with
    # partitions part0 then part1 (7.3.5.1 order), contexts from the
    # per-partition |mvd| neighbor cells (spec 9.3.3.1.1.7) ----
    if p_slice or b_slice:
        def emit_mvd(vals, s_of_comp, on_mv):
            for comp, base in ((1, 40), (0, 47)):
                s = s_of_comp(comp)
                inc = np.where(s < 3, 0, np.where(s <= 32, 1, 2))
                a = np.abs(vals[:, comp])
                grid.ctx_bin(base + inc, (a > 0).astype(np.int32), on_mv)
                for k in (1, 2, 3):
                    grid.ctx_bin(base + k + 2, (a > k).astype(np.int32),
                                 on_mv & (a >= k))
                grid.ctx_run(base + 6, 1, np.minimum(a, 9) - 4,
                             on_mv & (a >= 5))
                grid.ctx_bin(base + 6, 0, on_mv & (a >= 4) & (a < 9))
                _eg_suffix(grid, np.maximum(a - 9, 0), 3,
                           on_mv & (a >= 9))
                grid.bypass((vals[:, comp] < 0).astype(np.int32), 1,
                            on_mv & (a > 0))

        if parts_mode:
            on0 = coded & is_inter
            on1 = on0 & (ptype > 0)
            onq = on0 & (ptype == 3)
            a0 = np.where(on0[:, None], np.abs(mvds[0]), 0)
            a1 = np.where(on1[:, None], np.abs(mvd1), 0)
            # |mvd| at the boundary 4x4 cells later partitions consult:
            # tr (row 0, right col), bl (bottom row, col 0), br (bottom
            # row, right col) — same channel semantics as the MVP maps.
            # P_8x8 quadrant cells: tr <- q1 (== mvd1 row), bl <- q2,
            # br <- q3
            tr_g = np.where(((ptype == 2) | (ptype == 3))[:, None],
                            a1, a0).reshape(hm, wm, 2)
            bl_cell = np.where((ptype == 1)[:, None], a1, a0)
            br_cell = np.where((ptype > 0)[:, None], a1, a0)
            if p8x8_mode:
                a2 = np.where(onq[:, None], np.abs(mvdq[:, 2]), 0)
                a3 = np.where(onq[:, None], np.abs(mvdq[:, 3]), 0)
                bl_cell = np.where((ptype == 3)[:, None], a2, bl_cell)
                br_cell = np.where((ptype == 3)[:, None], a3, br_cell)
            bl_g = bl_cell.reshape(hm, wm, 2)
            br_g = br_cell.reshape(hm, wm, 2)

            def s_p0(comp):
                # part0 top-left cell: A = left MB row-0 right cell (tr),
                # B = top MB bottom-left cell (bl)
                return (np.where(av_l, left(tr_g[:, :, comp]), 0)
                        + np.where(av_t, top(bl_g[:, :, comp]), 0))\
                    .reshape(n)

            def s_p1(comp):
                # 16x8 bottom: A = left MB rows-2/3 right cell (br),
                #              B = own part0
                # 8x16 right:  A = own part0,
                #              B = top MB bottom cell col 2 (br)
                # P_8x8 q1:    A = own q0,
                #              B = top MB bottom cell col 2 (br)
                lbr = np.where(av_l, left(br_g[:, :, comp]), 0)\
                    .reshape(n)
                tbr = np.where(av_t, top(br_g[:, :, comp]), 0)\
                    .reshape(n)
                own = a0[:, comp]
                return np.where(ptype == 1, lbr + own, own + tbr)

            emit_mvd(mvds[0], s_p0, on0)
            emit_mvd(mvd1, s_p1, on1)
            if p8x8_mode:
                def s_q2(comp):
                    # q2: A = left MB rows-2/3 right cell (br), B = own q0
                    lbr = np.where(av_l, left(br_g[:, :, comp]), 0)\
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
                a0 = np.where(on0[:, None], np.abs(bmvd[lx][0]), 0)
                a1 = np.where(on1[:, None], np.abs(bmvd[lx][1]), 0)
                tr_g = np.where((bptype == 2)[:, None], a1, a0)\
                    .reshape(hm, wm, 2)
                bl_g = np.where((bptype == 1)[:, None], a1, a0)\
                    .reshape(hm, wm, 2)
                br_g = np.where((bptype > 0)[:, None], a1, a0)\
                    .reshape(hm, wm, 2)

                def s_p0(comp, tr_g=tr_g, bl_g=bl_g):
                    return (np.where(av_l, left(tr_g[:, :, comp]), 0)
                            + np.where(av_t, top(bl_g[:, :, comp]), 0))\
                        .reshape(n)

                def s_p1(comp, br_g=br_g, a0=a0):
                    lbr = np.where(av_l, left(br_g[:, :, comp]), 0)\
                        .reshape(n)
                    tbr = np.where(av_t, top(br_g[:, :, comp]), 0)\
                        .reshape(n)
                    own = a0[:, comp]
                    return np.where(bptype == 1, lbr + own, own + tbr)

                emit_mvd(bmvd[lx][0], s_p0, on0)
                emit_mvd(bmvd[lx][1], s_p1, on1)
        else:
            for lx in range(2 if b_slice else 1):
                on_mv = coded & uses[lx]

                def s_mb(comp, lx=lx):
                    return (np.where(av_l,
                                     left(absmvd_gl[lx][:, :, comp]), 0)
                            + np.where(av_t,
                                       top(absmvd_gl[lx][:, :, comp]), 0))\
                        .reshape(n)

                emit_mvd(mvds[lx], s_mb, on_mv)

    # ---- coded_block_pattern (kind != I16) ----
    on_cbp = coded & ~sel16
    skip_g = kind_g == K_SKIP

    def cbp_cond_l(bit):
        # skip neighbors have cbp 0 in the grid -> condTermFlag 1 (matches
        # the host state machine's explicit K_SKIP branch)
        v = ((left(cbp_l_g) >> bit) & 1) == 0
        return np.where(av_l, v.astype(np.int32), 0)

    def cbp_cond_t(bit):
        v = ((top(cbp_l_g) >> bit) & 1) == 0
        return np.where(av_t, v.astype(np.int32), 0)

    own = lambda bit: (((cbp >> bit) & 1) == 0).astype(np.int32)
    ca0, cb0 = cbp_cond_l(1).reshape(n), cbp_cond_t(2).reshape(n)
    grid.ctx_bin(73 + ca0 + 2 * cb0, (cbp >> 0) & 1, on_cbp)
    ca1, cb1 = own(0), cbp_cond_t(3).reshape(n)
    grid.ctx_bin(73 + ca1 + 2 * cb1, (cbp >> 1) & 1, on_cbp)
    ca2, cb2 = cbp_cond_l(3).reshape(n), own(0)
    grid.ctx_bin(73 + ca2 + 2 * cb2, (cbp >> 2) & 1, on_cbp)
    ca3, cb3 = own(2), own(1)
    grid.ctx_bin(73 + ca3 + 2 * cb3, (cbp >> 3) & 1, on_cbp)
    cc = cbp >> 4
    ccl = np.where(av_l, (left(cbp_c_g) != 0).astype(np.int32), 0).reshape(n)
    cct = np.where(av_t, (top(cbp_c_g) != 0).astype(np.int32), 0).reshape(n)
    grid.ctx_bin(77 + ccl + 2 * cct, (cc != 0).astype(np.int32), on_cbp)
    ccl2 = np.where(av_l, (left(cbp_c_g) == 2).astype(np.int32), 0)\
        .reshape(n)
    cct2 = np.where(av_t, (top(cbp_c_g) == 2).astype(np.int32), 0)\
        .reshape(n)
    grid.ctx_bin(81 + ccl2 + 2 * cct2, (cc - 1).clip(0).astype(np.int32),
                 on_cbp & (cc != 0))

    if t8_mode:
        # transform_size_8x8_flag after cbp for inter MBs with luma
        # residual (our t8 selection covers 16x16 MBs only, but the
        # flag is present for any qualifying inter MB)
        grid.ctx_bin(399 + t8_inc, t8v.astype(np.int32),
                     coded & is_inter & (cbp_luma > 0))

    # ---- mb_qp_delta (always 0 in this encoder; prev_nz stays 0) ----
    grid.ctx_bin(60, 0, coded & (sel16 | (cbp > 0)))

    # ---- residual blocks ----
    ic = intra_cur.astype(np.int32)

    # cbf value grids (final state)
    cbf_ldc = (sel16 & coded & (luma_dc != 0).any(1)).reshape(hm, wm)
    l4_i16 = (luma_ac[:, :, 1:] != 0).any(2) & (cbp_luma > 0)[:, None]
    bit_of_idx = np.arange(16) // 4
    l4_reg = (luma_ac != 0).any(2) \
        & (((cbp_luma[:, None] >> bit_of_idx[None, :]) & 1) > 0)
    l4 = np.where(sel16[:, None], l4_i16, l4_reg) & coded[:, None]
    if t8_mode:
        bit8 = ((cbp_luma[:, None] >> (np.arange(16) // 4)[None, :])
                & 1) > 0
        l4 = np.where(t8v[:, None], bit8, l4)
    cbf_l4_g = np.zeros((hm * 4, wm * 4), np.int32)
    for idx, (by, bx) in enumerate(BLK_ORDER):
        cbf_l4_g[mb_r * 4 + by, mb_c * 4 + bx] = l4[:, idx]
    cbf_cdc_g = np.zeros((2, hm, wm), np.int32)
    cbf_cac_g = np.zeros((2, hm * 2, wm * 2), np.int32)
    for comp in range(2):
        cbf_cdc_g[comp] = ((chroma_dc[:, comp] != 0).any(1)
                           & (cbp_chroma >= 1) & coded).reshape(hm, wm)
        cac_nz = (chroma_ac[:, comp, :, 1:] != 0).any(2) \
            & (cbp_chroma == 2)[:, None] & coded[:, None]
        for idx in range(4):
            cbf_cac_g[comp, mb_r * 2 + idx // 2, mb_c * 2 + idx % 2] = \
                cac_nz[:, idx]

    # I16 luma DC (cat 0)
    v_l = np.where(left(kind_g, -1) == K_I16, left(cbf_ldc.astype(np.int32)),
                   0)
    v_t = np.where(top(kind_g, -1) == K_I16, top(cbf_ldc.astype(np.int32)),
                   0)
    ca = np.where(av_l, v_l, 1).reshape(n)    # cur MB is I16 => intra
    cb = np.where(av_t, v_t, 1).reshape(n)
    _residual_group(grid, luma_dc, 16,
                    np.full(n, 105 + SIG_CAT_OFF[0]),
                    np.full(n, 166 + SIG_CAT_OFF[0]),
                    np.full(n, 227 + LVL_CAT_OFF[0]),
                    85 + CBF_CAT_OFF[0] + ca + 2 * cb,
                    coded & sel16, cdc_inc=False)

    # 16 luma blocks: I16-AC (cat 1, 15 coeffs) vs 4x4 (cat 2, 16 coeffs)
    sig_b = np.where(sel16, 105 + SIG_CAT_OFF[1], 105 + SIG_CAT_OFF[2])
    last_b = np.where(sel16, 166 + SIG_CAT_OFF[1], 166 + SIG_CAT_OFF[2])
    lvl_b = np.where(sel16, 227 + LVL_CAT_OFF[1], 227 + LVL_CAT_OFF[2])
    cbf_off = np.where(sel16, CBF_CAT_OFF[1], CBF_CAT_OFF[2])
    mc_l = np.where(sel16, 15, 16)
    lac16 = np.where(sel16[:, None, None],
                     np.concatenate([luma_ac[:, :, 1:],
                                     np.zeros((n, 16, 1), np.int64)], 2),
                     luma_ac)
    for idx, (by, bx) in enumerate(BLK_ORDER):
        g4r, g4c = mb_r * 4 + by, mb_c * 4 + bx
        if bx > 0:
            av_a = np.ones(n, bool)
        else:
            av_a = av_l.reshape(-1)[mb_r * wm + mb_c]
        if by > 0:
            av_b = np.ones(n, bool)
        else:
            av_b = av_t.reshape(-1)[mb_r * wm + mb_c]
        ca = np.where(av_a, cbf_l4_g[g4r, np.maximum(g4c - 1, 0)], ic)
        cb = np.where(av_b, cbf_l4_g[np.maximum(g4r - 1, 0), g4c], ic)
        coded_blk = coded & ~t8v & (
            sel16 & (cbp_luma > 0)
            | (~sel16 & ((cbp_luma >> (idx // 4)) & 1 > 0)))
        _residual_group(grid, lac16[:, idx], mc_l, sig_b, last_b, lvl_b,
                        85 + cbf_off + ca + 2 * cb, coded_blk,
                        cdc_inc=False)

    if t8_mode:
        # cat-5 8x8 residual for transform-8x8 MBs (their 4x4 groups
        # above are invalid, so coding order stays correct)
        scan64 = _deinterleave_scan64(luma_ac)
        for b8 in range(4):
            _residual_group8(grid, scan64[:, b8],
                             t8v & (((cbp_luma >> b8) & 1) > 0))

    # chroma DC (cat 3, 4 coeffs)
    for comp in range(2):
        v_l = np.where(left(cbp_c_g) != 0, left(cbf_cdc_g[comp]), 0)
        v_t = np.where(top(cbp_c_g) != 0, top(cbf_cdc_g[comp]), 0)
        ca = np.where(av_l, v_l, ic.reshape(hm, wm)).reshape(n)
        cb = np.where(av_t, v_t, ic.reshape(hm, wm)).reshape(n)
        cdc16 = np.concatenate(
            [chroma_dc[:, comp], np.zeros((n, 12), np.int64)], 1)
        _residual_group(grid, cdc16, 4,
                        np.full(n, 105 + SIG_CAT_OFF[3]),
                        np.full(n, 166 + SIG_CAT_OFF[3]),
                        np.full(n, 227 + LVL_CAT_OFF[3]),
                        85 + CBF_CAT_OFF[3] + ca + 2 * cb,
                        coded & (cbp_chroma >= 1), cdc_inc=True)

    # chroma AC (cat 4, 15 coeffs, 2x2 grid neighbors)
    for comp in range(2):
        for idx in range(4):
            by, bx = idx // 2, idx % 2
            g2r, g2c = mb_r * 2 + by, mb_c * 2 + bx
            if bx > 0:
                av_a = np.ones(n, bool)
            else:
                av_a = av_l.reshape(-1)[mb_r * wm + mb_c]
            if by > 0:
                av_b = np.ones(n, bool)
            else:
                av_b = av_t.reshape(-1)[mb_r * wm + mb_c]
            ca = np.where(av_a, cbf_cac_g[comp, g2r, np.maximum(g2c - 1, 0)],
                          ic)
            cb = np.where(av_b, cbf_cac_g[comp, np.maximum(g2r - 1, 0), g2c],
                          ic)
            cac16 = np.concatenate(
                [chroma_ac[:, comp, idx, 1:], np.zeros((n, 1), np.int64)], 1)
            _residual_group(grid, cac16, 15,
                            np.full(n, 105 + SIG_CAT_OFF[4]),
                            np.full(n, 166 + SIG_CAT_OFF[4]),
                            np.full(n, 227 + LVL_CAT_OFF[4]),
                            85 + CBF_CAT_OFF[4] + ca + 2 * cb,
                            coded & (cbp_chroma == 2), cdc_inc=False)

    # ---- end_of_slice_flag ----
    rows = [int(r) for r in slice_rows] + [hm]
    is_last = np.zeros(n, bool)
    for s in range(len(rows) - 1):
        is_last[rows[s + 1] * wm - 1] = True
    grid.terminate(is_last.astype(np.int32), np.ones(n, bool))

    k, a, b, v = grid.stack()
    return k, a, b, v, skipped


def slice_records(k, a, b, v, wm: int, first_row: int, last_row: int):
    """Gather one slice's valid records in coding order (mb-major, slot-
    minor) from the slot-major [S, n] grids.

    One bool transpose + nonzero gives the mb-major order directly —
    ~10x cheaper than the previous [S, n] int32 rank cumsum (the bool
    mask is 1/4 the bytes and nonzero is a single scan)."""
    lo, hi = first_row * wm, last_row * wm
    vt = np.ascontiguousarray(v[:, lo:hi].T)          # [n_slice, S]
    c_idx, s_idx = np.nonzero(vt)                     # mb-major order
    col = lo + c_idx
    return k[s_idx, col], a[s_idx, col], b[s_idx, col]
