"""In-loop deblocking filter — scalar reference (spec 8.7; JM
`loopFilter.c` — SURVEY.md §2a #16).

Operates in place on int64 planes, MB by MB in raster order: per MB all
vertical edges left→right then all horizontal edges top→bottom, each edge
filtering already-filtered samples — the normative sequential semantics
the wavefront kernel must reproduce bit-exactly.

Boundary strength (spec 8.7.2.1, frame/progressive subset):
  4 : MB edge and either side intra
  3 : internal edge and either side intra
  2 : either 4x4 block has nonzero coefficients
  1 : reference mismatch or |mv delta| >= 4 quarter-pel
  0 : none — edge unfiltered
"""

from __future__ import annotations

import numpy as np

# normative threshold tables (spec Tables 8-16/8-17), indexed by indexA/B
ALPHA_TABLE = np.array(
    [0] * 16 + [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
                32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144,
                162, 182, 203, 226, 255, 255], dtype=np.int64)
BETA_TABLE = np.array(
    [0] * 16 + [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10,
                10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17,
                18, 18], dtype=np.int64)
# TC0_TABLE[indexA][bS-1] for bS 1..3
TC0_TABLE = np.array(
    [[0, 0, 0]] * 17
    + [[0, 0, 1]] * 4 + [[0, 1, 1]] * 2 + [[1, 1, 1]] * 4
    + [[1, 1, 2]] * 4 + [[1, 2, 3]] * 2 + [[2, 2, 3]] + [[2, 2, 4]]
    + [[2, 3, 4]] * 2 + [[3, 3, 5]] + [[3, 4, 6]] * 2 + [[4, 5, 7]]
    + [[4, 5, 8]] + [[4, 6, 9]] + [[5, 7, 10]] + [[6, 8, 11]]
    + [[6, 8, 13]] + [[7, 10, 14]] + [[8, 11, 16]] + [[9, 12, 18]]
    + [[10, 13, 20]] + [[11, 15, 23]] + [[13, 17, 25]], dtype=np.int64)
assert TC0_TABLE.shape == (52, 3)


def _clip3(lo, hi, x):
    return np.minimum(np.maximum(x, lo), hi)


def filter_luma_lines(win: np.ndarray, bs: np.ndarray, alpha: int, beta: int,
                      tc0_row: np.ndarray) -> np.ndarray:
    """Filter N edge lines; win [N, 8] = p3..p0 q0..q3. Returns new [N, 8].

    bs: [N] boundary strength per line; tc0_row: TC0_TABLE[indexA].
    """
    win = win.astype(np.int64)
    p3, p2, p1, p0 = win[:, 0], win[:, 1], win[:, 2], win[:, 3]
    q0, q1, q2, q3 = win[:, 4], win[:, 5], win[:, 6], win[:, 7]
    fflag = ((np.abs(p0 - q0) < alpha) & (np.abs(p1 - p0) < beta)
             & (np.abs(q1 - q0) < beta) & (bs > 0))
    ap = np.abs(p2 - p0) < beta
    aq = np.abs(q2 - q0) < beta
    out = win.copy()

    # --- normal filter (bS 1..3) ---
    tc0 = tc0_row[np.clip(bs, 1, 3) - 1]
    tc = tc0 + ap.astype(np.int64) + aq.astype(np.int64)
    delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
    np0 = np.clip(p0 + delta, 0, 255)
    nq0 = np.clip(q0 - delta, 0, 255)
    np1 = p1 + _clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)
    nq1 = q1 + _clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)
    use_n = fflag & (bs < 4)
    out[:, 3] = np.where(use_n, np0, out[:, 3])
    out[:, 4] = np.where(use_n, nq0, out[:, 4])
    out[:, 2] = np.where(use_n & ap, np1, out[:, 2])
    out[:, 5] = np.where(use_n & aq, nq1, out[:, 5])

    # --- strong filter (bS 4) ---
    strong = np.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = fflag & (bs == 4) & strong & ap
    sq = fflag & (bs == 4) & strong & aq
    weak4 = fflag & (bs == 4)
    sp0 = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
    sp1 = (p2 + p1 + p0 + q0 + 2) >> 2
    sp2 = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
    wp0 = (2 * p1 + p0 + q1 + 2) >> 2
    sq0 = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
    sq1 = (q2 + q1 + q0 + p0 + 2) >> 2
    sq2 = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
    wq0 = (2 * q1 + q0 + p1 + 2) >> 2
    out[:, 3] = np.where(sp, sp0, np.where(weak4, wp0, out[:, 3]))
    out[:, 2] = np.where(sp, sp1, out[:, 2])
    out[:, 1] = np.where(sp, sp2, out[:, 1])
    out[:, 4] = np.where(sq, sq0, np.where(weak4, wq0, out[:, 4]))
    out[:, 5] = np.where(sq, sq1, out[:, 5])
    out[:, 6] = np.where(sq, sq2, out[:, 6])
    return out


def filter_chroma_lines(win: np.ndarray, bs: np.ndarray, alpha: int,
                        beta: int, tc0_row: np.ndarray) -> np.ndarray:
    """Chroma edge filter; win [N, 4] = p1 p0 q0 q1."""
    win = win.astype(np.int64)
    p1, p0, q0, q1 = win[:, 0], win[:, 1], win[:, 2], win[:, 3]
    fflag = ((np.abs(p0 - q0) < alpha) & (np.abs(p1 - p0) < beta)
             & (np.abs(q1 - q0) < beta) & (bs > 0))
    out = win.copy()
    tc = tc0_row[np.clip(bs, 1, 3) - 1] + 1
    delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
    use_n = fflag & (bs < 4)
    out[:, 1] = np.where(use_n, np.clip(p0 + delta, 0, 255), out[:, 1])
    out[:, 2] = np.where(use_n, np.clip(q0 - delta, 0, 255), out[:, 2])
    s4 = fflag & (bs == 4)
    out[:, 1] = np.where(s4, (2 * p1 + p0 + q1 + 2) >> 2, out[:, 1])
    out[:, 2] = np.where(s4, (2 * q1 + q0 + p1 + 2) >> 2, out[:, 2])
    return out


def inter_bs1_mask(mv_p, pid_p, mv_q, pid_q, xp=np):
    """bS-1 trigger for an inter/inter edge with two-list motion (spec
    8.7.2.1): different reference-picture sets / MV counts, or a >= 4
    quarter-pel component delta under the picture-wise MV pairing.

    mv_*: [..., 2, 2] (list axis, then (y, x)); pid_*: [..., 2] unique
    reference-*picture* ids per list, -1 = list unused.  `xp` lets the
    jnp deblock kernel reuse the identical derivation.
    """
    use_p, use_q = pid_p >= 0, pid_q >= 0
    n_p = use_p.sum(-1)
    n_q = use_q.sum(-1)
    big_pid = 1 << 20
    lo_p = xp.where(use_p, pid_p, big_pid).min(-1)
    hi_p = xp.where(use_p, pid_p, -1).max(-1)
    lo_q = xp.where(use_q, pid_q, big_pid).min(-1)
    hi_q = xp.where(use_q, pid_q, -1).max(-1)
    sets_differ = (n_p != n_q) | (lo_p != lo_q) | (hi_p != hi_q)

    def far(d):                      # any component >= 4 quarter-pel
        return (xp.abs(d) >= 4).any(-1)

    # sides using exactly one list: compare the single used mv
    mv1_p = (mv_p * use_p[..., None]).sum(-2)
    mv1_q = (mv_q * use_q[..., None]).sum(-2)
    d_one = far(mv1_p - mv1_q)
    # both bi-predicted from two distinct pictures: pair MVs by picture
    mv_lo_p = xp.where((pid_p[..., 0] == lo_p)[..., None],
                       mv_p[..., 0, :], mv_p[..., 1, :])
    mv_hi_p = xp.where((pid_p[..., 1] == hi_p)[..., None],
                       mv_p[..., 1, :], mv_p[..., 0, :])
    mv_lo_q = xp.where((pid_q[..., 0] == lo_q)[..., None],
                       mv_q[..., 0, :], mv_q[..., 1, :])
    mv_hi_q = xp.where((pid_q[..., 1] == hi_q)[..., None],
                       mv_q[..., 1, :], mv_q[..., 0, :])
    d_two = far(mv_lo_p - mv_lo_q) | far(mv_hi_p - mv_hi_q)
    # both bi-predicted from the SAME picture twice: bS 0 unless both the
    # straight and the crossed pairings have a large delta
    straight = (far(mv_p[..., 0, :] - mv_q[..., 0, :])
                | far(mv_p[..., 1, :] - mv_q[..., 1, :]))
    crossed = (far(mv_p[..., 0, :] - mv_q[..., 1, :])
               | far(mv_p[..., 1, :] - mv_q[..., 0, :]))
    both2 = (n_p == 2) & (n_q == 2)
    same_pic = both2 & (lo_p == hi_p) & (lo_q == hi_q)
    mv_differ = xp.where(same_pic, straight & crossed,
                         xp.where(both2, d_two, d_one))
    return sets_differ | mv_differ


def as_two_list_motion(mv, ref, xp=np):
    """Adapt single-list (mv [..., 2], ref [...]) motion to the two-list
    (mv [..., 2, 2], pid [..., 2]) form: list0 pid = ref where inter
    (intra/unused -> -1), list1 unused."""
    mv = xp.asarray(mv)
    ref = xp.asarray(ref)
    mv2 = xp.stack([mv, xp.zeros_like(mv)], axis=-2)
    pid2 = xp.stack([xp.where(ref >= 0, ref, -1),
                     xp.full_like(ref, -1)], axis=-1)
    return mv2, pid2


def compute_bs_maps(intra_mb, tc_luma, mv, ref, wm, hm):
    """Boundary strengths for all edges.

    Returns (bs_v [h4, w4], bs_h [h4, w4]): bs_v[j, i] = strength of the
    vertical edge at luma column 4*i for block row j (i == 0 column unused
    per MB; index i counts ALL 4x4 columns so MB-internal and MB edges mix
    naturally); bs_h analogous.

    Motion comes either single-list (mv [..., 2], ref [...]: P/I slices,
    ref doubling as the picture id) or two-list (mv [..., 2, 2] with a
    list axis, ref [..., 2] = per-list picture ids, -1 = unused: B
    slices), at MB or per-4x4 granularity.
    """
    h4, w4 = hm * 4, wm * 4
    intra4 = np.repeat(np.repeat(intra_mb, 4, axis=0), 4, axis=1)
    mv = np.asarray(mv)
    ref = np.asarray(ref)
    if mv.ndim == 3:                       # single-list -> two-list form
        mv, ref = as_two_list_motion(mv, ref)
    # mv/ref may come MB-granular [hm, wm, ...] or per-4x4 [h4, w4, ...]
    if mv.shape[0] == hm:
        mv4 = np.repeat(np.repeat(mv, 4, axis=0), 4, axis=1)
        pid4 = np.repeat(np.repeat(ref, 4, axis=0), 4, axis=1)
    else:
        mv4 = mv
        pid4 = ref

    def edge_bs(p_sl, q_sl, mb_edge):
        either_intra = intra4[p_sl] | intra4[q_sl]
        coeff = (tc_luma[p_sl] > 0) | (tc_luma[q_sl] > 0)
        interd = inter_bs1_mask(mv4[p_sl], pid4[p_sl],
                                mv4[q_sl], pid4[q_sl])
        return np.where(either_intra, np.where(mb_edge, 4, 3),
                        np.where(coeff, 2, np.where(interd, 1, 0)))

    bs_v = np.zeros((h4, w4), dtype=np.int64)
    bs_h = np.zeros((h4, w4), dtype=np.int64)
    cols = np.arange(1, w4)
    mb_edge_c = (cols % 4) == 0
    bs_v[:, 1:] = edge_bs(np.s_[:, 0:w4 - 1], np.s_[:, 1:w4],
                          mb_edge_c[None, :])
    rows = np.arange(1, h4)
    mb_edge_r = (rows % 4) == 0
    bs_h[1:, :] = edge_bs(np.s_[0:h4 - 1, :], np.s_[1:h4, :],
                          mb_edge_r[:, None])
    return bs_v, bs_h


def deblock_frame(y, u, v, qp_y, cqp, intra_mb, tc_luma, mv, ref,
                  filter_edges_left, filter_edges_top, t8=None,
                  off_a=0, off_b=0):
    """In-place deblocking of one picture (returns the filtered planes).

    filter_edges_left/top: [hm, wm] bool — whether the MB's left/top MB
    edge is filtered (False at picture edges, and at slice boundaries when
    disable_deblocking_filter_idc == 2).  t8: [hm, wm] bool — MBs coded
    with transform_size_8x8_flag have no internal 4x4 transform edges,
    so their luma edges at columns/rows 4 and 12 are not filtered.
    off_a / off_b: FilterOffsetA/B = 2 * slice_alpha_c0/beta_offset_div2
    (spec 8.7.2: indexA = Clip3(0,51, qPav + offsetA) for alpha/tc0,
    indexB for beta).
    """
    y = np.asarray(y, dtype=np.int64).copy()
    u = np.asarray(u, dtype=np.int64).copy()
    v = np.asarray(v, dtype=np.int64).copy()
    hm, wm = intra_mb.shape
    bs_v, bs_h = compute_bs_maps(intra_mb, tc_luma, mv, ref, wm, hm)
    if t8 is not None and np.asarray(t8).any():
        t8r = np.repeat(np.repeat(np.asarray(t8, bool), 4, 0), 4, 1)
        odd_c = (np.arange(wm * 4) % 2 == 1)[None, :]
        odd_r = (np.arange(hm * 4) % 2 == 1)[:, None]
        bs_v[t8r & odd_c] = 0
        bs_h[t8r & odd_r] = 0
    # qp_y / cqp may be scalars or per-MB [hm, wm] grids (spec 8.7.2:
    # MB-edge thresholds use qpAv = (qpP + qpQ + 1) >> 1)
    qp_g = np.broadcast_to(np.asarray(qp_y, dtype=np.int64), (hm, wm))
    cqp_g = np.broadcast_to(np.asarray(cqp, dtype=np.int64), (hm, wm))

    def _params(grid, r, c, nr, nc):
        if nr is None:
            q = grid[r, c]
        else:
            q = (int(grid[r, c]) + int(grid[nr, nc]) + 1) >> 1
        ia = int(np.clip(q + off_a, 0, 51))
        ib = int(np.clip(q + off_b, 0, 51))
        return int(ALPHA_TABLE[ia]), int(BETA_TABLE[ib]), TC0_TABLE[ia]

    for r in range(hm):
        for c in range(wm):
            alpha, beta, tc0_row = _params(qp_g, r, c, None, None)
            calpha, cbeta, ctc0_row = _params(cqp_g, r, c, None, None)
            # ---- luma vertical edges ----
            for k in range(4):
                x = c * 16 + 4 * k
                if k == 0 and not filter_edges_left[r, c]:
                    continue
                bs = bs_v[r * 4:r * 4 + 4, c * 4 + k]
                if (bs == 0).all():
                    continue
                a_, b_, t_ = ((alpha, beta, tc0_row) if k else
                              _params(qp_g, r, c, r, c - 1))
                bs16 = np.repeat(bs, 4)
                win = y[r * 16:r * 16 + 16, x - 4:x + 4]
                y[r * 16:r * 16 + 16, x - 4:x + 4] = filter_luma_lines(
                    win, bs16, a_, b_, t_)
            # ---- luma horizontal edges ----
            for k in range(4):
                yy = r * 16 + 4 * k
                if k == 0 and not filter_edges_top[r, c]:
                    continue
                bs = bs_h[r * 4 + k, c * 4:c * 4 + 4]
                if (bs == 0).all():
                    continue
                a_, b_, t_ = ((alpha, beta, tc0_row) if k else
                              _params(qp_g, r, c, r - 1, c))
                bs16 = np.repeat(bs, 4)
                win = y[yy - 4:yy + 4, c * 16:c * 16 + 16].T
                y[yy - 4:yy + 4, c * 16:c * 16 + 16] = filter_luma_lines(
                    win, bs16, a_, b_, t_).T
            # ---- chroma edges (4:2:0: edges 0 and 4 of the 8x8) ----
            for plane in (u, v):
                for k in (0, 2):
                    x = c * 8 + 4 * (k // 2)
                    if k == 0 and not filter_edges_left[r, c]:
                        continue
                    bs = bs_v[r * 4:r * 4 + 4, c * 4 + k]
                    if (bs == 0).all():
                        continue
                    a_, b_, t_ = ((calpha, cbeta, ctc0_row) if k else
                                  _params(cqp_g, r, c, r, c - 1))
                    bs8 = np.repeat(bs, 2)
                    win = plane[r * 8:r * 8 + 8, x - 2:x + 2]
                    plane[r * 8:r * 8 + 8, x - 2:x + 2] = \
                        filter_chroma_lines(win, bs8, a_, b_, t_)
                for k in (0, 2):
                    yy = r * 8 + 4 * (k // 2)
                    if k == 0 and not filter_edges_top[r, c]:
                        continue
                    bs = bs_h[r * 4 + k, c * 4:c * 4 + 4]
                    if (bs == 0).all():
                        continue
                    a_, b_, t_ = ((calpha, cbeta, ctc0_row) if k else
                                  _params(cqp_g, r, c, r - 1, c))
                    bs8 = np.repeat(bs, 2)
                    win = plane[yy - 2:yy + 2, c * 8:c * 8 + 8].T
                    plane[yy - 2:yy + 2, c * 8:c * 8 + 8] = \
                        filter_chroma_lines(win, bs8, a_, b_, t_).T
    return y, u, v
