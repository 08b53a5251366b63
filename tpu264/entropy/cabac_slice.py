"""CABAC slice-data encoder driver (spec 7.3.4/9.3; JM `cabac.c`
writeMBLayer path — SURVEY.md §2a #6, §3.1).

Consumes the same per-MB element tensors the CAVLC path uses
(`reorder_wave_outputs` dict) and produces one CABAC-coded slice payload
per slice.  The arithmetic loop is the lane-serial part (SURVEY.md §3.5);
slices are the parallel axis.
"""

from __future__ import annotations

import numpy as np

from tpu264.coding.wavefront import BLK_ORDER
from . import cabac_ctx as cs
from . import mb_syntax
from .cabac_engine import CabacEncoder


def _mb_grid_coords(i, wm):
    return i // wm, i % wm


def encode_frame_cabac_fast(mb, wm: int, hm: int, slice_start_rows,
                            qp: int, p_slice: bool = False,
                            b_slice: bool = False, init_idc: int = 0):
    """Vectorized-binarization + native-replay CABAC path.

    Byte-identical to `encode_frame_cabac` (tests/test_cabac.py asserts
    it); ~100x faster: binarization is numpy-vectorized over all MBs
    (cabac_binarize.py) and the serial range coder runs in C
    (cabac_core.c).  Falls back to the per-bin Python path when no C
    compiler is available (I/P only; B has no per-bin twin — it is
    validated against libavcodec directly).
    """
    from . import cabac_native
    if not cabac_native.available():
        if b_slice or "ptype" in mb:
            raise RuntimeError(
                "CABAC B slices / partitions need the native engine")
        return encode_frame_cabac(mb, wm, hm, slice_start_rows, qp,
                                  p_slice=p_slice, init_idc=init_idc)
    from . import cabac_binarize as cb
    k, a, b, v, skipped = cb.binarize_frame(
        mb, wm, hm, slice_start_rows, qp, p_slice=p_slice,
        b_slice=b_slice)
    table = 1 + init_idc if (p_slice or b_slice) else 0
    rows = [int(r) for r in slice_start_rows] + [hm]
    payloads = []
    for s in range(len(rows) - 1):
        kk, aa, bb = cb.slice_records(k, a, b, v, wm, rows[s], rows[s + 1])
        payloads.append(cabac_native.encode_records(kk, aa, bb, table, qp))
    return payloads, skipped


def encode_frame_cabac(mb, wm: int, hm: int, slice_start_rows, qp: int,
                       p_slice: bool = False, init_idc: int = 0):
    """Encode all slices of a frame → list of CABAC payload bytes (one per
    slice, starting at the byte-aligned position after the slice header).

    For P frames `mb` must carry is_inter / mv / mv_skip; mvd and the skip
    decisions are derived exactly as in the CAVLC serializer.
    """
    n = wm * hm
    sel16_raw = mb["sel16"].astype(bool)
    is_inter = (mb["is_inter"].astype(bool) if p_slice
                else np.zeros(n, dtype=bool))
    sel16 = sel16_raw & ~is_inter
    luma_ac = mb["luma_ac"].astype(np.int64)
    luma_dc = mb["luma_dc"].astype(np.int64)
    chroma_dc = mb["chroma_dc"].astype(np.int64)
    chroma_ac = mb["chroma_ac"].astype(np.int64)
    modes = mb["modes"].astype(np.int64)
    cmode = mb["cmode"].astype(np.int64)
    i16mode = mb["i16mode"].astype(np.int64)
    cbp_luma, cbp_chroma, cbp = mb_syntax.compute_cbp(
        sel16, luma_ac, chroma_dc, chroma_ac)

    # MPM grid for intra 4x4 mode coding (final maps; causal by construction)
    modes_grid = np.full((hm * 4, wm * 4), -1, dtype=np.int64)
    mb_r = np.arange(n) // wm
    mb_c = np.arange(n) % wm
    is_i4 = ~sel16 & ~is_inter
    for idx, (by, bx) in enumerate(BLK_ORDER):
        modes_grid[mb_r * 4 + by, mb_c * 4 + bx] = np.where(
            is_i4, modes[:, idx], -1)
    mpm = mb_syntax.mpm_grid(modes_grid, [r * 4 for r in slice_start_rows])

    if p_slice:
        from tpu264.coding import mvpred
        mv = mb["mv"].astype(np.int64)
        mv_map = np.where(is_inter[:, None], mv, 0).reshape(hm, wm, 2)
        ref_map = np.where(is_inter, 0, mvpred.INTRA).reshape(hm, wm)
        nb = mvpred.neighbor_mvs_np(mv_map, ref_map, wm, hm,
                                    slice_start_rows)
        mv_pred = mvpred.predict_mv_np(nb["mv_a"], nb["ref_a"], nb["mv_b"],
                                       nb["ref_b"], nb["mv_c"], nb["ref_c"])
        mvd = mv - mv_pred
        mv_skip = mb["mv_skip"].astype(np.int64)
        skipped = is_inter & (mv == mv_skip).all(axis=1) & (cbp == 0)
    else:
        mvd = np.zeros((n, 2), dtype=np.int64)
        skipped = np.zeros(n, dtype=bool)

    st = cs.CabacFrameState(wm, hm)
    payloads = []
    rows = list(slice_start_rows) + [hm]
    table = 1 + init_idc if p_slice else 0
    for s in range(len(rows) - 1):
        first = rows[s] * wm
        last = rows[s + 1] * wm
        eng = CabacEncoder(table, qp)
        st.prev_qp_delta_nz = 0
        sid = s + 1
        for i in range(first, last):
            mr, mc = _mb_grid_coords(i, wm)
            st.start_mb(mr, mc, sid)
            if p_slice:
                eng.encode(st.ctx_mb_skip(mr, mc, sid), int(skipped[i]))
            if skipped[i]:
                st.set_skip(mr, mc)
            else:
                _encode_mb(eng, st, mr, mc, sid, i, p_slice,
                           bool(is_inter[i]), bool(sel16[i]),
                           int(i16mode[i]), int(cbp_luma[i]),
                           int(cbp_chroma[i]), int(cmode[i]),
                           modes[i], mpm, mvd[i],
                           luma_dc[i], luma_ac[i], chroma_dc[i],
                           chroma_ac[i])
            eng.encode_terminate(int(i == last - 1))
        payloads.append(eng.get_bytes())
    return payloads, skipped


def _encode_mb(eng, st, mr, mc, sid, i, p_slice, inter, i16, i16m,
               cbp_l, cbp_c, cmode, mb_modes, mpm, mvd_i,
               dc16, lac, cdc, cac):
    if i16:
        mbt = 1 + i16m + 4 * cbp_c + 12 * (cbp_l > 0)
        kind = cs.K_I16
    elif not inter:
        mbt = 0
        kind = cs.K_I4
    else:
        mbt = 0
        kind = cs.K_INTER

    if p_slice:
        cs.encode_mb_type_p(eng, mbt + 5 if not inter else mbt)
    else:
        cs.encode_mb_type_intra(eng, st.ctx_mb_type_i(mr, mc, sid),
                                cs.I_REST, mbt)
    st.kind[mr, mc] = kind

    if kind == cs.K_I4:
        for idx, (by, bx) in enumerate(BLK_ORDER):
            cs.encode_i4_mode(eng, int(mb_modes[idx]),
                              int(mpm[mr * 4 + by, mc * 4 + bx]))
    if kind in (cs.K_I4, cs.K_I16):
        cs.encode_cpm(eng, cmode, st.ctx_cpm(mr, mc, sid))
        st.cpm[mr, mc] = cmode
    if kind == cs.K_INTER:
        # 16x16 partition, single ref: mvd x then y (compIdx order)
        cs.encode_mvd(eng, st, mr * 4, mc * 4, sid, 1, int(mvd_i[1]))
        cs.encode_mvd(eng, st, mr * 4, mc * 4, sid, 0, int(mvd_i[0]))
        st.set_absmvd(0, mr * 4, mc * 4, 4, 4,
                      abs(int(mvd_i[0])), abs(int(mvd_i[1])))
        st.set_refidx(0, mr * 4, mc * 4, 4, 4, 0)

    if kind != cs.K_I16:
        cs.encode_cbp(eng, st, mr, mc, sid, cbp_l | (cbp_c << 4))
    st.cbp_luma[mr, mc] = cbp_l
    st.cbp_chroma[mr, mc] = cbp_c

    if cbp_l or cbp_c or kind == cs.K_I16:
        cs.encode_qp_delta(eng, st, 0)

    intra = kind in (cs.K_I4, cs.K_I16)
    if kind == cs.K_I16:
        cbf = cs.encode_residual(
            eng, dc16, 0, st.ctx_cbf_luma_dc(mr, mc, sid, intra))
        st.cbf_ldc[mr, mc] = cbf
        for idx, (by, bx) in enumerate(BLK_ORDER):
            g4r, g4c = mr * 4 + by, mc * 4 + bx
            if cbp_l:
                cbf = cs.encode_residual(
                    eng, lac[idx, 1:], 1,
                    st.ctx_cbf_luma4(g4r, g4c, sid, intra, 1))
                st.cbf_l4[g4r, g4c] = cbf
    else:
        for idx, (by, bx) in enumerate(BLK_ORDER):
            g4r, g4c = mr * 4 + by, mc * 4 + bx
            if (cbp_l >> (idx // 4)) & 1:
                cbf = cs.encode_residual(
                    eng, lac[idx], 2,
                    st.ctx_cbf_luma4(g4r, g4c, sid, intra, 2))
                st.cbf_l4[g4r, g4c] = cbf

    if cbp_c >= 1:
        for comp in range(2):
            cbf = cs.encode_residual(
                eng, cdc[comp], 3,
                st.ctx_cbf_chroma_dc(mr, mc, sid, intra, comp))
            st.cbf_cdc[comp, mr, mc] = cbf
    if cbp_c == 2:
        for comp in range(2):
            for idx in range(4):
                by, bx = idx // 2, idx % 2
                g2r, g2c = mr * 2 + by, mc * 2 + bx
                cbf = cs.encode_residual(
                    eng, cac[comp, idx, 1:], 4,
                    st.ctx_cbf_chroma_ac(g2r, g2c, sid, intra, comp))
                st.cbf_cac[comp, g2r, g2c] = cbf
