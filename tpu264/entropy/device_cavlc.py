"""On-device CAVLC serialization + bit packing (JAX).

The host entropy path (`slice_writer` + `bits.bitwriter.pack_bits`) costs
seconds per 1080p frame and forces a ~24 MB device->host transfer of raw
coefficient grids.  This module runs the same computation on the TPU —
per-block token/length computation is embarrassingly parallel (SURVEY.md
§2a #5), and packing is a prefix-sum plus scatter-add — so only the packed
slice payloads (~stream size) cross the link.

Every function mirrors its numpy twin bit-for-bit (`slice_writer.
serialize_frame_mbs*`, `cavlc.encode_blocks`, `bitwriter.pack_bits`);
tests assert equality on random frames.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpu264.coding.wavefront import BLK_ORDER
from tpu264.coding import mvpred
from . import cavlc_tables as tbl
from . import mb_syntax
from .cavlc import SLOTS_PER_BLOCK
from .slice_writer import HDR_SLOTS, HDR_SLOTS_P, MB_SLOTS, MB_SLOTS_P

# ---------------------------------------------------------------- tables
# populated eagerly at import: creating constants lazily inside a jit
# trace leaks tracers into the cache
_J = {
    name: jnp.asarray(np.asarray(arr, dtype=np.int32))
    for name, arr in {
        "ctb": tbl.COEFF_TOKEN_BITS, "ctl": tbl.COEFF_TOKEN_LEN,
        "cctb": tbl.CDC_COEFF_TOKEN_BITS, "cctl": tbl.CDC_COEFF_TOKEN_LEN,
        "ctzb": tbl.CDC_TOTAL_ZEROS_BITS, "ctzl": tbl.CDC_TOTAL_ZEROS_LEN,
        "tzb": tbl.TOTAL_ZEROS_BITS, "tzl": tbl.TOTAL_ZEROS_LEN,
        "rbb": tbl.RUN_BEFORE_BITS, "rbl": tbl.RUN_BEFORE_LEN,
        "cbpi": mb_syntax.CBP_TO_CODENUM_INTRA,
        "cbpp": mb_syntax.CBP_TO_CODENUM_INTER,
    }.items()
}


def _jt(name, arr=None):
    return _J[name]


def ue_code_j(v):
    """ue(v) → (code uint32, nbits int32); v < 2^31 - 1."""
    vp1 = (v + 1).astype(jnp.uint32)
    nh = 31 - jax.lax.clz(vp1).astype(jnp.int32)
    return vp1, 2 * nh + 1


def se_to_ue_j(v):
    return jnp.where(v > 0, 2 * v - 1, -2 * v)


def _encode_level_j(lc, sl):
    """Fused level prefix+suffix (mirror of cavlc._encode_level)."""
    c0_short = lc < 14
    code0 = jnp.where(c0_short, 1, 0)
    len0 = jnp.where(c0_short, lc + 1, 0)
    c0_esc14 = (lc >= 14) & (lc < 30)
    code0 = jnp.where(c0_esc14, (1 << 4) | (lc - 14), code0)
    len0 = jnp.where(c0_esc14, 15 + 4, len0)
    c0_esc15 = lc >= 30
    code0 = jnp.where(c0_esc15, (1 << 12) | (lc - 30), code0)
    len0 = jnp.where(c0_esc15, 16 + 12, len0)

    sl1 = jnp.maximum(sl, 1)
    prefix = lc >> sl1
    suffix = lc & ((1 << sl1) - 1)
    cs_short = prefix < 15
    code1 = jnp.where(cs_short, (1 << sl1) | suffix, 0)
    len1 = jnp.where(cs_short, prefix + 1 + sl1, 0)
    cs_esc = prefix >= 15
    esc_val = lc - (15 << sl1)
    code1 = jnp.where(cs_esc, (1 << 12) | esc_val, code1)
    len1 = jnp.where(cs_esc, 16 + 12, len1)

    code = jnp.where(sl == 0, code0, code1)
    ln = jnp.where(sl == 0, len0, len1)
    return code, ln


def encode_blocks_j(scanned, nc, max_coeff: int):
    """jnp mirror of cavlc.encode_blocks.

    scanned [N, mc] int32 scan-order levels; nc [N] int32 (-1 = chroma DC).
    Returns (values [N,36] int32, lengths [N,36] int32).
    """
    scanned = scanned.astype(jnp.int32)
    n, mc = scanned.shape
    assert mc == max_coeff
    nc = jnp.broadcast_to(nc.astype(jnp.int32), (n,))

    nz = scanned != 0
    total_coeff = nz.sum(axis=1).astype(jnp.int32)
    # k-th nonzero from the end via suffix-rank one-hot (argsort is slow
    # on TPU): rev_rank[i] = #nonzeros at positions >= i, so the k-th
    # reverse-order nonzero is the unique i with nz[i] & rev_rank[i]==k+1.
    nzi = nz.astype(jnp.int32)
    rev_rank = jnp.cumsum(nzi[:, ::-1], axis=1)[:, ::-1]       # [N, mc]
    kk = jnp.arange(mc, dtype=jnp.int32)[None, :, None]        # [1, mc(k), 1]
    onehot = nzi[:, None, :] * (rev_rank[:, None, :] == 1 + kk).astype(
        jnp.int32)                                             # [N, k, i]
    idx = jnp.arange(mc, dtype=jnp.int32)[None, None, :]
    lev = (onehot * scanned[:, None, :]).sum(axis=2)           # [N, mc]
    lev_idx = (onehot * idx).sum(axis=2) - (
        1 - onehot.sum(axis=2))                                # -1 padding
    karange = jnp.arange(mc, dtype=jnp.int32)[None, :]
    valid = karange < total_coeff[:, None]
    lev = jnp.where(valid, lev, 0)

    is_one = (jnp.abs(lev) == 1) & valid
    run1 = jnp.cumprod(is_one[:, :3].astype(jnp.int32), axis=1)
    t1 = run1.sum(axis=1).astype(jnp.int32)

    vals = [None] * SLOTS_PER_BLOCK
    lens = [None] * SLOTS_PER_BLOCK
    zero = jnp.zeros(n, dtype=jnp.int32)

    # coeff_token
    ct_idx = 4 * total_coeff + t1
    tsel = jnp.where(nc < 2, 0, jnp.where(nc < 4, 1, jnp.where(nc < 8, 2, 3)))
    is_cdc = nc == -1
    tsel0 = jnp.where(is_cdc, 0, tsel)
    reg_bits = _jt("ctb", tbl.COEFF_TOKEN_BITS)[tsel0, ct_idx]
    reg_len = _jt("ctl", tbl.COEFF_TOKEN_LEN)[tsel0, ct_idx]
    cdc_bits = _jt("cctb", tbl.CDC_COEFF_TOKEN_BITS)[jnp.minimum(ct_idx, 19)]
    cdc_len = _jt("cctl", tbl.CDC_COEFF_TOKEN_LEN)[jnp.minimum(ct_idx, 19)]
    vals[0] = jnp.where(is_cdc, cdc_bits, reg_bits)
    lens[0] = jnp.where(is_cdc, cdc_len, reg_len)

    # trailing one signs
    for k in range(3):
        on = k < t1
        vals[1 + k] = jnp.where(on, (lev[:, k] < 0).astype(jnp.int32), 0)
        lens[1 + k] = jnp.where(on, 1, 0)

    # levels
    sl = jnp.where((total_coeff > 10) & (t1 < 3), 1, 0).astype(jnp.int32)
    first_coded = t1
    for k in range(16):
        if k >= mc:
            vals[4 + k] = zero
            lens[4 + k] = zero
            continue
        on = (k >= t1) & (k < total_coeff)
        v = lev[:, k]
        absv = jnp.abs(v)
        level_code = jnp.where(v > 0, 2 * absv - 2, 2 * absv - 1)
        level_code = jnp.where(on & (k == first_coded) & (t1 < 3),
                               level_code - 2, level_code)
        code, ln = _encode_level_j(level_code, sl)
        vals[4 + k] = jnp.where(on, code, 0)
        lens[4 + k] = jnp.where(on, ln, 0)
        sl_new = jnp.where(sl == 0, 1, sl)
        sl_new = jnp.where(
            (absv > (3 << jnp.maximum(sl_new - 1, 0))) & (sl_new < 6),
            sl_new + 1, sl_new)
        sl = jnp.where(on, sl_new, sl)

    # total_zeros
    highest = lev_idx[:, 0]
    total_zeros = jnp.where(total_coeff > 0, highest + 1 - total_coeff, 0)
    tz_on = (total_coeff > 0) & (total_coeff < max_coeff)
    tz_row = jnp.clip(total_coeff - 1, 0, 15)
    tz_col = jnp.clip(total_zeros, 0, 15)
    if max_coeff == 4:
        r3 = jnp.clip(tz_row, 0, 2)
        c3 = jnp.clip(tz_col, 0, 3)
        tzb = _jt("ctzb", tbl.CDC_TOTAL_ZEROS_BITS)[r3, c3]
        tzl = _jt("ctzl", tbl.CDC_TOTAL_ZEROS_LEN)[r3, c3]
    else:
        tzb = _jt("tzb", tbl.TOTAL_ZEROS_BITS)[tz_row, tz_col]
        tzl = _jt("tzl", tbl.TOTAL_ZEROS_LEN)[tz_row, tz_col]
    vals[20] = jnp.where(tz_on, tzb, 0)
    lens[20] = jnp.where(tz_on, tzl, 0)

    # run_before
    zeros_left = total_zeros
    for k in range(15):
        if k + 1 >= mc:
            vals[21 + k] = zero
            lens[21 + k] = zero
            continue
        on = (k < total_coeff - 1) & (zeros_left > 0)
        run = jnp.where(on, lev_idx[:, k] - lev_idx[:, k + 1] - 1, 0)
        row = jnp.clip(jnp.minimum(zeros_left, 7) - 1, 0, 6)
        rb = _jt("rbb", tbl.RUN_BEFORE_BITS)[row, jnp.clip(run, 0, 15)]
        rl = _jt("rbl", tbl.RUN_BEFORE_LEN)[row, jnp.clip(run, 0, 15)]
        vals[21 + k] = jnp.where(on, rb, 0)
        lens[21 + k] = jnp.where(on, rl, 0)
        zeros_left = zeros_left - run
    return jnp.stack(vals, axis=1), jnp.stack(lens, axis=1)


# ----------------------------------------------------- neighbor-grid ports

def luma_tc_grid_j(mb, cbp_luma, wm: int, hm: int):
    """[h4, w4] per-4x4 TotalCoeff grid (mirror of mb_syntax.luma_tc_grid);
    also feeds deblock bS derivation on device."""
    n = wm * hm
    mb_r = jnp.arange(n, dtype=jnp.int32) // wm
    mb_c = jnp.arange(n, dtype=jnp.int32) % wm
    luma_ac = mb["luma_ac"].astype(jnp.int32)
    tc = (luma_ac != 0).sum(axis=2).astype(jnp.int32)
    coded8 = ((cbp_luma[:, None] >> jnp.arange(4)[None, :]) & 1) > 0
    coded = jnp.repeat(coded8, 4, axis=1)
    tc = jnp.where(coded, tc, 0)
    lgrid = jnp.zeros((hm * 4, wm * 4), dtype=jnp.int32)
    for idx, (by, bx) in enumerate(BLK_ORDER):
        lgrid = lgrid.at[mb_r * 4 + by, mb_c * 4 + bx].set(tc[:, idx])
    return lgrid


def _tc_grids_j(mb, sel16, cbp_luma, cbp_chroma, wm: int, hm: int,
                slice_rows):
    """luma/chroma nC grids (mirror of mb_syntax.luma_tc_grid /
    chroma_tc_grid / nc_from_grid)."""
    n = wm * hm
    mb_r = jnp.arange(n, dtype=jnp.int32) // wm
    mb_c = jnp.arange(n, dtype=jnp.int32) % wm
    lgrid = luma_tc_grid_j(mb, cbp_luma, wm, hm)
    lnc = _nc_from_grid_j(lgrid, [r * 4 for r in slice_rows])

    cnc = []
    for comp in range(2):
        ctc = (mb["chroma_ac"][:, comp] != 0).sum(axis=2).astype(jnp.int32)
        ctc = jnp.where((cbp_chroma == 2)[:, None], ctc, 0)
        cgrid = jnp.zeros((hm * 2, wm * 2), dtype=jnp.int32)
        for idx in range(4):
            by, bx = idx // 2, idx % 2
            cgrid = cgrid.at[mb_r * 2 + by, mb_c * 2 + bx].set(ctc[:, idx])
        cnc.append(_nc_from_grid_j(cgrid, [r * 2 for r in slice_rows]))
    return lnc, cnc


def _nc_from_grid_j(tc_grid, slice_start_rows):
    gh, gw = tc_grid.shape
    na = jnp.zeros_like(tc_grid).at[:, 1:].set(tc_grid[:, :-1])
    nb = jnp.zeros_like(tc_grid).at[1:, :].set(tc_grid[:-1, :])
    avail_a = np.zeros((gh, gw), dtype=bool)
    avail_a[:, 1:] = True
    avail_b = np.zeros((gh, gw), dtype=bool)
    avail_b[1:, :] = True
    for r in slice_start_rows:
        avail_b[r, :] = False
    avail_a = jnp.asarray(avail_a)
    avail_b = jnp.asarray(avail_b)
    return jnp.where(avail_a & avail_b, (na + nb + 1) >> 1,
                     jnp.where(avail_a, na, jnp.where(avail_b, nb, 0)))


def _mpm_grid_j(modes_grid, slice_start_rows4):
    gh, gw = modes_grid.shape
    unavail = -2
    left = jnp.full((gh, gw), unavail, jnp.int32).at[:, 1:].set(
        modes_grid[:, :-1])
    top = jnp.full((gh, gw), unavail, jnp.int32).at[1:, :].set(
        modes_grid[:-1, :])
    mask = np.zeros((gh, 1), dtype=bool)
    for r in slice_start_rows4:
        mask[r] = True
    top = jnp.where(jnp.asarray(mask), unavail, top)
    a = jnp.where(left == -1, 2, left)
    b = jnp.where(top == -1, 2, top)
    return jnp.where((a < 0) | (b < 0), 2, jnp.minimum(a, b))


def _compute_cbp_j(sel16, luma_ac, chroma_dc, chroma_ac):
    nz_blk = (luma_ac != 0).any(axis=2)
    nz8 = nz_blk.reshape(-1, 4, 4).any(axis=2)
    cbp_luma = (nz8.astype(jnp.int32) << jnp.arange(4)[None, :]).sum(axis=1)
    cbp_luma = jnp.where(sel16 & (cbp_luma > 0), 15, cbp_luma)
    any_dc = (chroma_dc != 0).any(axis=(1, 2))
    any_ac = (chroma_ac != 0).any(axis=(1, 2, 3))
    cbp_chroma = jnp.where(any_ac, 2, jnp.where(any_dc, 1, 0))
    return cbp_luma, cbp_chroma, cbp_luma | (cbp_chroma << 4)


# ------------------------------------------------------------ frame grids

def _residual_slots_j(vals, lens, hdr_slots, mb, sel16, cbp_luma, cbp_chroma,
                      wm, hm, slice_rows):
    n = wm * hm
    mb_r = jnp.arange(n, dtype=jnp.int32) // wm
    mb_c = jnp.arange(n, dtype=jnp.int32) % wm
    luma_ac = mb["luma_ac"].astype(jnp.int32)
    lnc, cnc = _tc_grids_j(mb, sel16, cbp_luma, cbp_chroma, wm, hm,
                           slice_rows)

    def put(slot, v, l, coded):
        s0 = hdr_slots + slot * SLOTS_PER_BLOCK
        for i in range(SLOTS_PER_BLOCK):
            vals[s0 + i] = jnp.where(coded, v[:, i], 0)
            lens[s0 + i] = jnp.where(coded, l[:, i], 0)

    # batch all same-shape blocks into single encode_blocks_j calls (27
    # separate calls blow up compile time at 1080p)
    luma_nc = jnp.stack(
        [lnc[mb_r * 4 + by, mb_c * 4 + bx] for by, bx in BLK_ORDER], axis=0)

    # 16-coeff group: I16 DC + the 16 luma blocks (non-I16 variant)
    g16_in = jnp.concatenate(
        [mb["luma_dc"].astype(jnp.int32)[None],
         luma_ac.transpose(1, 0, 2)], axis=0)          # [17, n, 16]
    g16_nc = jnp.concatenate([lnc[mb_r * 4, mb_c * 4][None], luma_nc],
                             axis=0)
    v16, l16 = encode_blocks_j(g16_in.reshape(17 * n, 16),
                               g16_nc.reshape(17 * n), 16)
    v16 = v16.reshape(17, n, SLOTS_PER_BLOCK)
    l16 = l16.reshape(17, n, SLOTS_PER_BLOCK)

    # 15-coeff group: 16 luma AC (I16 variant) + 8 chroma AC blocks
    cac = mb["chroma_ac"].astype(jnp.int32)
    g15_in = jnp.concatenate(
        [luma_ac[:, :, 1:].transpose(1, 0, 2),
         cac[..., 1:].reshape(n, 8, 15).transpose(1, 0, 2)], axis=0)
    c_nc = jnp.stack(
        [cnc[comp][mb_r * 2 + idx // 2, mb_c * 2 + idx % 2]
         for comp in range(2) for idx in range(4)], axis=0)
    g15_nc = jnp.concatenate([luma_nc, c_nc], axis=0)
    v15, l15 = encode_blocks_j(g15_in.reshape(24 * n, 15),
                               g15_nc.reshape(24 * n), 15)
    v15 = v15.reshape(24, n, SLOTS_PER_BLOCK)
    l15 = l15.reshape(24, n, SLOTS_PER_BLOCK)

    # chroma DC group
    vcd, lcd = encode_blocks_j(
        mb["chroma_dc"].astype(jnp.int32).transpose(1, 0, 2).reshape(
            2 * n, 4),
        jnp.full((2 * n,), -1, jnp.int32), 4)
    vcd = vcd.reshape(2, n, SLOTS_PER_BLOCK)
    lcd = lcd.reshape(2, n, SLOTS_PER_BLOCK)

    put(0, v16[0], l16[0], sel16)
    s16 = sel16[:, None]
    for idx in range(16):
        coded8 = ((cbp_luma >> (idx // 4)) & 1) > 0
        put(1 + idx, jnp.where(s16, v15[idx], v16[1 + idx]),
            jnp.where(s16, l15[idx], l16[1 + idx]), coded8)
    for comp in range(2):
        put(17 + comp, vcd[comp], lcd[comp], cbp_chroma >= 1)
    for comp in range(2):
        for idx in range(4):
            put(19 + comp * 4 + idx, v15[16 + comp * 4 + idx],
                l15[16 + comp * 4 + idx], cbp_chroma == 2)


def _i4_mode_slots_j(vals, lens, slot0, mb, is_i4, wm, hm, slice_rows):
    n = wm * hm
    mb_r = jnp.arange(n, dtype=jnp.int32) // wm
    mb_c = jnp.arange(n, dtype=jnp.int32) % wm
    modes = mb["modes"].astype(jnp.int32)
    modes_grid = jnp.full((hm * 4, wm * 4), -1, jnp.int32)
    for idx, (by, bx) in enumerate(BLK_ORDER):
        modes_grid = modes_grid.at[mb_r * 4 + by, mb_c * 4 + bx].set(
            jnp.where(is_i4, modes[:, idx], -1))
    mpm = _mpm_grid_j(modes_grid, [r * 4 for r in slice_rows])
    for idx, (by, bx) in enumerate(BLK_ORDER):
        m = modes[:, idx]
        p = mpm[mb_r * 4 + by, mb_c * 4 + bx]
        is_mpm = m == p
        rem = m - (m > p)
        vals[slot0 + idx] = jnp.where(is_mpm, 1, rem)
        lens[slot0 + idx] = jnp.where(is_i4, jnp.where(is_mpm, 1, 4), 0)


def serialize_frame_j(mb, wm: int, hm: int, slice_rows,
                      t8_mode: bool = False):
    """I-frame grids (mirror of slice_writer.serialize_frame_mbs).

    `t8_mode`: the PPS has transform_8x8_mode_flag set — Intra_4x4 MBs
    must then carry a transform_size_8x8_flag bit (value 0: intra is
    coded with the 4x4 transform) right after mb_type (spec 7.3.5).
    Returns (values [n, SLOTS] int32, lengths [n, SLOTS] int32).
    """
    n = wm * hm
    ioff = 1 if t8_mode else 0
    sel16 = mb["sel16"].astype(bool)
    vals = [jnp.zeros(n, jnp.int32)] * (MB_SLOTS + ioff)
    lens = [jnp.zeros(n, jnp.int32)] * (MB_SLOTS + ioff)
    luma_ac = mb["luma_ac"].astype(jnp.int32)
    cbp_luma, cbp_chroma, cbp = _compute_cbp_j(
        sel16, luma_ac, mb["chroma_dc"], mb["chroma_ac"])

    mbt = jnp.where(sel16,
                    1 + mb["i16mode"].astype(jnp.int32) + 4 * cbp_chroma
                    + 12 * (cbp_luma > 0), 0)
    vals[0], lens[0] = ue_code_j(mbt)
    vals[0] = vals[0].astype(jnp.int32)
    if t8_mode:
        lens[1] = jnp.where(~sel16, 1, 0)      # t8 flag = 0 for I_NxN

    _i4_mode_slots_j(vals, lens, 1 + ioff, mb, ~sel16, wm, hm, slice_rows)

    c, l = ue_code_j(mb["cmode"].astype(jnp.int32))
    vals[17 + ioff], lens[17 + ioff] = c.astype(jnp.int32), l

    cbp_code, cbp_len = ue_code_j(_jt("cbpi", mb_syntax.CBP_TO_CODENUM_INTRA)[cbp])
    vals[18 + ioff] = jnp.where(~sel16, cbp_code.astype(jnp.int32), 0)
    lens[18 + ioff] = jnp.where(~sel16, cbp_len, 0)

    has_delta = sel16 | (cbp > 0)
    vals[19 + ioff] = jnp.where(has_delta, 1, 0)  # ue(se_to_ue(0)) = '1'
    lens[19 + ioff] = jnp.where(has_delta, 1, 0)

    _residual_slots_j(vals, lens, HDR_SLOTS + ioff, mb, sel16, cbp_luma,
                      cbp_chroma, wm, hm, slice_rows)
    return jnp.stack(vals, axis=1), jnp.stack(lens, axis=1)


def _neighbor_mvs_j(mv_map, ref_map, wm, hm, slice_rows):
    """Shifted-array port of mvpred.neighbor_mvs_np."""
    UN = mvpred.UNAVAIL
    mv_a = jnp.zeros((hm, wm, 2), jnp.int32).at[:, 1:].set(mv_map[:, :-1])
    ref_a = jnp.full((hm, wm), UN, jnp.int32).at[:, 1:].set(ref_map[:, :-1])
    mv_b = jnp.zeros((hm, wm, 2), jnp.int32).at[1:, :].set(mv_map[:-1, :])
    ref_b = jnp.full((hm, wm), UN, jnp.int32).at[1:, :].set(ref_map[:-1, :])
    # C = top-right with D (top-left) substitution at the last column
    mv_c = jnp.zeros((hm, wm, 2), jnp.int32).at[1:, :-1].set(
        mv_map[:-1, 1:])
    ref_c = jnp.full((hm, wm), UN, jnp.int32).at[1:, :-1].set(
        ref_map[:-1, 1:])
    if wm > 1:
        mv_c = mv_c.at[1:, wm - 1].set(mv_map[:-1, wm - 2])
        ref_c = ref_c.at[1:, wm - 1].set(ref_map[:-1, wm - 2])
    # slice starts: top row neighbors unavailable
    mask = np.zeros((hm, 1), dtype=bool)
    for r in slice_rows:
        mask[int(r)] = True
    maskj = jnp.asarray(mask)
    ref_b = jnp.where(maskj, UN, ref_b)
    ref_c = jnp.where(maskj, UN, ref_c)
    mv_b = jnp.where(maskj[..., None], 0, mv_b)
    mv_c = jnp.where(maskj[..., None], 0, mv_c)
    n = wm * hm
    return {k: v.reshape((n,) + v.shape[2:]) for k, v in
            dict(mv_a=mv_a, ref_a=ref_a, mv_b=mv_b, ref_b=ref_b,
                 mv_c=mv_c, ref_c=ref_c).items()}


def _cell_grids_j(mb, wm: int, hm: int):
    """Per-MB boundary-cell motion grids (tr / bl / br channels — the
    4x4 cells later MVP derivations can read; see inter_frame) from the
    final decided maps incl. 16x8/8x16 partitions."""
    n = wm * hm
    is_inter = mb["is_inter"].astype(bool)
    mv = mb["mv"].astype(jnp.int32)
    mv2 = mb.get("mv2", mb["mv"]).astype(jnp.int32)
    ptype = (mb["ptype"].astype(jnp.int32) if "ptype" in mb
             else jnp.zeros(n, jnp.int32))
    ref = jnp.where(is_inter, 0, mvpred.INTRA).reshape(hm, wm)\
        .astype(jnp.int32)

    def cell(sel2):
        m = jnp.where(sel2[:, None], mv2, mv)
        return jnp.where(is_inter[:, None], m, 0).reshape(hm, wm, 2)

    return (cell(ptype == 2), cell(ptype == 1), cell(ptype > 0), ref)


def _shift_nbrs_j(grid_tr, grid_bl, grid_br, ref_g, wm, hm, slice_rows):
    """(A, B, C-with-D-subst, raw D) neighbor (mv, ref) arrays at MB
    granularity from the channel grids."""
    UN = mvpred.UNAVAIL
    z2 = jnp.zeros((hm, wm, 2), jnp.int32)
    un = jnp.full((hm, wm), UN, jnp.int32)
    mv_a = z2.at[:, 1:].set(grid_tr[:, :-1])
    ref_a = un.at[:, 1:].set(ref_g[:, :-1])
    mv_b = z2.at[1:, :].set(grid_bl[:-1, :])
    ref_b = un.at[1:, :].set(ref_g[:-1, :])
    mv_c = z2.at[1:, :-1].set(grid_bl[:-1, 1:])
    ref_c = un.at[1:, :-1].set(ref_g[:-1, 1:])
    mv_d = z2.at[1:, 1:].set(grid_br[:-1, :-1])
    ref_d = un.at[1:, 1:].set(ref_g[:-1, :-1])
    mask = np.zeros((hm, 1), dtype=bool)
    for r in slice_rows:
        mask[int(r)] = True
    mj = jnp.asarray(mask)
    ref_b = jnp.where(mj, UN, ref_b)
    ref_c = jnp.where(mj, UN, ref_c)
    ref_d = jnp.where(mj, UN, ref_d)
    mv_b = jnp.where(mj[..., None], 0, mv_b)
    mv_c = jnp.where(mj[..., None], 0, mv_c)
    mv_d = jnp.where(mj[..., None], 0, mv_d)
    # C → D substitution when the top-right MB is unavailable
    use_d = ref_c == UN
    mv_c = jnp.where(use_d[..., None], mv_d, mv_c)
    ref_c = jnp.where(use_d, ref_d, ref_c)
    n = wm * hm
    f = lambda a: a.reshape((n,) + a.shape[2:])
    return (f(mv_a), f(ref_a), f(mv_b), f(ref_b), f(mv_c), f(ref_c),
            f(mv_d), f(ref_d))


def _cell_grids2_j(ptype, mv_p0, mv_p1, use_p0, use_p1, is_inter,
                   wm: int, hm: int, mvq=None):
    """Per-list boundary-cell grids with per-CHANNEL refs.

    Generalizes `_cell_grids_j` to lists a partition may not use (B
    slices): a cell covered by a partition that uses the list carries
    (mv, ref 0); covered by a non-using partition or an intra MB it
    carries (0, INTRA) — spec 8.4.1.3 "refIdxLXN = -1" semantics.
    `mvq` [n, 4, 2]: P_8x8 quadrant mvs — on ptype == 3 the boundary
    cells are tr <- q1, bl <- q2, br <- q3."""
    def cell(sel2, qi):
        m = jnp.where(sel2[:, None], mv_p1, mv_p0)
        if mvq is not None:
            m = jnp.where((ptype == 3)[:, None], mvq[:, qi], m)
        use = jnp.where(sel2, use_p1, use_p0) & is_inter
        mvg = jnp.where(use[:, None], m, 0).reshape(hm, wm, 2)
        refg = jnp.where(use, 0, mvpred.INTRA).reshape(hm, wm)\
            .astype(jnp.int32)
        return mvg, refg

    tr, ref_tr = cell(ptype == 2, 1)
    bl, ref_bl = cell(ptype == 1, 2)
    br, ref_br = cell(ptype > 0, 3)
    return tr, ref_tr, bl, ref_bl, br, ref_br


def _partition_mvds_core_j(ptype, mv_p0, mv_p1, p0_ref,
                           tr, ref_tr, bl, ref_bl, br, ref_br,
                           wm: int, hm: int, slice_rows, mvq=None):
    """Per-partition mvds from per-list channel grids — the decoder's
    spec-8.4.1.3 derivation incl. the 16x8/8x16 directional shortcuts.

    `p0_ref` [n]: the current MB's part0 ref FOR THIS LIST (0 when the
    partition uses the list, INTRA otherwise) — part1's within-MB
    neighbors read it.  Returns (mvd0 [n, 2], mvd1 [n, 2], pred16).
    With `mvq` [n, 4, 2] (P_8x8 quadrant mvs): quadrant predictors use
    the general median rule with raster-order sibling neighbors
    (decoder `_mv_pred_part` on 8x8 shapes); ptype == 3 rows of
    mvd0/mvd1 become q0/q1's mvds and the return gains
    mvdq [n, 4, 2]: (mvd0, mvd1, mvdq, pred16)."""
    UN = mvpred.UNAVAIL
    z2 = jnp.zeros((hm, wm, 2), jnp.int32)
    un = jnp.full((hm, wm), UN, jnp.int32)
    n = wm * hm
    f = lambda a: a.reshape((n,) + a.shape[2:])
    mask = np.zeros((hm, 1), dtype=bool)
    for r in slice_rows:
        mask[int(r)] = True
    mj = jnp.asarray(mask)

    def leftg(g, rg):
        mvv = z2.at[:, 1:].set(g[:, :-1])
        rr = un.at[:, 1:].set(rg[:, :-1])
        return f(mvv), f(rr)

    def topg(g, rg, dc=0):
        if dc == 0:
            mvv = z2.at[1:, :].set(g[:-1, :])
            rr = un.at[1:, :].set(rg[:-1, :])
        else:                              # top-RIGHT MB (C position)
            mvv = z2.at[1:, :-1].set(g[:-1, 1:])
            rr = un.at[1:, :-1].set(rg[:-1, 1:])
        rr = jnp.where(mj, UN, rr)
        mvv = jnp.where(mj[..., None], 0, mvv)
        return f(mvv), f(rr)

    def topleftg(g, rg):
        mvv = z2.at[1:, 1:].set(g[:-1, :-1])
        rr = un.at[1:, 1:].set(rg[:-1, :-1])
        rr = jnp.where(mj, UN, rr)
        mvv = jnp.where(mj[..., None], 0, mvv)
        return f(mvv), f(rr)

    # 16x16 neighbors: A = left MB tr cell, B = top MB bl cell,
    # C = top-right MB bl cell (D-subst -> top-left MB br cell)
    mv_a, ref_a = leftg(tr, ref_tr)
    mv_b, ref_b = topg(bl, ref_bl)
    mv_c, ref_c = topg(bl, ref_bl, dc=1)
    mv_d, ref_d = topleftg(br, ref_br)
    use_d = ref_c == UN
    mv_c16 = jnp.where(use_d[:, None], mv_d, mv_c)
    ref_c16 = jnp.where(use_d, ref_d, ref_c)
    pred16 = mvpred.predict_mv_jnp(mv_a, ref_a, mv_b, ref_b,
                                   mv_c16, ref_c16)
    # 8x16 left half: its C is the TOP MB's col-2 cell (br channel),
    # with D-substitution to the top-left MB's br cell
    mv_tbr, ref_tbr = topg(br, ref_br)
    use_d0 = ref_tbr == UN
    mv_c0 = jnp.where(use_d0[:, None], mv_d, mv_tbr)
    ref_c0 = jnp.where(use_d0, ref_d, ref_tbr)
    pred_8x16_0 = mvpred.predict_mv_jnp(mv_a, ref_a, mv_b, ref_b,
                                        mv_c0, ref_c0)
    pred_8x16_0 = jnp.where((ref_a == 0)[:, None], mv_a, pred_8x16_0)
    # part0: 16x8 top prefers B (ref 0), else the 16-wide median
    pred0 = jnp.where((ptype == 2)[:, None], pred_8x16_0,
                      jnp.where(((ptype == 1) & (ref_b == 0))[:, None],
                                mv_b, pred16))
    # ---- part1 ----
    # own part0 as a neighbor: predict_mv expects mv already zeroed for
    # neighbors whose refIdx != 0 (a part0 not using this list)
    mv_p0n = jnp.where((p0_ref == 0)[:, None], mv_p0, 0)
    # 16x8 bottom: A = left MB rows 2-3 (br channel); shortcut on A;
    # B = own part0 (ref = p0_ref); C unavailable → D = left MB
    # rows 0-1 (tr channel)
    mv_lbr, ref_lbr = leftg(br, ref_br)
    mv_ltr, ref_ltr = mv_a, ref_a
    p1_16x8 = mvpred.predict_mv_jnp(mv_lbr, ref_lbr, mv_p0n, p0_ref,
                                    mv_ltr, ref_ltr)
    p1_16x8 = jnp.where((ref_lbr == 0)[:, None], mv_lbr, p1_16x8)
    # 8x16 right: A = own part0 (ref = p0_ref); B = top MB col-2 cell
    # (br channel); C = top-right MB bottom-left (bl), D-subst -> top
    # MB bl; shortcut on C
    mv_tbl, ref_tbl = topg(bl, ref_bl)
    mv_cr, ref_cr = topg(bl, ref_bl, dc=1)
    use_d1 = ref_cr == UN
    mv_c1 = jnp.where(use_d1[:, None], mv_tbl, mv_cr)
    ref_c1 = jnp.where(use_d1, ref_tbl, ref_cr)
    p1_8x16 = mvpred.predict_mv_jnp(mv_p0n, p0_ref,
                                    mv_tbr, ref_tbr, mv_c1, ref_c1)
    p1_8x16 = jnp.where((ref_c1 == 0)[:, None], mv_c1, p1_8x16)
    pred1 = jnp.where((ptype == 1)[:, None], p1_16x8, p1_8x16)
    mvd0 = mv_p0 - pred0
    mvd1 = mv_p1 - pred1
    if mvq is None:
        return mvd0, mvd1, pred16
    # ---- P_8x8 quadrant predictors (general rule, 8x8 shapes) ----
    zref = jnp.zeros(n, jnp.int32)       # within-MB siblings: ref 0
    q0, q1, q2, q3 = (mvq[:, i] for i in range(4))
    # q0: A = left tr, B = top bl, C = top br (D-subst -> topleft br)
    pred_q0 = mvpred.predict_mv_jnp(mv_a, ref_a, mv_b, ref_b,
                                    mv_c0, ref_c0)
    # q1: A = q0, B = top br, C = top-right bl (D-subst -> top MB
    # col 1, the bl channel)
    mv_cq1 = jnp.where(use_d[:, None], mv_b, mv_c)
    ref_cq1 = jnp.where(use_d, ref_b, ref_c)
    pred_q1 = mvpred.predict_mv_jnp(q0, zref, mv_tbr, ref_tbr,
                                    mv_cq1, ref_cq1)
    # q2: A = left br, B = q0, C = q1
    pred_q2 = mvpred.predict_mv_jnp(mv_lbr, ref_lbr, q0, zref, q1, zref)
    # q3: A = q2, B = q1, C always unavailable -> D = q0
    pred_q3 = mvpred.predict_mv_jnp(q2, zref, q1, zref, q0, zref)
    on8 = (ptype == 3)[:, None]
    mvdq = jnp.stack([q0 - pred_q0, q1 - pred_q1,
                      q2 - pred_q2, q3 - pred_q3], axis=1)
    mvd0 = jnp.where(on8, mvdq[:, 0], mvd0)
    mvd1 = jnp.where(on8, mvdq[:, 1], mvd1)
    return mvd0, mvd1, mvdq, pred16


def _partition_mvds_j(mb, wm: int, hm: int, slice_rows):
    """Per-partition mvds for P ptype streams (every inter partition
    uses list 0, ref 0).  Returns (mvd0 [n, 2], mvd1 [n, 2], pred16),
    plus mvdq [n, 4, 2] before pred16 when mb carries "mvq" (P_8x8)."""
    n = wm * hm
    ptype = mb["ptype"].astype(jnp.int32)
    mv = mb["mv"].astype(jnp.int32)
    mv2 = mb["mv2"].astype(jnp.int32)
    mvq = (mb["mvq"].astype(jnp.int32) if "mvq" in mb else None)
    is_inter = mb["is_inter"].astype(bool)
    ones = jnp.ones(n, bool)
    tr, ref_tr, bl, ref_bl, br, ref_br = _cell_grids2_j(
        ptype, mv, mv2, ones, ones, is_inter, wm, hm, mvq=mvq)
    p0_ref = jnp.where(is_inter, 0, mvpred.INTRA).astype(jnp.int32)
    return _partition_mvds_core_j(ptype, mv, mv2, p0_ref,
                                  tr, ref_tr, bl, ref_bl, br, ref_br,
                                  wm, hm, slice_rows, mvq=mvq)


def serialize_frame_p_j(mb, wm: int, hm: int, slice_rows):
    """P-frame grids (mirror of slice_writer.serialize_frame_mbs_p).

    When `mb` carries ptype/mv2 (16x8 / 8x16 partitions), the header
    gains the second partition's mvd slots and mb_type follows Table
    7-13 (0/1/2).  With "mvq" (P_8x8, sub_mb_type = P_L0_8x8 on every
    quadrant) the header additionally gains the sub_mb_type slot (four
    ue(0) bits) and quadrant mvd slots.  Returns (values, lengths,
    skipped [n] bool).
    """
    n = wm * hm
    parts_mode = "ptype" in mb
    p8x8_mode = parts_mode and "mvq" in mb
    t8_mode = "t8" in mb
    ioff = 1 if t8_mode else 0
    poff = 1 if p8x8_mode else 0
    is_inter = mb["is_inter"].astype(bool)
    sel16 = mb["sel16"].astype(bool) & ~is_inter
    extra = (2 if parts_mode else 0) + 2 * ioff + 5 * poff
    n_slots = MB_SLOTS_P + extra
    hdr_slots = HDR_SLOTS_P + extra
    vals = [jnp.zeros(n, jnp.int32)] * n_slots
    lens = [jnp.zeros(n, jnp.int32)] * n_slots
    luma_ac = mb["luma_ac"].astype(jnp.int32)
    cbp_luma, cbp_chroma, cbp = _compute_cbp_j(
        sel16, luma_ac, mb["chroma_dc"], mb["chroma_ac"])

    mv = mb["mv"].astype(jnp.int32)
    mvdq = None
    if p8x8_mode:
        ptype = mb["ptype"].astype(jnp.int32)
        mvd, mvd1, mvdq, mv_pred = _partition_mvds_j(mb, wm, hm,
                                                     slice_rows)
    elif parts_mode:
        ptype = mb["ptype"].astype(jnp.int32)
        mvd, mvd1, mv_pred = _partition_mvds_j(mb, wm, hm, slice_rows)
    else:
        ptype = jnp.zeros(n, jnp.int32)
        mv_map = jnp.where(is_inter[:, None], mv, 0).reshape(hm, wm, 2)
        ref_map = jnp.where(is_inter, 0, mvpred.INTRA).reshape(hm, wm)\
            .astype(jnp.int32)
        nb = _neighbor_mvs_j(mv_map, ref_map, wm, hm, slice_rows)
        mv_pred = mvpred.predict_mv_jnp(nb["mv_a"], nb["ref_a"],
                                        nb["mv_b"], nb["ref_b"],
                                        nb["mv_c"], nb["ref_c"])
        mvd = mv - mv_pred

    mv_skip = mb["mv_skip"].astype(jnp.int32)
    skipped = is_inter & (ptype == 0) \
        & (mv == mv_skip).all(axis=1) & (cbp == 0)

    # mb_skip_run per coded MB: distance to previous coded MB in the slice
    pos = jnp.arange(n, dtype=jnp.int32)
    slice_first = np.zeros(n, dtype=np.int32)
    rows = [int(r) for r in slice_rows] + [hm]
    for s in range(len(rows) - 1):
        slice_first[rows[s] * wm: rows[s + 1] * wm] = rows[s] * wm
    slice_first = jnp.asarray(slice_first)
    coded = ~skipped
    coded_pos = jnp.where(coded, pos, -1)
    prev_coded = jax.lax.associative_scan(jnp.maximum, coded_pos)
    prev_excl = jnp.concatenate([jnp.array([-1], jnp.int32),
                                 prev_coded[:-1]])
    prev_excl = jnp.maximum(prev_excl, slice_first - 1)
    skip_run = pos - prev_excl - 1
    src, srl = ue_code_j(skip_run)
    vals[0] = jnp.where(coded, src.astype(jnp.int32), 0)
    lens[0] = jnp.where(coded, srl, 0)

    mbt_intra = 5 + jnp.where(sel16,
                              1 + mb["i16mode"].astype(jnp.int32)
                              + 4 * cbp_chroma + 12 * (cbp_luma > 0), 0)
    mbt = jnp.where(is_inter, ptype, mbt_intra)
    tc_, tl_ = ue_code_j(mbt)
    vals[1] = jnp.where(coded, tc_.astype(jnp.int32), 0)
    lens[1] = jnp.where(coded, tl_, 0)

    is_i4 = coded & ~is_inter & ~sel16
    inter_coded = coded & is_inter
    if p8x8_mode:
        # sub_mb_type x4, each ue(0) = '1' (P_L0_8x8), directly after
        # mb_type (spec 7.3.5.2)
        on8 = inter_coded & (ptype == 3)
        vals[2] = jnp.where(on8, 15, 0)    # 0b1111
        lens[2] = jnp.where(on8, 4, 0)
    if t8_mode:
        lens[2 + poff] = jnp.where(is_i4, 1, 0)  # t8 flag = 0 for I_NxN
    _i4_mode_slots_j(vals, lens, 2 + ioff + poff, mb, is_i4, wm, hm,
                     slice_rows)

    cmc, cml = ue_code_j(mb["cmode"].astype(jnp.int32))
    intra_coded = coded & ~is_inter
    vals[18 + ioff + poff] = jnp.where(intra_coded,
                                       cmc.astype(jnp.int32), 0)
    lens[18 + ioff + poff] = jnp.where(intra_coded, cml, 0)

    for k, comp in ((19 + ioff + poff, 1), (20 + ioff + poff, 0)):
        code, ln = ue_code_j(se_to_ue_j(mvd[:, comp]))
        vals[k] = jnp.where(inter_coded, code.astype(jnp.int32), 0)
        lens[k] = jnp.where(inter_coded, ln, 0)
    cbp_slot = 21 + ioff
    if parts_mode:
        # second partition's mvd (x then y) right after part0's
        on1 = inter_coded & (ptype > 0)
        for k, comp in ((21 + ioff + poff, 1), (22 + ioff + poff, 0)):
            code, ln = ue_code_j(se_to_ue_j(mvd1[:, comp]))
            vals[k] = jnp.where(on1, code.astype(jnp.int32), 0)
            lens[k] = jnp.where(on1, ln, 0)
        cbp_slot = 23 + ioff + poff
    if p8x8_mode:
        # quadrants q2 / q3 (x then y each) after q1's slots
        for k, qi, comp in ((23 + ioff + poff, 2, 1),
                            (24 + ioff + poff, 2, 0),
                            (25 + ioff + poff, 3, 1),
                            (26 + ioff + poff, 3, 0)):
            code, ln = ue_code_j(se_to_ue_j(mvdq[:, qi, comp]))
            vals[k] = jnp.where(on8, code.astype(jnp.int32), 0)
            lens[k] = jnp.where(on8, ln, 0)
        cbp_slot = 27 + ioff + poff

    ci, li_ = ue_code_j(_jt("cbpi", mb_syntax.CBP_TO_CODENUM_INTRA)[cbp])
    cp, lp_ = ue_code_j(_jt("cbpp", mb_syntax.CBP_TO_CODENUM_INTER)[cbp])
    vals[cbp_slot] = jnp.where(inter_coded, cp.astype(jnp.int32),
                               jnp.where(is_i4, ci.astype(jnp.int32), 0))
    lens[cbp_slot] = jnp.where(inter_coded, lp_,
                               jnp.where(is_i4, li_, 0))

    dq_slot = cbp_slot + 1
    if t8_mode:
        # transform_size_8x8_flag after cbp for inter MBs with luma
        # residual (spec 7.3.5; 16x16 / 16x8 / 8x16 all qualify)
        t8v = mb["t8"].astype(bool)
        flag_on = inter_coded & (cbp_luma > 0)
        vals[dq_slot] = jnp.where(flag_on & t8v, 1, 0)
        lens[dq_slot] = jnp.where(flag_on, 1, 0)
        dq_slot += 1

    has_delta = coded & (sel16 | (cbp > 0))
    vals[dq_slot] = jnp.where(has_delta, 1, 0)
    lens[dq_slot] = jnp.where(has_delta, 1, 0)

    _residual_slots_j(vals, lens, hdr_slots, mb, sel16, cbp_luma,
                      cbp_chroma, wm, hm, slice_rows)
    return jnp.stack(vals, axis=1), jnp.stack(lens, axis=1), skipped


HDR_SLOTS_B = 25
MB_SLOTS_B = HDR_SLOTS_B + 27 * SLOTS_PER_BLOCK


def serialize_frame_b_j(mb, wm: int, hm: int, slice_rows):
    """B-frame element grids (16x16 L0/L1/Bi, spatial direct/skip,
    16x8 / 8x16 two-partition types, intra).

    `mb` carries btype (0=L0, 1=L1, 2=Bi, 3=Direct, 4=intra,
    5=two-partition), final per-list motion mv0/mv1 with use0/use1
    flags (direct included; part0's for btype 5), plus — in partition
    mode — bptype (1=16x8, 2=8x16), c0/c1 (per-partition 0=L0, 1=L1,
    2=Bi) and mv0b/mv1b (part1 per-list MVs), and the shared
    intra/residual fields.  Direct MBs with cbp 0 become B_Skip runs.
    Bitstream order mirrors decode.decoder._decode_mb_b / _b_parts.
    Returns (values, lengths, skipped [n] bool).
    """
    n = wm * hm
    parts_mode = "bptype" in mb
    btype = mb["btype"].astype(jnp.int32)
    is_inter = btype != 4
    is_direct = btype == 3
    partd = btype == 5
    use0 = mb["use0"].astype(bool)
    use1 = mb["use1"].astype(bool)
    if parts_mode:
        from tpu264.coding.b_frame import COMBO_IDX
        bptype = mb["bptype"].astype(jnp.int32)
        c0 = mb["c0"].astype(jnp.int32)
        c1 = mb["c1"].astype(jnp.int32)
        combo_u0 = jnp.asarray(np.array([1, 0, 1], np.bool_))
        combo_u1 = jnp.asarray(np.array([0, 1, 1], np.bool_))
        use0b = jnp.where(partd, combo_u0[c1], use0)
        use1b = jnp.where(partd, combo_u1[c1], use1)
        exp0 = jnp.where(partd, combo_u0[c0],
                         (btype == 0) | (btype == 2))
        exp1 = jnp.where(partd, combo_u1[c0],
                         (btype == 1) | (btype == 2))
        exp0b = partd & combo_u0[c1]
        exp1b = partd & combo_u1[c1]
    else:
        bptype = jnp.zeros(n, jnp.int32)
        exp0 = (btype == 0) | (btype == 2)     # lists with explicit mvd
        exp1 = (btype == 1) | (btype == 2)
    sel16 = mb["sel16"].astype(bool) & ~is_inter
    t8_mode = "t8" in mb
    ioff = 1 if t8_mode else 0
    n_slots = MB_SLOTS_B + (4 if parts_mode else 0) + 2 * ioff
    vals = [jnp.zeros(n, jnp.int32)] * n_slots
    lens = [jnp.zeros(n, jnp.int32)] * n_slots
    luma_ac = mb["luma_ac"].astype(jnp.int32)
    cbp_luma, cbp_chroma, cbp = _compute_cbp_j(
        sel16, luma_ac, mb["chroma_dc"], mb["chroma_ac"])

    skipped = is_direct & (cbp == 0)
    coded = ~skipped

    # mb_skip_run per coded MB (same prefix-scan as the P serializer)
    pos = jnp.arange(n, dtype=jnp.int32)
    slice_first = np.zeros(n, dtype=np.int32)
    rows = [int(r) for r in slice_rows] + [hm]
    for s in range(len(rows) - 1):
        slice_first[rows[s] * wm: rows[s + 1] * wm] = rows[s] * wm
    slice_first = jnp.asarray(slice_first)
    coded_pos = jnp.where(coded, pos, -1)
    prev_coded = jax.lax.associative_scan(jnp.maximum, coded_pos)
    prev_excl = jnp.concatenate([jnp.array([-1], jnp.int32),
                                 prev_coded[:-1]])
    prev_excl = jnp.maximum(prev_excl, slice_first - 1)
    skip_run = pos - prev_excl - 1
    src, srl = ue_code_j(skip_run)
    vals[0] = jnp.where(coded, src.astype(jnp.int32), 0)
    lens[0] = jnp.where(coded, srl, 0)

    mbt_intra = 23 + jnp.where(sel16,
                               1 + mb["i16mode"].astype(jnp.int32)
                               + 4 * cbp_chroma + 12 * (cbp_luma > 0), 0)
    mbt = jnp.where(is_direct, 0,
                    jnp.where(is_inter, btype + 1, mbt_intra))
    if parts_mode:
        # Table 7-14 mb_type 4..21: 4 + 2*combo + (8x16)
        mbt_part = (4 + 2 * jnp.asarray(COMBO_IDX)[c0 * 3 + c1]
                    + (bptype == 2).astype(jnp.int32))
        mbt = jnp.where(partd, mbt_part, mbt)
    tc_, tl_ = ue_code_j(mbt)
    vals[1] = jnp.where(coded, tc_.astype(jnp.int32), 0)
    lens[1] = jnp.where(coded, tl_, 0)

    is_i4 = coded & ~is_inter & ~sel16
    if t8_mode:
        lens[2] = jnp.where(is_i4, 1, 0)   # t8 flag = 0 for I_NxN
    _i4_mode_slots_j(vals, lens, 2 + ioff, mb, is_i4, wm, hm, slice_rows)

    intra_coded = coded & ~is_inter
    cmc, cml = ue_code_j(mb["cmode"].astype(jnp.int32))
    vals[18 + ioff] = jnp.where(intra_coded, cmc.astype(jnp.int32), 0)
    lens[18 + ioff] = jnp.where(intra_coded, cml, 0)

    # per-list mvd (x then y): predictors from the FINAL per-list maps
    # (direct motion participates as a neighbor); mvd written only for
    # the explicit lists of non-direct inter MBs.  Stream order (spec
    # 7.3.5.1): mvd_l0 part0, part1, then mvd_l1 part0, part1.
    if parts_mode:
        for mv_key, mvb_key, u_p0, u_p1, e_p0, e_p1, slot0 in (
                ("mv0", "mv0b", use0, use0b, exp0, exp0b, 19 + ioff),
                ("mv1", "mv1b", use1, use1b, exp1, exp1b, 23 + ioff)):
            mv_p0 = mb[mv_key].astype(jnp.int32)
            mv_p1 = mb[mvb_key].astype(jnp.int32)
            tr, rtr, bl, rbl, br, rbr = _cell_grids2_j(
                bptype, mv_p0, mv_p1, u_p0, u_p1, is_inter, wm, hm)
            p0_ref = jnp.where(is_inter & u_p0, 0, mvpred.INTRA)\
                .astype(jnp.int32)
            mvd0, mvd1, _ = _partition_mvds_core_j(
                bptype, mv_p0, mv_p1, p0_ref, tr, rtr, bl, rbl, br, rbr,
                wm, hm, slice_rows)
            on0 = coded & e_p0
            on1 = coded & e_p1
            for mvd, on, s0 in ((mvd0, on0, slot0),
                                (mvd1, on1, slot0 + 2)):
                for k, comp in ((s0, 1), (s0 + 1, 0)):
                    code, ln = ue_code_j(se_to_ue_j(mvd[:, comp]))
                    vals[k] = jnp.where(on, code.astype(jnp.int32), 0)
                    lens[k] = jnp.where(on, ln, 0)
    else:
        for mv_key, use, exp, slot0 in (("mv0", use0, exp0, 19 + ioff),
                                        ("mv1", use1, exp1, 21 + ioff)):
            mv = mb[mv_key].astype(jnp.int32)
            mv_map = jnp.where(use[:, None], mv, 0).reshape(hm, wm, 2)
            ref_map = jnp.where(use, 0, mvpred.INTRA).reshape(hm, wm)\
                .astype(jnp.int32)
            nb = _neighbor_mvs_j(mv_map, ref_map, wm, hm, slice_rows)
            mv_pred = mvpred.predict_mv_jnp(nb["mv_a"], nb["ref_a"],
                                            nb["mv_b"], nb["ref_b"],
                                            nb["mv_c"], nb["ref_c"])
            mvd = mv - mv_pred
            for k, comp in ((slot0, 1), (slot0 + 1, 0)):
                code, ln = ue_code_j(se_to_ue_j(mvd[:, comp]))
                vals[k] = jnp.where(exp, code.astype(jnp.int32), 0)
                lens[k] = jnp.where(exp, ln, 0)

    poff = 4 if parts_mode else 0
    ci, li_ = ue_code_j(_jt("cbpi", mb_syntax.CBP_TO_CODENUM_INTRA)[cbp])
    cp, lp_ = ue_code_j(_jt("cbpp", mb_syntax.CBP_TO_CODENUM_INTER)[cbp])
    inter_coded = coded & is_inter
    cbp_slot = 23 + poff + ioff
    vals[cbp_slot] = jnp.where(inter_coded, cp.astype(jnp.int32),
                               jnp.where(is_i4, ci.astype(jnp.int32), 0))
    lens[cbp_slot] = jnp.where(inter_coded, lp_,
                               jnp.where(is_i4, li_, 0))

    dq_slot = cbp_slot + 1
    if t8_mode:
        # transform_size_8x8_flag (value 0: our B engines are 4x4-only)
        # after cbp for inter MBs with luma residual — direct included
        # (sps.direct_8x8_inference_flag == 1), 16x8/8x16 qualify
        flag_on = inter_coded & (cbp_luma > 0)
        lens[dq_slot] = jnp.where(flag_on, 1, 0)
        dq_slot += 1

    has_delta = coded & (sel16 | (cbp > 0))
    vals[dq_slot] = jnp.where(has_delta, 1, 0)
    lens[dq_slot] = jnp.where(has_delta, 1, 0)

    _residual_slots_j(vals, lens, HDR_SLOTS_B + poff + 2 * ioff, mb,
                      sel16, cbp_luma, cbp_chroma, wm, hm, slice_rows)
    return jnp.stack(vals, axis=1), jnp.stack(lens, axis=1), skipped


# ---------------------------------------------------------------- packing

def pack_slices_j(values, lengths, n_slices: int, cap_words: int):
    """Pack per-slice element grids into 32-bit word streams on device.

    values/lengths: [n_mbs, slots] int32 (codes < 2^31, lengths <= 31).
    The n_mbs axis is split into `n_slices` equal segments; each packs
    from bit 0 of its own word buffer.

    Returns (words [n_slices, cap_words] uint32 big-endian bit order,
             nbits [n_slices] int32).
    """
    n, slots = values.shape
    per = n // n_slices
    v = values.reshape(n_slices, per * slots).astype(jnp.uint32)
    l = lengths.reshape(n_slices, per * slots)
    starts = jnp.cumsum(l, axis=1) - l
    nbits = starts[:, -1] + l[:, -1]
    off = starts & 31
    w = starts >> 5
    # MSB-first split across two words in pure 32-bit arithmetic (uint64
    # is unavailable without x64): word w takes the code's top
    # `take = min(len, 32-off)` bits, word w+1 the remaining `len-take`.
    take = jnp.minimum(l, 32 - off)
    rem = l - take                                       # bits in word w+1
    hi = ((v >> rem.astype(jnp.uint32))
          << jnp.minimum(32 - off - take, 31).astype(jnp.uint32))
    lo_mask = jnp.where(rem > 0, (jnp.uint32(1) << jnp.minimum(
        rem, 31).astype(jnp.uint32)) - jnp.uint32(1), jnp.uint32(0))
    lo = (v & lo_mask) << jnp.where(rem > 0, 32 - rem, 0).astype(jnp.uint32)
    hi = jnp.where(l > 0, hi, 0)
    lo = jnp.where(rem > 0, lo, 0)
    words = jnp.zeros((n_slices, cap_words), dtype=jnp.uint32)
    sl_idx = jnp.broadcast_to(jnp.arange(n_slices)[:, None], w.shape)
    # disjoint bit ranges -> add == or
    words = words.at[sl_idx, w].add(hi, mode="drop")
    words = words.at[sl_idx, w + 1].add(lo, mode="drop")
    return words, nbits


def words_to_rbsp(words: np.ndarray, nbits: int, header_sink,
                  final_skip_run: int | None = None) -> bytes:
    """Merge host-written slice-header bits with a device-packed body.

    `header_sink` is the BitSink holding the slice header; the body
    (words/nbits) is appended at the current bit position, an optional
    trailing mb_skip_run is emitted, then rbsp_trailing_bits closes the
    RBSP (mirror of slice_writer.pack_slice).
    """
    words = np.asarray(words, dtype=np.uint32)
    # feed the body as 64-bit codes (one per pair of device words)
    nbits = int(nbits)
    n64 = nbits // 64
    if words.size % 2:
        words = np.concatenate([words, np.zeros(1, np.uint32)])
    w64 = (words[0::2].astype(np.uint64) << np.uint64(32)) \
        | words[1::2].astype(np.uint64)
    header_sink.put_array(w64[:n64], np.full(n64, 64, dtype=np.int64))
    rem = nbits - n64 * 64
    if rem:
        header_sink.put(int(w64[n64] >> np.uint64(64 - rem)), rem)
    if final_skip_run is not None and final_skip_run > 0:
        from tpu264.bits.expgolomb import write_ue
        write_ue(header_sink, final_skip_run)
    header_sink.rbsp_trailing_bits()
    return header_sink.to_bytes()
