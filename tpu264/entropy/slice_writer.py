"""Slice-data serialization: per-MB element grids → RBSP bytes (CAVLC).

The write path of JM's `encode_one_slice`/`writeMBLayer` (SURVEY.md §3.1)
re-shaped for batch hardware: all syntax elements of every MB in the frame
are computed as dense (value, length) numpy grids — header elements via
vectorized Exp-Golomb, residual blocks via `cavlc.encode_blocks` — and
each slice's bits are packed in one `pack_bits` pass.  Fixed layout per
MB: 20 header slots + 27 residual blocks x 36 slots; absent elements have
length 0.
"""

from __future__ import annotations

import numpy as np

from tpu264.bits.bitwriter import pack_bits
from tpu264.bits.expgolomb import se_to_ue, ue_code
from tpu264.coding.wavefront import BLK_ORDER
from . import cavlc, mb_syntax

HDR_SLOTS = 20
RES_BLOCKS = 1 + 16 + 2 + 8     # I16DC, 16 luma, 2 chroma DC, 8 chroma AC
MB_SLOTS = HDR_SLOTS + RES_BLOCKS * cavlc.SLOTS_PER_BLOCK


def serialize_frame_mbs(mb, width_mbs: int, height_mbs: int,
                        slice_start_rows) -> tuple[np.ndarray, np.ndarray]:
    """Build the [n_mbs, MB_SLOTS] (value, length) grids for an I frame.

    `mb` is the dict from `reorder_wave_outputs`: sel16, i16mode, modes,
    cmode, luma_ac [n,16,16], luma_dc [n,16], chroma_dc [n,2,4],
    chroma_ac [n,2,4,16].
    """
    n = width_mbs * height_mbs
    sel16 = mb["sel16"].astype(bool)
    values = np.zeros((n, MB_SLOTS), dtype=np.uint64)
    lengths = np.zeros((n, MB_SLOTS), dtype=np.int64)

    luma_ac = mb["luma_ac"].astype(np.int64)
    cbp_luma, cbp_chroma, cbp = mb_syntax.compute_cbp(
        sel16, luma_ac, mb["chroma_dc"], mb["chroma_ac"])

    # --- header elements ---
    mbt = mb_syntax.mb_type_i(sel16, mb["i16mode"], cbp_chroma, cbp_luma)
    values[:, 0], lengths[:, 0] = ue_code(mbt)

    # intra 4x4 pred modes: flag / flag+rem, against MPM from the final maps
    modes_grid = np.full((height_mbs * 4, width_mbs * 4), -1, dtype=np.int64)
    mb_r = np.arange(n) // width_mbs
    mb_c = np.arange(n) % width_mbs
    modes = mb["modes"].astype(np.int64)          # [n,16] zig-zag order
    for idx, (by, bx) in enumerate(BLK_ORDER):
        modes_grid[mb_r * 4 + by, mb_c * 4 + bx] = np.where(
            sel16, -1, modes[:, idx])
    mpm = mb_syntax.mpm_grid(modes_grid, [r * 4 for r in slice_start_rows])
    for idx, (by, bx) in enumerate(BLK_ORDER):
        m = modes[:, idx]
        p = mpm[mb_r * 4 + by, mb_c * 4 + bx]
        is_mpm = m == p
        rem = m - (m > p)
        values[:, 1 + idx] = np.where(is_mpm, 1, rem).astype(np.uint64)
        lengths[:, 1 + idx] = np.where(~sel16, np.where(is_mpm, 1, 4), 0)

    values[:, 17], lengths[:, 17] = ue_code(mb["cmode"].astype(np.int64))

    cbp_code, cbp_len = ue_code(mb_syntax.CBP_TO_CODENUM_INTRA[cbp])
    values[:, 18] = np.where(~sel16, cbp_code, 0)
    lengths[:, 18] = np.where(~sel16, cbp_len, 0)

    # mb_qp_delta (always 0: fixed QP) when residual or I16x16 present
    has_delta = sel16 | (cbp > 0)
    dq_code, dq_len = ue_code(se_to_ue(np.zeros(n, dtype=np.int64)))
    values[:, 19] = np.where(has_delta, dq_code, 0)
    lengths[:, 19] = np.where(has_delta, dq_len, 0)

    # --- nC maps ---
    ltc = mb_syntax.luma_tc_grid(sel16, cbp_luma, luma_ac,
                                 width_mbs, height_mbs)
    lnc = mb_syntax.nc_from_grid(ltc, 4, [r * 4 for r in slice_start_rows])
    ctc = [mb_syntax.chroma_tc_grid(cbp_chroma, mb["chroma_ac"], comp,
                                    width_mbs, height_mbs)
           for comp in range(2)]
    cnc = [mb_syntax.nc_from_grid(g, 2, [r * 2 for r in slice_start_rows])
           for g in ctc]

    def put_block(slot: int, coeffs, nc, max_coeff, coded):
        v, l, _ = cavlc.encode_blocks(coeffs, nc, max_coeff)
        s0 = HDR_SLOTS + slot * cavlc.SLOTS_PER_BLOCK
        s1 = s0 + cavlc.SLOTS_PER_BLOCK
        values[:, s0:s1] = np.where(coded[:, None], v, 0)
        lengths[:, s0:s1] = np.where(coded[:, None], l, 0)

    # I16x16 DC block: nC of luma block idx 0
    nc_dc = lnc[mb_r * 4, mb_c * 4]
    put_block(0, mb["luma_dc"].astype(np.int64), nc_dc, 16, sel16)

    # luma blocks (zig-zag idx order)
    for idx, (by, bx) in enumerate(BLK_ORDER):
        nc = lnc[mb_r * 4 + by, mb_c * 4 + bx]
        blk16 = luma_ac[:, idx]
        coded8 = ((cbp_luma >> (idx // 4)) & 1) > 0
        # I_4x4: 16-coeff block; I_16x16: 15-coeff AC block
        vi, li, _ = cavlc.encode_blocks(blk16, nc, 16)
        va, la, _ = cavlc.encode_blocks(blk16[:, 1:], nc, 15)
        s0 = HDR_SLOTS + (1 + idx) * cavlc.SLOTS_PER_BLOCK
        s1 = s0 + cavlc.SLOTS_PER_BLOCK
        use = coded8[:, None]
        values[:, s0:s1] = np.where(use, np.where(sel16[:, None], va, vi), 0)
        lengths[:, s0:s1] = np.where(use, np.where(sel16[:, None], la, li), 0)

    # chroma DC (nC = -1), coded when cbp_chroma >= 1
    for comp in range(2):
        put_block(17 + comp, mb["chroma_dc"][:, comp].astype(np.int64),
                  np.full(n, -1), 4, cbp_chroma >= 1)

    # chroma AC (15-coeff), coded when cbp_chroma == 2
    for comp in range(2):
        for idx in range(4):
            by, bx = idx // 2, idx % 2
            nc = cnc[comp][mb_r * 2 + by, mb_c * 2 + bx]
            put_block(19 + comp * 4 + idx,
                      mb["chroma_ac"][:, comp, idx, 1:].astype(np.int64),
                      nc, 15, cbp_chroma == 2)

    return values, lengths


def pack_slice(values: np.ndarray, lengths: np.ndarray, header_sink):
    """Concatenate slice-header bits + MB element grid → RBSP bytes."""
    header_sink.put_array(values.reshape(-1), lengths.reshape(-1))
    header_sink.rbsp_trailing_bits()
    return header_sink.to_bytes()
