"""CABAC syntax layer: binarization + context-index derivation (spec 9.3.2,
9.3.3.1; JM `cabac.c` ctxIdx machinery — SURVEY.md §2a #6).

Every syntax element is implemented as an encode/decode PAIR sitting next
to each other, driven by the same context-increment helpers over a shared
`CabacFrameState`, so the encoder and decoder cannot diverge on context
derivation.  The arithmetic engine itself lives in `cabac_engine`.

Context index map used (frame coding, progressive — spec Table 9-11):
  3..10   mb_type (I slices)            11..13  mb_skip_flag (P)
  14..20  mb_type (P) + intra suffix    21..23  sub_mb_type (P)
  40..53  mvd x / y                     54..59  ref_idx
  60..63  mb_qp_delta                   64..67  intra_chroma_pred_mode
  68..69  intra4x4 pred mode            73..84  coded_block_pattern
  85..104 coded_block_flag              105..165 significant_coeff_flag
  166..226 last_significant_coeff_flag  227..275 coeff_abs_level_minus1
  276     end_of_slice / terminate bins
"""

from __future__ import annotations

import numpy as np

# MB kinds tracked for context derivation
K_SKIP = 0
K_INTER = 1     # inter-coded, not skip
K_I4 = 2
K_I16 = 3
K_DIRECT = 4    # B_Direct_16x16 (coded, but direct for mb_type ctx)

# ctxBlockCat offsets
SIG_CAT_OFF = (0, 15, 29, 44, 47)     # significant / last maps
LVL_CAT_OFF = (0, 10, 20, 30, 39, 199)  # coeff_abs_level_minus1 (cat5->426)
CBF_CAT_OFF = (0, 4, 8, 12, 16)

# cat-5 (luma 8x8, frame coding) context maps, spec Table 9-43:
# significant_coeff_flag ctx = 402 + SIG8_MAP[i]; last ctx = 417 +
# LAST8_MAP[i] for scan position i of 63
SIG8_MAP = (
    0, 1, 2, 3, 4, 5, 5, 4, 4, 3, 3, 4, 4, 4, 5, 5,
    4, 4, 4, 4, 3, 3, 6, 7, 7, 7, 8, 9, 10, 9, 8, 7,
    7, 6, 11, 12, 13, 11, 6, 7, 8, 9, 14, 10, 9, 8, 6, 11,
    12, 13, 11, 6, 9, 14, 10, 9, 11, 12, 13, 11, 14, 10, 12)
LAST8_MAP = (
    0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    3, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4, 4, 4, 4, 4,
    5, 5, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7, 8, 8, 8)


class CabacFrameState:
    """Per-frame neighbor state consulted for context increments.

    Values are stored as each MB finishes coding; availability is gated by
    `slice_id`, so stale values from other slices are never consulted.
    """

    def __init__(self, wm: int, hm: int):
        self.wm, self.hm = wm, hm
        self.kind = np.full((hm, wm), -1, dtype=np.int64)
        self.slice_id = np.full((hm, wm), -1, dtype=np.int64)
        self.cbp_luma = np.zeros((hm, wm), dtype=np.int64)
        self.cbp_chroma = np.zeros((hm, wm), dtype=np.int64)
        self.cpm = np.zeros((hm, wm), dtype=np.int64)
        self.cbf_ldc = np.zeros((hm, wm), dtype=np.int64)
        self.cbf_l4 = np.zeros((hm * 4, wm * 4), dtype=np.int64)
        self.cbf_cdc = np.zeros((2, hm, wm), dtype=np.int64)
        self.cbf_cac = np.zeros((2, hm * 2, wm * 2), dtype=np.int64)
        # per-4x4 |mvd| per list (spec 9.3.3.1.1.7 consults the partition
        # COVERING the neighboring 4x4 block — MB granularity is only
        # correct for 16x16-only streams)
        self.absmvd = np.zeros((hm * 4, wm * 4, 2), dtype=np.int64)
        self.absmvd1 = np.zeros((hm * 4, wm * 4, 2), dtype=np.int64)
        # per-4x4 ref_idx per list for 9.3.3.1.1.6 (-1 = intra / unused
        # list / direct or skip cell -> no context increment)
        self.refidx = np.full((2, hm * 4, wm * 4), -1, dtype=np.int64)
        # transform_size_8x8_flag per MB (9.3.3.1.1.10)
        self.t8 = np.zeros((hm, wm), dtype=bool)
        self.prev_qp_delta_nz = 0    # reset at each slice start

    # -- availability ---------------------------------------------------
    def avail(self, mr: int, mc: int, sid: int) -> bool:
        if mr < 0 or mc < 0 or mr >= self.hm or mc >= self.wm:
            return False
        return self.slice_id[mr, mc] == sid

    def start_mb(self, mr: int, mc: int, sid: int):
        self.slice_id[mr, mc] = sid

    def set_skip(self, mr: int, mc: int):
        self.kind[mr, mc] = K_SKIP
        self.cbp_luma[mr, mc] = 0
        self.cbp_chroma[mr, mc] = 0
        self.cbf_ldc[mr, mc] = 0
        self.cbf_l4[mr * 4:mr * 4 + 4, mc * 4:mc * 4 + 4] = 0
        self.cbf_cdc[:, mr, mc] = 0
        self.cbf_cac[:, mr * 2:mr * 2 + 2, mc * 2:mc * 2 + 2] = 0
        self.absmvd[mr * 4:mr * 4 + 4, mc * 4:mc * 4 + 4] = 0
        self.absmvd1[mr * 4:mr * 4 + 4, mc * 4:mc * 4 + 4] = 0
        self.refidx[:, mr * 4:mr * 4 + 4, mc * 4:mc * 4 + 4] = -1
        self.t8[mr, mc] = False
        # mb_qp_delta is inferred 0 for skip (9.3.3.1.1.5)
        self.prev_qp_delta_nz = 0

    def set_absmvd(self, lx, g4r, g4c, h4b, w4b, ady, adx):
        amvd = self.absmvd if lx == 0 else self.absmvd1
        amvd[g4r:g4r + h4b, g4c:g4c + w4b, 0] = ady
        amvd[g4r:g4r + h4b, g4c:g4c + w4b, 1] = adx

    def set_refidx(self, lx, g4r, g4c, h4b, w4b, ref):
        self.refidx[lx, g4r:g4r + h4b, g4c:g4c + w4b] = ref

    def clear_inter_mb(self, mr, mc):
        """Reset the per-4x4 motion context cells at MB start (cells are
        only re-written for spans a partition actually covers)."""
        self.absmvd[mr * 4:mr * 4 + 4, mc * 4:mc * 4 + 4] = 0
        self.absmvd1[mr * 4:mr * 4 + 4, mc * 4:mc * 4 + 4] = 0
        self.refidx[:, mr * 4:mr * 4 + 4, mc * 4:mc * 4 + 4] = -1

    # -- context increments ----------------------------------------------
    def ctx_mb_skip(self, mr, mc, sid, b_slice: bool = False) -> int:
        inc = 0
        for nr, nc in ((mr, mc - 1), (mr - 1, mc)):
            if self.avail(nr, nc, sid) and self.kind[nr, nc] != K_SKIP:
                inc += 1
        return (24 if b_slice else 11) + inc

    def ctx_mb_type_b(self, mr, mc, sid) -> int:
        """bin0 of B mb_type: neighbors coded and not direct/skip
        (spec 9.3.3.1.1.3: B_Skip AND B_Direct_16x16 count as 0)."""
        inc = 0
        for nr, nc in ((mr, mc - 1), (mr - 1, mc)):
            if self.avail(nr, nc, sid) \
                    and self.kind[nr, nc] not in (K_SKIP, K_DIRECT):
                inc += 1
        return 27 + inc

    def ctx_mb_type_i(self, mr, mc, sid) -> int:
        """bin0 of I-slice mb_type: neighbors coded other than I_NxN."""
        inc = 0
        for nr, nc in ((mr, mc - 1), (mr - 1, mc)):
            if self.avail(nr, nc, sid) and self.kind[nr, nc] == K_I16:
                inc += 1
        return 3 + inc

    def ctx_cpm(self, mr, mc, sid) -> int:
        inc = 0
        for nr, nc in ((mr, mc - 1), (mr - 1, mc)):
            if (self.avail(nr, nc, sid)
                    and self.kind[nr, nc] in (K_I4, K_I16)
                    and self.cpm[nr, nc] != 0):
                inc += 1
        return 64 + inc

    def ctx_cbp_luma_bin(self, mr, mc, sid, j: int, cur_bits: int) -> int:
        """ctx for coded_block_pattern luma bin j (8x8 raster idx j).

        cur_bits: bits of the current MB's cbp decoded/known so far.
        condTermFlagN = 0 when the neighboring 8x8 block's bit is set or the
        neighbor MB is unavailable (spec 9.3.3.1.1.4).
        """
        def cond(nr, nc, bit):
            if (nr, nc) == (mr, mc):
                return 0 if (cur_bits >> bit) & 1 else 1
            if not self.avail(nr, nc, sid):
                return 0
            if self.kind[nr, nc] == K_SKIP:
                return 1
            return 0 if (self.cbp_luma[nr, nc] >> bit) & 1 else 1

        if j % 2 == 0:
            ca = cond(mr, mc - 1, j + 1)
        else:
            ca = cond(mr, mc, j - 1)
        if j // 2 == 0:
            cb = cond(mr - 1, mc, j + 2)
        else:
            cb = cond(mr, mc, j - 2)
        return 73 + ca + 2 * cb

    def ctx_cbp_chroma_bin(self, mr, mc, sid, binidx: int) -> int:
        def cond(nr, nc):
            if not self.avail(nr, nc, sid):
                return 0
            c = self.cbp_chroma[nr, nc]
            return int(c != 0) if binidx == 0 else int(c == 2)
        ca, cb = cond(mr, mc - 1), cond(mr - 1, mc)
        return 77 + (4 if binidx else 0) + ca + 2 * cb

    def ctx_qp_delta(self) -> int:
        return 60 + (1 if self.prev_qp_delta_nz else 0)

    def avail4(self, g4r: int, g4c: int, sid: int) -> bool:
        """4x4-cell availability: in-frame and its MB in this slice."""
        if g4r < 0 or g4c < 0 or g4r >= self.hm * 4 or g4c >= self.wm * 4:
            return False
        return self.slice_id[g4r // 4, g4c // 4] == sid

    def ctx_mvd(self, g4r, g4c, sid, comp: int, lx: int = 0) -> int:
        """bin0 of mvd for the partition whose top-left 4x4 cell is
        (g4r, g4c) (comp: 0 = y/vertical, 1 = x/horizontal); neighbors
        are the 4x4 cells left/above (spec 9.3.3.1.1.7)."""
        amvd = self.absmvd if lx == 0 else self.absmvd1
        s = 0
        for nr, nc in ((g4r, g4c - 1), (g4r - 1, g4c)):
            if self.avail4(nr, nc, sid):
                s += int(amvd[nr, nc, comp])
        inc = 0 if s < 3 else (1 if s <= 32 else 2)
        return (47 if comp == 0 else 40) + inc

    def ctx_ref_idx(self, g4r, g4c, sid, lx: int) -> int:
        """ctxIdxInc for ref_idx_lX bin0 (spec 9.3.3.1.1.6): neighbor
        4x4 cell's refIdxLX > 0 counts (direct/skip/intra/unused cells
        are stored as -1 and never count)."""
        def cond(nr, nc):
            if not self.avail4(nr, nc, sid):
                return 0
            return int(self.refidx[lx, nr, nc] > 0)
        return cond(g4r, g4c - 1) + 2 * cond(g4r - 1, g4c)

    def ctx_t8(self, mr, mc, sid) -> int:
        """transform_size_8x8_flag ctx (spec 9.3.3.1.1.10)."""
        inc = 0
        for nr, nc in ((mr, mc - 1), (mr - 1, mc)):
            if self.avail(nr, nc, sid) and self.t8[nr, nc]:
                inc += 1
        return 399 + inc

    # -- coded_block_flag contexts ---------------------------------------
    def _cbf_cond(self, val, nb_avail: bool, cur_intra: bool) -> int:
        if not nb_avail:
            return 1 if cur_intra else 0
        if val is None:
            # transform block absent in an available neighbor MB
            return 0
        return int(val)

    def ctx_cbf_luma_dc(self, mr, mc, sid, cur_intra) -> int:
        def side(nr, nc):
            av = self.avail(nr, nc, sid)
            v = None
            if av:
                v = (self.cbf_ldc[nr, nc]
                     if self.kind[nr, nc] == K_I16 else None)
                return self._cbf_cond(v, True, cur_intra)
            return self._cbf_cond(None, False, cur_intra)
        ca, cb = side(mr, mc - 1), side(mr - 1, mc)
        return 85 + CBF_CAT_OFF[0] + ca + 2 * cb

    def ctx_cbf_luma4(self, g4r, g4c, sid, cur_intra, cat: int) -> int:
        """cat 1 (I16 AC) or 2 (luma 4x4); (g4r, g4c) global 4x4 coords.

        Within-MB neighbors read earlier-stored cbf values (zig-zag block
        coding order guarantees left/top were coded first).
        """
        def side(nr, nc):
            if nr < 0 or nc < 0:
                return self._cbf_cond(None, False, cur_intra)
            if not self.avail(nr // 4, nc // 4, sid) and \
               (nr // 4, nc // 4) != (g4r // 4, g4c // 4):
                return self._cbf_cond(None, False, cur_intra)
            return self._cbf_cond(int(self.cbf_l4[nr, nc]), True, cur_intra)
        ca, cb = side(g4r, g4c - 1), side(g4r - 1, g4c)
        return 85 + CBF_CAT_OFF[cat] + ca + 2 * cb

    def ctx_cbf_chroma_dc(self, mr, mc, sid, cur_intra, comp) -> int:
        def side(nr, nc):
            if not self.avail(nr, nc, sid):
                return self._cbf_cond(None, False, cur_intra)
            v = (self.cbf_cdc[comp, nr, nc]
                 if self.cbp_chroma[nr, nc] != 0 else None)
            return self._cbf_cond(v, True, cur_intra)
        ca, cb = side(mr, mc - 1), side(mr - 1, mc)
        return 85 + CBF_CAT_OFF[3] + ca + 2 * cb

    def ctx_cbf_chroma_ac(self, g2r, g2c, sid, cur_intra, comp) -> int:
        def side(nr, nc):
            if nr < 0 or nc < 0:
                return self._cbf_cond(None, False, cur_intra)
            same_mb = (nr // 2, nc // 2) == (g2r // 2, g2c // 2)
            if not same_mb and not self.avail(nr // 2, nc // 2, sid):
                return self._cbf_cond(None, False, cur_intra)
            return self._cbf_cond(int(self.cbf_cac[comp, nr, nc]), True,
                                  cur_intra)
        ca, cb = side(g2r, g2c - 1), side(g2r - 1, g2c)
        return 85 + CBF_CAT_OFF[4] + ca + 2 * cb


# ======================================================================
# element coders (encode/decode pairs)
# ======================================================================

def encode_mb_type_intra(eng, first_ctx: int, rest: tuple, mb_type: int):
    """I-slice numbering: 0 = I_NxN, 1..24 = I_16x16 (cbp folded in).

    `first_ctx`: full ctxIdx for bin0; `rest`: ctx for (cbp_luma bin,
    chroma bin0, chroma bin1, pred bin0, pred bin1) — (6,7,8,9,10) in I
    slices, (18,19,19,20,20) as P-slice suffix.
    """
    if mb_type == 0:
        eng.encode(first_ctx, 0)
        return
    eng.encode(first_ctx, 1)
    eng.encode_terminate(0)              # not I_PCM
    t = mb_type - 1
    i16mode, cbp_chroma, cbp_luma15 = t % 4, (t // 4) % 3, t >= 12
    eng.encode(rest[0], int(cbp_luma15))
    if cbp_chroma == 0:
        eng.encode(rest[1], 0)
    else:
        eng.encode(rest[1], 1)
        eng.encode(rest[2], cbp_chroma - 1)
    eng.encode(rest[3], i16mode >> 1)
    eng.encode(rest[4], i16mode & 1)


def decode_mb_type_intra(eng, first_ctx: int, rest: tuple) -> int:
    if eng.decode(first_ctx) == 0:
        return 0
    if eng.decode_terminate():
        return 25                        # I_PCM
    cbp_luma15 = eng.decode(rest[0])
    cbp_chroma = 0
    if eng.decode(rest[1]):
        cbp_chroma = 1 + eng.decode(rest[2])
    i16mode = (eng.decode(rest[3]) << 1) | eng.decode(rest[4])
    return 1 + i16mode + 4 * cbp_chroma + 12 * cbp_luma15


I_REST = (6, 7, 8, 9, 10)
P_SUFFIX_REST = (18, 19, 19, 20, 20)
B_SUFFIX_REST = (33, 34, 34, 35, 35)


def decode_mb_type_b(eng, ctx0: int) -> int:
    """B mb_type (Table 9-37 inverse; ffmpeg decode_cabac_mb_type)."""
    if eng.decode(ctx0) == 0:
        return 0                                  # B_Direct_16x16
    if eng.decode(30) == 0:
        return 1 + eng.decode(32)                 # B_L0 / B_L1 16x16
    bits = eng.decode(31) << 3
    bits |= eng.decode(32) << 2
    bits |= eng.decode(32) << 1
    bits |= eng.decode(32)
    if bits < 8:
        return bits + 3                           # 3..10 (3 = B_Bi_16x16)
    if bits == 13:
        return 23 + decode_mb_type_intra(eng, 32, B_SUFFIX_REST)
    if bits == 14:
        return 11
    if bits == 15:
        return 22                                 # B_8x8
    # bits in 8..12 → mb_type 12..21 (16x8/8x16 shapes): (bits<<1|x)-4
    return 2 * bits - 4 + eng.decode(32)


def encode_mb_type_p(eng, mb_type: int):
    """P numbering (Table 7-13): 0=16x16, 1=16x8, 2=8x16, 3=8x8(ref0 folded),
    >=5: intra (value-5 is the I numbering)."""
    if mb_type >= 5:
        eng.encode(14, 1)
        encode_mb_type_intra(eng, 17, P_SUFFIX_REST, mb_type - 5)
        return
    eng.encode(14, 0)
    if mb_type in (0, 3, 4):             # '000' = 16x16, '001' = P_8x8
        eng.encode(15, 0)
        eng.encode(16, 0 if mb_type == 0 else 1)
    elif mb_type == 2:                   # P_L0_L0_8x16: '010'
        eng.encode(15, 1)
        eng.encode(17, 0)
    else:                                # P_L0_L0_16x8: '011'
        eng.encode(15, 1)
        eng.encode(17, 1)


def decode_mb_type_p(eng) -> int:
    """Table 9-37: '000'=P_L0_16x16, '001'=P_8x8, '010'=8x16,
    '011'=16x8; prefix '1' = intra suffix."""
    if eng.decode(14):
        return 5 + decode_mb_type_intra(eng, 17, P_SUFFIX_REST)
    if eng.decode(15) == 0:
        return 3 if eng.decode(16) else 0
    return 1 if eng.decode(17) else 2


def encode_sub_mb_type_p(eng, v: int):
    """0=8x8, 1=8x4, 2=4x8, 3=4x4 (Table 9-38 P binarization)."""
    if v == 0:
        eng.encode(21, 1)
        return
    eng.encode(21, 0)
    if v == 1:
        eng.encode(22, 0)
        return
    eng.encode(22, 1)
    eng.encode(23, 1 if v == 2 else 0)


def decode_sub_mb_type_p(eng) -> int:
    if eng.decode(21):
        return 0
    if eng.decode(22) == 0:
        return 1
    return 2 if eng.decode(23) else 3


def encode_sub_mb_type_b(eng, v: int):
    """B sub_mb_type (Table 9-38 B binarization, ctx 36..39):
    0=B_Direct_8x8, 1/2=L0/L1 8x8, 3..6, 7..10, 11/12."""
    if v == 0:
        eng.encode(36, 0)
        return
    eng.encode(36, 1)
    if v in (1, 2):
        eng.encode(37, 0)
        eng.encode(39, v - 1)
        return
    eng.encode(37, 1)
    if v >= 11:
        eng.encode(38, 1)
        eng.encode(39, 1)
        eng.encode(39, v - 11)
        return
    if v >= 7:
        eng.encode(38, 1)
        eng.encode(39, 0)
        t = v - 7
    else:
        eng.encode(38, 0)
        t = v - 3
    eng.encode(39, t >> 1)
    eng.encode(39, t & 1)


def decode_sub_mb_type_b(eng) -> int:
    """Inverse of encode_sub_mb_type_b (Table 9-38)."""
    if eng.decode(36) == 0:
        return 0                           # B_Direct_8x8
    if eng.decode(37) == 0:
        return 1 + eng.decode(39)          # B_L0_8x8 / B_L1_8x8
    t = 3
    if eng.decode(38):
        if eng.decode(39):
            return 11 + eng.decode(39)     # B_L0_4x4 / B_Bi_4x4
        t += 4
    t += 2 * eng.decode(39)
    t += eng.decode(39)
    return t


def encode_t8_flag(eng, st: CabacFrameState, mr, mc, sid, flag: int):
    eng.encode(st.ctx_t8(mr, mc, sid), flag)
    st.t8[mr, mc] = bool(flag)


def decode_t8_flag(eng, st: CabacFrameState, mr, mc, sid) -> int:
    flag = eng.decode(st.ctx_t8(mr, mc, sid))
    st.t8[mr, mc] = bool(flag)
    return flag


def encode_i4_mode(eng, mode: int, mpm: int):
    if mode == mpm:
        eng.encode(68, 1)
    else:
        eng.encode(68, 0)
        rem = mode - (mode > mpm)
        eng.encode(69, rem & 1)
        eng.encode(69, (rem >> 1) & 1)
        eng.encode(69, (rem >> 2) & 1)


def decode_i4_mode(eng, mpm: int) -> int:
    if eng.decode(68):
        return mpm
    rem = eng.decode(69)
    rem |= eng.decode(69) << 1
    rem |= eng.decode(69) << 2
    return rem + (rem >= mpm)


def encode_cpm(eng, v: int, ctx0: int):
    """intra_chroma_pred_mode: TU, cMax=3; bins >=1 use ctx 67."""
    if v == 0:
        eng.encode(ctx0, 0)
        return
    eng.encode(ctx0, 1)
    if v == 1:
        eng.encode(67, 0)
        return
    eng.encode(67, 1)
    eng.encode(67, 1 if v == 3 else 0)


def decode_cpm(eng, ctx0: int) -> int:
    if eng.decode(ctx0) == 0:
        return 0
    if eng.decode(67) == 0:
        return 1
    return 3 if eng.decode(67) else 2


def encode_cbp(eng, st: CabacFrameState, mr, mc, sid, cbp: int):
    bits = 0
    for j in range(4):
        b = (cbp >> j) & 1
        eng.encode(st.ctx_cbp_luma_bin(mr, mc, sid, j, bits), b)
        bits |= b << j
    cc = cbp >> 4
    eng.encode(st.ctx_cbp_chroma_bin(mr, mc, sid, 0), int(cc != 0))
    if cc != 0:
        eng.encode(st.ctx_cbp_chroma_bin(mr, mc, sid, 1), cc - 1)


def decode_cbp(eng, st: CabacFrameState, mr, mc, sid) -> int:
    bits = 0
    for j in range(4):
        b = eng.decode(st.ctx_cbp_luma_bin(mr, mc, sid, j, bits))
        bits |= b << j
    cc = 0
    if eng.decode(st.ctx_cbp_chroma_bin(mr, mc, sid, 0)):
        cc = 1 + eng.decode(st.ctx_cbp_chroma_bin(mr, mc, sid, 1))
    return bits | (cc << 4)


def encode_qp_delta(eng, st: CabacFrameState, delta: int):
    mapped = 2 * abs(delta) - (1 if delta > 0 else 0)
    if mapped == 0:
        eng.encode(st.ctx_qp_delta(), 0)
    else:
        eng.encode(st.ctx_qp_delta(), 1)
        for k in range(1, mapped):
            eng.encode(62 if k == 1 else 63, 1)
        eng.encode(62 if mapped == 1 else 63, 0)
    st.prev_qp_delta_nz = int(delta != 0)


def decode_qp_delta(eng, st: CabacFrameState) -> int:
    mapped = 0
    if eng.decode(st.ctx_qp_delta()):
        mapped = 1
        while eng.decode(62 if mapped == 1 else 63):
            mapped += 1
            if mapped > 104:
                raise ValueError("mb_qp_delta runaway")
    delta = (mapped + 1) >> 1
    if mapped % 2 == 0:
        delta = -delta
    st.prev_qp_delta_nz = int(mapped != 0)
    return delta


def _encode_eg_suffix(eng, v: int, k: int):
    while v >= (1 << k):
        eng.encode_bypass(1)
        v -= 1 << k
        k += 1
    eng.encode_bypass(0)
    for i in range(k - 1, -1, -1):
        eng.encode_bypass((v >> i) & 1)


def encode_mvd(eng, st: CabacFrameState, g4r, g4c, sid, comp: int,
               mvd: int, lx: int = 0):
    """UEG3 with signedValFlag=1, uCoff=9 (spec 9.3.2.3); (g4r, g4c) is
    the partition's top-left 4x4 cell."""
    a = abs(mvd)
    ctx0 = st.ctx_mvd(g4r, g4c, sid, comp, lx)
    base = 47 if comp == 0 else 40
    if a == 0:
        eng.encode(ctx0, 0)
        return
    eng.encode(ctx0, 1)
    # TU prefix bins 1..8 with ctx base+3..base+6
    for k in range(1, min(a, 9)):
        eng.encode(base + min(k + 2, 6), 1)
    if a < 9:
        eng.encode(base + min(a + 2, 6), 0)
    else:
        _encode_eg_suffix(eng, a - 9, 3)
    eng.encode_bypass(1 if mvd < 0 else 0)


def decode_mvd(eng, st: CabacFrameState, g4r, g4c, sid, comp: int,
               lx: int = 0) -> int:
    ctx0 = st.ctx_mvd(g4r, g4c, sid, comp, lx)
    base = 47 if comp == 0 else 40
    if eng.decode(ctx0) == 0:
        return 0
    a = 1
    while a < 9 and eng.decode(base + min(a + 2, 6)):
        a += 1
    if a == 9:
        a += _decode_eg_suffix_val(eng, 3)
    return -a if eng.decode_bypass() else a


def _decode_eg_suffix_val(eng, k: int) -> int:
    """Decode the EGk bypass suffix value (inverse of _encode_eg_suffix)."""
    v = 0
    while eng.decode_bypass():
        v += 1 << k
        k += 1
    rem = 0
    for _ in range(k):
        rem = (rem << 1) | eng.decode_bypass()
    return v + rem


def encode_ref_idx(eng, st_inc: int, ref: int):
    """ref_idx_l0: unary, bin0 ctx 54+inc, bin1 ctx 58, rest 59."""
    if ref == 0:
        eng.encode(54 + st_inc, 0)
        return
    eng.encode(54 + st_inc, 1)
    for k in range(1, ref):
        eng.encode(58 if k == 1 else 59, 1)
    eng.encode(58 if ref == 1 else 59, 0)


def decode_ref_idx(eng, st_inc: int) -> int:
    if eng.decode(54 + st_inc) == 0:
        return 0
    ref = 1
    while eng.decode(58 if ref == 1 else 59):
        ref += 1
        if ref > 32:
            raise ValueError("ref_idx runaway")
    return ref


# -------------------------------------------------------------- residual

def _sig_ctx(cat: int, i: int) -> int:
    if cat == 5:
        return 402 + SIG8_MAP[i]
    return 105 + SIG_CAT_OFF[cat] + (min(i, 2) if cat == 3 else i)


def _last_ctx(cat: int, i: int) -> int:
    if cat == 5:
        return 417 + LAST8_MAP[i]
    return 166 + SIG_CAT_OFF[cat] + (min(i, 2) if cat == 3 else i)


def encode_residual(eng, coeffs, cat: int, cbf_ctx: int) -> int:
    """Code one residual block (spec 7.3.5.3.3 residual_block_cabac).

    coeffs: scanned levels (zig-zag already applied), length = numCoeff.
    cat 5 (luma 8x8, 64 coeffs) has no coded_block_flag — pass
    cbf_ctx=None.  Returns the coded_block_flag value.
    """
    coeffs = np.asarray(coeffs)
    n = len(coeffs)
    nz = np.nonzero(coeffs)[0]
    cbf = int(nz.size > 0)
    if cat != 5:
        eng.encode(cbf_ctx, cbf)
        if not cbf:
            return 0
    last = int(nz[-1])
    for i in range(min(last + 1, n - 1)):
        sig = int(coeffs[i] != 0)
        eng.encode(_sig_ctx(cat, i), sig)
        if sig:
            eng.encode(_last_ctx(cat, i), int(i == last))
    lvl_base = 227 + LVL_CAT_OFF[cat]
    num_eq1 = 0
    num_gt1 = 0
    for i in nz[::-1]:
        v = int(coeffs[i])
        a = abs(v) - 1
        ctx0 = lvl_base + (0 if num_gt1 else min(4, 1 + num_eq1))
        ctxn = lvl_base + 5 + min(4, num_gt1)
        if a == 0:
            eng.encode(ctx0, 0)
        else:
            eng.encode(ctx0, 1)
            for k in range(1, min(a, 14)):
                eng.encode(ctxn, 1)
            if a < 14:
                eng.encode(ctxn, 0)
            else:
                _encode_eg_suffix(eng, a - 14, 0)
        eng.encode_bypass(1 if v < 0 else 0)
        if a == 0:
            num_eq1 += 1
        else:
            num_gt1 += 1
    return 1


def decode_residual(eng, n: int, cat: int, cbf_ctx: int):
    """Returns (scanned coeffs[n], cbf).  cat 5 has no coded_block_flag
    (pass cbf_ctx=None) — presence is implied by the cbp bit."""
    coeffs = np.zeros(n, dtype=np.int64)
    if cat != 5 and eng.decode(cbf_ctx) == 0:
        return coeffs, 0
    sig_pos = []
    for i in range(n - 1):
        if eng.decode(_sig_ctx(cat, i)):
            sig_pos.append(i)
            if eng.decode(_last_ctx(cat, i)):
                break
    else:
        sig_pos.append(n - 1)
    lvl_base = 227 + LVL_CAT_OFF[cat]
    num_eq1 = 0
    num_gt1 = 0
    for i in sig_pos[::-1]:
        ctx0 = lvl_base + (0 if num_gt1 else min(4, 1 + num_eq1))
        ctxn = lvl_base + 5 + min(4, num_gt1)
        if eng.decode(ctx0) == 0:
            a = 0
        else:
            a = 1
            while a < 14 and eng.decode(ctxn):
                a += 1
            if a == 14:
                a += _decode_eg_suffix_val(eng, 0)
        v = a + 1
        if eng.decode_bypass():
            v = -v
        coeffs[i] = v
        if a == 0:
            num_eq1 += 1
        else:
            num_gt1 += 1
    return coeffs, 1
