"""Slice header syntax (spec 7.3.3; parity: JM `header.c` — SURVEY.md §2a #4).

Supports I/P/B progressive slices with pic_order_cnt_type 0 or 2, optional
deblocking control, and the default-ordered reference lists used by the
encoder (no reordering commands, sliding-window marking).
"""

from __future__ import annotations

import dataclasses

from .bitreader import BitReader
from .bitwriter import BitSink
from .expgolomb import read_se, read_ue, write_se, write_ue
from .params import PPS, SPS

# slice_type values (spec Table 7-6); +5 variants mean "all slices in pic
# have this type" — we always emit the +5 form.
SLICE_P = 0
SLICE_B = 1
SLICE_I = 2


@dataclasses.dataclass
class SliceHeader:
    first_mb_in_slice: int = 0
    slice_type: int = SLICE_I            # canonical 0/1/2
    pic_parameter_set_id: int = 0
    frame_num: int = 0
    idr_pic_id: int = 0
    pic_order_cnt_lsb: int = 0
    delta_pic_order_cnt0: int = 0     # poc type 1, !always_zero
    num_ref_idx_l0_active: int = 1       # after per-slice override
    num_ref_idx_l1_active: int = 1
    slice_qp: int = 26
    disable_deblocking_filter_idc: int = 0
    slice_alpha_c0_offset_div2: int = 0
    slice_beta_offset_div2: int = 0
    is_idr: bool = True
    nal_ref_idc: int = 3
    cabac_init_idc: int = 0
    # ref_pic_list_modification: list of (modification_of_pic_nums_idc,
    # abs_diff_pic_num_minus1) commands per list (spec 7.3.3.1)
    reorder_l0: tuple = ()
    reorder_l1: tuple = ()
    direct_spatial_mv_pred_flag: int = 1   # B slices: spatial direct
    # dec_ref_pic_marking: adaptive MMCO ops (spec 7.4.3.3), parsed as
    # (op, val1[, val2]) tuples; () = sliding window
    mmco: tuple = ()
    long_term_reference_flag: int = 0      # IDR: mark as long-term
    # pred_weight_table (spec 7.3.3.2): None = not present; else
    # (luma_log2_denom, chroma_log2_denom, weights_l0, weights_l1) with
    # weights_lX = [(wy, oy, wcb, ocb, wcr, ocr)] per active ref
    pred_weights: object = None

    def write_rbsp_head(self, sps: SPS, pps: PPS) -> BitSink:
        """Write the slice header into a fresh BitSink (slice data follows)."""
        s = BitSink()
        write_ue(s, self.first_mb_in_slice)
        write_ue(s, self.slice_type + 5)
        write_ue(s, self.pic_parameter_set_id)
        s.put(self.frame_num, sps.log2_max_frame_num)
        if self.is_idr:
            write_ue(s, self.idr_pic_id)
        if sps.pic_order_cnt_type == 0:
            s.put(self.pic_order_cnt_lsb, sps.log2_max_pic_order_cnt_lsb)
            if pps.pic_order_present_flag:
                raise NotImplementedError("delta_pic_order_cnt_bottom")
        if self.slice_type == SLICE_B:
            s.put(self.direct_spatial_mv_pred_flag, 1)
        if self.slice_type in (SLICE_P, SLICE_B):
            override = int(
                self.num_ref_idx_l0_active != pps.num_ref_idx_l0_active
                or (self.slice_type == SLICE_B
                    and self.num_ref_idx_l1_active != pps.num_ref_idx_l1_active))
            s.put(override, 1)
            if override:
                write_ue(s, self.num_ref_idx_l0_active - 1)
                if self.slice_type == SLICE_B:
                    write_ue(s, self.num_ref_idx_l1_active - 1)
        # ref_pic_list_modification (spec 7.3.3.1)
        if self.slice_type in (SLICE_P, SLICE_B):
            s.put(1 if self.reorder_l0 else 0, 1)
            for idc, val in self.reorder_l0:
                write_ue(s, idc)
                write_ue(s, val)
            if self.reorder_l0:
                write_ue(s, 3)            # end of commands
        if self.slice_type == SLICE_B:
            s.put(1 if self.reorder_l1 else 0, 1)
            for idc, val in self.reorder_l1:
                write_ue(s, idc)
                write_ue(s, val)
            if self.reorder_l1:
                write_ue(s, 3)
        if pps.weighted_pred_flag and self.slice_type == SLICE_P:
            # pred_weight_table (spec 7.3.3.2); self.pred_weights uses
            # the parse-side format (ld, cd, wl0, wl1)
            ld, cd, wl0, _ = self.pred_weights or (
                6, 6, [(64, 0, 64, 0, 64, 0)]
                * self.num_ref_idx_l0_active, [])
            write_ue(s, ld)               # luma_log2_weight_denom
            write_ue(s, cd)               # chroma_log2_weight_denom
            for wy, oy, wcb, ocb, wcr, ocr in wl0:
                lflag = int((wy, oy) != (1 << ld, 0))
                s.put(lflag, 1)
                if lflag:
                    write_se(s, wy)
                    write_se(s, oy)
                cflag = int((wcb, ocb, wcr, ocr)
                            != (1 << cd, 0, 1 << cd, 0))
                s.put(cflag, 1)
                if cflag:
                    write_se(s, wcb)
                    write_se(s, ocb)
                    write_se(s, wcr)
                    write_se(s, ocr)
        if self.nal_ref_idc != 0:
            # dec_ref_pic_marking
            if self.is_idr:
                s.put(0, 1)               # no_output_of_prior_pics_flag
                s.put(0, 1)               # long_term_reference_flag
            else:
                s.put(1 if self.mmco else 0, 1)
                for op in self.mmco:      # memory_management_control ops
                    write_ue(s, op[0])
                    for arg in op[1:]:
                        write_ue(s, arg)
                if self.mmco:
                    write_ue(s, 0)        # end of MMCO commands
        if pps.entropy_coding_mode_flag and self.slice_type != SLICE_I:
            write_ue(s, 0)                # cabac_init_idc
        write_se(s, self.slice_qp - pps.pic_init_qp)
        if pps.deblocking_filter_control_present_flag:
            write_ue(s, self.disable_deblocking_filter_idc)
            if self.disable_deblocking_filter_idc != 1:
                write_se(s, self.slice_alpha_c0_offset_div2)
                write_se(s, self.slice_beta_offset_div2)
        return s

    @classmethod
    def parse(cls, r: BitReader, sps: SPS, pps: PPS, nal_unit_type: int,
              nal_ref_idc: int) -> "SliceHeader":
        h = cls()
        h.is_idr = nal_unit_type == 5
        h.nal_ref_idc = nal_ref_idc
        h.first_mb_in_slice = read_ue(r)
        st = read_ue(r)
        h.slice_type = st % 5
        if h.slice_type > 2:
            raise NotImplementedError(f"slice_type {st}")
        h.pic_parameter_set_id = read_ue(r)
        h.frame_num = r.read(sps.log2_max_frame_num)
        if h.is_idr:
            h.idr_pic_id = read_ue(r)
        if sps.pic_order_cnt_type == 0:
            h.pic_order_cnt_lsb = r.read(sps.log2_max_pic_order_cnt_lsb)
            if pps.pic_order_present_flag:
                raise NotImplementedError("delta_pic_order_cnt_bottom")
        elif sps.pic_order_cnt_type == 1 \
                and not sps.delta_pic_order_always_zero_flag:
            h.delta_pic_order_cnt0 = read_se(r)
            if pps.pic_order_present_flag:
                raise NotImplementedError("delta_pic_order_cnt[1]")
        h.num_ref_idx_l0_active = pps.num_ref_idx_l0_active
        h.num_ref_idx_l1_active = pps.num_ref_idx_l1_active
        if h.slice_type == SLICE_B:
            h.direct_spatial_mv_pred_flag = r.read(1)
        if h.slice_type in (SLICE_P, SLICE_B):
            if r.read(1):                 # num_ref_idx_active_override
                h.num_ref_idx_l0_active = read_ue(r) + 1
                if h.slice_type == SLICE_B:
                    h.num_ref_idx_l1_active = read_ue(r) + 1
        def _parse_reorder():
            cmds = []
            while True:
                idc = read_ue(r)
                if idc == 3:
                    break
                if idc not in (0, 1):
                    raise NotImplementedError(f"reorder idc {idc}")
                cmds.append((idc, read_ue(r)))
            return tuple(cmds)

        if h.slice_type in (SLICE_P, SLICE_B):
            if r.read(1):
                h.reorder_l0 = _parse_reorder()
        if h.slice_type == SLICE_B:
            if r.read(1):
                h.reorder_l1 = _parse_reorder()
        if (pps.weighted_pred_flag and h.slice_type == SLICE_P) or \
                (pps.weighted_bipred_idc == 1
                 and h.slice_type == SLICE_B):
            ld = read_ue(r)                   # luma_log2_weight_denom
            cd = read_ue(r)                   # chroma_log2_weight_denom
            lists = []
            n_active = (h.num_ref_idx_l0_active,
                        h.num_ref_idx_l1_active)
            n_lists = 2 if h.slice_type == SLICE_B else 1
            for lx in range(n_lists):
                wl = []
                for _ in range(n_active[lx]):
                    wy, oy = 1 << ld, 0
                    if r.read(1):             # luma_weight_flag
                        wy, oy = read_se(r), read_se(r)
                    wcb, ocb, wcr, ocr = 1 << cd, 0, 1 << cd, 0
                    if r.read(1):             # chroma_weight_flag
                        wcb, ocb = read_se(r), read_se(r)
                        wcr, ocr = read_se(r), read_se(r)
                    wl.append((wy, oy, wcb, ocb, wcr, ocr))
                lists.append(wl)
            lists += [[]] * (2 - len(lists))
            h.pred_weights = (ld, cd, lists[0], lists[1])
        if nal_ref_idc != 0:
            if h.is_idr:
                r.read(1)                 # no_output_of_prior_pics_flag
                h.long_term_reference_flag = r.read(1)
            else:
                if r.read(1):             # adaptive_ref_pic_marking
                    ops = []
                    while True:
                        op = read_ue(r)
                        if op == 0:
                            break
                        if op in (1, 2, 4, 6):
                            ops.append((op, read_ue(r)))
                        elif op == 3:
                            ops.append((op, read_ue(r), read_ue(r)))
                        elif op == 5:
                            ops.append((op,))
                        else:
                            raise ValueError(f"MMCO op {op}")
                    h.mmco = tuple(ops)
        if pps.entropy_coding_mode_flag and h.slice_type != SLICE_I:
            h.cabac_init_idc = read_ue(r)
        h.slice_qp = pps.pic_init_qp + read_se(r)
        if pps.deblocking_filter_control_present_flag:
            h.disable_deblocking_filter_idc = read_ue(r)
            if h.disable_deblocking_filter_idc != 1:
                h.slice_alpha_c0_offset_div2 = read_se(r)
                h.slice_beta_offset_div2 = read_se(r)
        return h
