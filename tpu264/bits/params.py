"""Sequence / picture parameter sets: syntax write and parse.

Parity target: JM `parset.c`/`parsetcommon.c` (SURVEY.md §2a #4).  Only the
progressive (frame_mbs_only) 4:2:0 subset required by the BASELINE configs
is populated; fields are named as in spec 7.3.2.1/7.3.2.2.
"""

from __future__ import annotations

import dataclasses

from .bitreader import BitReader
from .bitwriter import BitSink
from .expgolomb import read_se, read_ue, write_se, write_ue


@dataclasses.dataclass
class SPS:
    profile_idc: int = 66
    constraint_flags: int = 0         # constraint_setX flags + reserved, u(8)
    level_idc: int = 30
    seq_parameter_set_id: int = 0
    log2_max_frame_num: int = 8       # log2_max_frame_num_minus4 + 4
    pic_order_cnt_type: int = 2
    log2_max_pic_order_cnt_lsb: int = 8   # used when poc type 0
    max_num_ref_frames: int = 1
    qpprime_y_zero_transform_bypass_flag: int = 0  # lossless (prof 244)
    gaps_in_frame_num_allowed: int = 0
    pic_width_in_mbs: int = 11
    pic_height_in_map_units: int = 9
    frame_mbs_only_flag: int = 1
    direct_8x8_inference_flag: int = 1
    # when set, a minimal VUI with bitstream_restriction is written so
    # decoders size their reorder buffer correctly (B pyramids)
    num_reorder_frames: int | None = None

    @property
    def width(self) -> int:
        return self.pic_width_in_mbs * 16

    @property
    def height(self) -> int:
        return self.pic_height_in_map_units * 16

    def write_rbsp(self) -> bytes:
        s = BitSink()
        s.put(self.profile_idc, 8)
        s.put(self.constraint_flags, 8)
        s.put(self.level_idc, 8)
        write_ue(s, self.seq_parameter_set_id)
        if self.profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
            # High-profile extension block (chroma_format etc.) — 4:2:0 8-bit
            write_ue(s, 1)            # chroma_format_idc
            write_ue(s, 0)            # bit_depth_luma_minus8
            write_ue(s, 0)            # bit_depth_chroma_minus8
            s.put(0, 1)               # qpprime_y_zero_transform_bypass_flag
            s.put(0, 1)               # seq_scaling_matrix_present_flag
        write_ue(s, self.log2_max_frame_num - 4)
        write_ue(s, self.pic_order_cnt_type)
        if self.pic_order_cnt_type == 0:
            write_ue(s, self.log2_max_pic_order_cnt_lsb - 4)
        elif self.pic_order_cnt_type == 1:
            raise NotImplementedError("poc type 1")
        write_ue(s, self.max_num_ref_frames)
        s.put(self.gaps_in_frame_num_allowed, 1)
        write_ue(s, self.pic_width_in_mbs - 1)
        write_ue(s, self.pic_height_in_map_units - 1)
        s.put(self.frame_mbs_only_flag, 1)
        if not self.frame_mbs_only_flag:
            raise NotImplementedError("interlace (MBAFF/PAFF) is out of scope")
        s.put(self.direct_8x8_inference_flag, 1)
        s.put(0, 1)                   # frame_cropping_flag
        if self.num_reorder_frames is None:
            s.put(0, 1)               # vui_parameters_present_flag
        else:
            s.put(1, 1)               # VUI (spec E.1.1), minimal subset
            for _ in range(7):
                s.put(0, 1)           # aspect/overscan/signal/chroma/
            #                           timing/nal_hrd/vcl_hrd absent
            s.put(0, 1)               # pic_struct_present_flag
            s.put(1, 1)               # bitstream_restriction_flag
            s.put(1, 1)               # motion_vectors_over_pic_boundaries
            write_ue(s, 0)            # max_bytes_per_pic_denom
            write_ue(s, 0)            # max_bits_per_mb_denom
            write_ue(s, 16)           # log2_max_mv_length_horizontal
            write_ue(s, 16)           # log2_max_mv_length_vertical
            write_ue(s, self.num_reorder_frames)
            write_ue(s, self.max_num_ref_frames
                     + self.num_reorder_frames)  # max_dec_frame_buffering
        s.rbsp_trailing_bits()
        return s.to_bytes()

    @classmethod
    def parse_rbsp(cls, rbsp: bytes) -> "SPS":
        r = BitReader(rbsp)
        sps = cls()
        sps.profile_idc = r.read(8)
        sps.constraint_flags = r.read(8)
        sps.level_idc = r.read(8)
        sps.seq_parameter_set_id = read_ue(r)
        if sps.profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
            chroma_format_idc = read_ue(r)
            if chroma_format_idc == 3:
                r.read(1)
            read_ue(r); read_ue(r)    # bit depths
            sps.qpprime_y_zero_transform_bypass_flag = r.read(1)
            if r.read(1):             # scaling matrices
                raise NotImplementedError("seq scaling matrices")
            if chroma_format_idc != 1:
                raise NotImplementedError("only 4:2:0")
        sps.log2_max_frame_num = read_ue(r) + 4
        sps.pic_order_cnt_type = read_ue(r)
        if sps.pic_order_cnt_type == 0:
            sps.log2_max_pic_order_cnt_lsb = read_ue(r) + 4
        elif sps.pic_order_cnt_type == 1:
            raise NotImplementedError("poc type 1")
        sps.max_num_ref_frames = read_ue(r)
        sps.gaps_in_frame_num_allowed = r.read(1)
        sps.pic_width_in_mbs = read_ue(r) + 1
        sps.pic_height_in_map_units = read_ue(r) + 1
        sps.frame_mbs_only_flag = r.read(1)
        if not sps.frame_mbs_only_flag:
            raise NotImplementedError("interlace is out of scope")
        sps.direct_8x8_inference_flag = r.read(1)
        if r.read(1):                 # frame_cropping_flag
            raise NotImplementedError("cropping")
        # ignore VUI if present
        return sps


@dataclasses.dataclass
class PPS:
    pic_parameter_set_id: int = 0
    seq_parameter_set_id: int = 0
    entropy_coding_mode_flag: int = 0     # 0 CAVLC, 1 CABAC
    pic_order_present_flag: int = 0
    num_ref_idx_l0_active: int = 1
    num_ref_idx_l1_active: int = 1
    weighted_pred_flag: int = 0
    weighted_bipred_idc: int = 0
    pic_init_qp: int = 26
    pic_init_qs: int = 26
    chroma_qp_index_offset: int = 0
    deblocking_filter_control_present_flag: int = 1
    constrained_intra_pred_flag: int = 0
    redundant_pic_cnt_present_flag: int = 0
    transform_8x8_mode_flag: int = 0      # High-profile tail (7.3.2.2)
    second_chroma_qp_index_offset: int = 0

    def write_rbsp(self) -> bytes:
        s = BitSink()
        write_ue(s, self.pic_parameter_set_id)
        write_ue(s, self.seq_parameter_set_id)
        s.put(self.entropy_coding_mode_flag, 1)
        s.put(self.pic_order_present_flag, 1)
        write_ue(s, 0)                # num_slice_groups_minus1 (FMO off)
        write_ue(s, self.num_ref_idx_l0_active - 1)
        write_ue(s, self.num_ref_idx_l1_active - 1)
        s.put(self.weighted_pred_flag, 1)
        s.put(self.weighted_bipred_idc, 2)
        write_se(s, self.pic_init_qp - 26)
        write_se(s, self.pic_init_qs - 26)
        write_se(s, self.chroma_qp_index_offset)
        s.put(self.deblocking_filter_control_present_flag, 1)
        s.put(self.constrained_intra_pred_flag, 1)
        s.put(self.redundant_pic_cnt_present_flag, 1)
        if self.transform_8x8_mode_flag:
            s.put(1, 1)               # transform_8x8_mode_flag
            s.put(0, 1)               # pic_scaling_matrix_present_flag
            write_se(s, self.second_chroma_qp_index_offset)
        s.rbsp_trailing_bits()
        return s.to_bytes()

    @classmethod
    def parse_rbsp(cls, rbsp: bytes) -> "PPS":
        r = BitReader(rbsp)
        pps = cls()
        pps.pic_parameter_set_id = read_ue(r)
        pps.seq_parameter_set_id = read_ue(r)
        pps.entropy_coding_mode_flag = r.read(1)
        pps.pic_order_present_flag = r.read(1)
        if read_ue(r) != 0:
            raise NotImplementedError("FMO slice groups (decode)")
        pps.num_ref_idx_l0_active = read_ue(r) + 1
        pps.num_ref_idx_l1_active = read_ue(r) + 1
        pps.weighted_pred_flag = r.read(1)
        pps.weighted_bipred_idc = r.read(2)
        pps.pic_init_qp = read_se(r) + 26
        pps.pic_init_qs = read_se(r) + 26
        pps.chroma_qp_index_offset = read_se(r)
        pps.deblocking_filter_control_present_flag = r.read(1)
        pps.constrained_intra_pred_flag = r.read(1)
        pps.redundant_pic_cnt_present_flag = r.read(1)
        pps.second_chroma_qp_index_offset = pps.chroma_qp_index_offset
        if r.more_rbsp_data():        # High-profile tail
            pps.transform_8x8_mode_flag = r.read(1)
            if r.read(1):
                raise NotImplementedError("pic scaling matrices")
            pps.second_chroma_qp_index_offset = read_se(r)
        return pps
