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




# ---------------------------------------------------------------- scaling
# Default scaling lists (spec Tables 7-3/7-4, zig-zag order); verified
# against the system libavcodec rodata (raster form, see round-5 notes).
import numpy as np

DEFAULT_4x4 = (
    [6, 13, 13, 20, 20, 20, 28, 28, 28, 28, 32, 32, 32, 37, 37, 42],
    [10, 14, 14, 20, 20, 20, 24, 24, 24, 24, 27, 27, 27, 30, 30, 34])
DEFAULT_8x8 = (
    [6, 10, 10, 13, 11, 13, 16, 16, 16, 16, 18, 18, 18, 18, 18, 23,
     23, 23, 23, 23, 23, 25, 25, 25, 25, 25, 25, 25, 27, 27, 27, 27,
     27, 27, 27, 27, 29, 29, 29, 29, 29, 29, 29, 31, 31, 31, 31, 31,
     31, 33, 33, 33, 33, 33, 36, 36, 36, 36, 38, 38, 38, 40, 40, 42],
    [9, 13, 13, 15, 13, 15, 17, 17, 17, 17, 19, 19, 19, 19, 19, 21,
     21, 21, 21, 21, 21, 22, 22, 22, 22, 22, 22, 22, 24, 24, 24, 24,
     24, 24, 24, 24, 25, 25, 25, 25, 25, 25, 25, 27, 27, 27, 27, 27,
     27, 28, 28, 28, 28, 28, 30, 30, 30, 30, 32, 32, 32, 33, 33, 35])
_ZZ4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
_ZZ8 = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


def _derzz(scan_vals, size):
    zz = _ZZ4 if size == 16 else _ZZ8
    out = np.zeros(size, dtype=np.int64)
    out[zz] = scan_vals
    n = 4 if size == 16 else 8
    return out.reshape(n, n)


def _read_scaling_list(r, size):
    """scaling_list() (spec 7.3.2.1.1) -> (scan values, use_default)."""
    last, nxt = 8, 8
    vals = []
    use_default = False
    for j in range(size):
        if nxt != 0:
            delta = read_se(r)
            nxt = (last + delta + 256) % 256
            if j == 0 and nxt == 0:
                use_default = True
        vals.append(last if nxt == 0 else nxt)
        last = vals[-1]
    return vals, use_default


def parse_scaling_lists(r, n_lists, fallback4, fallback8):
    """Parse `n_lists` scaling lists with the Table 7-2 fall-back rules.

    fallback4/fallback8: the rule-A/B fallbacks for absent lists 0/3 and
    6/7 (default matrices for rule A, the SPS lists for rule B); absent
    non-anchor lists fall back to the PREVIOUS list.  Returns
    (w4 [6][4,4], w8 [2][8,8]) raster int64 arrays."""
    w4 = [None] * 6
    w8 = [None] * 2
    for i in range(n_lists):
        size = 16 if i < 6 else 64
        present = r.read(1)
        if present:
            vals, use_def = _read_scaling_list(r, size)
            if use_def:
                mat = _derzz(DEFAULT_4x4[0 if i < 3 else 1], 16)                     if i < 6 else _derzz(DEFAULT_8x8[i - 6], 64)
            else:
                mat = _derzz(vals, size)
        else:
            if i == 0 or i == 3:
                mat = fallback4[0 if i == 0 else 1].copy()
            elif i < 6:
                mat = w4[i - 1].copy()
            else:
                mat = fallback8[i - 6].copy()
        if i < 6:
            w4[i] = mat
        else:
            w8[i - 6] = mat
    for i in range(1, 6):                # PPS with n_lists == 6: no 8x8
        if w4[i] is None:
            w4[i] = w4[i - 1].copy()
    if w8[0] is None:
        w8 = [fallback8[0].copy(), fallback8[1].copy()]
    return w4, w8


def _default_mats():
    return ([_derzz(DEFAULT_4x4[0], 16), _derzz(DEFAULT_4x4[1], 16)],
            [_derzz(DEFAULT_8x8[0], 64), _derzz(DEFAULT_8x8[1], 64)])


@dataclasses.dataclass
class SPS:
    profile_idc: int = 66
    constraint_flags: int = 0         # constraint_setX flags + reserved, u(8)
    level_idc: int = 30
    seq_parameter_set_id: int = 0
    log2_max_frame_num: int = 8       # log2_max_frame_num_minus4 + 4
    pic_order_cnt_type: int = 2
    log2_max_pic_order_cnt_lsb: int = 8   # used when poc type 0
    # poc type 1 (spec 8.2.1.2) parameters
    delta_pic_order_always_zero_flag: int = 1
    offset_for_non_ref_pic: int = 0
    offsets_for_ref_frame: tuple = ()
    # frame cropping (spec 7.4.2.1.1): (left, right, top, bottom) in
    # chroma units (4:2:0 frame: luma crop = 2x) or None
    crop: tuple | None = None
    max_num_ref_frames: int = 1
    qpprime_y_zero_transform_bypass_flag: int = 0  # lossless (prof 244)
    scaling_w4: object = None         # [6][4,4] weightScale or None=flat
    scaling_w8: object = None         # [2][8,8]
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
            s.put(self.delta_pic_order_always_zero_flag, 1)
            write_se(s, self.offset_for_non_ref_pic)
            write_se(s, 0)            # offset_for_top_to_bottom_field
            write_ue(s, len(self.offsets_for_ref_frame))
            for off in self.offsets_for_ref_frame:
                write_se(s, off)
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
            if r.read(1):             # seq_scaling_matrix_present_flag
                d4, d8 = _default_mats()
                sps.scaling_w4, sps.scaling_w8 = parse_scaling_lists(
                    r, 8, d4, d8)     # rule A: defaults anchor 0/3/6/7
            if chroma_format_idc != 1:
                raise NotImplementedError("only 4:2:0")
        sps.log2_max_frame_num = read_ue(r) + 4
        sps.pic_order_cnt_type = read_ue(r)
        if sps.pic_order_cnt_type == 0:
            sps.log2_max_pic_order_cnt_lsb = read_ue(r) + 4
        elif sps.pic_order_cnt_type == 1:
            sps.delta_pic_order_always_zero_flag = r.read(1)
            sps.offset_for_non_ref_pic = read_se(r)
            read_se(r)                # offset_for_top_to_bottom_field
            n_cycle = read_ue(r)
            sps.offsets_for_ref_frame = tuple(
                read_se(r) for _ in range(n_cycle))
        sps.max_num_ref_frames = read_ue(r)
        sps.gaps_in_frame_num_allowed = r.read(1)
        sps.pic_width_in_mbs = read_ue(r) + 1
        sps.pic_height_in_map_units = read_ue(r) + 1
        sps.frame_mbs_only_flag = r.read(1)
        if not sps.frame_mbs_only_flag:
            raise NotImplementedError("interlace is out of scope")
        sps.direct_8x8_inference_flag = r.read(1)
        if r.read(1):                 # frame_cropping_flag
            sps.crop = (read_ue(r), read_ue(r), read_ue(r), read_ue(r))
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
    scaling_w4: object = None         # [6][4,4] weightScale or None=flat
    scaling_w8: object = None         # [2][8,8]

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
    def parse_rbsp(cls, rbsp: bytes, sps: "SPS | None" = None) -> "PPS":
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
            if r.read(1):             # pic_scaling_matrix_present_flag
                # rule B when the SPS carried matrices (its lists anchor
                # 0/3/6/7), rule A (defaults) otherwise
                if sps is not None and sps.scaling_w4 is not None:
                    f4 = [sps.scaling_w4[0], sps.scaling_w4[3]]
                    f8 = sps.scaling_w8
                else:
                    f4, f8 = _default_mats()
                n = 6 + 2 * pps.transform_8x8_mode_flag
                pps.scaling_w4, pps.scaling_w8 = parse_scaling_lists(
                    r, n, f4, f8)
            pps.second_chroma_qp_index_offset = read_se(r)
        return pps
