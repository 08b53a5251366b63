import numpy as np
import pytest

from tpu264.bits import expgolomb as eg
from tpu264.bits.bitreader import BitReader
from tpu264.bits.bitwriter import BitSink, pack_bits
from tpu264.bits import nal


def test_pack_bits_basic():
    vals = np.array([0b101, 0b1, 0b0, 0b11111111], dtype=np.uint64)
    lens = np.array([3, 1, 0, 8])
    packed, total = pack_bits(vals, lens)
    assert total == 12
    bits = np.unpackbits(packed)[:12]
    assert "".join(map(str, bits)) == "101111111111"


def test_pack_bits_random_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(1, 500))
        lens = rng.integers(0, 33, n)
        vals = np.array([rng.integers(0, 1 << l) if l else 0 for l in lens],
                        dtype=np.uint64)
        packed, total = pack_bits(vals, lens)
        r = BitReader(packed.tobytes())
        for v, l in zip(vals, lens):
            assert r.read(int(l)) == int(v)
        assert total == int(lens.sum())


def test_expgolomb_scalar_roundtrip():
    for v in list(range(0, 300)) + [1000, 65534]:
        s = BitSink()
        eg.write_ue(s, v)
        assert eg.read_ue(BitReader(s.to_bytes())) == v
    for v in list(range(-200, 200)) + [-5000, 5000]:
        s = BitSink()
        eg.write_se(s, v)
        assert eg.read_se(BitReader(s.to_bytes())) == v


def test_expgolomb_known_codes():
    # spec 9.1 Table 9-2: codeNum 0→'1', 1→'010', 2→'011', 3→'00100'
    code, n = eg.ue_code(np.array([0, 1, 2, 3, 4, 5, 6, 7]))
    assert list(n) == [1, 3, 3, 5, 5, 5, 5, 7]
    assert list(code) == [1, 2, 3, 4, 5, 6, 7, 8]


def test_emulation_prevention():
    cases = [
        b"\x00\x00\x00",           # -> 00 00 03 00
        b"\x00\x00\x01\x00\x00\x02",
        b"\x00\x00\x00\x00\x00\x00",
        b"\x00\x00\x03\x04",
        b"\xab\x00\x00\x00\x01\xcd",
        bytes(range(256)) * 3,
    ]
    for rbsp in cases:
        ebsp = nal.rbsp_to_ebsp(rbsp)
        # escaped stream must not contain 00 00 00/01/02 (00 00 03 is the
        # escape marker itself and is legal)
        a = np.frombuffer(ebsp, dtype=np.uint8)
        if a.size >= 3:
            bad = (a[:-2] == 0) & (a[1:-1] == 0) & (a[2:] <= 2)
            assert not bad.any(), (rbsp, ebsp)
        assert nal.ebsp_to_rbsp(ebsp) == rbsp


def test_emulation_prevention_random():
    rng = np.random.default_rng(1)
    for _ in range(200):
        n = int(rng.integers(0, 200))
        # biased toward zeros to exercise escaping
        rbsp = rng.choice([0, 0, 0, 1, 2, 3, 255], n).astype(np.uint8).tobytes()
        assert nal.ebsp_to_rbsp(nal.rbsp_to_ebsp(rbsp)) == rbsp


def test_nalu_split_roundtrip():
    # conforming RBSPs end with the rbsp_stop_one_bit → last byte nonzero
    payloads = [(3, nal.NAL_SPS, b"\x42\x00\x1e\x00\x00\x01\x07"),
                (3, nal.NAL_PPS, b"\x00\x00\x80"),
                (3, nal.NAL_IDR, bytes(100) + b"\x80"),
                (0, nal.NAL_SLICE, b"\xff" * 7)]
    stream = b"".join(nal.make_nalu(*p) for p in payloads)
    out = list(nal.split_annexb(stream))
    assert len(out) == len(payloads)
    for (ri, ti, pi), (ro, to, po) in zip(payloads, out):
        assert (ri, ti, pi) == (ro, to, po)


def test_sps_pps_roundtrip():
    from tpu264.bits.params import PPS, SPS
    sps = SPS(profile_idc=66, level_idc=30, pic_width_in_mbs=11,
              pic_height_in_map_units=9, pic_order_cnt_type=2,
              max_num_ref_frames=2)
    sps2 = SPS.parse_rbsp(sps.write_rbsp())
    assert sps2 == sps
    pps = PPS(pic_init_qp=28, deblocking_filter_control_present_flag=1)
    assert PPS.parse_rbsp(pps.write_rbsp()) == pps
    # high-profile SPS path
    spsh = SPS(profile_idc=100, level_idc=40, pic_width_in_mbs=120,
               pic_height_in_map_units=68)
    assert SPS.parse_rbsp(spsh.write_rbsp()) == spsh


def test_slice_header_roundtrip():
    from tpu264.bits.params import PPS, SPS
    from tpu264.bits.slicehdr import SLICE_I, SLICE_P, SliceHeader
    sps = SPS()
    pps = PPS(pic_init_qp=26)
    for st, idr, fn, qp in [(SLICE_I, True, 0, 28), (SLICE_P, False, 3, 30),
                            (SLICE_I, False, 7, 51)]:
        h = SliceHeader(slice_type=st, is_idr=idr, frame_num=fn, slice_qp=qp,
                        first_mb_in_slice=5, disable_deblocking_filter_idc=1)
        s = h.write_rbsp_head(sps, pps)
        s.rbsp_trailing_bits()
        r = BitReader(s.to_bytes())
        h2 = SliceHeader.parse(r, sps, pps, 5 if idr else 1, h.nal_ref_idc)
        assert h2.slice_type == st and h2.frame_num == fn
        assert h2.slice_qp == qp and h2.first_mb_in_slice == 5
        assert h2.disable_deblocking_filter_idc == 1
