"""CABAC conformance (PR3 gate, BASELINE.json config 3).

Encode-side: libavcodec must accept our CABAC streams with zero errors and
reproduce our reconstruction bit-exactly on all three planes (SURVEY.md
§4.2's external-oracle gate — closed-loop tests cannot catch co-diverging
encoder/decoder context bugs).

Parse-side: our CABAC context machinery must track independently-produced
conforming streams (libx264) to the last coded bin.

Engine tables: checked against libavcodec's rodata — a single wrong entry
in transIdxLPS (state 28) once produced streams that round-tripped
internally but failed externally only on rare content.
"""

import numpy as np
import pytest

from lavc_util import lavc_decode
from x264_util import x264_encode
from tpu264.config import EncoderConfig
from tpu264.coding.encoder import Encoder
from tpu264.media.synth import synth_frame

W, H = 48, 32


def _assert_lavc_bit_exact(enc, frames, stream):
    ff, errors = lavc_decode(stream)
    assert errors == [], errors
    assert len(ff) == len(frames)
    for (fy, fu, fv), (ry, ru, rv) in zip(ff, enc.recons):
        np.testing.assert_array_equal(fy, ry)
        np.testing.assert_array_equal(fu, ru)
        np.testing.assert_array_equal(fv, rv)


def test_cabac_all_intra():
    cfg = EncoderConfig(width=W, height=H, qp=26, symbol_mode="CABAC")
    enc = Encoder(cfg)
    frames = [synth_frame(W, H, t) for t in range(2)]
    _assert_lavc_bit_exact(enc, frames, enc.encode_sequence(frames))


def test_cabac_ippp():
    cfg = EncoderConfig(width=W, height=H, qp=30, symbol_mode="CABAC",
                        intra_period=0)
    enc = Encoder(cfg)
    frames = [synth_frame(W, H, t) for t in range(4)]
    _assert_lavc_bit_exact(enc, frames, enc.encode_sequence(frames))


@pytest.mark.parametrize("qp", [12, 28, 35, 46])
def test_cabac_qp_sweep(qp):
    cfg = EncoderConfig(width=W, height=H, qp=qp, symbol_mode="CABAC")
    enc = Encoder(cfg)
    frames = [synth_frame(W, H, 0)]
    _assert_lavc_bit_exact(enc, frames, enc.encode_sequence(frames))


def test_cabac_multi_slice():
    cfg = EncoderConfig(width=W, height=H, qp=26, symbol_mode="CABAC",
                        slices_per_frame=2)
    enc = Encoder(cfg)
    frames = [synth_frame(W, H, 0)]
    _assert_lavc_bit_exact(enc, frames, enc.encode_sequence(frames))


def test_cabac_ippp_partitions_multi_slice():
    """16x8/8x16 partitions under CABAC (Table 9-37 P mb_type tree +
    per-partition mvd contexts, spec 9.3.3.1.1.7) across slice
    boundaries (per-slice context resets)."""
    cfg = EncoderConfig(width=80, height=64, qp=30, symbol_mode="CABAC",
                        intra_period=0, slices_per_frame=2)
    enc = Encoder(cfg)
    assert enc.partitions and enc.t8_mode
    frames = [synth_frame(80, 64, 3 * t) for t in range(4)]
    stream = enc.encode_sequence(frames)
    _assert_lavc_bit_exact(enc, frames, stream)


def test_cabac_random_chroma_stress():
    """Random planes drive deep engine-state excursions (the transIdxLPS
    state-28 bug only manifested on content like this)."""
    rng = np.random.RandomState(7)
    frames = [(rng.randint(0, 255, (H, W)).astype(np.uint8),
               rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8),
               rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8))
              for _ in range(2)]
    cfg = EncoderConfig(width=W, height=H, qp=22, symbol_mode="CABAC")
    enc = Encoder(cfg)
    _assert_lavc_bit_exact(enc, frames, enc.encode_sequence(frames))


# ---------------------------------------------------------------- parse side

def _parse_x264_stream(stream):
    """Track an x264 CABAC stream with our context machinery; returns
    (bits_consumed, total_bits, premature_eos)."""
    from tpu264.bits import nal
    from tpu264.bits.bitreader import BitReader
    from tpu264.bits.params import SPS, PPS
    from tpu264.bits.slicehdr import SliceHeader
    from tpu264.decode.cabac_parse import CabacSliceParser
    from tpu264.entropy import cabac_ctx as cs

    sps = pps = None
    for ref_idc, ntype, rbsp in nal.split_annexb(stream):
        if ntype == 7:
            sps = SPS.parse_rbsp(rbsp)
        elif ntype == 8:
            pps = PPS.parse_rbsp(rbsp)
        elif ntype in (1, 5):
            r = BitReader(rbsp)
            hdr = SliceHeader.parse(r, sps, pps, ntype, ref_idc)
            wm, hm = sps.pic_width_in_mbs, sps.pic_height_in_map_units
            st = cs.CabacFrameState(wm, hm)

            class IC:
                grid = np.full((hm * 4, wm * 4), -1, dtype=np.int64)

                def mpm(self, gr, gc):
                    a = -2 if gc == 0 else self.grid[gr, gc - 1]
                    b = -2 if gr == 0 else self.grid[gr - 1, gc]
                    a = 2 if a == -1 else a
                    b = 2 if b == -1 else b
                    return 2 if (a < 0 or b < 0) else min(a, b)

                def set(self, gr, gc, m):
                    self.grid[gr, gc] = m

            p = CabacSliceParser(rbsp, r.pos, 0, hdr.slice_qp, st, 1)
            ic = IC()
            n = wm * hm
            for i in range(n):
                mr, mc = i // wm, i % wm
                st.start_mb(mr, mc, 1)
                p.parse_mb(mr, mc, False, ic)
                eos = p.end_of_slice()
                if eos:
                    return p.eng.pos, 8 * len(rbsp), i != n - 1
            return p.eng.pos, 8 * len(rbsp), False
    raise AssertionError("no slice NAL found")


@pytest.mark.parametrize("content", ["texture", "mixed", "chroma"])
def test_parse_x264_cabac(content):
    rng = np.random.RandomState(3)
    y = rng.randint(0, 255, (H, W)).astype(np.uint8)
    u = rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8)
    v = rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8)
    if content == "mixed":
        y = y.copy()
        y[:16] = 128                      # I16 top row above I4 rows
    elif content == "chroma":
        y = np.full((H, W), 128, np.uint8)
    s = x264_encode([(y, u, v)], qp=26,
                    params="8x8dct=0:keyint=1:bframes=0:cabac=1")
    pos, total, premature = _parse_x264_stream(s)
    assert not premature
    # must land within the final byte (rbsp stop bit padding only)
    assert total - 8 <= pos <= total, (pos, total)


# ------------------------------------------------------------- engine tables

def _lavc_engine_tables():
    """Extract CABAC engine tables from libavcodec's rodata
    (ff_h264_cabac_tables is not exported; locate it via the unique
    norm_shift prefix)."""
    data = open("/lib/x86_64-linux-gnu/libavcodec.so.59", "rb").read()
    pat = (bytes([7, 7, 6, 6, 6, 6]) + bytes([5] * 8) + bytes([4] * 16)
           + bytes([3] * 32))
    i = data.find(pat)
    assert i > 0, "ff_h264_cabac_tables not located"
    base = i - 2
    lps = np.frombuffer(data[base + 512:base + 1024],
                        dtype=np.uint8)                  # [4][128] quant-major
    mlps = np.frombuffer(data[base + 1024:base + 1280], dtype=np.uint8)
    lps_q_major = lps.reshape(4, 128)[:, 0::2]           # drop mps duplication
    range_tab = lps_q_major.T                            # [64][4]
    mps_next = mlps[128:]
    lps_next = mlps[:128][::-1]
    trans_mps = mps_next[0::2] >> 1
    trans_lps = lps_next[0::2] >> 1
    return range_tab, trans_mps, trans_lps


def test_engine_tables_match_libavcodec():
    from tpu264.entropy import cabac_tables as t
    range_tab, trans_mps, trans_lps = _lavc_engine_tables()
    np.testing.assert_array_equal(np.asarray(t.RANGE_TAB_LPS), range_tab)
    np.testing.assert_array_equal(np.asarray(t.TRANS_IDX_MPS), trans_mps)
    np.testing.assert_array_equal(np.asarray(t.TRANS_IDX_LPS), trans_lps)
