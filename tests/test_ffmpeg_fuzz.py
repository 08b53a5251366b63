"""Randomized syntax fuzz: hand-built MB data → serializer → bitstream,
cross-decoded by ffmpeg and our reference decoder; both must agree
bit-exactly with no decoder errors.  This is host-only (no JAX engine),
so it covers the entropy/serialization layer densely and fast."""

import numpy as np
import pytest

from lavc_util import lavc_decode
from tpu264.bits import nal
from tpu264.bits.params import PPS, SPS
from tpu264.bits.slicehdr import SLICE_I, SliceHeader
from tpu264.coding.wavefront import BLK_ORDER
from tpu264.decode import decode_annexb
from tpu264.entropy import slice_writer


def build_stream(wm, hm, mb, qp=28, slices=1):
    sps = SPS(profile_idc=66, constraint_flags=0xC0, level_idc=20,
              pic_width_in_mbs=wm, pic_height_in_map_units=hm)
    pps = PPS(pic_init_qp=26, deblocking_filter_control_present_flag=1)
    rows = [r * (hm // slices) for r in range(slices)]
    values, lengths = slice_writer.serialize_frame_mbs(mb, wm, hm, rows)
    out = [nal.make_nalu(3, nal.NAL_SPS, sps.write_rbsp()),
           nal.make_nalu(3, nal.NAL_PPS, pps.write_rbsp())]
    rows_per = hm // slices
    for s in range(slices):
        first = rows[s] * wm
        last = first + rows_per * wm
        hdr = SliceHeader(first_mb_in_slice=first, slice_type=SLICE_I,
                          frame_num=0, idr_pic_id=0, slice_qp=qp,
                          disable_deblocking_filter_idc=1, is_idr=True)
        sink = hdr.write_rbsp_head(sps, pps)
        rbsp = slice_writer.pack_slice(values[first:last], lengths[first:last],
                                       sink)
        out.append(nal.make_nalu(3, nal.NAL_IDR, rbsp))
    return b"".join(out)


def _idct_intermediates_ok(scanned, qp, is_dc_block=False, d00=0):
    """Spec 8.5.12.2 range constraint: both inverse-transform stages must
    stay within int16 (reference decoders store stage outputs in int16_t).
    Random level vectors need not correspond to any real residual, so the
    fuzz checks explicitly; real encoder output satisfies this by
    construction."""
    from tpu264.ref import transform as rt
    coeff = np.zeros(16, np.int64)
    if is_dc_block:
        coeff[rt.ZIGZAG_4x4] = scanned
    else:
        coeff[rt.ZIGZAG_4x4[1:]] = scanned[1:]
    d = rt.dequant4x4(coeff.reshape(4, 4), qp)
    if not is_dc_block:
        d[0, 0] = d00          # externally scaled DC (I16 / chroma paths)
    if np.abs(d).max() > 32767:
        return False
    e0 = d[:, 0] + d[:, 2]
    e1 = d[:, 0] - d[:, 2]
    e2 = (d[:, 1] >> 1) - d[:, 3]
    e3 = d[:, 1] + (d[:, 3] >> 1)
    f = np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=1)
    if np.abs(f).max() > 32767:
        return False
    g0 = f[0] + f[2]
    g1 = f[0] - f[2]
    g2 = (f[1] >> 1) - f[3]
    g3 = f[1] + (f[3] >> 1)
    h = np.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3])
    return np.abs(h).max() <= 32767


def _tame_block(scanned, qp, is_dc_block=False, d00_bound=0):
    """Halve levels until the block satisfies the range constraint under
    the worst-case external DC value."""
    out = scanned.copy()
    while not (_idct_intermediates_ok(out, qp, is_dc_block, d00_bound)
               and _idct_intermediates_ok(out, qp, is_dc_block, -d00_bound)):
        out = np.sign(out) * (np.abs(out) // 2)
    return out


def random_mb(rng, wm, hm, slices=1, max_mag=9, qp=28):
    """Random but CONFORMING per-MB data: modes respect availability, and
    level magnitudes respect the spec int16 range constraints on
    dequantized coefficients at this QP (ref.transform.level_limit_*)."""
    from tpu264.ref import transform as rt
    n = wm * hm
    rows_per = hm // slices
    cqp = rt.chroma_qp(qp)
    # joint worst case: random levels can align, so divide the single-level
    # bounds by the transform fan-in (16 DC levels, 4 chroma DC levels)
    ac_cap = max(1, min(max_mag, int(rt.level_limit_ac(qp).min())))
    dc_cap = max(1, min(40, rt.level_limit_dc(qp) // 16))
    cac_cap = max(1, min(6, int(rt.level_limit_ac(cqp).min())))
    cdc_cap = max(1, min(15, rt.level_limit_cdc(cqp) // 4))
    mb = dict(
        sel16=rng.random(n) < 0.5,
        i16mode=np.full(n, 2, np.int64),
        modes=np.full((n, 16), 2, np.int64),
        cmode=np.zeros(n, np.int64),
        luma_ac=(rng.integers(-ac_cap, ac_cap + 1, (n, 16, 16))
                 * (rng.random((n, 16, 16)) < 0.25)).astype(np.int64),
        luma_dc=(rng.integers(-dc_cap, dc_cap + 1, (n, 16))
                 * (rng.random((n, 16)) < 0.4)).astype(np.int64),
        chroma_dc=(rng.integers(-cdc_cap, cdc_cap + 1, (n, 2, 4))
                   * (rng.random((n, 2, 4)) < 0.4)).astype(np.int64),
        chroma_ac=(rng.integers(-cac_cap, cac_cap + 1, (n, 2, 4, 16))
                   * (rng.random((n, 2, 4, 16)) < 0.2)).astype(np.int64),
    )
    mb["luma_ac"][:, :, 0] = np.where(mb["sel16"][:, None], 0,
                                      mb["luma_ac"][:, :, 0])
    mb["chroma_ac"][:, :, :, 0] = 0
    from tpu264.ref.transform import _V_CLASS
    # worst-case scaled DC magnitudes given the caps (16/4 aligned levels)
    q6, cq6 = qp // 6, cqp // 6
    ls = 16 * int(_V_CLASS[qp % 6, 0])
    cls_ = 16 * int(_V_CLASS[cqp % 6, 0])
    dcy_bound = min(32767, (16 * dc_cap * ls) >> (6 - q6) if q6 < 6
                    else (16 * dc_cap * ls) << (q6 - 6))
    dcc_bound = min(32767, (4 * cdc_cap * cls_ << cq6) >> 5)
    for i in range(n):
        for j in range(16):
            mb["luma_ac"][i, j] = _tame_block(
                mb["luma_ac"][i, j], qp, is_dc_block=not mb["sel16"][i],
                d00_bound=dcy_bound if mb["sel16"][i] else 0)
        for comp in range(2):
            for j in range(4):
                mb["chroma_ac"][i, comp, j] = _tame_block(
                    mb["chroma_ac"][i, comp, j], cqp, d00_bound=dcc_bound)
    for i in range(n):
        r, c = i // wm, i % wm
        at = (r % rows_per) > 0 if slices > 1 else r > 0
        al = c > 0
        mb["i16mode"][i] = rng.choice(
            [m for m, ok in [(0, at), (1, al), (2, True), (3, at and al)] if ok])
        mb["cmode"][i] = rng.choice(
            [m for m, ok in [(0, True), (1, al), (2, at), (3, at and al)] if ok])
        for k, (by, bx) in enumerate(BLK_ORDER):
            b_at = at if by == 0 else True
            b_al = al if bx == 0 else True
            if by == 0 and bx == 0:
                b_atl = at and al
            elif by == 0:
                b_atl = at
            elif bx == 0:
                b_atl = al
            else:
                b_atl = True
            ok_modes = ([2] + ([0, 3, 7] if b_at else [])
                        + ([1, 8] if b_al else [])
                        + ([4, 5, 6] if (b_at and b_al and b_atl) else []))
            mb["modes"][i, k] = rng.choice(ok_modes)
    return mb


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_vs_ffmpeg(seed):
    rng = np.random.default_rng(seed)
    for _ in range(4):
        wm, hm = int(rng.integers(2, 5)), int(rng.integers(2, 4))
        qp = int(rng.integers(8, 49))
        mb = random_mb(rng, wm, hm, qp=qp)
        stream = build_stream(wm, hm, mb, qp=qp)
        ours = decode_annexb(stream)[0]
        ff, errors = lavc_decode(stream)
        assert errors == [], (seed, wm, hm, qp, errors)
        fy, fu, fv = ff[0]
        np.testing.assert_array_equal(fy, ours[0])
        np.testing.assert_array_equal(fu, ours[1])
        np.testing.assert_array_equal(fv, ours[2])


def test_fuzz_multi_slice():
    rng = np.random.default_rng(7)
    wm, hm, slices = 3, 4, 2
    mb = random_mb(rng, wm, hm, slices=slices, qp=30)
    stream = build_stream(wm, hm, mb, qp=30, slices=slices)
    ours = decode_annexb(stream)[0]
    ff, errors = lavc_decode(stream)
    assert errors == []
    np.testing.assert_array_equal(ff[0][0], ours[0])


def test_large_levels_vs_ffmpeg():
    """Dense high-magnitude blocks exercise suffix-length escalation and
    escape codes (the QP12 regression class)."""
    rng = np.random.default_rng(11)
    for trial in range(4):
        wm, hm = 3, 2
        mb = random_mb(rng, wm, hm, max_mag=120, qp=10)
        stream = build_stream(wm, hm, mb, qp=10)
        ours = decode_annexb(stream)[0]
        ff, errors = lavc_decode(stream)
        assert errors == [], (trial, errors)
        np.testing.assert_array_equal(ff[0][0], ours[0])
