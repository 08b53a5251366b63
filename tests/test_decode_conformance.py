"""Decoder conformance matrix on external (x264) bitstreams.

Our decoder's YUV must equal libavcodec's YUV on every stream —
BASELINE.json: "bit-exact versus JM-decoded output for any conforming
bitstream" (VERDICT r2 task #5).  Every cell runs under BOTH entropy
coders (`ec` parametrization: cabac=0 / cabac=1 — VERDICT r4 task #1);
the CABAC side exercises the full 9.3.3 decode trees (P/B partitions,
sub-MB types, per-4x4 mvd/ref contexts, cat-5 8x8 residual, I_PCM
with arithmetic-engine re-init).
"""

import numpy as np
import pytest

from lavc_util import lavc_decode
from x264_util import x264_encode

W, H = 176, 144
BASE = ("8x8dct=0:cabac={ec}:bframes=0:weightp=0:aq-mode=0:trellis=0"
        ":slices=1:scenecut=0")

pytestmark = []


def _base(ec):
    return BASE.format(ec=ec)


def _frames(n, seed=5):
    rng = np.random.RandomState(seed)
    out = []
    y = rng.randint(0, 255, (H, W)).astype(np.uint8)
    for t in range(n):
        # smooth pan + noise refresh band: exercises skip, mvs, intra
        y = np.roll(y, 2, axis=1)
        y[:, :8] = rng.randint(0, 255, (H, 8))
        u = rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8)
        v = rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8)
        out.append((y.copy(), u, v))
    return out


def _check(stream):
    from tpu264.decode.decoder import decode_annexb
    want, errors = lavc_decode(stream, W, H)
    assert not errors, errors[:2]
    got = decode_annexb(stream)
    assert len(got) == len(want), (len(got), len(want))
    for i, ((gy, gu, gv), (wy, wu, wv)) in enumerate(zip(got, want)):
        assert np.array_equal(gy, wy), ("Y", i)
        assert np.array_equal(gu, wu), ("U", i)
        assert np.array_equal(gv, wv), ("V", i)


@pytest.mark.parametrize("ec", [0, 1])
@pytest.mark.parametrize("refs", [1, 2, 3])
def test_x264_multiref(refs, ec):
    s = x264_encode(_frames(5), qp=26,
                    params=_base(ec) + f":ref={refs}:partitions=none:keyint=30")
    _check(s)


@pytest.mark.parametrize("ec", [0, 1])
@pytest.mark.parametrize("parts", ["none", "p8x8"])
def test_x264_partitions(parts, ec):
    s = x264_encode(_frames(5), qp=28,
                    params=_base(ec) + f":ref=1:partitions={parts}:keyint=30")
    _check(s)


@pytest.mark.parametrize("ec", [0, 1])
def test_x264_partitions_multiref(ec):
    s = x264_encode(_frames(6), qp=24,
                    params=_base(ec) + ":ref=3:partitions=p8x8:keyint=4")
    _check(s)


@pytest.mark.parametrize("ec", [0, 1])
def test_x264_all_intra(ec):
    s = x264_encode(_frames(2), qp=30,
                    params=_base(ec) + ":keyint=1:partitions=i4x4")
    _check(s)


@pytest.mark.parametrize("ec", [0, 1])
def test_x264_adaptive_qp(ec):
    """Per-MB mb_qp_delta chains (x264 aq-mode) — exercises the running-
    QP threading and per-MB-QP deblocking thresholds."""
    base = (f"8x8dct=0:cabac={ec}:bframes=0:weightp=0:trellis=0:slices=1"
            ":scenecut=0:ref=2:partitions=p8x8:keyint=30")
    s = x264_encode(_frames(5), qp=26, params=base + ":aq-mode=1")
    _check(s)
    # CRF mode drives larger qp_delta swings
    s2 = x264_encode(_frames(4), qp=28,
                     params=base + ":aq-mode=2:aq-strength=2.0")
    _check(s2)


@pytest.mark.parametrize("ec", [0, 1])
@pytest.mark.parametrize("bf", [1, 2, 3])
def test_x264_bframes_spatial_direct(bf, ec):
    """External B streams: B_Skip / B_Direct_16x16 (spatial direct, per-
    8x8 colZeroFlag), L0/L1/BI 16x16, B deblocking — bit-exact vs lavc
    (VERDICT r3 task #4)."""
    s = x264_encode(
        _frames(7), qp=28,
        params=f"8x8dct=0:cabac={ec}:bframes={bf}:b-adapt=0:b-pyramid=none"
               ":partitions=none:weightp=0:no-weightb=1:direct=spatial"
               ":ref=1:aq-mode=0:no-mbtree=1:trellis=0:slices=1"
               ":scenecut=0:keyint=30")
    _check(s)


def _fade_frames(n):
    base = _frames(n)
    return [((y.astype(np.float32) * (1 - 0.08 * t)).astype(np.uint8),
             u, v) for t, (y, u, v) in enumerate(base)]


@pytest.mark.parametrize("ec", [0, 1])
@pytest.mark.parametrize("pyr", ["normal", "strict"])
def test_x264_b_pyramid_mmco(pyr, ec):
    """b-pyramid streams use MMCO sliding control + reference Bs; with
    multi-ref B slices (ref_idx_lX te(v) fields)."""
    s = x264_encode(
        _frames(9), qp=28,
        params=f"8x8dct=0:cabac={ec}:bframes=3:b-adapt=0:b-pyramid={pyr}"
               ":partitions=none:weightp=0:no-weightb=1:direct=spatial"
               ":ref=2:aq-mode=0:no-mbtree=1:trellis=0:slices=1"
               ":scenecut=0:keyint=30")
    _check(s)


@pytest.mark.parametrize("ec", [0, 1])
@pytest.mark.parametrize("wp", ["weightp=1", "weightp=2",
                                "weightp=0:weightb=1:bframes=2"])
def test_x264_weighted_prediction(wp, ec):
    """Explicit P weights (incl. weightp=2 duplicate-reference lists)
    and implicit B bi-prediction weights, on fading content."""
    extra = "" if "bframes" in wp else ":bframes=0"
    s = x264_encode(
        _fade_frames(9), qp=28,
        params=f"8x8dct=0:cabac={ec}:{wp}{extra}:b-adapt=0:b-pyramid=none"
               ":partitions=none:direct=spatial:ref=2:aq-mode=0"
               ":no-mbtree=1:trellis=0:slices=1:scenecut=0:keyint=30")
    _check(s)


@pytest.mark.parametrize("ec", [0, 1])
@pytest.mark.parametrize("parts", ["i8x8", "i8x8,i4x4",
                                   "i8x8,i4x4,p8x8"])
def test_x264_high_8x8dct(parts, ec):
    """High profile: transform_size_8x8_flag streams — intra 8x8
    prediction (filtered references), 8x8 residual interleave, 8x8
    dequant/IDCT, and the 8x8-transform deblock edge rules."""
    s = x264_encode(
        _frames(7), qp=28,
        params=f"cabac={ec}:bframes=0:8x8dct=1:partitions={parts}:ref=2"
               ":weightp=0:aq-mode=0:no-mbtree=1:trellis=0:scenecut=0")
    _check(s)


@pytest.mark.parametrize("ec", [0, 1])
@pytest.mark.parametrize("preset", ["medium", "slow"])
def test_x264_default_preset_p(preset, ec):
    """x264 default presets with every default tool enabled (High
    8x8dct, weightp 2 dup-refs, aq, mbtree, multi-ref, partitions) —
    only CAVLC + P-only forced."""
    s = x264_encode(_fade_frames(9), qp=26, params=f"cabac={ec}:bframes=0",
                    preset=preset)
    _check(s)


@pytest.mark.parametrize("ec", [0, 1])
def test_x264_b_partitions_sub_mb(ec):
    """B_X_Y_16x8/8x16 two-partition types and B_8x8 with sub-partitions
    (incl. B_Direct_8x8 subs), mixed with High 8x8dct and multi-ref."""
    s = x264_encode(
        _fade_frames(9), qp=28,
        params=f"cabac={ec}:bframes=2:b-adapt=0"
               ":partitions=p8x8,b8x8,i8x8,i4x4:8x8dct=1:weightp=0"
               ":no-weightb=1:ref=2:aq-mode=0:no-mbtree=1"
               ":direct=spatial")
    _check(s)


@pytest.mark.parametrize("ec", [0, 1])
def test_x264_default_preset_with_b(ec):
    """x264 medium preset, EVERY default tool (B frames with pyramid,
    partitions, sub-MBs, direct/skip, weighted prediction, 8x8dct, aq,
    mbtree, multi-ref) — only CAVLC forced."""
    s = x264_encode(_fade_frames(9), qp=26, params=f"cabac={ec}")
    _check(s)


@pytest.mark.parametrize("ec", [0, 1])
@pytest.mark.parametrize("mode", ["temporal", "auto"])
def test_x264_temporal_direct(mode, ec):
    """Temporal direct (spec 8.4.1.2.3 MV scaling, per-8x8 colocated
    reference mapping); 'auto' mixes spatial/temporal per slice."""
    s = x264_encode(
        _fade_frames(9), qp=28,
        params=f"cabac={ec}:bframes=3:b-adapt=0:direct={mode}"
               ":partitions=p8x8,b8x8,i8x8,i4x4:8x8dct=1:weightp=0"
               ":no-weightb=1:ref=2:aq-mode=0:no-mbtree=1")
    _check(s)


@pytest.mark.parametrize("ec", [0, 1])
def test_x264_slow_preset_defaults_with_b(ec):
    """x264 slow preset, every default tool (incl. direct=auto) — with
    both entropy coders."""
    s = x264_encode(_fade_frames(9), qp=26, params=f"cabac={ec}:bframes=3",
                    preset="slow")
    _check(s)


def test_x264_cabac_ipcm():
    """I_PCM macroblocks under CABAC: pcm_alignment, raw sample read,
    and the arithmetic-engine re-initialization (spec 9.3.1.2).  x264
    emits an all-I_PCM IDR frame at qp 0 (lossless mode); only that
    access unit is decoded — the following lossless transform-bypass
    P frames are out of scope and raise NotImplementedError."""
    from tpu264.bits import nal
    s = x264_encode(_frames(3), qp=0, params="cabac=1:bframes=0:aq-mode=0")
    parts = []
    for ref_idc, ntype, rbsp in nal.split_annexb(s):
        if ntype == nal.NAL_SLICE:
            break
        parts.append((ref_idc, ntype, rbsp))
    trunc = b"".join(nal.make_nalu(ri, nt, rb) for ri, nt, rb in parts)
    _check(trunc)
    from tpu264.decode.decoder import decode_annexb
    with pytest.raises(NotImplementedError):
        decode_annexb(s)          # transform-bypass P frames


@pytest.mark.parametrize("ec", [0, 1])
@pytest.mark.parametrize("db", ["1,1", "-2,2", "-6,-6"])
def test_x264_deblock_offsets(db, ec):
    """Nonzero slice_alpha_c0_offset_div2 / slice_beta_offset_div2
    (spec 8.7.2: indexA/indexB = qPav + FilterOffsetA/B) — previously an
    assertion failure on legal streams (VERDICT r4 weak #6)."""
    s = x264_encode(_frames(5), qp=28,
                    params=_base(ec) + f":ref=2:partitions=p8x8:keyint=30"
                    f":deblock={db}")
    _check(s)


@pytest.mark.parametrize("ec", [0, 1])
@pytest.mark.parametrize("cqm", ["jvt", "flat"])
def test_x264_scaling_matrices(cqm, ec):
    """SPS/PPS scaling lists (spec 7.3.2.1.1 + 8.5.9 weighted dequant):
    x264 --cqm jvt emits non-flat 4x4 and 8x8 weight matrices; default
    matrices verified against libavcodec rodata."""
    s = x264_encode(_frames(5), qp=28,
                    params=_base(ec) + f":ref=2:partitions=p8x8:8x8dct=1"
                    f":cqm={cqm}")
    _check(s)


@pytest.mark.parametrize("ec", [0, 1])
def test_x264_frame_cropping(ec):
    """Non-multiple-of-16 dimensions: x264 emits frame_cropping_flag
    (spec 7.4.2.1.1); cropping applies to OUTPUT pictures only while
    references stay full padded size."""
    cw, ch = 172, 92
    frames = [(y[:ch, :cw], u[:ch // 2, :cw // 2], v[:ch // 2, :cw // 2])
              for (y, u, v) in _frames(4)]
    s = x264_encode(frames, qp=28, params=_base(ec) + ":ref=2:keyint=30")
    from tpu264.decode.decoder import decode_annexb
    want, errors = lavc_decode(s, cw, ch)
    assert not errors, errors[:2]
    got = decode_annexb(s)
    assert got[0][0].shape == (ch, cw)
    for i in range(len(frames)):
        for p in range(3):
            assert np.array_equal(got[i][p], want[i][p]), (i, p)


def test_poc_type_1():
    """POC type 1 (spec 8.2.1.2): an IPPP stream rewritten with a
    type-1 SPS (always_zero, cycle offsets (2,)) decodes identically —
    cross-checked against libavcodec on the same rewritten stream."""
    from tpu264.bits import nal as N
    from tpu264.bits.params import SPS
    from tpu264.config import EncoderConfig
    from tpu264.coding.encoder import Encoder
    from tpu264.decode.decoder import decode_annexb
    from tpu264.media.synth import synth_frame
    frames = [synth_frame(W, H, t) for t in range(5)]
    enc = Encoder(EncoderConfig(width=W, height=H, qp=30,
                                intra_period=0), gop_mode="ippp")
    stream = enc.encode_sequence(frames)
    sps1 = SPS.parse_rbsp(next(rb for _, nt, rb in N.split_annexb(stream)
                               if nt == N.NAL_SPS))
    sps1.pic_order_cnt_type = 1
    sps1.delta_pic_order_always_zero_flag = 1
    sps1.offsets_for_ref_frame = (2,)
    pieces = [N.make_nalu(3, N.NAL_SPS, sps1.write_rbsp())
              if nt == N.NAL_SPS else N.make_nalu(ri, nt, rb)
              for ri, nt, rb in N.split_annexb(stream)]
    s1 = b"".join(pieces)
    got = decode_annexb(s1)
    want, errors = lavc_decode(s1, W, H)
    assert not errors, errors[:2]
    for i in range(len(frames)):
        assert np.array_equal(got[i][0],
                              np.asarray(enc.recons[i][0])), i
        assert np.array_equal(want[i][0],
                              np.asarray(enc.recons[i][0])), ("lavc", i)
