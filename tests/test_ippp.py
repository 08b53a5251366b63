"""IPPP (PR2 gate, BASELINE.json config 2): full-search ME + quarter-pel
MC + P_Skip, closed-loop and external-decoder bit-exact."""

import numpy as np
import pytest

from lavc_util import lavc_decode
from tpu264.config import EncoderConfig
from tpu264.coding.encoder import Encoder
from tpu264.decode import decode_annexb
from tpu264.media.synth import synth_frame

W, H = 48, 32


@pytest.fixture(scope="module")
def encoded():
    cfg = EncoderConfig(width=W, height=H, qp=28, search_range=8,
                        intra_period=0)
    enc = Encoder(cfg)
    frames = [synth_frame(W, H, t) for t in range(4)]
    stream = enc.encode_sequence(frames)
    return enc, frames, stream


def test_ippp_closed_loop(encoded):
    enc, frames, stream = encoded
    assert [s.slice_type for s in enc.stats] == ["IDR", "P", "P", "P"]
    decoded = decode_annexb(stream)
    assert len(decoded) == 4
    for d, r in zip(decoded, enc.recons):
        np.testing.assert_array_equal(d[0], r[0])
        np.testing.assert_array_equal(d[1], r[1])
        np.testing.assert_array_equal(d[2], r[2])


def test_ippp_ffmpeg_bit_exact(encoded):
    enc, frames, stream = encoded
    ff, errors = lavc_decode(stream)
    assert errors == []
    assert len(ff) == 4
    for f, r in zip(ff, enc.recons):
        np.testing.assert_array_equal(f[0], r[0])
        if f[1] is not None:
            np.testing.assert_array_equal(f[1], r[1])
            np.testing.assert_array_equal(f[2], r[2])


def test_p_frames_cheaper_than_intra(encoded):
    enc, frames, stream = encoded
    idr_bits = enc.stats[0].bits
    for st in enc.stats[1:]:
        assert st.bits < idr_bits, "P frame should beat IDR on this content"
        assert st.psnr_y > 30


def test_static_content_skips():
    """A fully static sequence must code P frames almost entirely as
    P_Skip (tiny bitstream)."""
    cfg = EncoderConfig(width=W, height=H, qp=28, search_range=8,
                        intra_period=0)
    enc = Encoder(cfg)
    y, u, v = synth_frame(W, H, 0)
    stream = enc.encode_sequence([(y, u, v)] * 3)
    # P frame of identical content: recon differs from IDR recon only via
    # re-quantization; expect very few bits (skips + rare refinements)
    assert enc.stats[1].bits < enc.stats[0].bits // 4
    decoded = decode_annexb(stream)
    for d, r in zip(decoded, enc.recons):
        np.testing.assert_array_equal(d[0], r[0])
    ff, errors = lavc_decode(stream)
    assert errors == []
    np.testing.assert_array_equal(ff[2][0], enc.recons[2][0])


def test_periodic_intra():
    cfg = EncoderConfig(width=W, height=H, qp=30, search_range=8,
                        intra_period=2)
    enc = Encoder(cfg)
    frames = [synth_frame(W, H, t) for t in range(4)]
    stream = enc.encode_sequence(frames)
    assert [s.slice_type for s in enc.stats] == ["IDR", "P", "IDR", "P"]
    decoded = decode_annexb(stream)
    for d, r in zip(decoded, enc.recons):
        np.testing.assert_array_equal(d[0], r[0])
    ff, errors = lavc_decode(stream)
    assert errors == []


def test_motion_content_uses_inter():
    """Translating content: P frames should mostly pick inter modes and
    land near the true motion."""
    from tpu264.coding.encoder import jax_to_np
    from tpu264.coding.intra_frame import reorder_wave_outputs
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (H + 32, W + 32)).astype(np.uint8)
    frames = []
    for t in range(2):
        y = base[8 + 2 * t: 8 + 2 * t + H, 8 + 3 * t: 8 + 3 * t + W]
        u = np.full((H // 2, W // 2), 128, np.uint8)
        v = u.copy()
        frames.append((np.ascontiguousarray(y), u, v))
    cfg = EncoderConfig(width=W, height=H, qp=28, search_range=8,
                        intra_period=0)
    enc = Encoder(cfg)
    stream = enc.encode_sequence(frames)
    _, ys = enc._encode_p(*[np.asarray(p) for p in frames[1]],
                          *[np.asarray(p) for p in enc.recons[0]],
                          np.int32(cfg.qp_inter))
    mb = reorder_wave_outputs(enc.sched, jax_to_np(ys))
    assert mb["is_inter"].mean() > 0.8
    inter_mvs = mb["mv"][mb["is_inter"].astype(bool)]
    # frame1(y,x) = frame0(y+2, x+3) → mv = (+2,+3) full-pel = (8,12) qpel
    frac_right = ((inter_mvs == np.array([8, 12])).all(axis=1)).mean()
    assert frac_right > 0.5, inter_mvs[:8]
    decoded = decode_annexb(stream)
    np.testing.assert_array_equal(decoded[1][0], enc.recons[1][0])


def test_partitions_16x8_8x16_roundtrip():
    """16x8/8x16 inter partitions (auto-on for CAVLC IPPP): lavc + own
    decoder bit-exact with deblocking, and an RD win vs 16x16-only on
    the same frames (VERDICT r3 task #6)."""
    import numpy as np
    from lavc_util import lavc_decode
    from tpu264.decode.decoder import decode_annexb
    W2, H2 = 96, 80
    frames = [synth_frame(W2, H2, t) for t in range(6)]
    cfg = EncoderConfig(width=W2, height=H2, qp=30, intra_period=0)
    enc = Encoder(cfg)
    assert enc.partitions
    stream = enc.encode_sequence(frames)
    dec, errors = lavc_decode(stream, W2, H2)
    assert not errors, errors[:2]
    for i, (dy, du, dv) in enumerate(dec):
        assert np.array_equal(
            dy, np.asarray(enc.recons[i][0]).astype(np.uint8)), i
        assert np.array_equal(
            du, np.asarray(enc.recons[i][1]).astype(np.uint8)), i
    own = decode_annexb(stream)
    for i, (dy, du, dv) in enumerate(own):
        assert np.array_equal(
            dy, np.asarray(enc.recons[i][0]).astype(np.uint8)), i
    cfg16 = EncoderConfig(width=W2, height=H2, qp=30, intra_period=0,
                          inter_partitions=False)
    e16 = Encoder(cfg16)
    s16 = e16.encode_sequence(frames)
    p_parts = float(np.mean([s.psnr_y for s in enc.stats]))
    p_16 = float(np.mean([s.psnr_y for s in e16.stats]))
    # strictly better on this clip: fewer bits at >= equal quality
    assert len(stream) < len(s16)
    assert p_parts > p_16 - 0.05


def test_weighted_prediction_emission_fade():
    """Explicit P weighted prediction (VERDICT r4 task #6): on a fading
    clip the WP encoder must beat the non-WP encoder decisively, and
    both the external oracle and our decoder must reconstruct the WP
    stream bit-exactly (slice-header pred_weight_table write path)."""
    import numpy as np
    from lavc_util import lavc_decode
    from tpu264.media.synth import natural_frame
    from tpu264.decode.decoder import decode_annexb
    W, H = 176, 144
    base = [natural_frame(W, H, t) for t in range(8)]
    frames = [(np.clip(y.astype(np.float64) * (1 - 0.06 * t),
                       0, 255).astype(np.uint8), u, v)
              for t, (y, u, v) in enumerate(base)]
    sizes = {}
    for wp in (False, True):
        cfg = EncoderConfig(width=W, height=H, qp=30, intra_period=0,
                            weighted_pred=wp)
        enc = Encoder(cfg)
        s = enc.encode_sequence(frames)
        sizes[wp] = len(s)
        want, errors = lavc_decode(s, W, H)
        assert not errors, errors[:2]
        for i in range(len(frames)):
            assert np.array_equal(np.asarray(enc.recons[i][0]),
                                  want[i][0]), ("lavc", wp, i)
        got = decode_annexb(s)
        for i in range(len(frames)):
            for j in range(3):
                assert np.array_equal(np.asarray(enc.recons[i][j]),
                                      got[i][j]), ("own", wp, i, j)
    assert sizes[True] < 0.8 * sizes[False], sizes


def test_mmco5_reset_hand_built():
    """MMCO 5 (spec 8.2.5.4.5): unmark ALL references; the MMCO5
    picture is thereafter treated as frame_num 0 and the following
    slices restart frame_num at 1.  x264 never emits MMCO 5, so the
    stream is hand-built frame-by-frame with our encoder (VERDICT r4
    task #9); libavcodec is the external conformance oracle."""
    from tpu264.bits import nal

    cfg = EncoderConfig(width=W, height=H, qp=28, search_range=8,
                        intra_period=0)
    enc = Encoder(cfg)
    frames = [synth_frame(W, H, t) for t in range(4)]
    out = [nal.make_nalu(3, nal.NAL_SPS, enc.sps.write_rbsp()),
           nal.make_nalu(3, nal.NAL_PPS, enc.pps.write_rbsp())]
    enc.recons = []
    nalus, rec = enc.encode_intra_frame(*frames[0], frame_num=0)
    out += nalus
    enc.recons.append(rec)
    nalus, rec = enc.encode_p_frame(*frames[1], enc.recons[-1],
                                    frame_num=1)
    out += nalus
    enc.recons.append(rec)
    # MMCO5 on frame 2: after marking, the DPB holds ONLY this picture
    # (as frame_num 0) — frame 3 must restart at frame_num 1
    nalus, rec = enc.encode_p_frame(*frames[2], enc.recons[-1],
                                    frame_num=2, mmco=((5,),))
    out += nalus
    enc.recons.append(rec)
    nalus, rec = enc.encode_p_frame(*frames[3], enc.recons[-1],
                                    frame_num=1)
    out += nalus
    enc.recons.append(rec)
    stream = b"".join(out)

    got = decode_annexb(stream)
    assert len(got) == 4
    for i in range(4):
        for j in range(3):
            np.testing.assert_array_equal(
                got[i][j], np.asarray(enc.recons[i][j]), err_msg=f"own {i}")
    want, errors = lavc_decode(stream)
    assert errors == []
    assert len(want) == 4
    for i in range(4):
        for j in range(3):
            np.testing.assert_array_equal(
                want[i][j], np.asarray(enc.recons[i][j]),
                err_msg=f"lavc {i} plane {j}")


@pytest.mark.parametrize("sym", ["CAVLC", "CABAC"])
def test_p8x8_sub_mb_tree_roundtrip(sym):
    """P_8x8 sub-MB tree (sub_mb_type = P_L0_8x8, one MV per quadrant;
    VERDICT r4 task #3): quadrant MVs must actually be selected, and
    the stream must be bit-exact through lavc AND our decoder with
    deblocking on (exact spec-8.4.1.3 quadrant predictors + per-4x4
    deblock bS grids), under BOTH entropy coders (CABAC: Table 9-37
    '001' prefix, sub_mb_type ctx 21, per-quadrant 9.3.3.1.1.7 mvd
    context cells)."""
    import numpy as np
    from lavc_util import lavc_decode
    from tpu264.coding.intra_frame import reorder_wave_outputs_j
    from tpu264.decode.decoder import decode_annexb
    W2, H2 = 112, 80
    frames = [synth_frame(W2, H2, t) for t in range(5)]
    cfg = EncoderConfig(width=W2, height=H2, qp=30, intra_period=0,
                        deblock=True, symbol_mode=sym)
    enc = Encoder(cfg)
    assert enc.p8x8
    orig_p = enc._encode_p
    n_p8 = []

    def spy(*a, **k):
        out, ys = orig_p(*a, **k)
        mbd = reorder_wave_outputs_j(enc.sched, ys)
        pt = np.asarray(mbd["ptype"])
        ii = np.asarray(mbd["is_inter"])
        n_p8.append(int(((pt == 3) & ii).sum()))
        return out, ys

    enc._encode_p = spy
    stream = enc.encode_sequence(frames)
    assert sum(n_p8) > 0, "no P_8x8 MB selected on this clip"
    dec, errors = lavc_decode(stream, W2, H2)
    assert not errors, errors[:2]
    for i, (dy, du, dv) in enumerate(dec):
        assert np.array_equal(
            dy, np.asarray(enc.recons[i][0]).astype(np.uint8)), i
        assert np.array_equal(
            du, np.asarray(enc.recons[i][1]).astype(np.uint8)), i
        assert np.array_equal(
            dv, np.asarray(enc.recons[i][2]).astype(np.uint8)), i
    own = decode_annexb(stream)
    for i, (dy, du, dv) in enumerate(own):
        assert np.array_equal(
            dy, np.asarray(enc.recons[i][0]).astype(np.uint8)), i
