"""Rate control (JVT-G012 quadratic) — hits a target bitrate and the
streams stay conforming (libavcodec decodes bit-exactly with per-frame
QP variation in the slice headers)."""

import numpy as np

from lavc_util import lavc_decode
from tpu264.config import EncoderConfig
from tpu264.coding.encoder import Encoder
from tpu264.media.synth import synth_frame

W, H = 96, 64
FPS = 30.0


def _encode(bitrate, n_frames=30, symbol_mode="CAVLC"):
    cfg = EncoderConfig(width=W, height=H, qp=30, intra_period=0,
                        rate_control=True, bitrate=bitrate, frame_rate=FPS,
                        symbol_mode=symbol_mode)
    enc = Encoder(cfg)
    frames = [synth_frame(W, H, t) for t in range(n_frames)]
    stream = enc.encode_sequence(frames)
    return enc, frames, stream


def test_hits_target_bitrate():
    for target in (150_000, 300_000):       # bps
        enc, frames, stream = _encode(target)
        total_bits = sum(s.bits for s in enc.stats)
        achieved = total_bits / len(frames) * FPS
        # sequence-level tracking gate: <=5% (VERDICT r2 task #10); the
        # buffer feedback drains the IDR overshoot across the GOP
        assert abs(achieved - target) / target < 0.05, (achieved, target)


def test_qp_adapts():
    lo = _encode(150_000)[0]
    hi = _encode(900_000)[0]
    # find per-frame QPs from the rate controller history via stats bits:
    # cheaper streams must come from higher QPs
    assert lo.rc.prev_qp > hi.rc.prev_qp
    assert sum(s.bits for s in lo.stats) < sum(s.bits for s in hi.stats)


def test_rc_stream_conforms():
    enc, frames, stream = _encode(250_000, n_frames=10)
    ff, errors = lavc_decode(stream)
    assert errors == [], errors
    assert len(ff) == len(frames)
    for (fy, fu, fv), (ry, ru, rv) in zip(ff, enc.recons):
        np.testing.assert_array_equal(fy, ry)
        np.testing.assert_array_equal(fu, ru)
        np.testing.assert_array_equal(fv, rv)


def test_bgop_rate_control_accuracy():
    """Hierarchical-B rate control (VERDICT r3 task #1): anchors absorb
    the sub-GOP budget minus the B EMA; sequence error <= 8%."""
    W, H = 96, 80
    frames = [synth_frame(W, H, t) for t in range(33)]
    for br in (150_000, 400_000):
        cfg = EncoderConfig(width=W, height=H, qp=30, intra_period=0,
                            num_b_frames=3, rate_control=True, bitrate=br)
        enc = Encoder(cfg)
        enc.encode_sequence(frames)
        tot = sum(s.bits for s in enc.stats)
        target = br * 33 / cfg.frame_rate
        assert abs(tot - target) / target < 0.08, (br, tot, target)
