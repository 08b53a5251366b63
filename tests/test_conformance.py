"""External-decoder conformance: libavcodec (via ctypes, exact planes)
must accept our bitstreams without errors and reproduce our reconstruction
bit-exactly (BASELINE.json:4 decoder bit-exactness gate, with ffmpeg
standing in for JM as the conforming reference decoder)."""

import numpy as np
import pytest

from lavc_util import lavc_decode
from tpu264.config import EncoderConfig
from tpu264.coding.encoder import Encoder
from tpu264.media.synth import synth_frame

W, H = 48, 32


@pytest.fixture(scope="module")
def encoded():
    cfg = EncoderConfig(width=W, height=H, qp=26)
    enc = Encoder(cfg)
    frames = [synth_frame(W, H, t) for t in range(2)]
    stream = enc.encode_sequence(frames)
    return enc, frames, stream


def test_ffmpeg_accepts_stream(encoded):
    enc, frames, stream = encoded
    ff, errors = lavc_decode(stream)
    assert errors == [], errors
    assert len(ff) == len(frames)


def test_ffmpeg_bit_exact_recon(encoded):
    enc, frames, stream = encoded
    ff, errors = lavc_decode(stream)
    assert errors == []
    for (fy, fu, fv), (ry, ru, rv) in zip(ff, enc.recons):
        np.testing.assert_array_equal(fy, ry)
        np.testing.assert_array_equal(fu, ru)
        np.testing.assert_array_equal(fv, rv)


@pytest.mark.parametrize("qp", [12, 35, 46])
def test_ffmpeg_across_qps(qp):
    cfg = EncoderConfig(width=W, height=H, qp=qp)
    enc = Encoder(cfg)
    y, u, v = synth_frame(W, H, 0)
    stream = enc.encode_sequence([(y, u, v)])
    ff, errors = lavc_decode(stream)
    assert errors == [], (qp, errors)
    np.testing.assert_array_equal(ff[0][0], enc.recons[0][0])
