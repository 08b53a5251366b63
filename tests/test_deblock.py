"""Deblocking filter: JAX wavefront kernel vs scalar reference, plus
end-to-end bit-exactness with the filter enabled (vs our decoder AND
ffmpeg — ffmpeg applies the normative filter per the stream flags, so any
deviation shows as a pixel diff)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ffmpeg_util import ffmpeg_decode
from tpu264.config import EncoderConfig
from tpu264.coding.encoder import Encoder
from tpu264.coding.wavefront import build_schedule
from tpu264.decode import decode_annexb
from tpu264.kernels.deblock import make_deblocker, make_deblocker_skewed
from tpu264.media.synth import synth_frame
from tpu264.ref import deblock as rdb
from tpu264.ref.transform import chroma_qp

W, H = 48, 32


@pytest.mark.parametrize("maker", [make_deblocker, make_deblocker_skewed])
@pytest.mark.parametrize("qp,seed", [(28, 0), (12, 1), (40, 2)])
def test_kernel_matches_scalar_ref(qp, seed, maker):
    rng = np.random.default_rng(seed)
    wm, hm = 3, 2
    y = rng.integers(0, 256, (hm * 16, wm * 16))
    u = rng.integers(0, 256, (hm * 8, wm * 8))
    v = rng.integers(0, 256, (hm * 8, wm * 8))
    intra = rng.random((hm, wm)) < 0.5
    tc = (rng.integers(0, 5, (hm * 4, wm * 4))
          * (rng.random((hm * 4, wm * 4)) < 0.5))
    mv = rng.integers(-20, 21, (hm, wm, 2))
    ref = np.where(intra, -1, 0)
    mv = np.where(intra[..., None], 0, mv)
    left_ok = np.zeros((hm, wm), dtype=bool); left_ok[:, 1:] = True
    top_ok = np.zeros((hm, wm), dtype=bool); top_ok[1:, :] = True
    cqp = chroma_qp(qp)
    ry, ru, rv = rdb.deblock_frame(y, u, v, qp, cqp, intra, tc, mv, ref,
                                   left_ok, top_ok)
    sched = build_schedule(wm, hm, 1)
    fn = maker(sched, qp, cqp, filter_across_slices=True)
    ky, ku, kv = fn(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                    jnp.asarray(intra), jnp.asarray(tc), jnp.asarray(mv),
                    jnp.asarray(ref))
    np.testing.assert_array_equal(np.asarray(ky), ry)
    np.testing.assert_array_equal(np.asarray(ku), ru)
    np.testing.assert_array_equal(np.asarray(kv), rv)


def test_intra_deblock_end_to_end():
    cfg = EncoderConfig(width=W, height=H, qp=30, deblock=True)
    enc = Encoder(cfg)
    assert enc.deblock_idc == 0
    frames = [synth_frame(W, H, t) for t in range(2)]
    stream = enc.encode_sequence(frames)
    decoded = decode_annexb(stream)
    for d, r in zip(decoded, enc.recons):
        np.testing.assert_array_equal(d[0], r[0])
        np.testing.assert_array_equal(d[1], r[1])
        np.testing.assert_array_equal(d[2], r[2])
    ff, errors = ffmpeg_decode(stream, W, H)
    assert errors == []
    for f, r in zip(ff, enc.recons):
        np.testing.assert_array_equal(f[0], r[0])
        if f[1] is not None:
            np.testing.assert_array_equal(f[1], r[1])


def test_ippp_deblock_end_to_end():
    """P frames reference FILTERED pictures — any filter bug compounds
    and breaks bit-exactness immediately."""
    cfg = EncoderConfig(width=W, height=H, qp=28, search_range=8,
                        intra_period=0, deblock=True)
    enc = Encoder(cfg)
    frames = [synth_frame(W, H, t) for t in range(4)]
    stream = enc.encode_sequence(frames)
    decoded = decode_annexb(stream)
    for d, r in zip(decoded, enc.recons):
        np.testing.assert_array_equal(d[0], r[0])
        np.testing.assert_array_equal(d[1], r[1])
        np.testing.assert_array_equal(d[2], r[2])
    ff, errors = ffmpeg_decode(stream, W, H)
    assert errors == []
    for f, r in zip(ff, enc.recons):
        np.testing.assert_array_equal(f[0], r[0])


def test_multi_slice_deblock_idc2():
    cfg = EncoderConfig(width=W, height=H, qp=30, deblock=True,
                        slices_per_frame=2)
    enc = Encoder(cfg)
    assert enc.deblock_idc == 2
    y, u, v = synth_frame(W, H, 0)
    stream = enc.encode_sequence([(y, u, v)])
    decoded = decode_annexb(stream)
    np.testing.assert_array_equal(decoded[0][0], enc.recons[0][0])
    ff, errors = ffmpeg_decode(stream, W, H)
    assert errors == []
    np.testing.assert_array_equal(ff[0][0], enc.recons[0][0])


def test_deblock_improves_psnr_on_blocky_content():
    from tpu264.coding.encoder import psnr
    y, u, v = synth_frame(W, H, 0)
    cfg_on = EncoderConfig(width=W, height=H, qp=38, deblock=True)
    cfg_off = EncoderConfig(width=W, height=H, qp=38, deblock=False)
    r_on = Encoder(cfg_on)
    r_off = Encoder(cfg_off)
    r_on.encode_sequence([(y, u, v)])
    r_off.encode_sequence([(y, u, v)])
    # not a strict win on all content, but on smooth synthetic gradients
    # at high QP the filter should not lose more than a sliver
    assert r_on.stats[0].psnr_y > r_off.stats[0].psnr_y - 0.3
