"""End-to-end bit-exactness: encoder → bitstream → our decoder must equal
the encoder-side reconstruction exactly (SURVEY.md §4.2 closed loop)."""

import numpy as np
import pytest

from tpu264.config import EncoderConfig
from tpu264.coding.encoder import Encoder
from tpu264.decode import decode_annexb
from tpu264.media.synth import synth_frame

W, H = 48, 32  # 3x2 MBs: includes interior, edge and corner MBs


@pytest.fixture(scope="module")
def encoded():
    cfg = EncoderConfig(width=W, height=H, qp=28)
    enc = Encoder(cfg)
    frames = [synth_frame(W, H, t) for t in range(2)]
    stream = enc.encode_sequence(frames)
    return cfg, enc, frames, stream


def test_closed_loop_bit_exact(encoded):
    cfg, enc, frames, stream = encoded
    decoded = decode_annexb(stream)
    assert len(decoded) == len(frames)
    for (dy, du, dv), (ry, ru, rv) in zip(decoded, enc.recons):
        np.testing.assert_array_equal(dy, ry)
        np.testing.assert_array_equal(du, ru)
        np.testing.assert_array_equal(dv, rv)


def test_psnr_reasonable(encoded):
    cfg, enc, frames, stream = encoded
    for st in enc.stats:
        assert st.psnr_y > 30, f"PSNR-Y too low at QP28: {st.psnr_y}"
        assert st.psnr_u > 32 and st.psnr_v > 32


def test_modes_respect_availability(encoded):
    """No chosen mode may reference unavailable neighbors (a conforming
    decoder would reject the stream)."""
    from tpu264.coding.encoder import jax_to_np
    from tpu264.coding.intra_frame import reorder_wave_outputs
    from tpu264.coding.wavefront import BLK_ORDER
    cfg, enc, frames, stream = encoded
    y, u, v = frames[0]
    _, ys = enc._encode_frame(np.asarray(y), np.asarray(u), np.asarray(v),
                              np.int32(cfg.qp))
    mb = reorder_wave_outputs(enc.sched, jax_to_np(ys))
    wm = cfg.width_mbs
    needs = {0: (1, 0, 0), 1: (0, 1, 0), 2: (0, 0, 0), 3: (1, 0, 0),
             4: (1, 1, 1), 5: (1, 1, 1), 6: (1, 1, 1), 7: (1, 0, 0),
             8: (0, 1, 0)}
    for i in range(mb["sel16"].shape[0]):
        r, c = i // wm, i % wm
        at, al = r > 0, c > 0
        if mb["sel16"][i]:
            m = mb["i16mode"][i]
            assert not (m in (0, 3) and not at)
            assert not (m in (1, 3) and not al)
        else:
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
                nt, nl, ntl = needs[mb["modes"][i, k]]
                assert not (nt and not b_at), (i, k)
                assert not (nl and not b_al), (i, k)
                assert not (ntl and not b_atl), (i, k)
        cm = mb["cmode"][i]
        assert not (cm in (2, 3) and not at)
        assert not (cm in (1, 3) and not al)


def test_multi_slice_closed_loop():
    cfg = EncoderConfig(width=W, height=H, qp=30, slices_per_frame=2)
    enc = Encoder(cfg)
    y, u, v = synth_frame(W, H, 0)
    stream = enc.encode_sequence([(y, u, v)])
    decoded = decode_annexb(stream)
    np.testing.assert_array_equal(decoded[0][0], enc.recons[0][0])
    np.testing.assert_array_equal(decoded[0][1], enc.recons[0][1])
    np.testing.assert_array_equal(decoded[0][2], enc.recons[0][2])
