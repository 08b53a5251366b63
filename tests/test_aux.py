"""Auxiliary subsystems (SURVEY.md §5): metrics JSONL, checkpoint/resume,
bitstream fault injection (decoder robustness)."""

import json
import os

import numpy as np
import pytest

from tpu264.bits import nal
from tpu264.config import EncoderConfig
from tpu264.coding.encoder import Encoder
from tpu264.decode.decoder import decode_annexb
from tpu264.media.synth import synth_frame

W, H = 176, 144


def test_metrics_jsonl(tmp_path):
    from tpu264.runtime.metrics import JsonlLogger, format_frame_line
    cfg = EncoderConfig(width=W, height=H, qp=30, intra_period=0)
    enc = Encoder(cfg, gop_mode="ippp")
    frames = [synth_frame(W, H, t) for t in range(3)]
    enc.encode_sequence(frames)
    path = str(tmp_path / "m.jsonl")
    log = JsonlLogger(path)
    for s in enc.stats:
        rec = log.log_frame(s, qp=30)
        assert "bits" in format_frame_line(rec)
    trailer = log.close({"chip": "cpu"})
    lines = [json.loads(x) for x in open(path)]
    assert len(lines) == 4
    assert lines[-1]["run_summary"] and lines[-1]["frames"] == 3
    assert trailer["total_bits"] == sum(s.bits for s in enc.stats)


def test_checkpoint_resume_identical(tmp_path):
    from tpu264.runtime.checkpoint import encode_gops
    cfg = EncoderConfig(width=W, height=H, qp=30, intra_period=3)
    frames = [synth_frame(W, H, t) for t in range(7)]

    ref = encode_gops(Encoder(cfg, gop_mode="ippp"), frames,
                      str(tmp_path / "full.264"))

    # interrupted run: stop after the first GOP, then resume
    out = str(tmp_path / "part.264")

    class Boom(Exception):
        pass

    enc = Encoder(cfg, gop_mode="ippp")
    orig = enc.encode_sequence
    calls = {"n": 0}

    def flaky(fr):
        calls["n"] += 1
        if calls["n"] == 2:
            raise Boom()
        return orig(fr)

    enc.encode_sequence = flaky
    # retry path absorbs the single failure; run completes
    got = encode_gops(enc, frames, out, max_retries=1)
    assert got == ref

    # hard interruption: wipe trailing GOPs via a stale checkpoint
    ck = json.load(open(out + ".ckpt"))
    ck["done_gops"] = 1
    first_gop_len = len(encode_gops(Encoder(cfg, gop_mode="ippp"),
                                    frames[:3], str(tmp_path / "g0.264")))
    ck["byte_offset"] = first_gop_len
    json.dump(ck, open(out + ".ckpt", "w"))
    got2 = encode_gops(Encoder(cfg, gop_mode="ippp"), frames, out)
    assert got2 == ref
    dec = decode_annexb(got2)
    assert len(dec) == 7


def test_fault_injection_decoder_robustness():
    """Corrupted streams must fail with controlled exceptions (or decode
    fewer frames) — never hang or crash the process."""
    cfg = EncoderConfig(width=W, height=H, qp=30, intra_period=0)
    enc = Encoder(cfg, gop_mode="ippp")
    frames = [synth_frame(W, H, t) for t in range(3)]
    stream = enc.encode_sequence(frames)
    rng = np.random.default_rng(0)
    arr = np.frombuffer(stream, np.uint8).copy()
    for trial in range(6):
        bad = arr.copy()
        if trial % 2 == 0:
            bad = bad[: rng.integers(64, len(bad))]       # truncation
        else:
            for _ in range(4):                            # bit flips
                pos = int(rng.integers(48, len(bad)))
                bad[pos] ^= 1 << int(rng.integers(8))
        try:
            out = decode_annexb(bad.tobytes())
            assert len(out) <= 3
        except Exception:
            pass   # controlled failure is acceptable; hangs are not


def test_error_concealment_synthesis():
    """Concealment (SURVEY §2a #21): corrupt / drop slices mid-stream;
    the concealing decoder still outputs every frame, with the damaged
    pictures synthesized from the reference (temporal zero-mv copy) —
    not garbage (PSNR floor) and not an exception."""
    import numpy as np
    from tpu264.bits import nal
    from tpu264.coding.encoder import psnr
    from tpu264.decode.decoder import Decoder

    W2, H2 = 96, 80
    cfg = EncoderConfig(width=W2, height=H2, qp=28, intra_period=0)
    enc = Encoder(cfg)
    frames = [synth_frame(W2, H2, t) for t in range(5)]
    stream = enc.encode_sequence(frames)
    nalus = list(nal.split_annexb(stream))
    # drop one P slice and bit-flip another
    rebuilt = []
    victims = [i for i, (_, t, _) in enumerate(nalus)
               if t == nal.NAL_SLICE]
    drop, flip = victims[1], victims[2]
    for i, (ref_idc, ntype, rbsp) in enumerate(nalus):
        if i == drop:
            continue
        if i == flip:
            rb = bytearray(rbsp)
            rb[len(rb) // 2] ^= 0xFF
            rbsp = bytes(rb)
        rebuilt.append(nal.make_nalu(ref_idc, ntype, rbsp))
    broken = b"".join(rebuilt)

    dec = Decoder(conceal=True)
    out = dec.decode(broken)
    assert len(out) >= 4                 # dropped slice may cost a pic
    assert dec.errors                    # the corruption was seen
    for i, f in enumerate(out):
        assert psnr(frames[i][0], f[0]) > 18, i   # synthesized, not noise


def test_syntax_trace_mode():
    """Syntax-trace decode (JM TRACE parity, SURVEY §5): one line per
    slice header and per macroblock with the key syntax values."""
    import io
    from tpu264.decode.decoder import Decoder

    W2, H2 = 96, 80
    cfg = EncoderConfig(width=W2, height=H2, qp=30, intra_period=0)
    enc = Encoder(cfg)
    frames = [synth_frame(W2, H2, t) for t in range(3)]
    stream = enc.encode_sequence(frames)
    sink = io.StringIO()
    Decoder(trace=sink).decode(stream)
    lines = sink.getvalue().splitlines()
    n_mbs = (W2 // 16) * (H2 // 16)
    assert sum(ln.startswith("SLICE") for ln in lines) == 3
    assert sum(ln.startswith("MB ") for ln in lines) == 3 * n_mbs
    assert any("l0=(" in ln for ln in lines)      # inter MBs traced


def test_sei_parse_and_emission():
    """SEI (Annex D / SURVEY #20): parse x264's user_data_unregistered
    message from an external stream, and round-trip our own encoder
    tag + recovery_point (SEIMessages=1) through the decoder while the
    stream stays externally decodable."""
    import numpy as np
    from lavc_util import lavc_decode
    from x264_util import x264_encode
    from tpu264.bits import sei
    from tpu264.config import EncoderConfig
    from tpu264.coding.encoder import Encoder
    from tpu264.decode.decoder import Decoder
    from tpu264.media.synth import synth_frame

    frames = [synth_frame(176, 96, t) for t in range(3)]
    fr = [(np.asarray(a), np.asarray(b), np.asarray(c))
          for a, b, c in frames]
    s = x264_encode(fr, qp=30, preset="medium", params="cabac=0:bframes=0")
    d = Decoder()
    d.decode(s)
    ud = [m for m in d.sei if m.payload_type == sei.USER_DATA_UNREGISTERED]
    assert ud and "x264" in ud[0].text

    cfg = EncoderConfig(width=176, height=96, qp=30, intra_period=0,
                        sei_messages=True)
    enc = Encoder(cfg, gop_mode="ippp")
    stream = enc.encode_sequence(frames)
    d2 = Decoder()
    recs = d2.decode(stream)
    types = [m.payload_type for m in d2.sei]
    assert sei.USER_DATA_UNREGISTERED in types
    assert sei.RECOVERY_POINT in types
    for i in range(3):
        assert np.array_equal(recs[i][0], np.asarray(enc.recons[i][0])), i
    dlav, errs = lavc_decode(stream, 176, 96)
    assert not errs, errs[:2]
    for i in range(3):
        assert np.array_equal(dlav[i][0],
                              np.asarray(enc.recons[i][0])), i
