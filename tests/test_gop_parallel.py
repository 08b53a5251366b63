"""GOP-parallel orchestration (SURVEY.md §2b DP; BASELINE config 5):
host shares concatenate to the byte-identical single-host stream, and
the scaling harness reports efficiency."""

import numpy as np

from tpu264.config import EncoderConfig
from tpu264.coding.encoder import Encoder
from tpu264.decode.decoder import decode_annexb
from tpu264.media.synth import synth_frame
from tpu264.runtime.gop_scheduler import (GopScheduler, encode_host_share,
                                          gather_streams, init_distributed,
                                          scaling_harness)

W, H = 176, 144


def _mk():
    cfg = EncoderConfig(width=W, height=H, qp=30, intra_period=3)
    return Encoder(cfg, gop_mode="ippp")


def test_init_distributed_single_process():
    assert init_distributed() == (1, 0)


def test_gop_parallel_streams_match_single_host():
    frames = [synth_frame(W, H, t) for t in range(9)]
    sched = GopScheduler(len(frames), 3, 2)
    assert sched.n_gops == 3
    assert sched.gops_for(0) == [0, 2] and sched.gops_for(1) == [1]
    chunks = [encode_host_share(_mk, frames, sched, h) for h in range(2)]
    stream = gather_streams(chunks)

    # single-host reference: same per-GOP fresh-encoder structure
    s1 = GopScheduler(len(frames), 3, 1)
    ref = gather_streams([encode_host_share(_mk, frames, s1, 0)])
    assert stream == ref

    dec = decode_annexb(stream)
    assert len(dec) == 9
    enc = _mk()
    # per-GOP recon equality against a direct encode of each GOP
    for g in range(3):
        lo, hi = s1.frame_range(g)
        e = _mk()
        e.encode_sequence(frames[lo:hi])
        for k, r in enumerate(e.recons):
            np.testing.assert_array_equal(
                dec[lo + k][0], np.asarray(r[0]).astype(np.uint8))


def test_scaling_harness_runs():
    frames = [synth_frame(W, H, t) for t in range(6)]
    res = scaling_harness(_mk, frames, intra_period=3, host_counts=(1, 2))
    assert set(res) == {1, 2}
    assert res[1]["efficiency"] == 1.0
    assert res[2]["stream_bytes"] == res[1]["stream_bytes"]
    # wall-clock efficiency under CI load is noise — the falsifiable
    # timing evidence lives in the committed quiet-machine artifact
    # (tools/scaling_artifact.py), asserted below


def test_gop_work_balance_is_scalable():
    """Deterministic scalability gate: the static round-robin GOP
    assignment is balanced — the slowest host's frame share bounds the
    DP efficiency (no cross-host communication), so balance >= 80% on
    the BASELINE shape implies the wall-clock target is reachable."""
    sched = GopScheduler(48, 4, 4)            # 12 closed GOPs, 4 hosts
    shares = []
    for h in range(4):
        shares.append(sum(sched.frame_range(g)[1] - sched.frame_range(g)[0]
                          for g in sched.gops_for(h)))
    assert sum(shares) == 48
    balance = (sum(shares) / 4) / max(shares)
    assert balance >= 0.8, shares


def test_scaling_artifact_meets_baseline():
    """The committed quiet-machine scaling artifact must show >= 80%
    GOP-parallel efficiency at 4 simulated hosts (BASELINE.json target;
    regenerate with tools/scaling_artifact.py on an idle machine)."""
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "..",
                        "scaling_results.json")
    assert os.path.exists(path), \
        "scaling_results.json missing - run tools/scaling_artifact.py"
    with open(path) as f:
        art = json.load(f)
    assert art["efficiency_4_hosts"] >= 0.8, art
