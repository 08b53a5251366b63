"""Lane-serialized Pallas CABAC range coder vs the native/Python engines
(interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu264.entropy import cabac_binarize as cb
from tpu264.entropy import cabac_pallas
from tpu264.entropy.cabac_engine import CabacEncoder


def _replay_python(kinds, aa, bb, table, qp):
    eng = CabacEncoder(table, qp)
    for kind, a, b in zip(kinds.tolist(), aa.tolist(), bb.tolist()):
        if kind == cb.K_CTX:
            for _ in range(b >> 1):
                eng.encode(a, b & 1)
        elif kind == cb.K_BYP:
            for i in range(b - 1, -1, -1):
                eng.encode_bypass((a >> i) & 1)
        else:
            eng.encode_terminate(a)
    return eng.get_bytes()


def _run_kernel(k, a, b, table, qp, n_pad=0, chunk=None):
    from tpu264.entropy.cabac_binarize_j import pack_records
    cap = len(k) + n_pad
    if chunk is not None and cap % chunk:
        cap += chunk - cap % chunk
    rec = np.zeros((1, cap), np.int32)
    rec[0, :len(k)] = np.asarray(pack_records(
        jnp.asarray(k, jnp.int32), jnp.asarray(a, jnp.int32),
        jnp.asarray(b, jnp.int32)))
    counts = np.array([len(k)], np.int32)
    init = cabac_pallas.init_packed_states(table, qp)
    run = cabac_pallas.make_slice_encoder(cap, 8192, chunk=chunk)
    words, nbytes = run(jnp.asarray(rec), jnp.asarray(counts),
                        jnp.asarray(init))
    return np.asarray(words)[0].astype(">u4").tobytes()[:int(nbytes[0])]


@pytest.mark.parametrize("seed,n", [(0, 100), (1, 1500), (2, 5000)])
def test_kernel_matches_python_engine(seed, n):
    rng = np.random.default_rng(seed)
    kinds, aa, bb = [], [], []
    for _ in range(n):
        kk = int(rng.integers(0, 3))
        if kk == 0:
            kinds.append(0)
            aa.append(int(rng.integers(0, 460)))
            bb.append(int(rng.integers(0, 2))
                      | (int(rng.integers(1, 14)) << 1))
        elif kk == 1:
            nb = int(rng.integers(1, 17))
            kinds.append(1)
            aa.append(int(rng.integers(0, 1 << nb)))
            bb.append(nb)
        else:
            kinds.append(2)
            aa.append(0)
            bb.append(0)
    kinds.append(2)
    aa.append(1)
    bb.append(0)
    k = np.array(kinds, np.int8)
    a = np.array(aa, np.int32)
    b = np.array(bb, np.int32)
    want = _replay_python(k, a, b, 0, 28)
    got = _run_kernel(k, a, b, 0, 28, n_pad=7)
    assert got == want


def test_kernel_on_real_frame_records():
    """Records binarized from a real encoded QCIF frame."""
    import jax
    from tpu264.config import EncoderConfig
    from tpu264.coding.encoder import Encoder, jax_to_np
    from tpu264.coding.intra_frame import reorder_wave_outputs
    from tpu264.media.synth import synth_frame

    W, H, qp = 176, 144, 30
    cfg = EncoderConfig(width=W, height=H, qp=qp)
    enc = Encoder(cfg)
    y, u, v = synth_frame(W, H, 0)
    _, ys = enc._encode_frame(jnp.asarray(y), jnp.asarray(u),
                              jnp.asarray(v), np.int32(qp))
    mb = reorder_wave_outputs(enc.sched, jax_to_np(ys))
    wm, hm = cfg.width_mbs, cfg.height_mbs
    k, a, b, val, _ = cb.binarize_frame(mb, wm, hm, [0], qp)
    kk, aa, bb = cb.slice_records(k, a, b, val, wm, 0, hm)
    want = _replay_python(kk, aa, bb, 0, qp)
    got = _run_kernel(kk, aa, bb, 0, qp)
    assert got == want


def test_kernel_chunked_matches_python_engine():
    """Record streaming in chunks (engine state persists in SMEM across
    chunk grid steps) — required for slices larger than VMEM."""
    rng = np.random.default_rng(9)
    kinds, aa, bb = [], [], []
    for _ in range(3000):
        kk = int(rng.integers(0, 3))
        if kk == 0:
            kinds.append(0)
            aa.append(int(rng.integers(0, 460)))
            bb.append(int(rng.integers(0, 2))
                      | (int(rng.integers(1, 14)) << 1))
        elif kk == 1:
            nb = int(rng.integers(1, 17))
            kinds.append(1)
            aa.append(int(rng.integers(0, 1 << nb)))
            bb.append(nb)
        else:
            kinds.append(2)
            aa.append(0)
            bb.append(0)
    kinds.append(2)
    aa.append(1)
    bb.append(0)
    k = np.array(kinds, np.int8)
    a = np.array(aa, np.int32)
    b = np.array(bb, np.int32)
    want = _replay_python(k, a, b, 1, 33)
    got = _run_kernel(k, a, b, 1, 33, chunk=256)
    assert got == want
