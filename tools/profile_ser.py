"""Micro-profile: device CAVLC serialize vs pack at 1080p."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu264.config import EncoderConfig
from tpu264.coding.encoder import Encoder
from tpu264.coding.intra_frame import reorder_wave_outputs_j
from tpu264.media.synth import synth_frame
from tpu264.entropy import device_cavlc as dcav


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / n, out


def main():
    W, H, qp = 1920, 1088, 28
    cfg = EncoderConfig(width=W, height=H, qp=qp)
    enc = Encoder(cfg)
    y, u, v = synth_frame(W, H, 0)
    dev_out, ys = enc._encode_frame(jnp.asarray(y), jnp.asarray(u),
                                    jnp.asarray(v), np.int32(qp))
    mbd = jax.jit(lambda ys: reorder_wave_outputs_j(enc.sched, ys))(ys)
    jax.block_until_ready(mbd)
    wm, hm = cfg.width_mbs, cfg.height_mbs
    rows = enc.sched.slice_starts.tolist()
    n_slices = cfg.slices_per_frame
    cap_words = (wm * hm // n_slices) * 100

    ser = jax.jit(lambda m: dcav.serialize_frame_j(m, wm, hm, rows))
    dt, (vv, ll) = timeit(lambda: ser(mbd))
    print("serialize_s", round(dt, 4))

    pack = jax.jit(lambda v, l: dcav.pack_slices_j(v, l, n_slices, cap_words))
    dt, (words, nbits) = timeit(lambda: pack(vv, ll))
    print("pack_s", round(dt, 4))
    print("nbits", np.asarray(nbits))

    # encode_blocks_j alone (the 17n group)
    g16 = jnp.zeros((17 * wm * hm, 16), jnp.int32)
    nc = jnp.zeros((17 * wm * hm,), jnp.int32)
    eb = jax.jit(lambda a, b: dcav.encode_blocks_j(a, b, 16))
    dt, _ = timeit(lambda: eb(g16, nc))
    print("encode_blocks17n_s", round(dt, 4))

    # host NAL with new 64-bit path
    from tpu264.bits.slicehdr import SLICE_I, SliceHeader
    nb = int(np.asarray(nbits)[0])
    wslice = np.asarray(words[0, : (nb + 31) // 32])
    t0 = time.monotonic()
    for _ in range(5):
        hdr = SliceHeader(first_mb_in_slice=0, slice_type=SLICE_I,
                          frame_num=0, idr_pic_id=0, slice_qp=qp,
                          disable_deblocking_filter_idc=enc.deblock_idc,
                          is_idr=True)
        sink = hdr.write_rbsp_head(enc.sps, enc.pps)
        rbsp = dcav.words_to_rbsp(wslice, nb, sink)
    print("host_nal_s", round((time.monotonic() - t0) / 5, 4))


if __name__ == "__main__":
    main()
