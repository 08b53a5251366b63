"""Stage-timing breakdown for the 1080p intra path (VERDICT r2 weak #1).

Times, warm, on the real chip:
  - wavefront encode scan alone
  - reorder
  - CAVLC serialize+pack
  - deblock
  - full fused per-frame device fn
  - host NAL assembly
Prints a JSON breakdown.
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu264.config import EncoderConfig
from tpu264.coding.encoder import Encoder
from tpu264.media.synth import synth_frame


def timeit(fn, *args, n=3):
    # warm
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / n, out


def main():
    W = int(os.environ.get("W", 1920))
    H = int(os.environ.get("H", 1088))
    qp = 28
    cfg = EncoderConfig(width=W, height=H, qp=qp)
    enc = Encoder(cfg)
    y, u, v = synth_frame(W, H, 0)
    yd, ud, vd = jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)

    res = {}
    t0 = time.monotonic()
    dev_out, ys = enc._encode_frame(yd, ud, vd, np.int32(qp))
    jax.block_until_ready(ys)
    res["compile_wavefront_s"] = round(time.monotonic() - t0, 2)

    dt, (dev_out, ys) = timeit(lambda: enc._encode_frame(yd, ud, vd, np.int32(qp)))
    res["wavefront_s"] = round(dt, 4)

    from tpu264.coding.intra_frame import reorder_wave_outputs_j
    reo = jax.jit(lambda ys: reorder_wave_outputs_j(enc.sched, ys))
    dt, mbd = timeit(lambda: reo(ys))
    res["reorder_s"] = round(dt, 4)

    dt, (words, nbits) = timeit(lambda: enc._ser_i(mbd))
    res["serialize_pack_s"] = round(dt, 4)

    if enc._deblock is not None:
        dt, _ = timeit(lambda: enc._apply_deblock_j(dev_out, mbd, qp))
        res["deblock_s"] = round(dt, 4)

    # host NAL assembly
    nbits_np = np.asarray(nbits)
    t0 = time.monotonic()
    for _ in range(3):
        nb = int(nbits_np[0])
        wslice = np.asarray(words[0, : (nb + 31) // 32])
        from tpu264.bits.slicehdr import SLICE_I, SliceHeader
        hdr = SliceHeader(first_mb_in_slice=0, slice_type=SLICE_I, frame_num=0,
                          idr_pic_id=0, slice_qp=qp,
                          disable_deblocking_filter_idc=enc.deblock_idc,
                          is_idr=True)
        sink = hdr.write_rbsp_head(enc.sps, enc.pps)
        rbsp = enc._dcav.words_to_rbsp(wslice, nb, sink)
    res["host_nal_s"] = round((time.monotonic() - t0) / 3, 4)

    # batched pipeline end-to-end (batch from env)
    batch = int(os.environ.get("TPU264_BATCH", "4"))
    fn = enc._get_intra_batch_fn(batch, qp)
    ys_b = np.stack([np.asarray(synth_frame(W, H, t)[0]) for t in range(batch)])
    us_b = np.stack([np.asarray(synth_frame(W, H, t)[1]) for t in range(batch)])
    vs_b = np.stack([np.asarray(synth_frame(W, H, t)[2]) for t in range(batch)])
    t0 = time.monotonic()
    out = fn(ys_b, us_b, vs_b)
    jax.block_until_ready(out)
    res["compile_batched_s"] = round(time.monotonic() - t0, 2)
    dt, _ = timeit(lambda: fn(ys_b, us_b, vs_b), n=2)
    res["batched_fused_s_per_frame"] = round(dt / batch, 4)
    res["batch"] = batch
    res["fps_batched_device_only"] = round(batch / (dt / 1), 3) if dt else 0

    print(json.dumps(res))


if __name__ == "__main__":
    main()
