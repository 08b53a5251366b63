"""Benchmark: encoded frames/s/chip (BASELINE.json north-star metric).

Encodes a synthetic 1080p (1920x1088) sequence all-intra at QP28 —
BASELINE.json config 4's resolution on the currently shipped feature set —
and reports end-to-end frames/s (device wavefront encode + host CAVLC +
bitstream assembly) on one chip.

vs_baseline: the JM reference software publishes no numbers
(BASELINE.md); JM-class RD-optimized software encoding at 1080p runs on
the order of <= 2 fps on CPUs, so vs_baseline is fps / 2.0 — a
deliberately generous stand-in for `lencod` until a direct measurement
exists.

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    width = int(os.environ.get("TPU264_BENCH_W", 1920))
    height = int(os.environ.get("TPU264_BENCH_H", 1088))
    qp = int(os.environ.get("TPU264_BENCH_QP", 28))
    frames = int(os.environ.get("TPU264_BENCH_FRAMES", 4))

    from tpu264.config import EncoderConfig
    from tpu264.coding.encoder import Encoder
    from tpu264.media.synth import synth_frame

    cfg = EncoderConfig(width=width, height=height, qp=qp)
    enc = Encoder(cfg)
    seq = [synth_frame(width, height, t) for t in range(frames + 1)]

    # warmup (compile)
    enc.encode_sequence(seq[:1])
    enc.stats.clear()

    t0 = time.monotonic()
    stream = enc.encode_sequence(seq[1:])
    dt = time.monotonic() - t0
    fps = frames / dt
    psnr_y = float(np.mean([s.psnr_y for s in enc.stats]))
    bitrate = sum(s.bits for s in enc.stats) / frames * 30 / 1e6

    print(json.dumps({
        "metric": "1080p_intra_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 2.0, 3),
        "extras": {
            "psnr_y_db": round(psnr_y, 2),
            "mbps_at_30fps": round(bitrate, 2),
            "qp": qp,
            "resolution": f"{width}x{height}",
            "backend": _backend_name(),
        },
    }))


def _backend_name() -> str:
    try:
        import jax
        return jax.devices()[0].platform
    except Exception:
        return "unknown"


if __name__ == "__main__":
    main()
