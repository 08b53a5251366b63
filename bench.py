"""Benchmark: encoded frames/s/chip (BASELINE.json north-star metric).

Encodes a synthetic 1080p (1920x1088) sequence all-intra at QP28 —
BASELINE.json config 4's resolution on the currently shipped feature set —
and reports end-to-end WARM frames/s (device wavefront encode + device
CAVLC serialize/pack + deblock + host NAL assembly) on one chip.  The
batched pipeline is warmed on a full batch first so the timed region
measures throughput, not XLA compilation; compile seconds are reported
separately in extras (VERDICT r2 weak #1).

vs_baseline: the JM reference software publishes no numbers
(BASELINE.md); JM-class RD-optimized software encoding at 1080p runs on
the order of <= 2 fps on CPUs, so vs_baseline is fps / 2.0 — a
deliberately generous stand-in for `lencod` until a direct measurement
exists.

Prints exactly one JSON line.
"""

import json
import os
import time

# persistent XLA compile cache: first bench run pays the compile, later
# runs start warm (cache is keyed on program hash, safe across edits)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def main() -> None:
    import numpy as np

    width = int(os.environ.get("TPU264_BENCH_W", 1920))
    height = int(os.environ.get("TPU264_BENCH_H", 1088))
    qp = int(os.environ.get("TPU264_BENCH_QP", 28))
    batch = int(os.environ.get("TPU264_BATCH", "4"))
    frames = int(os.environ.get("TPU264_BENCH_FRAMES", 2 * batch))
    frames = max(frames, batch)          # at least one full batch timed

    from tpu264.config import EncoderConfig
    from tpu264.coding.encoder import Encoder
    from tpu264.media.synth import synth_frame

    cfg = EncoderConfig(width=width, height=height, qp=qp)
    enc = Encoder(cfg)
    seq = [synth_frame(width, height, t) for t in range(frames + batch)]

    # warmup compiles THE path being timed: a full batch through the
    # batched pipeline (bench harness bug in r2: warming with one frame
    # compiled only the per-frame path and the timed region paid a
    # ~2-minute XLA compile)
    t0 = time.monotonic()
    enc.encode_sequence(seq[:batch])
    compile_s = time.monotonic() - t0
    enc.stats.clear()

    t0 = time.monotonic()
    enc.encode_sequence(seq[batch:])
    dt = time.monotonic() - t0
    fps = frames / dt
    psnr_y = float(np.mean([s.psnr_y for s in enc.stats]))
    bitrate = sum(s.bits for s in enc.stats) / frames * 30 / 1e6

    # config 2 (BASELINE.json): CIF IPPP, full-search 16x16 ME, CAVLC —
    # with a Pallas-transform A/B (threshold dropped so the per-wave
    # inter DCT+quant actually routes through the MXU kernel)
    from tpu264.kernels import transform as kt
    cif = [synth_frame(352, 288, t) for t in range(12)]
    fps2 = {}
    saved_min = kt._PALLAS_MIN_BLOCKS
    for label, pallas, minblk in (("auto", None, saved_min),
                                  ("on", True, 1),
                                  ("off", False, saved_min)):
        try:
            kt._PALLAS_MIN_BLOCKS = minblk
            cfg2 = EncoderConfig(width=352, height=288, qp=qp,
                                 intra_period=0, use_pallas=pallas)
            enc2 = Encoder(cfg2)
            enc2.encode_sequence(cif[:4])     # warm I + P paths
            t0 = time.monotonic()
            enc2.encode_sequence(cif[4:])
            fps2[label] = round(8 / (time.monotonic() - t0), 3)
        except Exception as e:                # record, don't kill the bench
            fps2[label] = f"error: {type(e).__name__}: {e}"[:120]
        finally:
            kt._PALLAS_MIN_BLOCKS = saved_min

    # config 3 (BASELINE.json): 720p Main, CABAC + in-loop deblocking
    cfg3 = EncoderConfig(width=1280, height=720, qp=qp,
                         symbol_mode="CABAC", deblock=True)
    enc3 = Encoder(cfg3)
    s3 = [synth_frame(1280, 720, t) for t in range(4)]
    enc3.encode_sequence(s3[:1])          # warm the per-frame path
    enc3.stats.clear()
    t0 = time.monotonic()
    enc3.encode_sequence(s3[1:])
    fps3 = 3 / (time.monotonic() - t0)

    # config 4 (BASELINE.json): 1080p Main, hierarchical B + qpel + rate
    # control, CABAC + deblock, through the tile-sharded path (1 chip ->
    # 1x1 mesh; same code drives multi-chip bands)
    from tpu264.runtime.tiled import TiledEncoder, make_mesh
    cfg4 = EncoderConfig(width=width, height=height, qp=qp,
                         intra_period=0, num_b_frames=2,
                         symbol_mode="CABAC", deblock=True,
                         rate_control=True, bitrate=8_000_000)
    te = TiledEncoder(cfg4, make_mesh(1, gop=1))
    seq4 = [synth_frame(width, height, t) for t in range(13)]
    te.encode_sequence([seq4[:4]])        # warm I/P/B paths
    t0 = time.monotonic()
    stream4 = te.encode_sequence([seq4[4:]])[0]
    fps4 = 9 / (time.monotonic() - t0)

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
            "batch": batch,
            "compile_s": round(compile_s, 1),
            "config2_cif_ippp_fps": fps2,
            "config3_720p_cabac_deblock_fps": round(fps3, 3),
            "config4_1080p_hierB_cabac_rc_tiled_fps": round(fps4, 3),
            "config4_mbps": round(8 * len(stream4) / 9 * 30 / 1e6, 2),
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
