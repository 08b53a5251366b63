"""RD regression harness: PSNR/bitrate vs x264 at matched QP
(BASELINE.json: "match or exceed JM PSNR at equal bitrate"; x264
ultrafast/veryslow bracket the JM operating range — VERDICT r2 task #7).

Writes rd_results.json next to this file's repo root and prints a
summary.  Run under the CPU backend for reproducibility:
    JAX_PLATFORMS=cpu python tools/rd_harness.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

QPS = (22, 27, 32, 37)
W, H, NFR = 176, 144, 8


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.99 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _seq():
    from tpu264.media.synth import synth_frame
    return [synth_frame(W, H, t) for t in range(NFR)]


def _ours(frames, qp, num_b=0):
    from tpu264.config import EncoderConfig
    from tpu264.coding.encoder import Encoder
    cfg = EncoderConfig(width=W, height=H, qp=qp, intra_period=0,
                        num_b_frames=num_b)
    enc = Encoder(cfg, gop_mode="bgop" if num_b else "ippp")
    stream = enc.encode_sequence(frames)
    psnr = float(np.mean([
        _psnr(frames[i][0], np.asarray(enc.recons[i][0]))
        for i in range(NFR)]))
    return dict(bits=8 * len(stream), psnr_y=psnr)


def _x264(frames, qp, preset):
    from lavc_util import lavc_decode
    from x264_util import x264_encode
    s = x264_encode(frames, qp=qp, preset=preset,
                    params="8x8dct=0:cabac=0:bframes=0:ref=1:weightp=0"
                           ":aq-mode=0:trellis=0:keyint=999")
    dec, _ = lavc_decode(s, W, H)
    psnr = float(np.mean([_psnr(frames[i][0], dec[i][0])
                          for i in range(len(dec))]))
    return dict(bits=8 * len(s), psnr_y=psnr)


def bd_rate(anchor, test):
    """Bjontegaard rate delta (%) of `test` vs `anchor`
    ([{bits, psnr_y}] over the QP sweep); negative = test better."""
    ra = np.log10([p["bits"] for p in anchor])
    pa = [p["psnr_y"] for p in anchor]
    rt = np.log10([p["bits"] for p in test])
    pt = [p["psnr_y"] for p in test]
    ca = np.polyfit(pa, ra, 3)
    ct = np.polyfit(pt, rt, 3)
    lo = max(min(pa), min(pt))
    hi = min(max(pa), max(pt))
    xs = np.linspace(lo, hi, 64)
    avg = np.mean(np.polyval(ct, xs) - np.polyval(ca, xs))
    return float((10 ** avg - 1) * 100)


def main():
    frames = _seq()
    res = {"config": f"{W}x{H} synthetic IPPP, {NFR} frames, CAVLC",
           "qps": list(QPS), "ours": [], "ours_b2": [], "ours_b3": [],
           "x264_ultrafast": [], "x264_veryslow": []}
    for qp in QPS:
        res["ours"].append(_ours(frames, qp))
        res["ours_b2"].append(_ours(frames, qp, num_b=2))
        res["ours_b3"].append(_ours(frames, qp, num_b=3))
        res["x264_ultrafast"].append(_x264(frames, qp, "ultrafast"))
        res["x264_veryslow"].append(_x264(frames, qp, "veryslow"))
        print(f"qp={qp} ours={res['ours'][-1]} b2={res['ours_b2'][-1]} "
              f"b3={res['ours_b3'][-1]} "
              f"uf={res['x264_ultrafast'][-1]} "
              f"vs={res['x264_veryslow'][-1]}", flush=True)
    res["bd_rate_vs_ultrafast_pct"] = bd_rate(res["x264_ultrafast"],
                                              res["ours"])
    res["bd_rate_vs_veryslow_pct"] = bd_rate(res["x264_veryslow"],
                                             res["ours"])
    res["bd_rate_b2_vs_ultrafast_pct"] = bd_rate(res["x264_ultrafast"],
                                                 res["ours_b2"])
    res["bd_rate_b3_vs_ultrafast_pct"] = bd_rate(res["x264_ultrafast"],
                                                 res["ours_b3"])
    # hierarchical B must WIN vs our own IPPP (VERDICT r3 weak #4)
    res["bd_rate_b2_vs_ours_ippp_pct"] = bd_rate(res["ours"],
                                                 res["ours_b2"])
    res["bd_rate_b3_vs_ours_ippp_pct"] = bd_rate(res["ours"],
                                                 res["ours_b3"])
    out = os.path.join(REPO, "rd_results.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items()
                      if k.startswith("bd_")}, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
