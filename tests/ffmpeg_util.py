"""External-decoder oracle: decode H.264 via OpenCV's FFMPEG backend in a
subprocess (isolates flaky VideoCapture state) and report YUV planes plus
any libavcodec error lines (SURVEY.md §4.2 external bit-exactness gate)."""

import subprocess
import sys
import tempfile
import os

import numpy as np

_SNIPPET = r"""
import sys
import numpy as np
import cv2

path, w, h, out = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
cap = cv2.VideoCapture(path)
cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
frames = []
while True:
    ok, frame = cap.read()
    if not ok or frame is None:
        break
    frames.append(frame.reshape(-1))
np.savez(out, n=len(frames), **{f"f{i}": f for i, f in enumerate(frames)})
print("DECODED", len(frames))
"""


def ffmpeg_decode(stream: bytes, width: int, height: int):
    """Decode an Annex-B stream. Returns (frames, errors).

    frames: list of (y, u, v) uint8 planes (u/v None if the backend only
    surfaced luma); errors: list of libavcodec error strings.
    """
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "in.264")
        out = os.path.join(td, "out.npz")
        with open(path, "wb") as f:
            f.write(stream)
        script = os.path.join(td, "dec.py")
        with open(script, "w") as f:
            f.write(_SNIPPET)
        p = subprocess.run(
            [sys.executable, script, path, str(width), str(height), out],
            capture_output=True, text=True, timeout=120)
        errors = [l for l in p.stderr.splitlines()
                  if any(k in l for k in ("error", "Error", "unavailable",
                                          "Invalid", "too large",
                                          "out of range", "corrupted"))]
        frames = []
        if os.path.exists(out):
            data = np.load(out)
            for i in range(int(data["n"])):
                f = data[f"f{i}"]
                if f.size == width * height * 3 // 2:
                    y = f[:width * height].reshape(height, width)
                    u = f[width * height:width * height * 5 // 4].reshape(
                        height // 2, width // 2)
                    v = f[width * height * 5 // 4:].reshape(
                        height // 2, width // 2)
                    frames.append((y, u, v))
                elif f.size == width * height:
                    frames.append((f.reshape(height, width), None, None))
                else:
                    frames.append((None, None, None))
        return frames, errors
