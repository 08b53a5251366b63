"""Deterministic synthetic YUV 4:2:0 test content.

The image ships no test sequences (JM bundles foreman_part_qcif.yuv —
SURVEY.md §4), so tests and benches use generated content with natural-ish
statistics: smooth gradients, moving structures, and mild noise.
"""

from __future__ import annotations

import numpy as np


def synth_frame(width: int, height: int, t: int = 0, seed: int = 7):
    """One (y, u, v) uint8 frame with translating structure at time t."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    dx, dy = 1.7 * t, 0.9 * t
    y = (110
         + 60 * np.sin(2 * np.pi * (xx + dx) / 48.0)
         + 40 * np.cos(2 * np.pi * (yy + dy) / 36.0)
         + 25 * np.sin(2 * np.pi * ((xx + dx) + 2 * (yy + dy)) / 90.0))
    # a moving bright square and a dark disc give edges for intra modes
    cx, cy = (width // 3 + 2 * t) % width, (height // 2 + t) % height
    sq = (np.abs(xx - cx) < width // 10) & (np.abs(yy - cy) < height // 10)
    y = np.where(sq, 210.0, y)
    disc = (xx - width * 0.7 - dx) ** 2 + (yy - height * 0.3) ** 2 < (min(width, height) / 6.0) ** 2
    y = np.where(disc, 40.0, y)
    noise = rng.normal(0, 2.0, y.shape)  # same seed every t: static texture
    y = np.clip(y + noise, 0, 255).astype(np.uint8)
    u = np.clip(128 + 40 * np.sin(2 * np.pi * (xx + 2 * dx) / 64.0), 0, 255)
    v = np.clip(128 + 40 * np.cos(2 * np.pi * (yy + 2 * dy) / 52.0), 0, 255)
    u = u[::2, ::2].astype(np.uint8)
    v = v[::2, ::2].astype(np.uint8)
    return y, u, v


def synth_sequence(width: int, height: int, n_frames: int, seed: int = 7):
    return [synth_frame(width, height, t, seed) for t in range(n_frames)]
