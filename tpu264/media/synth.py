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


_TEX_CACHE: dict = {}


def _textured_canvas(h: int, w: int, seed: int):
    """Band-limited static texture canvas (camera-noise-free): white
    noise box-blurred 3x ~ Gaussian, normalized to +-1."""
    key = (h, w, seed)
    if key not in _TEX_CACHE:
        rng = np.random.default_rng(seed)
        c = rng.normal(0.0, 1.0, (h, w))
        for _ in range(3):
            k = np.ones(5) / 5.0
            c = np.apply_along_axis(
                lambda r: np.convolve(r, k, mode="same"), 1, c)
            c = np.apply_along_axis(
                lambda r: np.convolve(r, k, mode="same"), 0, c)
        c /= np.abs(c).max()
        _TEX_CACHE[key] = c
    return _TEX_CACHE[key]


def natural_frame(width: int, height: int, t: int = 0, seed: int = 11):
    """Natural-statistics frame (VERDICT r4 task #5): smooth gradient
    background + band-limited texture that PANS with the motion (so
    inter prediction works and residuals have realistic spectra) +
    moving occluders + slow illumination drift.  No per-frame camera
    noise."""
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    pad = 320
    canvas = _textured_canvas(height + pad, width + pad, seed)
    ox = int(round(2.3 * t)) % pad
    oy = int(round(1.1 * t)) % pad
    tex = canvas[oy:oy + height, ox:ox + width]
    gain = 1.0 - 0.004 * t                      # slow fade (WP content)
    y = (105
         + 45 * np.sin(2 * np.pi * (xx + 2.3 * t) / (width * 0.45))
         + 30 * np.cos(2 * np.pi * (yy + 1.1 * t) / (height * 0.4))
         + 55 * tex)
    # moving occluders with sharp edges (intra/partition content)
    cx = (width * 0.25 + 1.5 * t) % width
    cy = (height * 0.6 - 0.8 * t) % height
    sq = (np.abs(xx - cx) < width * 0.09) & (np.abs(yy - cy) < height * 0.09)
    y = np.where(sq, 205.0 + 20 * tex, y)
    disc = ((xx - width * 0.72 - 1.9 * t % width) ** 2
            + (yy - height * 0.28 - 0.6 * t) ** 2) \
        < (min(width, height) * 0.14) ** 2
    y = np.where(disc, 55.0 + 15 * tex, y)
    y = np.clip(y * gain, 0, 255).astype(np.uint8)
    u = np.clip(128 + 30 * np.sin(2 * np.pi * (xx + 3 * t) / (width * 0.6))
                + 20 * tex, 0, 255)
    v = np.clip(128 + 30 * np.cos(2 * np.pi * (yy + 1.5 * t)
                                  / (height * 0.55)) + 15 * tex, 0, 255)
    return (y, u[::2, ::2].astype(np.uint8), v[::2, ::2].astype(np.uint8))
