"""Static wavefront schedule and availability metadata (host-side numpy).

Wavefront MB scheduling (BASELINE.json north star): intra prediction
depends on reconstructed left / top / top-right neighbors, so MBs on the
anti-diagonal d = 2*row + col are mutually independent and form one wave.
This module precomputes, per frame geometry and slice partition, the
per-wave MB coordinate lists, validity masks, MB-level neighbor
availability (spec 6.4.9 via JM `mb_access.c` semantics — SURVEY.md §2a
#24), and the zig-zag block metadata used inside the device engine.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# zig-zag coding order of 4x4 luma blocks within a MB: idx -> (row, col)
BLK_ORDER = [(0, 0), (0, 1), (1, 0), (1, 1), (0, 2), (0, 3), (1, 2), (1, 3),
             (2, 0), (2, 1), (3, 0), (3, 1), (2, 2), (2, 3), (3, 2), (3, 3)]
# 4x4 blocks (by zig-zag idx) whose top-right neighbor is in the same MB
# but later in coding order → unavailable, top[4:8] replicates top[3]
TR_UNAVAIL_IN_MB = {3, 7, 11, 13, 15}


@dataclasses.dataclass(frozen=True)
class WaveSchedule:
    width_mbs: int
    height_mbs: int
    slice_starts: np.ndarray        # first MB row of each slice
    n_waves: int
    max_wave: int
    coords: np.ndarray              # [n_waves, max_wave, 2] (r, c); pad (H,0)
    valid: np.ndarray               # [n_waves, max_wave]
    mb_index: np.ndarray            # [n_waves, max_wave] r*W+c (pad: n_mbs)
    avail: np.ndarray               # [n_waves, max_wave, 4] top,left,tl,tr

    @property
    def n_mbs(self) -> int:
        return self.width_mbs * self.height_mbs


def build_schedule(width_mbs: int, height_mbs: int,
                   slices_per_frame: int = 1) -> WaveSchedule:
    assert height_mbs % slices_per_frame == 0
    rows_per_slice = height_mbs // slices_per_frame
    slice_starts = np.arange(slices_per_frame) * rows_per_slice
    slice_start_set = set(slice_starts.tolist())

    waves: list[list[tuple[int, int]]] = []
    n_waves = 2 * (height_mbs - 1) + (width_mbs - 1) + 1
    for d in range(n_waves):
        wave = []
        for r in range(height_mbs):
            c = d - 2 * r
            if 0 <= c < width_mbs:
                wave.append((r, c))
        waves.append(wave)
    max_wave = max(len(w) for w in waves)

    coords = np.full((n_waves, max_wave, 2), 0, dtype=np.int32)
    coords[:, :, 0] = height_mbs  # pad rows point at the trash band
    valid = np.zeros((n_waves, max_wave), dtype=bool)
    mb_index = np.full((n_waves, max_wave), width_mbs * height_mbs,
                       dtype=np.int32)
    avail = np.zeros((n_waves, max_wave, 4), dtype=bool)
    for wi, wave in enumerate(waves):
        for k, (r, c) in enumerate(wave):
            coords[wi, k] = (r, c)
            valid[wi, k] = True
            mb_index[wi, k] = r * width_mbs + c
            top = r not in slice_start_set
            left = c > 0
            avail[wi, k] = (top, left, top and left,
                            top and (c < width_mbs - 1))
    return WaveSchedule(width_mbs, height_mbs, slice_starts, n_waves,
                        max_wave, coords, valid, mb_index, avail)


def block_availability(idx: int):
    """Static per-4x4-block availability rules within a MB.

    Returns dict describing how the block at zig-zag index `idx` derives
    (top, left, topleft, topright) availability from the MB-level flags:
    each entry is True (always available), or one of the strings
    'mb_top' / 'mb_left' / 'mb_tl' / 'mb_tr' / False.
    """
    by, bx = BLK_ORDER[idx]
    top = True if by > 0 else "mb_top"
    left = True if bx > 0 else "mb_left"
    if by > 0 and bx > 0:
        tl = True
    elif by == 0 and bx > 0:
        tl = "mb_top"
    elif by > 0 and bx == 0:
        tl = "mb_left"
    else:
        tl = "mb_tl"
    if by == 0:
        tr = "mb_tr" if bx == 3 else "mb_top"
    else:
        tr = idx not in TR_UNAVAIL_IN_MB
    return {"top": top, "left": left, "tl": tl, "tr": tr, "by": by, "bx": bx}
