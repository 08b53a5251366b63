"""Intra prediction, scalar reference (spec 8.3; JM intra4x4/16x16/chroma
prediction in `block.c`/`macroblock.c` — SURVEY.md §2a #9).

Conventions: `top` is the row above (length 8 for 4x4: includes top-right
extension; 16 for 16x16; 8 for chroma), `left` the column to the left,
`tl` the corner sample p[-1][-1].  Availability flags select the normative
fallbacks; the caller must already have applied the top-right substitution
rule (replicate top[3]) when the top-right 4x4 neighbor is unavailable but
top is available.
"""

from __future__ import annotations

import numpy as np

# intra 4x4 prediction mode numbers (spec Table 8-2)
I4_V, I4_H, I4_DC, I4_DDL, I4_DDR, I4_VR, I4_HD, I4_VL, I4_HU = range(9)
# intra 16x16 modes (spec Table 8-4)
I16_V, I16_H, I16_DC, I16_PLANE = range(4)
# chroma modes (spec Table 8-5) — note DC is 0 for chroma
IC_DC, IC_H, IC_V, IC_PLANE = range(4)

# which neighbors each 4x4 mode needs: (needs_top, needs_left, needs_topleft)
I4_MODE_NEEDS = {
    I4_V: (1, 0, 0), I4_H: (0, 1, 0), I4_DC: (0, 0, 0),
    I4_DDL: (1, 0, 0), I4_DDR: (1, 1, 1), I4_VR: (1, 1, 1),
    I4_HD: (1, 1, 1), I4_VL: (1, 0, 0), I4_HU: (0, 1, 0),
}


def predict_4x4(mode: int, top: np.ndarray, left: np.ndarray, tl: int,
                avail_top: bool, avail_left: bool, avail_tl: bool) -> np.ndarray:
    """Predict one 4x4 block. top: 8 samples (incl. top-right, already
    substituted), left: 4 samples, tl: corner."""
    t = np.asarray(top, dtype=np.int64)
    l = np.asarray(left, dtype=np.int64)
    z = int(tl)
    p = np.zeros((4, 4), dtype=np.int64)

    if mode == I4_V:
        assert avail_top
        p[:, :] = t[:4][None, :]
    elif mode == I4_H:
        assert avail_left
        p[:, :] = l[:, None]
    elif mode == I4_DC:
        if avail_top and avail_left:
            p[:] = (t[:4].sum() + l.sum() + 4) >> 3
        elif avail_top:
            p[:] = (t[:4].sum() + 2) >> 2
        elif avail_left:
            p[:] = (l.sum() + 2) >> 2
        else:
            p[:] = 128
    elif mode == I4_DDL:
        assert avail_top
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    p[y, x] = (t[6] + 3 * t[7] + 2) >> 2
                else:
                    p[y, x] = (t[x + y] + 2 * t[x + y + 1] + t[x + y + 2] + 2) >> 2
    elif mode == I4_DDR:
        assert avail_top and avail_left and avail_tl
        te = np.concatenate([[z], t])  # te[i] = p[i-1,-1]; te[0] = Z
        le = np.concatenate([[z], l])  # le[i] = p[-1,i-1]
        for y in range(4):
            for x in range(4):
                if x > y:
                    p[y, x] = (te[x - y - 1] + 2 * te[x - y] + te[x - y + 1] + 2) >> 2
                elif x < y:
                    p[y, x] = (le[y - x - 1] + 2 * le[y - x] + le[y - x + 1] + 2) >> 2
                else:
                    p[y, x] = (t[0] + 2 * z + l[0] + 2) >> 2
    elif mode == I4_VR:
        assert avail_top and avail_left and avail_tl
        te = np.concatenate([[z], t])  # te[i] = p[i-1, -1] with te[0] = Z
        for y in range(4):
            for x in range(4):
                zvr = 2 * x - y
                if zvr >= 0:
                    i = x - (y >> 1)
                    if zvr % 2 == 0:
                        p[y, x] = (te[i] + te[i + 1] + 1) >> 1
                    else:
                        p[y, x] = (te[i - 1] + 2 * te[i] + te[i + 1] + 2) >> 2
                elif zvr == -1:
                    p[y, x] = (l[0] + 2 * z + t[0] + 2) >> 2
                else:
                    p[y, x] = (l[y - 2 * x - 1] + 2 * l[y - 2 * x - 2]
                               + (l[y - 2 * x - 3] if y - 2 * x - 3 >= 0 else z)
                               + 2) >> 2
    elif mode == I4_HD:
        assert avail_top and avail_left and avail_tl
        le = np.concatenate([[z], l])  # le[i] = p[-1, i-1] with le[0] = Z
        for y in range(4):
            for x in range(4):
                zhd = 2 * y - x
                if zhd >= 0:
                    i = y - (x >> 1)
                    if zhd % 2 == 0:
                        p[y, x] = (le[i] + le[i + 1] + 1) >> 1
                    else:
                        p[y, x] = (le[i - 1] + 2 * le[i] + le[i + 1] + 2) >> 2
                elif zhd == -1:
                    p[y, x] = (l[0] + 2 * z + t[0] + 2) >> 2
                else:
                    p[y, x] = (t[x - 2 * y - 1] + 2 * t[x - 2 * y - 2]
                               + (t[x - 2 * y - 3] if x - 2 * y - 3 >= 0 else z)
                               + 2) >> 2
    elif mode == I4_VL:
        assert avail_top
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    p[y, x] = (t[i] + t[i + 1] + 1) >> 1
                else:
                    p[y, x] = (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2
    elif mode == I4_HU:
        assert avail_left
        for y in range(4):
            for x in range(4):
                zhu = x + 2 * y
                if zhu > 5:
                    p[y, x] = l[3]
                elif zhu == 5:
                    p[y, x] = (l[2] + 3 * l[3] + 2) >> 2
                else:
                    i = y + (x >> 1)
                    if zhu % 2 == 0:
                        p[y, x] = (l[i] + l[i + 1] + 1) >> 1
                    else:
                        p[y, x] = (l[i] + 2 * l[i + 1] + l[i + 2] + 2) >> 2
    else:
        raise ValueError(f"bad intra4x4 mode {mode}")
    return p


def predict_16x16(mode: int, top: np.ndarray, left: np.ndarray, tl: int,
                  avail_top: bool, avail_left: bool, avail_tl: bool) -> np.ndarray:
    t = np.asarray(top, dtype=np.int64)
    l = np.asarray(left, dtype=np.int64)
    p = np.zeros((16, 16), dtype=np.int64)
    if mode == I16_V:
        assert avail_top
        p[:, :] = t[None, :]
    elif mode == I16_H:
        assert avail_left
        p[:, :] = l[:, None]
    elif mode == I16_DC:
        if avail_top and avail_left:
            p[:] = (t.sum() + l.sum() + 16) >> 5
        elif avail_top:
            p[:] = (t.sum() + 8) >> 4
        elif avail_left:
            p[:] = (l.sum() + 8) >> 4
        else:
            p[:] = 128
    elif mode == I16_PLANE:
        assert avail_top and avail_left and avail_tl
        tz = np.concatenate([[tl], t])  # tz[i] = p[i-1, -1]
        lz = np.concatenate([[tl], l])
        h = sum((x + 1) * (int(tz[9 + x]) - int(tz[7 - x])) for x in range(8))
        v = sum((y + 1) * (int(lz[9 + y]) - int(lz[7 - y])) for y in range(8))
        a = 16 * (int(l[15]) + int(t[15]))
        b = (5 * h + 32) >> 6
        c = (5 * v + 32) >> 6
        for y in range(16):
            for x in range(16):
                p[y, x] = np.clip((a + b * (x - 7) + c * (y - 7) + 16) >> 5, 0, 255)
    else:
        raise ValueError(f"bad intra16 mode {mode}")
    return p


def predict_chroma8x8(mode: int, top: np.ndarray, left: np.ndarray, tl: int,
                      avail_top: bool, avail_left: bool, avail_tl: bool) -> np.ndarray:
    t = np.asarray(top, dtype=np.int64)
    l = np.asarray(left, dtype=np.int64)
    p = np.zeros((8, 8), dtype=np.int64)
    if mode == IC_DC:
        # per 4x4 quadrant (spec 8.3.4.1)
        for yo in (0, 4):
            for xo in (0, 4):
                ts = t[xo:xo + 4]
                ls = l[yo:yo + 4]
                if xo == yo:
                    if avail_top and avail_left:
                        v = (ts.sum() + ls.sum() + 4) >> 3
                    elif avail_top:
                        v = (ts.sum() + 2) >> 2
                    elif avail_left:
                        v = (ls.sum() + 2) >> 2
                    else:
                        v = 128
                elif xo == 4:  # top-right quadrant: prefer top
                    if avail_top:
                        v = (ts.sum() + 2) >> 2
                    elif avail_left:
                        v = (ls.sum() + 2) >> 2
                    else:
                        v = 128
                else:          # bottom-left quadrant: prefer left
                    if avail_left:
                        v = (ls.sum() + 2) >> 2
                    elif avail_top:
                        v = (ts.sum() + 2) >> 2
                    else:
                        v = 128
                p[yo:yo + 4, xo:xo + 4] = v
    elif mode == IC_H:
        assert avail_left
        p[:, :] = l[:, None]
    elif mode == IC_V:
        assert avail_top
        p[:, :] = t[None, :]
    elif mode == IC_PLANE:
        assert avail_top and avail_left and avail_tl
        tz = np.concatenate([[tl], t])
        lz = np.concatenate([[tl], l])
        h = sum((x + 1) * (int(tz[5 + x]) - int(tz[3 - x])) for x in range(4))
        v = sum((y + 1) * (int(lz[5 + y]) - int(lz[3 - y])) for y in range(4))
        a = 16 * (int(l[7]) + int(t[7]))
        b = (17 * h + 16) >> 5
        c = (17 * v + 16) >> 5
        for y in range(8):
            for x in range(8):
                p[y, x] = np.clip((a + b * (x - 3) + c * (y - 3) + 16) >> 5, 0, 255)
    else:
        raise ValueError(f"bad chroma mode {mode}")
    return p


def filter_ref_8x8(top16, left8, tl, avail_top, avail_left, avail_tl):
    """Intra_8x8 reference sample filtering (spec 8.3.2.2.1).

    top16: 16 raw samples p[0..15,-1] (top-right already substituted by
    the caller when unavailable); left8: p[-1,0..7]; tl: p[-1,-1].
    Returns (top16', left8', tl')."""
    t = np.asarray(top16, dtype=np.int64)
    l = np.asarray(left8, dtype=np.int64)
    z = int(tl)
    tf = t.copy()
    lf = l.copy()
    zf = z
    if avail_top:
        if avail_tl:
            tf[0] = (z + 2 * t[0] + t[1] + 2) >> 2
        else:
            tf[0] = (3 * t[0] + t[1] + 2) >> 2
        tf[1:15] = (t[0:14] + 2 * t[1:15] + t[2:16] + 2) >> 2
        tf[15] = (t[14] + 3 * t[15] + 2) >> 2
    if avail_tl:
        if avail_top and avail_left:
            zf = (t[0] + 2 * z + l[0] + 2) >> 2
        elif avail_top:
            zf = (3 * z + t[0] + 2) >> 2
        elif avail_left:
            zf = (3 * z + l[0] + 2) >> 2
    if avail_left:
        if avail_tl:
            lf[0] = (z + 2 * l[0] + l[1] + 2) >> 2
        else:
            lf[0] = (3 * l[0] + l[1] + 2) >> 2
        lf[1:7] = (l[0:6] + 2 * l[1:7] + l[2:8] + 2) >> 2
        lf[7] = (l[6] + 3 * l[7] + 2) >> 2
    return tf, lf, zf


def predict_8x8(mode: int, top16, left8, tl, avail_top: bool,
                avail_left: bool, avail_tl: bool) -> np.ndarray:
    """Intra_8x8 luma prediction (spec 8.3.2.2.2-.2.10) over FILTERED
    reference samples.  top16: 16 raw samples incl. top-right (already
    substituted when the top-right 8x8 is unavailable)."""
    t, l, z = filter_ref_8x8(top16, left8, tl, avail_top, avail_left,
                             avail_tl)
    p = np.zeros((8, 8), dtype=np.int64)
    xs = np.arange(8)[None, :]
    ys = np.arange(8)[:, None]
    if mode == 0:                      # vertical
        assert avail_top
        p[:, :] = t[None, :8]
    elif mode == 1:                    # horizontal
        assert avail_left
        p[:, :] = l[:, None]
    elif mode == 2:                    # DC
        if avail_top and avail_left:
            p[:, :] = (t[:8].sum() + l.sum() + 8) >> 4
        elif avail_top:
            p[:, :] = (t[:8].sum() + 4) >> 3
        elif avail_left:
            p[:, :] = (l.sum() + 4) >> 3
        else:
            p[:, :] = 128
    elif mode == 3:                    # diagonal down-left
        assert avail_top
        for y in range(8):
            for x in range(8):
                if x == 7 and y == 7:
                    p[y, x] = (t[14] + 3 * t[15] + 2) >> 2
                else:
                    p[y, x] = (t[x + y] + 2 * t[x + y + 1]
                               + t[x + y + 2] + 2) >> 2
    elif mode == 4:                    # diagonal down-right
        assert avail_top and avail_left and avail_tl
        for y in range(8):
            for x in range(8):
                if x > y:
                    a = z if x - y == 1 else t[x - y - 2]
                    p[y, x] = (a + 2 * t[x - y - 1] + t[x - y] + 2) >> 2
                elif x < y:
                    a = z if y - x == 1 else l[y - x - 2]
                    p[y, x] = (a + 2 * l[y - x - 1] + l[y - x] + 2) >> 2
                else:
                    p[y, x] = (t[0] + 2 * z + l[0] + 2) >> 2
    elif mode == 5:                    # vertical-right
        assert avail_top and avail_left and avail_tl
        for y in range(8):
            for x in range(8):
                zvr = 2 * x - y
                if zvr >= 0 and zvr % 2 == 0:
                    i = x - (y >> 1)
                    p[y, x] = ((z if i == 0 else t[i - 1])
                               + t[i] + 1) >> 1 if i > 0 else \
                        (z + t[0] + 1) >> 1
                elif zvr > 0:
                    i = x - (y >> 1)
                    a = z if i == 1 else t[i - 2]
                    p[y, x] = (a + 2 * t[i - 1] + t[i] + 2) >> 2
                elif zvr == -1:
                    p[y, x] = (l[0] + 2 * z + t[0] + 2) >> 2
                else:
                    j = y - 2 * x
                    p[y, x] = (l[j - 1] + 2 * l[j - 2]
                               + (l[j - 3] if j >= 3 else z) + 2) >> 2
    elif mode == 6:                    # horizontal-down
        assert avail_top and avail_left and avail_tl
        for y in range(8):
            for x in range(8):
                zhd = 2 * y - x
                if zhd >= 0 and zhd % 2 == 0:
                    j = y - (x >> 1)
                    p[y, x] = ((z if j == 0 else l[j - 1])
                               + l[j] + 1) >> 1
                elif zhd > 0:
                    j = y - (x >> 1)
                    a = z if j == 1 else l[j - 2]
                    p[y, x] = (a + 2 * l[j - 1] + l[j] + 2) >> 2
                elif zhd == -1:
                    p[y, x] = (l[0] + 2 * z + t[0] + 2) >> 2
                else:
                    i = x - 2 * y
                    p[y, x] = (t[i - 1] + 2 * t[i - 2]
                               + (t[i - 3] if i >= 3 else z) + 2) >> 2
    elif mode == 7:                    # vertical-left
        assert avail_top
        for y in range(8):
            for x in range(8):
                i = x + (y >> 1)
                if y % 2 == 0:
                    p[y, x] = (t[i] + t[i + 1] + 1) >> 1
                else:
                    p[y, x] = (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2
    elif mode == 8:                    # horizontal-up
        assert avail_left
        for y in range(8):
            for x in range(8):
                zhu = x + 2 * y
                if zhu > 13:
                    p[y, x] = l[7]
                elif zhu == 13:
                    p[y, x] = (l[6] + 3 * l[7] + 2) >> 2
                elif zhu % 2 == 0:
                    j = y + (x >> 1)
                    p[y, x] = (l[j] + l[j + 1] + 1) >> 1
                else:
                    j = y + (x >> 1)
                    p[y, x] = (l[j] + 2 * l[j + 1] + l[j + 2] + 2) >> 2
    else:
        raise ValueError(f"bad intra8x8 mode {mode}")
    return p
