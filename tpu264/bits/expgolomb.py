"""Exp-Golomb codes, ue(v)/se(v)/te(v)/me(v) (spec 9.1; JM `vlc.c` ue_v/se_v).

Both scalar helpers (for headers) and vectorized numpy forms returning
(code value, code length) pairs suitable for `pack_bits` (for the per-MB
syntax layer, which is emitted as dense arrays).
"""

from __future__ import annotations

import numpy as np

from .bitreader import BitReader


def ue_code(v):
    """ue(v) → (code, nbits). Vectorized over numpy arrays.

    codeNum v is written as [log2(v+1) zeros][binary(v+1)].
    """
    v = np.asarray(v, dtype=np.int64)
    vp1 = v + 1
    # exact integer floor(log2(v+1)), avoiding float edge cases
    nbits_half = np.zeros_like(v)
    x = vp1.copy()
    while np.any(x > 1):
        step = x > 1
        nbits_half = nbits_half + step
        x = np.where(step, x >> 1, x)
    return vp1.astype(np.uint64), (2 * nbits_half + 1).astype(np.int64)


def se_to_ue(v):
    """Map signed value to ue codeNum (spec 9.1.1): k>0 → 2k-1, k<=0 → -2k."""
    v = np.asarray(v, dtype=np.int64)
    return np.where(v > 0, 2 * v - 1, -2 * v)


def se_code(v):
    return ue_code(se_to_ue(v))


def write_ue(sink, v: int) -> None:
    code, n = ue_code(np.asarray([v]))
    sink.put(int(code[0]), int(n[0]))


def write_se(sink, v: int) -> None:
    write_ue(sink, int(se_to_ue(np.asarray([v]))[0]))


def write_te(sink, v: int, max_val: int) -> None:
    """te(v): truncated Exp-Golomb (spec 9.1): 1-bit inverted if range is [0,1]."""
    if max_val == 1:
        sink.put(1 - v, 1)
    else:
        write_ue(sink, v)


def read_ue(r: BitReader) -> int:
    lz = r.count_leading_zeros(limit=32)
    r.read(1)  # the terminating 1
    if lz == 0:
        return 0
    return (1 << lz) - 1 + r.read(lz)


def read_se(r: BitReader) -> int:
    k = read_ue(r)
    # inverse of se_to_ue
    if k % 2 == 1:
        return (k + 1) // 2
    return -(k // 2)


def read_te(r: BitReader, max_val: int) -> int:
    if max_val == 1:
        return 1 - r.read(1)
    return read_ue(r)
