"""Vectorized bit packing for bitstream assembly.

The JM reference software writes bitstreams one syntax element at a time
through a byte-oriented `Bitstream` struct (upstream `lencod/src/vlc.c`,
`bitstream.c` — see SURVEY.md §2a #3/#5).  Our design instead computes all
(code value, code length) pairs for a slice as dense numpy arrays — the
natural output layout for batched TPU kernels — and packs them into bytes in
one vectorized pass.  Zero-length elements are legal and write nothing, which
lets fixed-shape per-block element grids (with absent elements padded to
length 0) be serialized without any per-element Python control flow.
"""

from __future__ import annotations

import numpy as np


def pack_bits(values: np.ndarray, lengths: np.ndarray) -> tuple[np.ndarray, int]:
    """Pack MSB-first variable-length codes into a byte array.

    Args:
      values: uint64 array of code values (low `lengths[i]` bits significant).
      lengths: int array of code lengths in bits, 0..64. Length-0 entries are
        skipped.

    Returns:
      (bytes_array, total_bits): packed bytes (zero-padded to a byte
      boundary at the end) and the exact number of valid bits.
    """
    values = np.asarray(values, dtype=np.uint64).ravel()
    lengths = np.asarray(lengths, dtype=np.int64).ravel()
    if values.shape != lengths.shape:
        raise ValueError("values/lengths shape mismatch")
    if lengths.size == 0:
        return np.zeros(0, dtype=np.uint8), 0
    if lengths.min() < 0 or lengths.max() > 64:
        raise ValueError("bit lengths must be in [0, 64]")

    # compact away length-0 slots (the fixed element grids are mostly empty)
    nz = lengths > 0
    values = values[nz]
    lengths = lengths[nz]
    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, dtype=np.uint8), 0
    starts = np.cumsum(lengths) - lengths

    # Each code contributes to at most 3 consecutive 32-bit words (len<=64
    # plus up to 31 bits of offset).  Align every code's bits inside a
    # 96-bit window starting at its word: top 32 bits -> word w, next 32 ->
    # w+1, next 32 -> w+2.  OR-reduce per word via run-boundary reduceat
    # (codes are in stream order, so word indices are non-decreasing).
    n_words = (total + 31) // 32
    off = (starts & 31).astype(np.uint64)
    w = (starts >> 5).astype(np.int64)
    lens64 = lengths.astype(np.uint64)
    sh = np.uint64(96) - off - lens64            # left shift within the window
    ge64 = sh >= 64
    # hi = window bits [64,96); mid = window bits [0,64)  (shifts clamped so
    # both `where` branches stay defined)
    hi = np.where(ge64,
                  values << np.where(ge64, sh - np.uint64(64), np.uint64(0)),
                  values >> np.where(ge64, np.uint64(0), np.uint64(64) - sh))
    mid = np.where(ge64, np.uint64(0),
                   values << np.minimum(sh, np.uint64(63)))
    words = np.zeros(n_words, dtype=np.uint32)
    m32 = np.uint64(0xFFFFFFFF)
    for dw, part in ((0, hi & m32), (1, mid >> np.uint64(32)), (2, mid & m32)):
        pw = w + dw
        keep = (part != 0) & (pw < n_words)
        pw = pw[keep]
        pv = part[keep].astype(np.uint32)
        if pw.size == 0:
            continue
        run_start = np.empty(pw.size, dtype=bool)
        run_start[0] = True
        run_start[1:] = pw[1:] != pw[:-1]       # pw is non-decreasing
        bounds = np.flatnonzero(run_start)
        words[pw[bounds]] |= np.bitwise_or.reduceat(pv, bounds)
    out = words.astype(">u4").view(np.uint8)
    return out[: (total + 7) // 8].copy(), total


class BitSink:
    """Accumulates (value, nbits) codes; packs once at the end.

    Scalar `put` calls are cheap appends; bulk array appends via `put_array`
    keep the host entropy path vectorized.
    """

    def __init__(self) -> None:
        self._vals: list[np.ndarray] = []
        self._lens: list[np.ndarray] = []
        self._nbits = 0

    def put(self, value: int, nbits: int) -> None:
        if nbits < 0 or nbits > 64:
            raise ValueError(f"bad code length {nbits}")
        if nbits < 64 and value >= (1 << nbits):
            raise ValueError(f"value {value} does not fit in {nbits} bits")
        self._vals.append(np.asarray([value], dtype=np.uint64))
        self._lens.append(np.asarray([nbits], dtype=np.int64))
        self._nbits += nbits

    def put_array(self, values: np.ndarray, lengths: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.uint64).ravel()
        l = np.asarray(lengths, dtype=np.int64).ravel()
        if v.shape != l.shape:
            raise ValueError("values/lengths shape mismatch")
        self._vals.append(v)
        self._lens.append(l)
        self._nbits += int(l.sum())

    @property
    def nbits(self) -> int:
        return self._nbits

    def cabac_align(self) -> None:
        """cabac_alignment_one_bit padding to a byte boundary (spec 7.3.4)."""
        align = (-self._nbits) % 8
        if align:
            self.put((1 << align) - 1, align)

    def rbsp_trailing_bits(self) -> None:
        """rbsp_stop_one_bit + alignment zeros (spec 7.3.2.11)."""
        self.put(1, 1)
        align = (-self._nbits) % 8
        if align:
            self.put(0, align)

    def to_bytes(self) -> bytes:
        vals = np.concatenate(self._vals) if self._vals else np.zeros(0, np.uint64)
        lens = np.concatenate(self._lens) if self._lens else np.zeros(0, np.int64)
        packed, total = pack_bits(vals, lens)
        assert total == self._nbits
        return packed.tobytes()
