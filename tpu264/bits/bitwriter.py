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

    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, dtype=np.uint8), 0
    starts = np.cumsum(lengths) - lengths
    # element index owning each output bit, and bit position within element
    elem = np.repeat(np.arange(lengths.size, dtype=np.int64), lengths)
    k = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
    shift = (lengths[elem] - 1 - k).astype(np.uint64)
    bits = ((values[elem] >> shift) & np.uint64(1)).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(bits), total


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
