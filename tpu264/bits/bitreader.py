"""MSB-first bit reader over an RBSP byte buffer (decoder side).

Mirrors the read half of JM's `ldecod` bitstream access (upstream
`ldecod/src/vlc.c` GetBits/ShowBits — SURVEY.md §3.2); implemented as an
index into a pre-expanded numpy bit array, so that syntax parsing is cheap
python while bulk coefficient parsing can operate on array slices.
"""

from __future__ import annotations

import numpy as np


class BitReader:
    def __init__(self, data: bytes | np.ndarray) -> None:
        buf = np.frombuffer(bytes(data), dtype=np.uint8)
        self.bits = np.unpackbits(buf)
        self.pos = 0

    @property
    def remaining(self) -> int:
        return int(self.bits.size - self.pos)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.bits.size:
            raise EOFError("bitstream exhausted")
        chunk = self.bits[self.pos:self.pos + n]
        self.pos += n
        val = 0
        for b in chunk.tolist():
            val = (val << 1) | int(b)
        return val

    def peek(self, n: int) -> int:
        save = self.pos
        try:
            return self.read(n)
        finally:
            self.pos = save

    def read_flag(self) -> int:
        return self.read(1)

    def count_leading_zeros(self, limit: int = 64) -> int:
        """Consume and count zero bits until (not including) the first 1."""
        n = 0
        while n < limit:
            if self.pos >= self.bits.size:
                raise EOFError("bitstream exhausted in leading-zero scan")
            if self.bits[self.pos]:
                return n
            self.pos += 1
            n += 1
        raise ValueError("leading-zero run exceeds limit")

    def byte_aligned(self) -> bool:
        return self.pos % 8 == 0

    def align_byte(self) -> None:
        """Skip pcm_alignment_zero_bit padding (spec 7.3.5 I_PCM)."""
        self.pos += (-self.pos) % 8

    def more_rbsp_data(self) -> bool:
        """True if data remains before rbsp_stop_one_bit (spec 7.2)."""
        if self.pos >= self.bits.size:
            return False
        # find last 1 bit in the buffer == rbsp_stop_one_bit
        ones = np.nonzero(self.bits)[0]
        if ones.size == 0:
            return False
        return self.pos < int(ones[-1])
