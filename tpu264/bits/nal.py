"""NAL unit framing: RBSP↔EBSP emulation prevention and Annex-B byte streams.

Capability parity with JM `nal.c`/`nalu.c`/`annexb.c` (SURVEY.md §2a #3):
RBSP → emulation-prevention-escaped EBSP (insert 0x03 after any 00 00
followed by a byte <= 0x03), NAL header construction, 4-byte start codes,
and the decode-side inverse (start-code scan + 0x03 removal).
"""

from __future__ import annotations

import numpy as np

# nal_unit_type values (spec Table 7-1)
NAL_SLICE = 1
NAL_IDR = 5
NAL_SEI = 6
NAL_SPS = 7
NAL_PPS = 8
NAL_AUD = 9
NAL_FILLER = 12

START_CODE = b"\x00\x00\x00\x01"


def rbsp_to_ebsp(rbsp: bytes) -> bytes:
    """Insert emulation_prevention_three_byte (spec 7.4.1.1).

    A 0x03 is inserted after every pair of consecutive zero bytes that is
    followed by a byte in {0,1,2,3}; the inserted byte resets the zero run.
    Zero pairs are rare in entropy-coded data, so we locate candidate
    positions vectorized and walk only those sequentially to honor the
    run-reset semantics.
    """
    a = np.frombuffer(rbsp, dtype=np.uint8)
    if a.size < 3:
        return rbsp
    cand = np.nonzero((a[:-2] == 0) & (a[1:-1] == 0) & (a[2:] <= 3))[0]
    if cand.size == 0:
        return rbsp
    out = []
    prev = 0
    last_insert_end = -10  # index (in `a`) just past the last escaped pair
    for i in cand.tolist():
        # a pair starting inside the previous escaped pair is broken by the
        # inserted 0x03 → skip it
        if i < last_insert_end:
            continue
        out.append(a[prev:i + 2])
        out.append(np.asarray([3], dtype=np.uint8))
        prev = i + 2
        last_insert_end = i + 2
    out.append(a[prev:])
    return np.concatenate(out).tobytes()


def ebsp_to_rbsp(ebsp: bytes) -> bytes:
    """Remove emulation prevention bytes (00 00 03 → 00 00)."""
    a = np.frombuffer(ebsp, dtype=np.uint8)
    if a.size < 3:
        return ebsp
    # Every 0x03 preceded by two zero bytes is an escape: a conforming EBSP
    # stream never contains 00 00 0x(0..3) as payload, and two escape
    # candidates cannot overlap (the pair bytes must be zero, the escape is
    # 3), so a single vectorized pass is exact.
    drop = np.zeros(a.size, dtype=bool)
    cand = np.nonzero((a[2:] == 3) & (a[1:-1] == 0) & (a[:-2] == 0))[0] + 2
    drop[cand] = True
    return a[~drop].tobytes()


def nal_header(nal_ref_idc: int, nal_unit_type: int) -> bytes:
    assert 0 <= nal_ref_idc <= 3 and 0 <= nal_unit_type <= 31
    return bytes([(nal_ref_idc << 5) | nal_unit_type])


def make_nalu(nal_ref_idc: int, nal_unit_type: int, rbsp: bytes) -> bytes:
    """Annex-B NAL unit: start code + header + escaped payload."""
    return START_CODE + nal_header(nal_ref_idc, nal_unit_type) + rbsp_to_ebsp(rbsp)


def split_annexb(stream: bytes):
    """Yield (nal_ref_idc, nal_unit_type, rbsp_bytes) for each NALU."""
    a = np.frombuffer(stream, dtype=np.uint8)
    if a.size < 4:
        return
    sc3 = np.nonzero((a[:-2] == 0) & (a[1:-1] == 0) & (a[2:] == 1))[0]
    if sc3.size == 0:
        return
    starts = []  # payload start offsets
    for p in sc3.tolist():
        starts.append(p + 3)
    for i, s in enumerate(starts):
        end = starts[i + 1] - 3 if i + 1 < len(starts) else a.size
        # a 4-byte start code contributes a leading 00 to the previous NALU
        while end > s and a[end - 1] == 0:
            end -= 1
        if end <= s:
            continue
        hdr = int(a[s])
        rbsp = ebsp_to_rbsp(a[s + 1:end].tobytes())
        yield (hdr >> 5) & 3, hdr & 31, rbsp
