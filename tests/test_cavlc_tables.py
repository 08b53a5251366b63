"""Structural validation of the CAVLC VLC tables: prefix-freeness and
(near-)completeness — a transcription error in any table would break one of
these invariants or the decoder round trip."""

import numpy as np

from tpu264.entropy import cavlc_tables as tbl


def _codes(bits, lens, entries):
    out = []
    for i in entries:
        ln = int(lens[i])
        if ln > 0:
            out.append((ln, int(bits[i])))
    return out


def _check_prefix_free(codes):
    strs = [format(v, f"0{l}b") for l, v in codes]
    for l, v in codes:
        assert v < (1 << l)
    for i, a in enumerate(strs):
        for j, b in enumerate(strs):
            if i != j:
                assert not b.startswith(a), (a, b)
    return sum(2.0 ** -l for l, _ in codes)


def test_coeff_token_tables():
    entries = [4 * tc + t1 for tc in range(17) for t1 in range(min(3, tc) + 1)]
    for t in range(4):
        codes = _codes(tbl.COEFF_TOKEN_BITS[t], tbl.COEFF_TOKEN_LEN[t], entries)
        assert len(codes) == 62
        kraft = _check_prefix_free(codes)
        assert 0.96 <= kraft <= 1.0


def test_chroma_dc_coeff_token():
    entries = [4 * tc + t1 for tc in range(5) for t1 in range(min(3, tc) + 1)]
    codes = _codes(tbl.CDC_COEFF_TOKEN_BITS, tbl.CDC_COEFF_TOKEN_LEN, entries)
    assert len(codes) == 14
    kraft = _check_prefix_free(codes)
    assert 0.9 <= kraft <= 1.0


def test_total_zeros_tables():
    for i in range(15):  # tzVlcIndex = TotalCoeff = i+1; 16-i-1+1 entries
        codes = _codes(tbl.TOTAL_ZEROS_BITS[i], tbl.TOTAL_ZEROS_LEN[i],
                       range(16 - i))
        kraft = _check_prefix_free(codes)
        assert 0.99 <= kraft <= 1.0, (i, kraft)
    for i in range(3):
        codes = _codes(tbl.CDC_TOTAL_ZEROS_BITS[i], tbl.CDC_TOTAL_ZEROS_LEN[i],
                       range(4 - i))
        assert _check_prefix_free(codes) == 1.0


def test_run_before_tables():
    for zl in range(1, 7):
        codes = _codes(tbl.RUN_BEFORE_BITS[zl - 1], tbl.RUN_BEFORE_LEN[zl - 1],
                       range(zl + 1))
        assert _check_prefix_free(codes) == 1.0
    codes = _codes(tbl.RUN_BEFORE_BITS[6], tbl.RUN_BEFORE_LEN[6], range(15))
    kraft = _check_prefix_free(codes)
    assert 0.999 <= kraft <= 1.0


def test_known_spec_entries():
    # spot checks against spec Table 9-5 (widely published entries)
    # nC in [0,2): tc=0 → '1'; tc=1,t1=1 → '01'; tc=2,t1=2 → '001'
    assert (tbl.COEFF_TOKEN_LEN[0][0], tbl.COEFF_TOKEN_BITS[0][0]) == (1, 1)
    assert (tbl.COEFF_TOKEN_LEN[0][5], tbl.COEFF_TOKEN_BITS[0][5]) == (2, 1)
    assert (tbl.COEFF_TOKEN_LEN[0][10], tbl.COEFF_TOKEN_BITS[0][10]) == (3, 1)
    # nC >= 8 is a 6-bit FLC with code 4*(tc-1)+t1, tc=0 → 3
    assert (tbl.COEFF_TOKEN_LEN[3][0], tbl.COEFF_TOKEN_BITS[3][0]) == (6, 3)
    assert (tbl.COEFF_TOKEN_LEN[3][4 * 16 + 3],
            tbl.COEFF_TOKEN_BITS[3][4 * 16 + 3]) == (6, 63)
    # chroma DC: tc=1,t1=1 → '1'
    assert (tbl.CDC_COEFF_TOKEN_LEN[5], tbl.CDC_COEFF_TOKEN_BITS[5]) == (1, 1)
