"""Entropy coding: vectorized CAVLC (host numpy) and CABAC.

Design (SURVEY.md §2a #5/#6): per-4x4-block token/length computation is
embarrassingly parallel across blocks and runs as dense numpy array math;
variable-length concatenation happens once per slice via `bits.pack_bits`.
"""
