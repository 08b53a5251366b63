"""Batched device kernels (JAX/Pallas) for the codec hot loops.

Every kernel here operates on *batches* of blocks/macroblocks — the axes
that JM iterates sequentially (SURVEY.md §3.1 hot loops) become array
dimensions.  All codec math is int32 with explicit shifts; bit-exactness
against `tpu264.ref` scalar oracles is enforced by tests/test_kernels.py.
Pallas variants of the hottest kernels live in `pallas_kernels.py`
(fused MXU DCT+quant, deblock line filters) and are enabled via
`EncoderConfig.use_pallas` → `pallas_kernels.set_enabled`.
"""
