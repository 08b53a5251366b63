"""Scalar numpy reference implementations (correctness oracles).

Obviously-correct, unvectorized implementations of the normative codec
math: transforms, quantization, intra prediction, interpolation, deblocking.
These mirror JM's role as a conformance reference (SURVEY.md §4 item 1):
every JAX/Pallas kernel is property-tested against this module, and the
decoder's reconstruction path is built on it.
"""
