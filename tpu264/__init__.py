"""tpu264 — a TPU-native H.264/AVC encode/decode engine in JAX/XLA/Pallas.

Built from scratch with the capability set of the annotated JM reference
software (githubhjs/h264-jm-commentary; see /root/repo/SURVEY.md for the
structural blueprint).  The compute path (intra prediction, motion
estimation, transform/quant, deblocking) runs batched on TPU via JAX and
Pallas kernels with wavefront macroblock scheduling; entropy coding and
bitstream assembly run as vectorized numpy on the host; multi-chip scaling
shards frame tiles / slice rows over a `jax.sharding.Mesh` and multi-host
scaling shards GOPs across hosts.
"""

__version__ = "0.1.0"
