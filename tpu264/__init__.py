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

import os as _os

import jax as _jax

# The wavefront engine's scan body is a large graph (16 unrolled blocks x 9
# modes); persistent compilation caching makes repeat runs/tests cheap.
_jax.config.update("jax_compilation_cache_dir",
                   _os.environ.get("TPU264_JAX_CACHE",
                                   _os.path.expanduser("~/.cache/tpu264-jax")))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
