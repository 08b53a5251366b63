"""Runtime: device meshes, tile sharding, halo exchange, GOP scheduling.

The parallelism plan (SURVEY.md §2b): GOPs are data-parallel across hosts
(`jax.distributed`), frame tiles / slice rows are sharded across chips via
`shard_map` over a `jax.sharding.Mesh` (each tile is an independent H.264
slice, so tiling is bitstream-visible but deterministic), and tile-boundary
data (deblock halos, rate stats) moves over ICI collectives.
"""
