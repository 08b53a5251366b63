"""Tile-sharded frame encoding over a device mesh (SURVEY.md §2b TP row).

Each chip owns a horizontal band of MB rows and encodes it as an
independent H.264 slice — the codec-native tensor-parallel axis: no
cross-tile intra dependencies (slice boundaries cut them by construction),
so the only inter-chip traffic is (a) rate/stat reductions via `psum` and
(b) the 4-pixel tile-boundary halo rows exchanged via `ppermute` for the
in-loop deblocking filter (consumed once deblocking lands; exchanged here
so the communication pattern is part of the compiled step from day one).

The tiled encode of a frame produces byte-identical bitstreams to a
single-device encode with `slices_per_frame = n_tiles`
(tests/test_sharded.py), which is the determinism/race gate of
SURVEY.md §4.4.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu264.coding.intra_frame import make_intra_encoder
from tpu264.coding.wavefront import build_schedule


def make_tiled_intra_encoder(width: int, height: int, qp: int, mesh: Mesh,
                             tile_axis: str = "tile", gop_axis: str | None = "gop"):
    """Build a jitted, mesh-sharded multi-frame intra encode step.

    Returns fn(y [G,H,W], u, v) -> (recon dict, ys dict, stats) with G
    sharded over `gop_axis` and H sharded over `tile_axis`.
    """
    n_tiles = mesh.shape[tile_axis]
    assert height % (16 * n_tiles) == 0, "tile bands must be whole MB rows"
    band_h = height // n_tiles
    band_sched = build_schedule(width // 16, band_h // 16, 1)
    band_encode = make_intra_encoder(band_sched)

    in_spec = (P(gop_axis, tile_axis, None),) * 3
    out_spec = (
        dict(recon_y=P(gop_axis, tile_axis, None),
             recon_u=P(gop_axis, tile_axis, None),
             recon_v=P(gop_axis, tile_axis, None)),
        P(gop_axis, tile_axis),          # ys: explicit tile dim added below
        dict(bits_estimate=P(gop_axis),
             halo_up=P(gop_axis, tile_axis)),
    )

    def per_device(y, u, v):
        # local shapes: [g_local, band_h, W]
        def one(args):
            yy, uu, vv = args
            out, ys = band_encode(yy, uu, vv, qp)
            return out, ys
        out, ys = jax.lax.map(one, (y, u, v))
        # rate-control stat per frame: nonzero levels, psum'd over tiles
        def frame_nz(a):
            return (a != 0).reshape(a.shape[0], -1).sum(axis=1)
        nz = (frame_nz(ys["luma_ac"]) + frame_nz(ys["luma_dc"])
              + frame_nz(ys["chroma_ac"]) + frame_nz(ys["chroma_dc"]))
        bits_est = jax.lax.psum(nz.astype(jnp.int32), tile_axis)
        # deblock halo: send our band's top 4 recon rows to the tile above
        # (ring ppermute over the tile axis)
        top_rows = out["recon_y"][:, :4, :]
        perm = [(i, (i - 1) % n_tiles) for i in range(n_tiles)]
        halo_up = jax.lax.ppermute(top_rows, tile_axis, perm)
        # add an explicit tile dim so global ys is [G, n_tiles, waves, ...]
        ys = jax.tree.map(lambda a: a[:, None], ys)
        return out, ys, dict(bits_estimate=bits_est,
                             halo_up=halo_up[:, None])

    # check_vma=False: the wavefront scan carries mix device-varying recon
    # state with replicated schedule constants, which the varying-axis
    # checker rejects; correctness is covered by the sharded-vs-unsharded
    # identical-bitstream test.
    shard_fn = jax.shard_map(per_device, mesh=mesh,
                             in_specs=in_spec, out_specs=out_spec,
                             check_vma=False)
    return jax.jit(shard_fn)


def tiled_ys_to_mb(ys, width: int, band_h: int, n_tiles: int, g: int = 0):
    """Reassemble one frame's per-band wave outputs into frame-raster
    per-MB arrays (same layout as `reorder_wave_outputs` on a full frame
    encoded with per-band slices)."""
    from tpu264.coding.intra_frame import reorder_wave_outputs
    band_sched = build_schedule(width // 16, band_h // 16, 1)
    parts = []
    for t in range(n_tiles):
        band_ys = {k: np.asarray(v)[g, t] for k, v in ys.items()}
        parts.append(reorder_wave_outputs(band_sched, band_ys))
    return {k: np.concatenate([p[k] for p in parts], axis=0)
            for k in parts[0]}


def make_mesh(n_devices: int | None = None, gop: int | None = None):
    """Default 2-axis mesh (gop × tile) over the available devices."""
    devs = np.array(jax.devices())
    n = n_devices or devs.size
    devs = devs[:n]
    if gop is None:
        gop = 2 if n % 2 == 0 and n > 1 else 1
    tile = n // gop
    return Mesh(devs.reshape(gop, tile), ("gop", "tile"))
