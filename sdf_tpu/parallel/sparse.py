"""Sharded sparse tiles: the active-tile list sharded over the mesh.

Z-slab sharding (parallel.grid) balances *volume*; for sparse models the
surface tiles cluster, so the better pod strategy is to shard the
ACTIVE TILE LIST round-robin over devices -- every device gets the same
number of surface tiles regardless of where the surface sits.  Tiles
carry global indices, so per-device marching cubes needs no offset fixup
and, as everywhere else in this engine, no halo exchange (the +1 sample
ring is recomputed locally).

Collectives: one pmax pair for the global emit capacities.  Host-side
readback touches only addressable shards (multi-host safe, same contract
as parallel.grid: each host returns its local triangle soup).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..core import mc
from ..core import sparse as core_sparse

AXIS = "grid"


@partial(
    jax.jit, static_argnames=("mesh", "cshape", "tile", "tpd", "chunk",
                              "variant")
)
def _phase_count(sdf, X, Y, Z, tiles, live, mesh, cshape, tile, tpd, chunk,
                 variant="default"):
    def body(X, Y, Z, tiles, live):
        # blocks arrive per-device: tiles (tpd, 3), live (tpd,)
        vols = core_sparse._eval_tiles(sdf, X, Y, Z, tiles, tpd, chunk, tile)
        total, per_tile, ncell, case, nedge, emask = core_sparse._count_tiles(
            vols, tiles, live, cshape, tile, variant=variant
        )
        gmax_t = jax.lax.pmax(total, AXIS)
        gmax_c = jax.lax.pmax(ncell, AXIS)
        gmax_e = jax.lax.pmax(nedge, AXIS)
        # All-gather the per-tile counts so every HOST can assemble the
        # full stats grid (addressable shards alone would be partial on
        # a multi-host mesh).
        per_tile_all = jax.lax.all_gather(per_tile, AXIS)  # (ndev, tpd)
        return (vols, case, emask, nedge[None], per_tile_all, gmax_t,
                gmax_c, gmax_e)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(), P(), P()),
        # the vma checker cannot infer all_gather's output replication
        check_vma=False,
    )(X, Y, Z, tiles, live)


@partial(
    jax.jit,
    static_argnames=("mesh", "cshape", "tile", "edge_capacity", "capacity",
                     "cell_capacity", "variant"),
)
def _phase_emit(vols, case, emask, tiles, live, mesh, cshape, tile,
                edge_capacity, capacity, cell_capacity, variant="default"):
    def body(vols, case, emask, tiles, live):
        everts, faces, n = core_sparse._emit_tiles_indexed(
            vols, tiles, live, case, emask, cshape, edge_capacity, capacity,
            cell_capacity, tile, variant=variant,
        )
        return everts[None], faces[None], n[None]

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P(AXIS)),
        # compact.indices_of/indices_and_ranktable_of inside
        # _emit_tiles_indexed are pallas_calls on TPU; their out_shapes
        # carry no vma annotation.
        check_vma=False,
    )(vols, case, emask, tiles, live)


def mesh_sparse_tiles_sharded(sdf_c, X, Y, Z, skip, tile, mesh, dtype,
                              chunk_tiles=128, return_indexed=False,
                              variant="default"):
    """Sharded tiled-sparse pipeline over a device mesh.

    Same inputs/outputs as core.sparse.mesh_sparse_tiles (incl.
    ``return_indexed``), with one difference: triangle ORDER is
    device-major over the round-robin tile assignment, not the
    single-device path's x-major tile order (compare as sets).  On a
    multi-host mesh each host returns its local soup/indexed mesh
    (assemble with parallel.gather_triangles); per-tile stats are global
    on every host.
    """
    ndev = mesh.devices.size
    nx, ny, nz = len(X), len(Y), len(Z)
    cshape = (nx - 1, ny - 1, nz - 1)

    def empty(pt):
        v = np.zeros((0, 3), dtype=np.float64)
        return ((v, np.zeros((0, 3), np.int32)) if return_indexed else v), pt

    active = np.argwhere(~skip)  # (nt, 3) x-major
    nt = len(active)
    if nt == 0:
        return empty(np.zeros(skip.shape, dtype=np.int64))
    # Pad to a power-of-two per-device tile count: tpd is a static shape,
    # so pow2 rounding keeps executable reuse as the active-tile count
    # drifts between runs.
    tpd = mc.round_capacity(-(-nt // ndev))
    ntc = tpd * ndev
    tiles = np.zeros((ntc, 3), dtype=np.int32)
    tiles[:nt] = active
    live = np.zeros((ntc,), dtype=bool)
    live[:nt] = True
    # Round-robin: device d gets tiles [d::ndev] -- spreads clustered
    # surface regions evenly.
    order = np.arange(ntc).reshape(tpd, ndev).T.reshape(-1)
    tiles = tiles[order]
    live = live[order]

    Xd = jnp.asarray(X, dtype=dtype)
    Yd = jnp.asarray(Y, dtype=dtype)
    Zd = jnp.asarray(Z, dtype=dtype)
    tiles_d = jnp.asarray(tiles)
    live_d = jnp.asarray(live)

    vols, case, emask, nedges, per_tile, gmax_t, gmax_c, gmax_e = (
        _phase_count(
            sdf_c, Xd, Yd, Zd, tiles_d, live_d, mesh, cshape, tile, tpd,
            chunk_tiles, variant,
        )
    )
    nmax = int(gmax_t)

    pt = np.zeros(skip.shape, dtype=np.int64)
    # per_tile is all-gathered (replicated): assemble the full grid.
    counts_all = np.asarray(per_tile).reshape(-1)  # (ntc,) device-major
    pt[tuple(tiles[live].T)] = counts_all[live]

    if nmax == 0:
        return empty(pt)

    capacity = mc.round_capacity(nmax)
    cell_capacity = mc.round_capacity(int(gmax_c))
    edge_capacity = mc.round_capacity(int(gmax_e))
    everts, faces, counts = _phase_emit(
        vols, case, emask, tiles_d, live_d, mesh, cshape, tile,
        edge_capacity, capacity, cell_capacity, variant,
    )

    # Per-shard indexed readback + assembly (shared with the z-slab
    # path; each shard's soup is reconstructed bit-identically to
    # _emit_tiles's, device-major order unchanged).
    from .shards import assemble_indexed

    out = assemble_indexed(everts, faces, counts, nedges, return_indexed)
    return out, pt
