"""Sparse tiled evaluation: evaluate only tiles the coarse cull kept.

The dense engine evaluates every grid sample and uses the probe-based
skip mask (ref sdf/core.py:28-43) only to mask marching-cubes cells.
This module completes the reference's sparsity story on device
(SURVEY.md section 7 step 4): the skip mask selects *active*
batch_size^3-cell tiles, their (+1-halo-sample -- the reference's batch overlap)
volumes are evaluated in one vmapped pass, and marching cubes runs
tile-locally -- work scales with surface area instead of grid volume.

Triangle order is (tile, cell) ascending with tiles in x-major order --
exactly the reference's batch-then-cell order (its batches iterate the
same product order, ref sdf/core.py:114-119).

Enable with ``generate(..., sparse="tiles")``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import compact
from .mc_tables import CORNER_OFFSETS, NTRI_TABLE
from .mc import MAX_TRIS_PER_CELL, interpolate_slots, round_capacity
from .node import Points


@partial(jax.jit, static_argnames=("ntc", "chunk", "tile"))
def _eval_tiles(sdf, X, Y, Z, tiles, ntc, chunk, tile):
    """Evaluate (ntc, tile+1, tile+1, tile+1) tile volumes.

    tiles: (ntc, 3) int32 tile indices (padded rows repeat tile 0 and are
    masked downstream).  Edge tiles clip their sample indices to the grid
    (the repeated boundary samples belong to cells masked as out-of-grid).
    """
    TS = tile + 1
    nx, ny, nz = X.shape[0], Y.shape[0], Z.shape[0]
    ar = jnp.arange(TS)

    def tile_vol(t):
        x = X[jnp.clip(t[0] * tile + ar, 0, nx - 1)]
        y = Y[jnp.clip(t[1] * tile + ar, 0, ny - 1)]
        z = Z[jnp.clip(t[2] * tile + ar, 0, nz - 1)]
        p = Points(x[:, None, None], y[None, :, None], z[None, None, :])
        return jnp.broadcast_to(sdf(p), (TS, TS, TS))

    return jax.lax.map(tile_vol, tiles, batch_size=min(chunk, ntc))


def _tile_cases(vols, tile):
    """Case codes for every tile-local cell: (ntc, tile, tile, tile)."""
    case = jnp.zeros((vols.shape[0], tile, tile, tile), dtype=jnp.int32)
    for b, (ox, oy, oz) in enumerate(np.asarray(CORNER_OFFSETS)):
        corner = vols[:, ox : tile + ox, oy : tile + oy, oz : tile + oz]
        case = case | ((corner < 0).astype(jnp.int32) << b)
    return case


def _cell_valid(tiles, live, cshape, tile):
    """(ntc, tile^3) mask: cell inside the global grid + live tile."""
    ncx, ncy, ncz = cshape
    ar = jnp.arange(tile)
    gx = tiles[:, 0, None] * tile + ar[None, :]  # (ntc, tile)
    gy = tiles[:, 1, None] * tile + ar[None, :]
    gz = tiles[:, 2, None] * tile + ar[None, :]
    m = (
        (gx < ncx)[:, :, None, None]
        & (gy < ncy)[:, None, :, None]
        & (gz < ncz)[:, None, None, :]
    )
    return m & live[:, None, None, None]


@partial(jax.jit, static_argnames=("cshape", "tile"))
def _count_tiles(vols, tiles, live, cshape, tile, case=None):
    if case is None:
        case = _tile_cases(vols, tile)
    valid = _cell_valid(tiles, live, cshape, tile)
    ntri = jnp.asarray(NTRI_TABLE)[case] * valid.astype(jnp.int32)
    per_tile = ntri.sum(axis=(1, 2, 3))
    ncell = jnp.sum((ntri > 0).astype(jnp.int32))
    return jnp.sum(ntri), per_tile, ncell, case


@partial(
    jax.jit, static_argnames=("cshape", "capacity", "cell_capacity", "tile")
)
def _emit_tiles(vols, tiles, live, case, cshape, capacity, cell_capacity, tile):
    """Tile-local marching cubes -> (9, capacity) SoA triangles + count.

    Same 1D-SoA layout discipline as mc.emit (interpolation shared via
    mc.interpolate_slots); the only difference is that cell base
    coordinates come from ``tiles[t] * tile + local`` instead of a dense
    unravel.
    """
    TS = tile + 1
    valid = _cell_valid(tiles, live, cshape, tile)
    ntri = jnp.asarray(NTRI_TABLE)[case] * valid.astype(jnp.int32)

    active = (ntri > 0).reshape(-1)
    cell_idx = compact.indices_of(active, cell_capacity)
    n_cells = jnp.sum(active.astype(jnp.int32))
    cell_live = jnp.arange(cell_capacity) < n_cells

    t_of = cell_idx // (tile * tile * tile)
    local = cell_idx % (tile * tile * tile)
    li, rem = local // (tile * tile), local % (tile * tile)
    lj, lk = rem // tile, rem % tile

    cell_case = case.reshape(-1)[cell_idx]
    cell_ntri = jnp.where(cell_live, ntri.reshape(-1)[cell_idx], 0)

    vflat = vols.reshape(-1)
    corner = []
    for ox, oy, oz in np.asarray(CORNER_OFFSETS):
        lin = ((t_of * TS + li + ox) * TS + (lj + oy)) * TS + (lk + oz)
        corner.append(vflat[lin])
    dt = vols.dtype
    base = (
        (tiles[:, 0][t_of] * tile + li).astype(dt),
        (tiles[:, 1][t_of] * tile + lj).astype(dt),
        (tiles[:, 2][t_of] * tile + lk).astype(dt),
    )
    return interpolate_slots(
        corner, base, cell_case, cell_ntri, capacity, cell_capacity
    )


@partial(jax.jit, static_argnames=("ntc", "tile", "interpret"))
def _eval_tiles_pallas(sdf, Xp, Yp, Zp, tiles, ntc, tile, interpret):
    """Fused Pallas per-tile eval + classify (see pallas_eval)."""
    from . import pallas_eval

    return pallas_eval.eval_tiles_and_classify(
        sdf, Xp, Yp, Zp, tiles, ntc, tile, interpret=interpret
    )


def mesh_sparse_tiles(sdf_c, X, Y, Z, skip, tile, dtype, chunk_tiles=128,
                      use_pallas=False, interpret=False):
    """Tiled sparse pipeline: eval + marching cubes on active tiles only.

    Returns (verts (3T, 3) float64 in fractional index coords,
    per_tile_counts (tx, ty, tz)).  ``skip`` is the probe-cull mask from
    the engine (True = culled) at ``tile`` (= engine batch_size) cells
    per tile per axis.  ``use_pallas=True`` fuses per-tile evaluation and
    cell classification into one Pallas kernel (raises if the expression
    does not lower; the engine handles fallback).
    """
    nx, ny, nz = len(X), len(Y), len(Z)
    cshape = (nx - 1, ny - 1, nz - 1)

    keep = ~skip
    active = np.argwhere(keep)  # (nt, 3) host, x-major order
    nt = len(active)
    if nt == 0:
        return np.zeros((0, 3), dtype=np.float64), np.zeros(
            skip.shape, dtype=np.int64
        )
    ntc = round_capacity(nt)
    tiles = np.zeros((ntc, 3), dtype=np.int32)
    tiles[:nt] = active
    live = np.zeros((ntc,), dtype=bool)
    live[:nt] = True

    Xd = jnp.asarray(X, dtype=dtype)
    Yd = jnp.asarray(Y, dtype=dtype)
    Zd = jnp.asarray(Z, dtype=dtype)
    tiles_d = jnp.asarray(tiles)
    live_d = jnp.asarray(live)

    if use_pallas:
        # Edge tiles read one tile past the end: pad each axis with its
        # last coordinate (the same samples _eval_tiles's index clamping
        # produces; the repeated-sample cells are masked downstream).
        def padf(A):
            return jnp.concatenate(
                [A, jnp.full((tile,), A[-1], dtype=A.dtype)]
            )

        vols, case = _eval_tiles_pallas(
            sdf_c, padf(Xd), padf(Yd), padf(Zd), tiles_d, ntc, tile,
            interpret,
        )
        total, per_tile, ncell, case = _count_tiles(
            vols, tiles_d, live_d, cshape, tile, case
        )
    else:
        vols = _eval_tiles(sdf_c, Xd, Yd, Zd, tiles_d, ntc, chunk_tiles, tile)
        total, per_tile, ncell, case = _count_tiles(
            vols, tiles_d, live_d, cshape, tile
        )
    n = int(total)

    pt = np.zeros(skip.shape, dtype=np.int64)
    per_tile_np = np.asarray(per_tile)[:nt]
    pt[tuple(active.T)] = per_tile_np

    if n == 0:
        return np.zeros((0, 3), dtype=np.float64), pt

    capacity = round_capacity(n)
    cell_capacity = round_capacity(int(ncell))
    verts9, n_tris = _emit_tiles(
        vols, tiles_d, live_d, case, cshape, capacity, cell_capacity, tile
    )
    n = int(n_tris)
    verts = np.asarray(verts9[:, :n], dtype=np.float64).T.reshape(-1, 3)
    return verts, pt
