"""On-device marching cubes (replaces skimage, ref sdf/core.py:16-18,54).

XLA needs static shapes, but marching cubes has a data-dependent output
size.  The pipeline therefore runs in two jitted phases with one host sync
in between (the idiomatic TPU pattern for compaction):

  * ``count``: per-cell case classification over the whole volume ->
    per-cell triangle counts (+ per-tile totals for the reference's
    skipped/empty/nonempty stats, ref sdf/core.py:129-145).
  * ``emit``: given a static capacity (rounded up to a power of two so the
    executable is reused across runs), gather the active cells, interpolate
    the crossing-edge vertices and write a fixed-size triangle buffer plus a
    validity count.

Vertices are produced in fractional index coordinates, exactly like
skimage's output, and mapped to world space by ``verts * step + origin``
(ref sdf/core.py:58-60).  Because the reference's batches overlap by one
sample plane, per-batch marching cubes over tiles is identical to one global
pass over the full volume -- so this kernel runs globally and keeps the
reference's tile semantics via masks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mc_tables import CORNER_OFFSETS, EDGE_CORNERS, NTRI_TABLE, TRI_TABLE

MAX_TRIS_PER_CELL = TRI_TABLE.shape[1]

# Flattened (case, tri, vertex) -> cube edge lookup, -1 padded.
_TRI_FLAT = TRI_TABLE.reshape(256, -1)  # (256, MAX_TRIS * 3)
_EDGE_A = EDGE_CORNERS[:, 0]
_EDGE_B = EDGE_CORNERS[:, 1]

# Everything that depends only on (case, slot-vertex) is precomputed into
# one (256, 8*NSV) table fetched with a single one-hot matmul on the MXU:
# per-element gathers / take_along_axis on NSV(=15)-wide arrays are
# lane-hostile on TPU (measured ~170ms of a 370ms emit); one
# (cells, 256) @ (256, 120) matmul is ~free.
_NSV = MAX_TRIS_PER_CELL * 3
_CA_TAB = _EDGE_A[np.maximum(_TRI_FLAT, 0)]  # (256, NSV) corner id a
_CB_TAB = _EDGE_B[np.maximum(_TRI_FLAT, 0)]
_PA_TAB = np.asarray(CORNER_OFFSETS)[_CA_TAB]  # (256, NSV, 3)
_PB_TAB = np.asarray(CORNER_OFFSETS)[_CB_TAB]
_CASE_PACK = np.concatenate(
    [
        _CA_TAB,
        _CB_TAB,
        _PA_TAB.reshape(256, -1),
        _PB_TAB.reshape(256, -1),
    ],
    axis=1,
).astype(np.float32)  # (256, 8 * NSV)


def _cell_cases(volume, level=0.0):
    """Case index per cell: bit c set iff corner c is inside (< level)."""
    nx, ny, nz = volume.shape
    case = jnp.zeros((nx - 1, ny - 1, nz - 1), dtype=jnp.int32)
    for c, (ox, oy, oz) in enumerate(np.asarray(CORNER_OFFSETS)):
        corner = volume[ox : nx - 1 + ox, oy : ny - 1 + oy, oz : nz - 1 + oz]
        case = case | (jnp.int32(1 << c) * (corner < level).astype(jnp.int32))
    return case


@partial(jax.jit, static_argnames=("tile",))
def count(volume, cell_mask, tile, case=None):
    """Phase 1: per-cell triangle counts and per-tile totals.

    ``cell_mask`` zeroes cells culled by sparse tile skipping (the
    reference's ``_skip``, ref sdf/core.py:28-43).  ``tile`` is the cell
    tile size (reference ``batch_size``, default 32).

    Returns (total_triangles, per_tile_triangle_counts, active_cells,
    case_codes); pass ``case_codes`` back into ``emit`` to skip
    reclassification.  ``case=`` accepts precomputed codes (e.g. from the
    fused Pallas eval+classify kernel).
    """
    if case is None:
        case = _cell_cases(volume)
    ntri = jnp.asarray(NTRI_TABLE)[case] * cell_mask.astype(jnp.int32)
    cx, cy, cz = ntri.shape
    # Pad cells up to tile multiples, then reduce per tile.
    px, py, pz = (-cx) % tile, (-cy) % tile, (-cz) % tile
    padded = jnp.pad(ntri, ((0, px), (0, py), (0, pz)))
    tx, ty, tz = (cx + px) // tile, (cy + py) // tile, (cz + pz) // tile
    per_tile = padded.reshape(tx, tile, ty, tile, tz, tile).sum(axis=(1, 3, 5))
    return jnp.sum(ntri), per_tile, jnp.sum((ntri > 0).astype(jnp.int32)), case


@partial(jax.jit, static_argnames=("capacity", "cell_capacity"))
def emit(volume, cell_mask, capacity, cell_capacity=None, case=None):
    """Phase 2: triangle soup with a static ``capacity``.

    Returns ``(verts, n_tris)`` where ``verts`` is ``(capacity, 3, 3)`` in
    fractional index coordinates; rows ``[0:n_tris]`` are valid.

    Two-level compaction: ``flatnonzero`` on TPU is sort-based, so
    compacting at (cell, slot) granularity costs O(5 * ncells log) -- the
    dominant emit cost (measured 180ms of a 370ms emit at 20M slots).
    Instead compact *cells* first (ncells bools), run the slot/table/
    interpolation work only on the <= ``cell_capacity`` surviving cells,
    then compact their <= 5x slots (a tiny second pass).  Triangle order
    is unchanged: ascending (cell, slot), exactly the reference's
    batch-then-cell order.
    """
    if cell_capacity is None:
        # n_active_cells <= n_triangles, so the triangle capacity is a
        # safe (if generous) bound.
        cell_capacity = capacity
    if case is None:
        case = _cell_cases(volume)
    ntri = jnp.asarray(NTRI_TABLE)[case] * cell_mask.astype(jnp.int32)
    cshape = case.shape

    # --- level 1: compact active cells --------------------------------
    active = (ntri > 0).reshape(-1)
    cell_idx = jnp.flatnonzero(active, size=cell_capacity, fill_value=0)
    n_cells = jnp.sum(active.astype(jnp.int32))
    cell_live = jnp.arange(cell_capacity) < n_cells

    ci, cj, ck = jnp.unravel_index(cell_idx, cshape)
    cell_case = case.reshape(-1)[cell_idx]
    cell_ntri = jnp.where(cell_live, ntri.reshape(-1)[cell_idx], 0)

    # Gather the 8 corner values of each active cell.
    nx, ny, nz = volume.shape
    vflat = volume.reshape(-1)
    corner_vals = []
    for ox, oy, oz in np.asarray(CORNER_OFFSETS):
        lin = ((ci + ox) * ny + (cj + oy)) * nz + (ck + oz)
        corner_vals.append(vflat[lin])
    corner_vals = jnp.stack(corner_vals, axis=-1)  # (cell_capacity, 8)

    # All MAX_TRIS_PER_CELL slots per active cell, vectorized.  Per-case
    # data (edge endpoints + their corner offsets) arrives via ONE one-hot
    # matmul against the packed table (MXU) instead of per-element gathers.
    onehot = jax.nn.one_hot(cell_case, 256, dtype=volume.dtype)
    packed = jnp.dot(
        onehot,
        jnp.asarray(_CASE_PACK, dtype=volume.dtype),
        preferred_element_type=volume.dtype,
    )  # (cell_capacity, 8 * NSV)
    ca = packed[:, 0:_NSV]
    cb = packed[:, _NSV : 2 * _NSV]
    pa = packed[:, 2 * _NSV : 5 * _NSV].reshape(cell_capacity, _NSV, 3)
    pb = packed[:, 5 * _NSV : 8 * _NSV].reshape(cell_capacity, _NSV, 3)

    # Corner values by 8-way elementwise select (branch-free, fused).
    va = sum((ca == c) * corner_vals[:, c][:, None] for c in range(8))
    vb = sum((cb == c) * corner_vals[:, c][:, None] for c in range(8))
    denom = va - vb
    t = va / jnp.where(denom == 0, 1.0, denom)  # zero crossing, level = 0
    t = jnp.clip(t, 0.0, 1.0)

    base_pos = jnp.stack([ci, cj, ck], axis=-1).astype(volume.dtype)
    verts = base_pos[:, None, :] + pa + t[..., None] * (pb - pa)
    verts = verts.reshape(cell_capacity, MAX_TRIS_PER_CELL, 3, 3)

    # --- level 2: compact live slots (small: cell_capacity * 5) -------
    slot_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (cell_capacity, MAX_TRIS_PER_CELL), 1)
        < cell_ntri[:, None]
    ).reshape(-1)
    tri_idx = jnp.flatnonzero(slot_valid, size=capacity, fill_value=0)
    n_tris = jnp.sum(slot_valid.astype(jnp.int32))
    out = verts.reshape(-1, 3, 3)[tri_idx]
    return out, n_tris
