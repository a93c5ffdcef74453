"""Multi-device sharded grid sampling + meshing.

TPU-native replacement for the reference's thread-pool fan-out
(ref sdf/core.py:114-141): the sample grid is sharded over a
``jax.sharding.Mesh`` along z-slabs, every device independently evaluates
its slab (SDF evaluation is pointwise, so there is *zero* communication in
the hot path -- the 1-sample halo plane each slab needs for marching cubes
is recomputed locally instead of exchanged, mirroring the reference's
+1-sample batch overlap, ref sdf/core.py:115-117), per-slab marching cubes
emits into fixed-capacity buffers, and only the final compacted INDEXED
mesh -- unique per-edge vertices + int32 faces, half the bytes of the
triangle soup (see mc.emit_indexed) -- is gathered to the host, where
each slab's soup is reconstructed bit-identically (the analog of the
reference's results-list merge, ref sdf/core.py:128-141).

Collectives used: one ``psum`` over the mesh for the per-tile triangle
statistics (the reference's skipped/empty/nonempty counters,
ref sdf/core.py:129-145).  Everything else is embarrassingly parallel.

Two jitted phases with one host sync for the output capacity, identical in
structure to the single-device path (see sdf_tpu.core.mc): count -> choose
capacity -> emit.  The evaluated volume stays device-resident (sharded)
between the phases.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import mc
from ..core.node import Points

AXIS = "grid"


def make_mesh(devices=None, axis_name=AXIS):
    """A 1D device mesh over the grid (z-slab) axis."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def _slab_eval(sdf, X, Y, Zblk, chunk_points):
    """Evaluate the SDF over one device's (nx, ny, len(Zblk)) slab.

    Chunked along z with ``lax.map`` to bound VMEM-resident working set,
    like the single-device engine.
    """
    nx, ny = X.shape[0], Y.shape[0]
    nzb = Zblk.shape[0]
    sz = max(1, min(nzb, -(-chunk_points // (nx * ny))))
    nchunks = -(-nzb // sz)
    pad = nchunks * sz - nzb
    Zp = jnp.concatenate([Zblk, jnp.full((pad,), Zblk[-1], Zblk.dtype)])

    def slab(zc):
        # SoA evaluation (see core.node.Points): no (N, 3) materialization.
        shape = (nx, ny, zc.shape[0])
        p = Points(X[:, None, None], Y[None, :, None], zc[None, None, :])
        return jnp.broadcast_to(sdf(p), shape)

    vols = jax.lax.map(slab, Zp.reshape(nchunks, sz))
    return jnp.moveaxis(vols, 0, 2).reshape(nx, ny, nchunks * sz)[:, :, :nzb]


def _local_cell_mask(keep_xy, c, ncz, tile, axis_name):
    """Per-device cell mask from the global (skip-expanded) xy tile mask.

    keep_xy: (ncx, ncy, n_z_tiles) bool -- True = tile kept, already
    expanded along x/y to cell resolution but still tile-indexed in z.
    Returns (ncx, ncy, c) bool for this device's z cell range, with padded
    cells (beyond the real grid) masked off.
    """
    dev = jax.lax.axis_index(axis_name)
    zcells = dev * c + jnp.arange(c, dtype=jnp.int32)
    ztile = jnp.clip(zcells // tile, 0, keep_xy.shape[2] - 1)
    mask = keep_xy[:, :, ztile]
    return mask & (zcells < ncz)[None, None, :]


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "c", "ncz", "tile", "n_z_tiles", "chunk_points", "use_pallas",
        "interpret", "variant",
    ),
)
def _phase_count(sdf, X, Y, Zs, keep_xy, mesh, c, ncz, tile, n_z_tiles,
                 chunk_points, use_pallas=False, interpret=False,
                 variant="default"):
    """Sharded phase 1: evaluate slabs, count triangles per cell.

    Returns ``(vol, case, emask, nedges, gmax_t, gmax_c, gmax_e,
    per_tile)``: the sharded evaluated volume (ndev, nx, ny, c+1) with
    its per-slab classification and edge mask (reused by phase 2),
    per-device edge counts (sized host readback), the replicated global
    maxima that pick the static emit capacities, and the global
    (tx, ty, tz) per-tile triangle counts (replicated via psum).
    """

    def body(X, Y, Zblk, keep_xy):
        Zblk = Zblk[0]
        if use_pallas:
            # Fused Pallas eval+classify per device slab.
            from ..core import pallas_eval

            vol, case = pallas_eval.eval_and_classify_traced(
                sdf, X, Y, Zblk, interpret=interpret
            )
            if variant != "default":
                # extend the kernel's 8-bit codes with the variant bits
                from ..core import mc33

                case = mc33.classify_ext(vol, base_case=case)
        else:
            vol = _slab_eval(sdf, X, Y, Zblk, chunk_points)
            case = mc.get_tables(variant).classify(vol)
        mask = _local_cell_mask(keep_xy, c, ncz, tile, AXIS)
        ntri = mc.ntri_of(case, variant) * mask.astype(jnp.int32)
        total = jnp.sum(ntri)
        ncell = jnp.sum((ntri > 0).astype(jnp.int32))

        # Global per-tile stats: bin local z cells into *global* z tiles
        # (slab boundaries do not align with 32-cell tiles), then psum.
        ncx, ncy = ntri.shape[0], ntri.shape[1]
        px, py = (-ncx) % tile, (-ncy) % tile
        padded = jnp.pad(ntri, ((0, px), (0, py), (0, 0)))
        tx, ty = (ncx + px) // tile, (ncy + py) // tile
        xy_tiled = padded.reshape(tx, tile, ty, tile, -1).sum(axis=(1, 3))
        dev = jax.lax.axis_index(AXIS)
        ztile = (dev * c + jnp.arange(c, dtype=jnp.int32)) // tile
        per_tile = jax.ops.segment_sum(
            jnp.moveaxis(xy_tiled, 2, 0), ztile, num_segments=n_z_tiles
        )
        per_tile = jnp.moveaxis(per_tile, 0, 2)
        per_tile = jax.lax.psum(per_tile, AXIS)
        # Per-slab active-edge mask + count for the indexed emit (one
        # vertex per unique crossing edge; see mc.emit_indexed).
        emask = mc._edge_mask(vol, ntri > 0)
        nedge = jnp.sum(emask.astype(jnp.int32))

        # Global maxima (replicated): every host must agree on the static
        # emit capacities without reading remote shards.
        gmax_t = jax.lax.pmax(total, AXIS)
        gmax_c = jax.lax.pmax(ncell, AXIS)
        gmax_e = jax.lax.pmax(nedge, AXIS)
        return (
            vol[None],
            case[None],
            emask[None],
            nedge[None],
            gmax_t,
            gmax_c,
            gmax_e,
            per_tile,
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(),
                   P(), P()),
        # pallas_call's out_shapes carry no vma annotation; psum/pmax
        # still make the replicated outputs genuinely replicated.
        check_vma=False,
    )(X, Y, Zs, keep_xy)


@partial(
    jax.jit,
    static_argnames=("mesh", "c", "ncz", "tile", "edge_capacity", "capacity",
                     "cell_capacity", "variant"),
)
def _phase_emit(vol, case, emask, keep_xy, mesh, c, ncz, tile, edge_capacity,
                capacity, cell_capacity, variant="default"):
    """Sharded phase 2: per-slab indexed marching cubes into fixed-size
    buffers.

    Returns (everts, faces, counts): everts (ndev, 3, edge_capacity)
    unique per-edge vertices with z already shifted to *global*
    fractional index space; faces (ndev, 3, capacity) slab-local int32
    vertex indices; counts (ndev,) valid triangle counts.  ``case`` and
    ``emask`` are phase 1's classification and edge mask, reused instead
    of recomputing over the resident slab.
    """

    def body(vol, case, emask, keep_xy):
        vol = vol[0]
        case = case[0]
        emask = emask[0]
        mask = _local_cell_mask(keep_xy, c, ncz, tile, AXIS)
        ntri = mc.ntri_of(case, variant) * mask.astype(jnp.int32)
        state = mc.compact_cells(case, (ntri > 0), cell_capacity, variant)
        dev = jax.lax.axis_index(AXIS)
        # Local slab cell 0 is global cell dev*c: the integer z shift
        # happens INSIDE emit (before the + t float add), so sharded
        # vertices are bit-identical to a single-device global run.
        everts, faces, n = mc.emit_indexed(
            vol, emask, state, edge_capacity, capacity, cell_capacity,
            z_offset=dev * c, variant=variant,
        )
        return everts[None], faces[None], n[None]

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS), P(AXIS)),
        # compact.indices_of/indices_and_ranktable_of are pallas_calls on
        # TPU, whose out_shapes carry no vma annotation -- same reason
        # as phase 1.
        check_vma=False,
    )(vol, case, emask, keep_xy)


def mesh_and_march(sdf_c, X, Y, Z, skip, tile, mesh, dtype,
                   chunk_points=2**22, use_pallas=False, interpret=False,
                   return_indexed=False, variant="default"):
    """Sharded volume eval + marching cubes over a device mesh.

    sdf_c: dtype-cast SDF expression pytree.  X/Y/Z: host float64 grid axis
    coordinates (np.arange semantics, ref sdf/core.py:110-112).  skip:
    (tx, ty, tz) bool per-tile skip mask (True = cull), from the
    reference-parity probe test.  Returns (verts, per_tile): verts is a
    host float64 (3*T, 3) array of vertices in fractional index
    coordinates; per_tile the global per-tile triangle counts.  With
    ``return_indexed=True`` the first element is instead the indexed mesh
    ``(everts (V, 3) float64, faces (T, 3) int32)`` -- the per-slab
    indexed outputs concatenated with vertex offsets, so vertices on
    slab-boundary planes stay duplicated (once per adjacent slab) but
    every vertex is referenced and the soup equals
    ``everts[faces.reshape(-1)]``.
    """
    ndev = mesh.devices.size
    nx, ny, nz = len(X), len(Y), len(Z)
    ncz = nz - 1
    c = -(-ncz // ndev)  # cells per device slab

    # Device i samples global z indices [i*c, i*c + c]: c+1 samples with a
    # 1-sample halo (recomputed, not exchanged).  Pad beyond the grid by
    # repeating the last sample; padded cells are masked off.
    zidx = np.minimum(
        np.arange(ndev)[:, None] * c + np.arange(c + 1)[None, :], nz - 1
    )
    Zs = Z[zidx]  # (ndev, c+1) host float64

    # Global cell-resolution xy mask, tile-indexed z (expanded on device).
    keep = ~skip  # (tx, ty, tz_tiles)
    ncx, ncy = nx - 1, ny - 1
    keep_xy = np.repeat(np.repeat(keep, tile, axis=0), tile, axis=1)[:ncx, :ncy]

    Xd = jnp.asarray(X, dtype=dtype)
    Yd = jnp.asarray(Y, dtype=dtype)
    Zsd = jnp.asarray(Zs, dtype=dtype)
    keep_d = jnp.asarray(keep_xy)

    vol, case, emask, nedges, gmax_t, gmax_c, gmax_e, per_tile = (
        _phase_count(
            sdf_c, Xd, Yd, Zsd, keep_d, mesh, c, ncz, tile,
            keep.shape[2], chunk_points, use_pallas, interpret, variant,
        )
    )
    # gmax_* are replicated (pmax over the mesh), so every host derives
    # identical static capacities without touching remote shards.
    nmax = int(gmax_t)

    if nmax == 0:
        v = np.zeros((0, 3), dtype=np.float64)
        out = (v, np.zeros((0, 3), np.int32)) if return_indexed else v
        return out, np.asarray(per_tile)

    capacity = mc.round_capacity(nmax)
    cell_capacity = mc.round_capacity(int(gmax_c))
    edge_capacity = mc.round_capacity(int(gmax_e))
    everts, faces, counts = _phase_emit(
        vol, case, emask, keep_d, mesh, c, ncz, tile, edge_capacity,
        capacity, cell_capacity, variant,
    )
    # Addressable-shard readback + assembly (shared with the sharded
    # sparse path; multi-host contract documented in parallel.shards).
    from .shards import assemble_indexed

    out = assemble_indexed(everts, faces, counts, nedges, return_indexed)
    return out, np.asarray(per_tile)
