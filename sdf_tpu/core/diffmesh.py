"""Differentiable surface extraction: gradients through marching cubes.

The reference cannot do this at all (numpy closures + Cython skimage are
opaque).  Here the whole chain

    shape params -> grid values -> edge-interpolated vertex positions

is pure JAX: ``mc.emit``'s vertex interpolation is a gather + lerp of grid
values, so ``jax.grad`` differentiates triangle vertices w.r.t. every shape
parameter (radii, transforms, blend k) automatically.  The discrete parts
(cell case codes, triangle topology) are integer-valued and act as
constants under differentiation -- the standard fixed-topology treatment
from the differentiable marching cubes literature (topology changes are
measure-zero events; see PAPERS.md).

Typical use: a mesh-space loss (chamfer to a target scan, area, silhouette)
optimized directly over CSG parameters via ``extract`` + ``jax.grad``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import mc
from .node import Points


def _warn_overflow(total, capacity):
    import warnings

    warnings.warn(
        "diffmesh.extract: surface has %d triangles but capacity=%d; "
        "extra triangles were dropped -- raise capacity=" % (int(total), capacity)
    )


@partial(jax.jit, static_argnames=("capacity", "shape", "variant"))
def _extract(node, grid01, origin, step, capacity, shape, variant):
    nx, ny, nz = shape
    X = origin[0] + step[0] * grid01[0][:nx]
    Y = origin[1] + step[1] * grid01[1][:ny]
    Z = origin[2] + step[2] * grid01[2][:nz]
    p = Points(X[:, None, None], Y[None, :, None], Z[None, None, :])
    vol = jnp.broadcast_to(node(p), shape)
    keep = jnp.ones((nx - 1, ny - 1, nz - 1), dtype=bool)
    # True triangle total (independent of the static buffers): overflow
    # must be observable, not silently clamped -- a fitting loss seeing a
    # truncated surface is a silent wrong-gradient bug.
    case = mc.get_tables(variant).classify(vol)
    total = jnp.sum(mc.ntri_of(case, variant))
    verts9, n = mc.emit(
        vol, keep, capacity, case=case, variant=variant
    )  # (9, capacity) SoA
    kept = jnp.minimum(jnp.minimum(n, total), capacity)
    jax.lax.cond(
        total > capacity,
        lambda t: jax.debug.callback(_warn_overflow, t, capacity),
        lambda t: None,
        total,
    )
    sc = jnp.tile(step, 3)[:, None]
    org = jnp.tile(origin, 3)[:, None]
    world9 = verts9 * sc + org
    world = world9.T.reshape(capacity, 3, 3)
    valid = jnp.arange(capacity) < kept
    return world, total, valid


def extract(node, bounds, resolution=64, capacity=None, dtype=jnp.float32,
            variant="lewiner"):
    """Differentiable triangle extraction on a fixed grid.

    node: dtype-cast SDF expression.  bounds: ((x0,y0,z0),(x1,y1,z1)).
    resolution: samples per axis (int or 3-tuple).  capacity: static
    triangle buffer size (default: 4 * resolution^2, plenty for smooth
    surfaces at the given resolution).  variant: marching-cubes topology
    rule, same names/default as ``generate(mc_variant=)`` -- "lewiner"
    (reference-parity, the default: gradients flow through tunnel cells'
    edge-lerped vertices too, with the per-cell topology held constant
    under differentiation exactly like the base tables) or "fast".

    Returns (verts, n, valid): verts (capacity, 3, 3) world-space triangle
    vertices -- differentiable w.r.t. ``node``'s parameters -- with rows
    where ``valid`` is False being garbage to mask out of any loss.
    ``n`` is the TRUE triangle total of the surface; overflow is
    observable as ``n > capacity`` (only ``capacity`` triangles are kept,
    ``valid`` flags them, and a warning fires via ``jax.debug.callback``).
    """
    variant = mc.get_tables(variant).name  # normalize "fast" et al.
    (rx, ry, rz), capacity, origin, step = _resolve(
        bounds, resolution, capacity, dtype
    )
    # Unit index grids (static shape); world coords formed inside jit so
    # origin/step stay differentiable inputs.
    grid01 = (
        jnp.arange(rx, dtype=dtype),
        jnp.arange(ry, dtype=dtype),
        jnp.arange(rz, dtype=dtype),
    )
    return _extract(
        node, grid01, origin, step, capacity, (rx, ry, rz), variant
    )


def _resolve(bounds, resolution, capacity, dtype):
    try:
        rx, ry, rz = resolution
    except TypeError:
        rx = ry = rz = resolution
    (x0, y0, z0), (x1, y1, z1) = bounds
    if capacity is None:
        capacity = 4 * max(rx, ry, rz) ** 2
    origin = jnp.asarray([x0, y0, z0], dtype=dtype)
    step = jnp.asarray(
        [(x1 - x0) / (rx - 1), (y1 - y0) / (ry - 1), (z1 - z0) / (rz - 1)],
        dtype=dtype,
    )
    return (rx, ry, rz), capacity, origin, step


def extract_sharded(node, bounds, resolution=64, capacity=None,
                    dtype=jnp.float32, mesh=None, axis_name="grid",
                    variant="lewiner"):
    """Differentiable extraction sharded over a device mesh.

    The sample grid's z cells are split into per-device slabs (with the
    usual 1-sample recomputed halo, like parallel.grid); every device
    runs marching cubes on its slab into a fixed per-device buffer.
    Because the whole thing is one ``shard_map`` of pure JAX ops,
    ``jax.grad`` flows through it -- the backward pass psums parameter
    gradients over the mesh automatically, so multi-device fitting works
    exactly like the single-device path.

    Returns (verts, n, valid) with verts (ndev * cap_d, 3, 3); ``n`` is
    the TRUE global triangle total (overflow observable as
    ``n > ndev * cap_d``, per-device overflow as dropped rows in that
    device's segment of ``valid``).
    """
    from jax.sharding import PartitionSpec as P

    variant = mc.get_tables(variant).name
    if mesh is None:
        from ..parallel import grid as pgrid

        mesh = pgrid.make_mesh()
    ndev = mesh.devices.size
    (rx, ry, rz), capacity, origin, step = _resolve(
        bounds, resolution, capacity, dtype
    )
    # Every device gets the FULL capacity: z-slab triangle counts are
    # highly imbalanced (an equatorial slab of a sphere holds many times
    # the polar count), so splitting capacity/ndev would overflow
    # per-device buffers that are globally far from full.  Total buffer
    # is ndev * capacity rows; fitting-scale grids keep this tiny.
    cap_d = capacity
    c = -(-(rz - 1) // ndev)  # z cells per device

    # Per-device z sample indices (c+1 with halo), clamped to the grid.
    zidx = np.minimum(
        np.arange(ndev)[:, None] * c + np.arange(c + 1)[None, :], rz - 1
    ).astype(np.int32)
    grid01 = (
        jnp.arange(rx, dtype=dtype),
        jnp.arange(ry, dtype=dtype),
        jnp.asarray(zidx, dtype=dtype),  # (ndev, c+1) fractional indices
    )

    def body(gx, gy, gz, origin, step):
        gz = gz[0]  # (c+1,)
        X = origin[0] + step[0] * gx
        Y = origin[1] + step[1] * gy
        Z = origin[2] + step[2] * gz
        p = Points(X[:, None, None], Y[None, :, None], Z[None, None, :])
        vol = jnp.broadcast_to(node(p), (rx, ry, c + 1))
        dev = jax.lax.axis_index(axis_name)
        zc = dev * c + jnp.arange(c, dtype=jnp.int32)
        keep = jnp.broadcast_to(
            (zc < rz - 1)[None, None, :], (rx - 1, ry - 1, c)
        )
        case = mc.get_tables(variant).classify(vol)
        total = jnp.sum(
            mc.ntri_of(case, variant) * keep.astype(jnp.int32)
        )
        verts9, nn = mc.emit(vol, keep, cap_d, case=case, variant=variant)
        verts9 = verts9.at[jnp.array([2, 5, 8]), :].add(
            (dev * c).astype(verts9.dtype)
        )
        kept = jnp.minimum(jnp.minimum(nn, total), cap_d)
        gtotal = jax.lax.psum(total, axis_name)
        return verts9[None], kept[None], gtotal

    verts9, kept, gtotal = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(), P()),
        out_specs=(P(axis_name), P(axis_name), P()),
        # the Pallas compaction inside mc.emit carries no vma annotation;
        # the psum still makes gtotal genuinely replicated
        check_vma=False,
    )(grid01[0], grid01[1], grid01[2], origin, step)

    sc = jnp.tile(step, 3)[None, :, None]
    org = jnp.tile(origin, 3)[None, :, None]
    world = (verts9 * sc + org).transpose(0, 2, 1).reshape(-1, 3, 3)
    valid = (
        jnp.arange(cap_d)[None, :] < kept[:, None]
    ).reshape(-1)
    return world, gtotal, valid


def mean_vertex(node, bounds, resolution=64, capacity=None, dtype=jnp.float32,
                variant="lewiner"):
    """Mass-center of the extracted surface (a simple differentiable probe)."""
    verts, n, valid = extract(node, bounds, resolution, capacity, dtype, variant)
    w = valid.astype(verts.dtype)[:, None, None]
    kept = jnp.sum(valid)  # n can exceed capacity under overflow
    return jnp.sum(verts * w, axis=(0, 1)) / jnp.maximum(3.0 * kept, 1.0)
