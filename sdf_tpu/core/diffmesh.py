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


@partial(jax.jit, static_argnames=("capacity", "shape"))
def _extract(node, grid01, origin, step, capacity, shape):
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
    case = mc._cell_cases(vol)
    total = jnp.sum(jnp.asarray(mc.NTRI_TABLE)[case])
    verts9, n = mc.emit(vol, keep, capacity, case=case)  # (9, capacity) SoA
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


def extract(node, bounds, resolution=64, capacity=None, dtype=jnp.float32):
    """Differentiable triangle extraction on a fixed grid.

    node: dtype-cast SDF expression.  bounds: ((x0,y0,z0),(x1,y1,z1)).
    resolution: samples per axis (int or 3-tuple).  capacity: static
    triangle buffer size (default: 4 * resolution^2, plenty for smooth
    surfaces at the given resolution).

    Returns (verts, n, valid): verts (capacity, 3, 3) world-space triangle
    vertices -- differentiable w.r.t. ``node``'s parameters -- with rows
    where ``valid`` is False being garbage to mask out of any loss.
    ``n`` is the TRUE triangle total of the surface; overflow is
    observable as ``n > capacity`` (only ``capacity`` triangles are kept,
    ``valid`` flags them, and a warning fires via ``jax.debug.callback``).
    """
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
    # Unit index grids (static shape); world coords formed inside jit so
    # origin/step stay differentiable inputs.
    grid01 = (
        jnp.arange(rx, dtype=dtype),
        jnp.arange(ry, dtype=dtype),
        jnp.arange(rz, dtype=dtype),
    )
    return _extract(node, grid01, origin, step, capacity, (rx, ry, rz))


def mean_vertex(node, bounds, resolution=64, capacity=None, dtype=jnp.float32):
    """Mass-center of the extracted surface (a simple differentiable probe)."""
    verts, n, valid = extract(node, bounds, resolution, capacity, dtype)
    w = valid.astype(verts.dtype)[:, None, None]
    kept = jnp.sum(valid)  # n can exceed capacity under overflow
    return jnp.sum(verts * w, axis=(0, 1)) / jnp.maximum(3.0 * kept, 1.0)
