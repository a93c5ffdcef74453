"""Triangle-mesh import and mesh -> SDF conversion (parity: ref sdf/mesh.py).

The reference converts meshes to SDFs through OpenVDB's C++ level-set
builder plus a scipy trilinear interpolator (ref sdf/mesh.py:64-113).  The
TPU-native replacement voxelizes on device with JAX:

  * unsigned distance: exact point-triangle distance (Ericson's algorithm),
    min-reduced over all triangles -- a large dense pairwise computation that
    maps perfectly onto the TPU's vector units, chunked with ``lax.map``,
  * sign: generalized winding number (sum of signed solid angles, Jacobson
    et al.), robust even for imperfectly closed meshes,
  * the band is clamped to +/- background exactly like an OpenVDB narrow-band
    level set, and queries outside the grid return ``background``.

The resulting SDF keeps the reference's evaluation structure: a cheap
bounding-``box`` estimator gates the trilinear grid interpolation
(ref sdf/mesh.py:102-105), and the sampled array/axes are exposed as
attributes on the eval function (ref sdf/mesh.py:107-111).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.node import as_param
from .shapes3 import box, sdf3


@partial(jax.jit, static_argnames=("chunks", "tchunks"))
def _mesh_distance_field(points, tri_a, tri_b, tri_c, chunks, tchunks=1):
    """Signed distances from query points to a triangle soup.

    points: (N, 3) query points (N divisible by chunks)
    tri_a/b/c: (T, 3) triangle vertices (T divisible by tchunks; pad with
    degenerate far-away triangles -- zero area contributes no winding)
    Returns (N,) signed distance (negative inside by winding number).

    Both axes are chunked: lax.map over point chunks and a fori_loop over
    triangle chunks carrying (running min dist^2, winding sum), so peak
    memory is (n_chunk x t_chunk) instead of (n_chunk x T) -- a 500k-
    triangle scan no longer OOMs.
    """
    ta_all = tri_a.reshape(tchunks, -1, 3)
    tb_all = tri_b.reshape(tchunks, -1, 3)
    tc_all = tri_c.reshape(tchunks, -1, 3)

    def one_chunk(p):
        n = p.shape[0]

        def tri_block(k, carry):
            best2, winding = carry
            a = ta_all[k][None, :, :]  # (1, tc, 3)
            b = tb_all[k][None, :, :]
            c = tc_all[k][None, :, :]
            q = p[:, None, :]  # (n, 1, 3)

            # --- exact point-triangle distance (Ericson, Real-Time Collision
            # Detection 5.1.5), vectorized over (n, T) pairs -----------------
            ab = b - a
            ac = c - a
            ap = q - a
            d1 = jnp.sum(ab * ap, -1)
            d2 = jnp.sum(ac * ap, -1)
            bp = q - b
            d3 = jnp.sum(ab * bp, -1)
            d4 = jnp.sum(ac * bp, -1)
            cp = q - c
            d5 = jnp.sum(ab * cp, -1)
            d6 = jnp.sum(ac * cp, -1)

            va = d3 * d6 - d5 * d4
            vb = d5 * d2 - d1 * d6
            vc = d1 * d4 - d3 * d2

            eps = jnp.asarray(1e-30, p.dtype)

            def safe_div(num, den):
                return num / jnp.where(jnp.abs(den) < eps, eps, den)

            # Region tests, resolved with nested where (branch-free for TPU).
            v_ab = jnp.clip(safe_div(d1, d1 - d3), 0.0, 1.0)
            v_ac = jnp.clip(safe_div(d2, d2 - d6), 0.0, 1.0)
            v_bc = jnp.clip(safe_div(d4 - d3, (d4 - d3) + (d5 - d6)), 0.0, 1.0)

            denom = safe_div(jnp.ones_like(va), va + vb + vc)
            v = vb * denom
            w = vc * denom

            closest_face = a + ab * v[..., None] + ac * w[..., None]
            closest_ab = a + ab * v_ab[..., None]
            closest_ac = a + ac * v_ac[..., None]
            closest_bc = b + (c - b) * v_bc[..., None]

            in_vert_a = (d1 <= 0) & (d2 <= 0)
            in_vert_b = (d3 >= 0) & (d4 <= d3)
            in_vert_c = (d6 >= 0) & (d5 <= d6)
            in_edge_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
            in_edge_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
            in_edge_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

            closest = closest_face
            closest = jnp.where(in_edge_bc[..., None], closest_bc, closest)
            closest = jnp.where(in_edge_ac[..., None], closest_ac, closest)
            closest = jnp.where(in_edge_ab[..., None], closest_ab, closest)
            closest = jnp.where(in_vert_c[..., None], c, closest)
            closest = jnp.where(in_vert_b[..., None], b, closest)
            closest = jnp.where(in_vert_a[..., None], a, closest)

            dist2 = jnp.sum((q - closest) ** 2, -1)  # (n, tc)
            best2 = jnp.minimum(best2, jnp.min(dist2, axis=1))

            # --- sign: generalized winding number (sum of solid angles) --
            ra = a - q
            rb = b - q
            rc = c - q
            la = jnp.linalg.norm(ra, axis=-1)
            lb = jnp.linalg.norm(rb, axis=-1)
            lc = jnp.linalg.norm(rc, axis=-1)
            det = jnp.sum(ra * jnp.cross(rb, rc), -1)
            dd = (
                la * lb * lc
                + jnp.sum(ra * rb, -1) * lc
                + jnp.sum(rb * rc, -1) * la
                + jnp.sum(rc * ra, -1) * lb
            )
            omega = 2.0 * jnp.arctan2(det, dd)  # (n, tc)
            winding = winding + jnp.sum(omega, axis=1)
            return best2, winding

        best2 = jnp.full((n,), jnp.inf, dtype=p.dtype)
        winding = jnp.zeros((n,), dtype=p.dtype)
        best2, winding = jax.lax.fori_loop(0, tchunks, tri_block, (best2, winding))
        dist = jnp.sqrt(best2)
        return jnp.where(winding / (4.0 * jnp.pi) > 0.5, -dist, dist)

    return jax.lax.map(one_chunk, points.reshape(chunks, -1, 3)).reshape(-1)


class Mesh:
    """A triangle mesh with affine positioning helpers (ref sdf/mesh.py:9-62)."""

    @classmethod
    def from_file(cls, path):
        from ..io import meshfmt

        points, triangles = meshfmt.read_mesh(path)
        return cls(points, triangles)

    def __init__(self, points, triangles):
        self.points = np.asarray(points, dtype=np.float64)
        self.triangles = np.asarray(triangles, dtype=np.int64)

    @property
    def size(self):
        a = self.points.min(axis=0)
        b = self.points.max(axis=0)
        return tuple((b - a).tolist())

    @property
    def bounding_box(self):
        a = tuple(self.points.min(axis=0).tolist())
        b = tuple(self.points.max(axis=0).tolist())
        return (a, b)

    def transformed(self, matrix):
        points = np.hstack([self.points, np.ones((self.points.shape[0], 1))])
        points = points @ np.array(matrix).T
        return Mesh(points[:, :3], self.triangles)

    def scaled(self, scale):
        try:
            sx, sy, sz = scale
        except TypeError:
            sx = sy = sz = scale
        matrix = [[sx, 0, 0, 0], [0, sy, 0, 0], [0, 0, sz, 0], [0, 0, 0, 1]]
        return self.transformed(matrix)

    def translated(self, offset):
        dx, dy, dz = offset
        matrix = [[1, 0, 0, dx], [0, 1, 0, dy], [0, 0, 1, dz], [0, 0, 0, 1]]
        return self.transformed(matrix)

    def positioned(self, position, anchor):
        a, b = map(np.array, self.bounding_box)
        p = a + (b - a) * anchor
        return self.translated(np.asarray(position) - p)

    def centered(self):
        return self.positioned((0, 0, 0), (0.5, 0.5, 0.5))

    @sdf3
    def sdf(self, voxel_size, half_width=None, chunk_points=2**15):
        a, b = self.bounding_box
        estimator = box(a=a, b=b)

        half_width_voxels = 3
        if half_width is not None:
            half_width_voxels = max(
                half_width_voxels, int(np.ceil(half_width / voxel_size))
            )
        background = half_width_voxels * voxel_size

        # Dense sample grid covering the mesh plus the narrow band.
        lo = np.floor((np.array(a) - background) / voxel_size).astype(int)
        hi = np.ceil((np.array(b) + background) / voxel_size).astype(int)
        size = hi - lo + 1
        X = (lo[0] + np.arange(size[0])) * voxel_size
        Y = (lo[1] + np.arange(size[1])) * voxel_size
        Z = (lo[2] + np.arange(size[2])) * voxel_size
        P = np.stack(np.meshgrid(X, Y, Z, indexing="ij"), axis=-1).reshape(-1, 3)

        n = len(P)
        chunks = max(1, -(-n // chunk_points))
        pad = chunks * chunk_points - n if chunks > 1 else 0
        if pad:
            P = np.concatenate([P, np.zeros((pad, 3))])
            chunks = len(P) // chunk_points

        tris = self.points[self.triangles]  # (T, 3, 3)
        # Triangle-axis chunking: bound the (points x triangles) pairwise
        # working set (~2^25 pairs), padding with degenerate far-away
        # triangles (zero area: no winding contribution).
        T = len(tris)
        tchunk = max(1, min(T, (1 << 25) // max(1, chunk_points)))
        tchunks = -(-T // tchunk)
        padT = tchunks * tchunk - T
        if padT:
            far = np.full((padT, 3, 3), 1e9, dtype=tris.dtype)
            tris = np.concatenate([tris, far])
        dist = _mesh_distance_field(
            jnp.asarray(P, dtype=jnp.float32),
            jnp.asarray(tris[:, 0], dtype=jnp.float32),
            jnp.asarray(tris[:, 1], dtype=jnp.float32),
            jnp.asarray(tris[:, 2], dtype=jnp.float32),
            chunks,
            tchunks,
        )
        A = np.asarray(dist, dtype=np.float32)[:n].reshape(tuple(size))
        A = np.clip(A, -background, background)  # narrow-band clamp (OpenVDB-like)

        origin = np.array([X[0], Y[0], Z[0]])
        params = {
            "grid": as_param(A),
            "origin": as_param(origin),
            "voxel": as_param(voxel_size),
            "background": as_param(background),
            "estimator": estimator,
        }

        from ..core.hybrid import mark_gather

        @mark_gather
        def fn(q, p):
            # Cheap box gate (ref sdf/mesh.py:102-105), then trilinear fetch.
            e = q["estimator"](p)
            d = _trilinear(q["grid"], (p - q["origin"]) / q["voxel"], q["background"])
            return jnp.where(e > q["background"], e, d)

        # Attribute fall-through contract (ref sdf/mesh.py:107-111).
        fn.array = A
        fn.xyz = (X, Y, Z)
        fn.background = background
        fn.estimator = estimator
        return fn, params


def _trilinear(grid, idx, fill):
    """Trilinear interpolation of ``grid`` at fractional indices ``idx``.

    Out-of-bounds queries return ``fill`` (scipy RegularGridInterpolator
    semantics with bounds_error=False, ref sdf/mesh.py:96-97).
    """
    nx, ny, nz = grid.shape
    ix, iy, iz = idx.c  # SoA: broadcastable component arrays
    inside = (
        (ix >= 0)
        & (ix <= nx - 1)
        & (iy >= 0)
        & (iy <= ny - 1)
        & (iz >= 0)
        & (iz <= nz - 1)
    )
    x0 = jnp.clip(jnp.floor(ix).astype(jnp.int32), 0, nx - 2)
    y0 = jnp.clip(jnp.floor(iy).astype(jnp.int32), 0, ny - 2)
    z0 = jnp.clip(jnp.floor(iz).astype(jnp.int32), 0, nz - 2)
    fx, fy, fz = ix - x0, iy - y0, iz - z0

    def g(dx, dy, dz):
        return grid[x0 + dx, y0 + dy, z0 + dz]

    c00 = g(0, 0, 0) * (1 - fx) + g(1, 0, 0) * fx
    c10 = g(0, 1, 0) * (1 - fx) + g(1, 1, 0) * fx
    c01 = g(0, 0, 1) * (1 - fx) + g(1, 0, 1) * fx
    c11 = g(0, 1, 1) * (1 - fx) + g(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    val = c0 * (1 - fz) + c1 * fz
    return jnp.where(inside, val, fill)
