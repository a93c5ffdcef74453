"""Gradients through marching cubes vs. finite differences."""

import jax
import jax.numpy as jnp
import numpy as np

from sdf_tpu.core import diffmesh
from sdf_tpu.core.node import cast
from sdf_tpu.models.zoo import sphere

BOUNDS = ((-1.6, -1.6, -1.6), (1.6, 1.6, 1.6))


def _mean_radius(radius, res=24):
    node = cast(sphere(1.0), jnp.float64)
    node = jax.tree_util.tree_map(
        lambda x: jnp.where(np.asarray(x).size == 1, radius, x)
        if np.asarray(x).size == 1
        else x,
        node,
    )
    verts, n, valid = diffmesh.extract(node, BOUNDS, res, dtype=jnp.float64)
    w = valid.astype(verts.dtype)[:, None, None]
    r = jnp.sqrt(jnp.sum(verts**2, axis=-1))
    return jnp.sum(r * w[..., 0]) / jnp.maximum(3.0 * n, 1.0)


def test_extract_vertices_on_surface():
    node = cast(sphere(1.0), jnp.float64)
    verts, n, valid = diffmesh.extract(node, BOUNDS, 32, dtype=jnp.float64)
    v = np.asarray(verts)[np.asarray(valid)]
    assert int(n) > 0
    radii = np.linalg.norm(v.reshape(-1, 3), axis=1)
    np.testing.assert_allclose(radii, 1.0, atol=5e-3)


def test_grad_matches_finite_difference():
    # d(mean vertex radius)/d(sphere radius) should be ~1 and match FD.
    g = jax.grad(_mean_radius)(jnp.float64(1.0))
    eps = 1e-5
    fd = (_mean_radius(jnp.float64(1.0 + eps)) - _mean_radius(jnp.float64(1.0 - eps))) / (
        2 * eps
    )
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)
    np.testing.assert_allclose(float(g), 1.0, atol=5e-2)


def test_grad_through_csg_params():
    # Gradient flows through a smooth-union expression to both children.
    from sdf_tpu.models.zoo import box

    def loss(node):
        verts, n, valid = diffmesh.extract(
            node, BOUNDS, 20, dtype=jnp.float64
        )
        w = valid.astype(verts.dtype)[:, None, None]
        return jnp.sum(verts**2 * w) / jnp.maximum(3.0 * n, 1.0)

    node = cast(sphere(1.0).union(box(0.8), k=0.2), jnp.float64)
    grads = jax.grad(loss)(node)
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(grads)]
    assert any(np.any(l != 0) for l in leaves)
    assert all(np.all(np.isfinite(l)) for l in leaves)


def test_gradient_and_normal_api():
    f = sphere(1.0)
    rng = np.random.RandomState(5)
    p = rng.normal(size=(256, 3))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    p *= rng.uniform(0.5, 1.5, (256, 1))
    g = np.asarray(f.gradient(p, dtype=jnp.float64))
    # gradient of a sphere SDF is the unit radial direction
    np.testing.assert_allclose(
        g, p / np.linalg.norm(p, axis=1, keepdims=True), atol=1e-9
    )
    n = np.asarray(f.normal(p, dtype=jnp.float64))
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-12)


def test_grad_through_lewiner_tunnel_cell():
    """Gradients flow through a lewiner-variant TUNNEL cell: the 6-tube
    triangulation's edge-lerped vertices differentiate w.r.t. a level
    shift of the volume, matching finite differences (the tunnel
    topology is locally constant, so FD is well-defined)."""
    from sdf_tpu.core import mc
    from sdf_tpu.core import mc33_build as mb

    rng = np.random.default_rng(5)
    v = None
    for _ in range(200):
        cand = mb.sample_realizations(65, 500, rng)
        hit = np.flatnonzero(mb.interior_bits(cand) == 1)
        if len(hit):
            v = cand[hit[0]]
            break
    assert v is not None, "no case-65 tunnel realization found"
    vol0 = np.zeros((2, 2, 2))
    for ci, (ox, oy, oz) in enumerate(np.asarray(mb.CORNER_OFFSETS)):
        vol0[ox, oy, oz] = v[ci]
    vol0 = jnp.asarray(vol0, jnp.float64)
    mask = jnp.ones((1, 1, 1), dtype=bool)

    verts9, n = mc.emit(vol0, mask, 8, variant="lewiner")
    assert int(n) == 6  # the tube, not the default variant's 2 caps

    def loss(theta):
        verts9, _ = mc.emit(vol0 - theta, mask, 8, variant="lewiner")
        w = (jnp.arange(8) < 6).astype(verts9.dtype)
        return jnp.sum(verts9 * w[None, :])

    g = jax.grad(loss)(jnp.float64(0.0))
    eps = 1e-6
    fd = (loss(jnp.float64(eps)) - loss(jnp.float64(-eps))) / (2 * eps)
    assert np.isfinite(float(g)) and abs(float(g)) > 1e-9
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


def test_extract_variant_threads_through():
    """extract(variant=) accepts the generate() names ("lewiner" default,
    "fast", legacy "default") and gradients flow under the lewiner
    variant (sphere: no ambiguous cells, so the variants' meshes agree
    -- this pins the plumbing, the tunnel test above pins the math)."""
    node = cast(sphere(1.0), jnp.float64)
    v_lew, n_lew, ok_lew = diffmesh.extract(
        node, BOUNDS, 24, dtype=jnp.float64, variant="lewiner"
    )
    v_fast, n_fast, ok_fast = diffmesh.extract(
        node, BOUNDS, 24, dtype=jnp.float64, variant="fast"
    )
    assert int(n_lew) == int(n_fast)
    np.testing.assert_array_equal(
        np.asarray(v_lew)[np.asarray(ok_lew)],
        np.asarray(v_fast)[np.asarray(ok_fast)],
    )

    g = jax.grad(_mean_radius)(jnp.float64(1.0))  # default is now lewiner
    np.testing.assert_allclose(float(g), 1.0, atol=5e-2)


def test_extract_overflow_is_observable():
    # With a deliberately tiny capacity, n reports the TRUE triangle
    # total (> capacity) instead of silently clamping, and exactly
    # `capacity` triangles are kept.
    import warnings

    node = cast(sphere(1.0), jnp.float64)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        verts, n, valid = diffmesh.extract(
            node, BOUNDS, 32, capacity=64, dtype=jnp.float64
        )
        n = int(n)
        kept = int(np.asarray(valid).sum())
    full_n = int(diffmesh.extract(node, BOUNDS, 32, dtype=jnp.float64)[1])
    assert n == full_n and n > 64
    assert kept == 64
    assert any("capacity" in str(x.message) for x in w)


def test_extract_sharded_matches_single_device():
    # 8-virtual-device sharded extraction: same triangle SET as the
    # single-device path (order differs: per-slab vs global cell order).
    import jax
    from sdf_tpu.parallel import grid as pgrid

    node = cast(sphere(1.0), jnp.float64)
    v1, n1, ok1 = diffmesh.extract(node, BOUNDS, 33, dtype=jnp.float64)
    mesh = pgrid.make_mesh()
    v8, n8, ok8 = diffmesh.extract_sharded(
        node, BOUNDS, 33, dtype=jnp.float64, mesh=mesh
    )
    assert int(n1) == int(n8)
    # round before sorting: slab-local+shift vs global base addition
    # reassociates, so vertices can differ in the last ulp, which would
    # destabilize an exact sort
    a = np.asarray(v1)[np.asarray(ok1)].reshape(-1, 9).round(5)
    b = np.asarray(v8)[np.asarray(ok8)].reshape(-1, 9).round(5)
    assert a.shape == b.shape
    a = a[np.lexsort(a.T[::-1])]
    b = b[np.lexsort(b.T[::-1])]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_extract_sharded_grad_flows():
    import jax
    from sdf_tpu.parallel import grid as pgrid

    mesh = pgrid.make_mesh()

    def radius_probe(node):
        verts, n, valid = diffmesh.extract_sharded(
            node, BOUNDS, 24, dtype=jnp.float64, mesh=mesh
        )
        w = valid.astype(verts.dtype)[:, None, None]
        r = jnp.sqrt(jnp.sum(verts**2, axis=-1) + 1e-12)
        return jnp.sum(r * w[..., 0]) / jnp.maximum(3.0 * jnp.sum(valid), 1)

    node = cast(sphere(1.0), jnp.float64)
    g = jax.grad(radius_probe)(node)
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(g)]
    # d(mean radius)/d(sphere radius) ~ 1
    assert any(abs(l - 1.0).max() < 0.05 for l in leaves if l.size == 1)


def test_fit_chamfer_recovers_radius():
    # Fit a sphere's radius to a point cloud sampled on radius 1.2,
    # purely through the extracted mesh (no SDF oracle).
    from sdf_tpu.models import fit as fitmod

    rng = np.random.RandomState(11)
    d = rng.normal(size=(384, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    cloud = 1.2 * d
    node, loss = fitmod.fit_chamfer(
        sphere(1.0), cloud, BOUNDS, steps=80, lr=0.05,
        resolution=20, dtype=jnp.float64,
    )
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(node)]
    r = float([l for l in leaves if l.size == 1][0].ravel()[0])
    # vertex-to-point chamfer on a res-20 mesh (grid step ~0.17) has a
    # discretization floor; the optimum sits within ~half a step of 1.2
    assert abs(r - 1.2) < 0.1, (r, loss)
    assert loss < 0.25


def test_fit_chamfer_sharded():
    from sdf_tpu.models import fit as fitmod
    from sdf_tpu.parallel import grid as pgrid

    rng = np.random.RandomState(12)
    d = rng.normal(size=(256, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    cloud = 1.15 * d
    node, loss = fitmod.fit_chamfer(
        sphere(1.0), cloud, BOUNDS, steps=25, lr=0.1,
        resolution=17, dtype=jnp.float64, mesh=pgrid.make_mesh(),
    )
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(node)]
    r = float([l for l in leaves if l.size == 1][0].ravel()[0])
    assert abs(r - 1.15) < 0.07, (r, loss)
