"""Differentiable shape fitting: gradient steps on SDF parameters.

The reference has no training of any kind; this is the framework's
"training step".  Because an SDF expression is a pytree whose numeric
leaves are the shape parameters (radii, transforms, blend radii --
see sdf_tpu.core.node), ``jax.grad`` differentiates the whole CSG tree
end-to-end and a fit step is ordinary SGD on the expression itself.

The sharded variant shard_maps the point batch over a device mesh
(data/spatial parallelism -- the only meaningful parallel axis for a
pointwise field, SURVEY.md 2.3) and ``pmean``s loss + gradients over ICI,
i.e. the gradient all-reduce rides the same collective path as any
data-parallel trainer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..core.node import cast

AXIS = "grid"


def _loss(node, points, target):
    d = node(points)[:, 0]
    return jnp.mean((d - target) ** 2)


def _sgd(node, grads, lr):
    return jax.tree_util.tree_map(lambda w, g: w - lr * g, node, grads)


@jax.jit
def fit_step(node, points, target, lr):
    """One SGD step on an SDF expression's parameters.

    node: dtype-cast SDF expression (see sdf_tpu.core.node.cast).
    points: (N, dim) sample points; target: (N,) target distances.
    Returns (new_node, loss).
    """
    loss, grads = jax.value_and_grad(_loss)(node, points, target)
    return _sgd(node, grads, lr), loss


def make_sharded_fit_step(mesh, axis_name=AXIS):
    """Build a jitted fit step sharding the point batch over ``mesh``.

    Each device computes loss/grads on its shard of points; ``pmean``
    all-reduces both so every device applies the identical update
    (synchronous data parallelism over the mesh's ICI links).
    """

    n_dev = mesh.shape[axis_name]

    def body(node, points, target):
        # (shard_map has already split the batch here; validation below.)
        def local_loss(node):
            d = node(points)[:, 0]
            # Normalize by the GLOBAL point count: the backward pass w.r.t.
            # the replicated node auto-psums over the mesh (transpose of the
            # implicit broadcast under shard_map's vma semantics), so the
            # summed gradient is exactly the global-mean-loss gradient.
            return jnp.sum((d - target) ** 2) / (d.shape[0] * n_dev)

        loss, grads = jax.value_and_grad(local_loss)(node)
        loss = jax.lax.psum(loss, axis_name)
        return grads, loss

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
    )

    @jax.jit
    def _step(node, points, target, lr):
        grads, loss = sharded(node, points, target)
        return _sgd(node, grads, lr), loss

    def step(node, points, target, lr):
        if points.shape[0] % n_dev:
            raise ValueError(
                f"point batch of {points.shape[0]} does not divide over the "
                f"{n_dev}-device mesh; pad or trim to a multiple of {n_dev}"
            )
        return _step(node, points, target, lr)

    return step


def make_chamfer_loss(bounds, resolution=24, capacity=None,
                      dtype=jnp.float32, mesh=None):
    """Symmetric chamfer distance between a target point cloud and the
    EXTRACTED surface (not an SDF oracle): gradients flow through
    marching cubes (core.diffmesh) into the shape parameters, so this
    fits CSG models directly to scans.  With ``mesh=`` the extraction
    itself is sharded (diffmesh.extract_sharded)."""
    from ..core import diffmesh

    if capacity is None:
        # Roomier than extract's default: a truncated surface during
        # fitting silently corrupts gradients (diffmesh warns on
        # overflow, but the optimizer would still wander).
        r = resolution if np.isscalar(resolution) else max(resolution)
        capacity = 8 * r * r

    def loss(node, targets):
        if mesh is None:
            verts, _, valid = diffmesh.extract(
                node, bounds, resolution, capacity, dtype
            )
        else:
            verts, _, valid = diffmesh.extract_sharded(
                node, bounds, resolution, capacity, dtype, mesh=mesh
            )
        v = verts.reshape(-1, 3)
        vmask = jnp.repeat(valid, 3)
        eps = jnp.asarray(1e-12, v.dtype)
        d2 = jnp.sum((targets[:, None, :] - v[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(vmask[None, :], d2, jnp.asarray(1e9, v.dtype))
        cloud_to_mesh = jnp.mean(jnp.sqrt(jnp.min(d2, axis=1) + eps))
        dv = jnp.sqrt(jnp.min(d2, axis=0) + eps)
        mesh_to_cloud = jnp.sum(jnp.where(vmask, dv, 0)) / jnp.maximum(
            jnp.sum(vmask), 1
        )
        return cloud_to_mesh + mesh_to_cloud

    return loss


def fit_chamfer(builder, target_points, bounds, steps=60, lr=5e-2,
                resolution=24, capacity=None, dtype=jnp.float32, mesh=None,
                verbose=False):
    """Fit an SDF expression to a target POINT CLOUD by chamfer distance
    on the extracted surface.  Returns (fitted_node, final_loss)."""
    node = cast(builder, dtype)
    t = jnp.asarray(np.asarray(target_points), dtype=dtype)
    lr = jnp.asarray(lr, dtype=dtype)
    loss_fn = make_chamfer_loss(bounds, resolution, capacity, dtype, mesh)

    @jax.jit
    def step(node, t, lr):
        l, g = jax.value_and_grad(loss_fn)(node, t)
        return _sgd(node, g, lr), l

    loss = None
    for i in range(steps):
        node, loss = step(node, t, lr)
        if verbose and (i % max(1, steps // 10) == 0):
            print(f"step {i}: chamfer {float(loss):.3e}")
    return node, float(loss)


def fit(builder, target_sdf, points, steps=100, lr=1e-2, dtype=jnp.float32,
        mesh=None, verbose=False):
    """Fit a parametric model to a target SDF on fixed sample points.

    builder: an SDF expression (the initial model).  target_sdf: an SDF
    expression or callable producing target distances at ``points``.
    With ``mesh=`` the batch is trimmed to a multiple of the mesh size.
    Returns (fitted_node, final_loss).
    """
    node = cast(builder, dtype)
    points = np.asarray(points)
    if mesh is not None:
        # Trim to a shardable multiple of the mesh size (documented).
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        n = (points.shape[0] // n_dev) * n_dev
        points = points[:n]
    p = jnp.asarray(points, dtype=dtype)
    t = jnp.asarray(target_sdf(points), dtype=dtype).reshape(-1)
    lr = jnp.asarray(lr, dtype=dtype)
    step = fit_step if mesh is None else make_sharded_fit_step(mesh)
    loss = None
    for i in range(steps):
        node, loss = step(node, p, t, lr)
        if verbose and (i % max(1, steps // 10) == 0):
            print(f"step {i}: loss {float(loss):.3e}")
    return node, float(loss)
