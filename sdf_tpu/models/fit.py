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
