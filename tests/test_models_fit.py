"""Model zoo builders + differentiable fitting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_tpu.core.node import cast
from sdf_tpu import models
from sdf_tpu.models import fit as fit_mod
from sdf_tpu.models.zoo import MODELS, sphere
from sdf_tpu.parallel.grid import make_mesh


@pytest.mark.parametrize("name", sorted(MODELS))
def test_zoo_builders_evaluate(name):
    builder, _ = MODELS[name]
    f = builder()
    rng = np.random.default_rng(0)
    p = rng.uniform(-3, 3, size=(64, 3))
    d = f(p)
    assert d.shape == (64, 1)
    assert np.all(np.isfinite(np.asarray(d)))


def test_fit_recovers_sphere_radius():
    # Fit sphere(r) to the field of sphere(1.3): r should converge to 1.3.
    target = cast(sphere(1.3), jnp.float32)
    model = cast(sphere(0.5), jnp.float32)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-2, 2, size=(512, 3)).astype(np.float32)
    node, loss = fit_mod.fit(model, target, pts, steps=200, lr=0.1)
    scalars = [
        x for x in jax.tree_util.tree_leaves(node.params)
        if np.asarray(x).size == 1
    ]
    r = float(np.asarray(scalars[0]))
    assert abs(r - 1.3) < 1e-3
    assert loss < 1e-6


def test_sharded_fit_matches_single_device():
    target = cast(models.example(), jnp.float32)
    model = cast(sphere(0.8), jnp.float32)
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1.5, 1.5, size=(1024, 3)).astype(np.float32)
    tgt = jnp.asarray(np.asarray(target(pts)).reshape(-1))
    lr = jnp.float32(1e-2)

    single, loss_s = fit_mod.fit_step(model, jnp.asarray(pts), tgt, lr)
    step8 = fit_mod.make_sharded_fit_step(make_mesh())
    shard, loss_m = step8(model, jnp.asarray(pts), tgt, lr)

    np.testing.assert_allclose(float(loss_s), float(loss_m), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(single), jax.tree_util.tree_leaves(shard)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
