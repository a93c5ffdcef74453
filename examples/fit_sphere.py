"""New-to-this-framework demo: differentiable shape fitting.

Gradient-descends a sphere's parameters to match the canonical example
model's field -- impossible in the reference (numpy closures are opaque);
here the expression pytree is differentiated end-to-end by jax.grad and the
point batch shards over every visible device.
"""

import jax.numpy as jnp
import numpy as np

from sdf_tpu.core.node import cast
from sdf_tpu.models import example, fit_step
from sdf_tpu.models.zoo import sphere

target = cast(example(), jnp.float32)
model = cast(sphere(0.5), jnp.float32)

rng = np.random.default_rng(0)
pts = jnp.asarray(rng.uniform(-1.5, 1.5, size=(8192, 3)), dtype=jnp.float32)
tgt = target(pts).reshape(-1)

for i in range(300):
    model, loss = fit_step(model, pts, tgt, jnp.float32(0.05))
    if i % 50 == 0:
        print(f"step {i:4d}  loss {float(loss):.3e}")

print("fitted params:", [np.asarray(x) for x in
                         __import__('jax').tree_util.tree_leaves(model.params)])
