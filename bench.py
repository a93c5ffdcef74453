"""Headline benchmark: SDF grid-evaluation throughput (points/s).

Mirrors the measured baseline in BASELINE.md: the reference's
examples/example.py model evaluated over the samples=2**22 dense grid
(162^3 on the estimated bounds).  The reference CPU number is 4.7 M pts/s
(1 vCPU, float64 numpy, sdf/core.py:45-60 batch loop).

Timing methodology: K back-to-back dispatches with one synchronization at
the end (per-call block_until_ready through the TPU tunnel does not
reliably fence, and a single run under-measures pipelined dispatch).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

BASELINE_PTS_PER_S = 4.7e6  # BASELINE.md: reference CPU, example model, 2^22


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdf_tpu.core import engine
    from sdf_tpu.core.node import cast
    from sdf_tpu.models import example

    f = example()
    dtype = jnp.float32
    sdf_c = cast(f, dtype)

    bounds = engine._estimate_bounds(f, dtype)
    (x0, y0, z0), (x1, y1, z1) = bounds
    samples = 2**22
    volume = (x1 - x0) * (y1 - y0) * (z1 - z0)
    step = (volume / samples) ** (1 / 3)
    X = np.arange(x0, x1, step)
    Y = np.arange(y0, y1, step)
    Z = np.arange(z0, z1, step)
    n_points = len(X) * len(Y) * len(Z)

    # Warmup (compile), then K amortized runs with one final sync.
    vol = engine._eval_volume(sdf_c, X, Y, Z, dtype)
    jax.block_until_ready(vol)
    K = 20
    t0 = time.perf_counter()
    for _ in range(K):
        vol = engine._eval_volume(sdf_c, X, Y, Z, dtype)
    jax.block_until_ready(vol)
    dt = (time.perf_counter() - t0) / K

    pts_per_s = n_points / dt
    print(
        json.dumps(
            {
                "metric": "sdf_eval_points_per_s_example_2p22",
                "value": pts_per_s,
                "unit": "points/s",
                "vs_baseline": pts_per_s / BASELINE_PTS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
