"""Roofline / MFU accounting for the fused eval kernel (round-3 verdict
item 5: quantify how far the eval phase is from speed-of-light and what
binds it).

Method: measure, on the SAME grid shape and dtype as the headline eval,

  * the per-dispatch overhead floor of this runtime (a tiny jitted
    copy, amortized): through the tunneled TPU runtime the dispatch
    stream feeds at ~3.5-4 ms/call no matter the size, which would
    otherwise masquerade as low utilization -- every probe below
    reports raw AND floor-corrected times;
  * achievable HBM copy bandwidth (read+write of a 1 GB buffer --
    big enough that the floor is a small fraction);
  * achievable VPU mul-add throughput (a jitted chain of fused
    multiply-adds over the grid, one f32 write at the end) -- the
    realistic elementwise peak, not the datasheet number;
  * achievable sqrt throughput (the transcendental tax: every
    primitive's length() needs one);

then count the example model's flops/point analytically (per-primitive
table below, matching ops/shapes3.py's formulas) and report

  eval GFLOP/s          = model_flops * n / t_eval_corrected
  VPU utilization       = eval GFLOP/s / measured mul-add GFLOP/s
  HBM utilization       = bytes_touched / t_eval / measured copy GB/s
  time_model            = flops at the muladd rate + sqrts at the sqrt
                          rate + one volume write at copy bandwidth
                          (ratio ~1 means those three fully explain the
                          kernel; <1 means the kernel beats the naive
                          decomposition via fusion)

Run: python - < tools/roofline.py   (stdin form keeps the repo root on
sys.path for the axon plugin environment), or python tools/roofline.py
on a normal host.  Prints one JSON line; PERF.md's roofline section
quotes it.
"""

import json
import sys
import time

# flops per point for the example model, counted from ops/shapes3.py's
# formulas (mul/add/sub/cmp = 1, sqrt = 1 flop + counted separately as a
# transcendental):
#   sphere(1):          x*x+y*y+z*z (5) + sqrt (1) + sub (1)        =  7
#   box(1.5):           abs (3) + sub (3) + max-chain inner (2) +
#                       per-comp max0 (3) + norm (5+1) + min (1)    = 18
#   intersection:       max (1)                                     =  1
#   cylinder(0.5):      x*x+y*y (3) + sqrt (1) + sub (1)            =  5
#   orient(=rotate):    3x3 matvec (15)                             = 15
#   union x2:           min (2)                                     =  2
#   difference:         max+neg (2)                                 =  2
#   3 cylinders+orients: 3 * (15 + 5)                               = 60
EXAMPLE_FLOPS_PER_POINT = 7 + 18 + 1 + 60 + 2 + 2  # = 90
EXAMPLE_SQRTS_PER_POINT = 4  # sphere + 3 cylinders (box norm ~masked)


def _timed(f, *args, K=16, reps=3):
    import jax
    import numpy as np

    def fence(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf[(0,) * leaf.ndim])  # 1-element index, no relayout

    r = f(*args)
    jax.block_until_ready(r)
    fence(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(K):
            r = f(*args)
        jax.block_until_ready(r)
        fence(r)
        best = min(best, (time.perf_counter() - t0) / K)
    return best, r


def main(samples_log2=26):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from sdf_tpu.core import engine
    from sdf_tpu.core.node import cast
    from sdf_tpu.models import example

    dtype = jnp.float32
    f = example()
    sdf_c = cast(f, dtype)
    (x0, y0, z0), (x1, y1, z1) = engine._estimate_bounds(f, dtype)
    volume = (x1 - x0) * (y1 - y0) * (z1 - z0)
    step = (volume / 2**samples_log2) ** (1 / 3)
    X = np.arange(x0, x1, step)
    Y = np.arange(y0, y1, step)
    Z = np.arange(z0, z1, step)
    n = len(X) * len(Y) * len(Z)
    shape = (len(X), len(Y), len(Z))

    copy = jax.jit(lambda v: v + 1.0)

    # --- dispatch floor: a tiny copy, amortized ------------------------
    tiny = jnp.ones((2048, 128), jnp.float32)
    t_floor, _ = _timed(copy, tiny, K=32)

    # --- the measured kernel ------------------------------------------
    t_eval, vol = _timed(engine._eval_volume, sdf_c, X, Y, Z, dtype)
    t_eval_c = max(t_eval - t_floor, 1e-9)

    # --- HBM probe: out-of-place copy of a 1 GB buffer ----------------
    big = jnp.ones((1 << 21, 128), jnp.float32)  # 1 GiB
    jax.block_until_ready(big)
    t_copy, _ = _timed(copy, big, K=8)
    copy_gbs = 2 * big.nbytes / max(t_copy - t_floor, 1e-9) / 1e9
    del big

    # --- VPU mul-add probe: CHAIN fused muladds on broadcast coords ---
    # Same input structure as the eval (three 1-D coordinate arrays,
    # broadcast in-kernel, one f32 volume write) so the only difference
    # from the real kernel is the instruction mix.
    CHAIN = 64

    @partial(jax.jit, static_argnames=("chain",))
    def muladd(x, y, z, chain=CHAIN):
        acc = x[:, None, None] + y[None, :, None] + z[None, None, :]
        c = jnp.float32(1.0000001)
        for _ in range(chain):
            acc = acc * c + y[None, :, None]
        return acc

    xj = jnp.asarray(X, dtype)
    yj = jnp.asarray(Y, dtype)
    zj = jnp.asarray(Z, dtype)
    t_ma, _ = _timed(muladd, xj, yj, zj)
    # 2 flops per fused muladd per point
    vpu_gflops = 2.0 * CHAIN * n / max(t_ma - t_floor, 1e-9) / 1e9

    # --- transcendental probe: chain of sqrts -------------------------
    SQ = 32

    @partial(jax.jit, static_argnames=("chain",))
    def sqrts(x, y, z, chain=SQ):
        acc = x[:, None, None] + y[None, :, None] + z[None, None, :]
        acc = jnp.abs(acc) + 1.0
        for _ in range(chain):
            acc = jnp.sqrt(acc) + 1.0
        return acc

    t_sq, _ = _timed(sqrts, xj, yj, zj)
    sqrt_gops = SQ * n / max(t_sq - t_floor, 1e-9) / 1e9

    # --- accounting (all on floor-corrected times) --------------------
    eval_gflops = EXAMPLE_FLOPS_PER_POINT * n / t_eval_c / 1e9
    # time decomposition estimate: flops at the muladd rate + sqrts at
    # the sqrt rate + one volume write at copy bandwidth
    t_model = (
        EXAMPLE_FLOPS_PER_POINT * n / (vpu_gflops * 1e9)
        + EXAMPLE_SQRTS_PER_POINT * n / (sqrt_gops * 1e9)
        + 4.0 * n / (copy_gbs * 1e9 / 2)  # write-only half of copy BW
    )
    print(
        json.dumps(
            {
                "samples_log2": samples_log2,
                "n_points": n,
                "grid": shape,
                "dispatch_floor_ms": round(t_floor * 1e3, 2),
                "eval_ms_raw": round(t_eval * 1e3, 2),
                "eval_ms": round(t_eval_c * 1e3, 2),
                "eval_pts_per_s": round(n / t_eval_c),
                "model_flops_per_point": EXAMPLE_FLOPS_PER_POINT,
                "model_sqrts_per_point": EXAMPLE_SQRTS_PER_POINT,
                "eval_gflops": round(eval_gflops, 1),
                "probe_muladd_gflops": round(vpu_gflops, 1),
                "probe_sqrt_gops": round(sqrt_gops, 2),
                "probe_copy_gbs": round(copy_gbs, 1),
                "vpu_utilization": round(eval_gflops / vpu_gflops, 3),
                "hbm_utilization_write": round(
                    4.0 * n / t_eval_c / 1e9 / copy_gbs, 3
                ),
                "time_model_ms": round(t_model * 1e3, 2),
                "time_model_ratio": round(t_model / t_eval_c, 3),
            }
        )
    )


if __name__ == "__main__":
    lg = 26
    if "--samples" in sys.argv:
        lg = int(sys.argv[sys.argv.index("--samples") + 1])
    main(lg)
