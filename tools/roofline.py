"""Roofline / MFU accounting for the fused eval kernel (round-3 verdict
item 5: quantify how far the eval phase is from speed-of-light and what
binds it).

Method: measure, on the SAME grid shape and dtype as the headline eval,

  * the per-dispatch overhead floor of this runtime (a tiny jitted
    copy, amortized): through the tunneled TPU runtime the dispatch
    stream feeds at ~1.8-4 ms/call no matter the size, which would
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

The probes themselves live in ``sdf_tpu/utils/weather.py`` (shared with
bench.py, which runs them EVERY invocation and carries the session
weather index in the BENCH_r*.json artifact -- round-4 verdict item 1).

Run: python - < tools/roofline.py   (stdin form keeps the repo root on
sys.path for the axon plugin environment), or python tools/roofline.py
on a normal host.  Prints one JSON line; PERF.md's roofline section
quotes it.

flops per point for the example model, counted from ops/shapes3.py's
formulas (mul/add/sub/cmp = 1, sqrt = 1 flop + counted separately as a
transcendental):
  sphere(1):          x*x+y*y+z*z (5) + sqrt (1) + sub (1)        =  7
  box(1.5):           abs (3) + sub (3) + max-chain inner (2) +
                      per-comp max0 (3) + norm (5+1) + min (1)    = 18
  intersection:       max (1)                                     =  1
  cylinder(0.5):      x*x+y*y (3) + sqrt (1) + sub (1)            =  5
  orient(=rotate):    3x3 matvec (15)                             = 15
  union x2:           min (2)                                     =  2
  difference:         max+neg (2)                                 =  2
  3 cylinders+orients: 3 * (15 + 5)                               = 60
  total = 90 (+ 4 sqrts: sphere + 3 cylinders; box norm ~masked)
"""

import json
import sys


def main(samples_log2=26):
    import numpy as np

    from sdf_tpu.core import engine
    from sdf_tpu.core.node import cast
    from sdf_tpu.models import example
    from sdf_tpu.utils import weather

    import jax.numpy as jnp

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

    # --- the measured kernel + the session probes ---------------------
    t_floor = weather.dispatch_floor()
    t_eval, vol = weather.timed_min(
        engine._eval_volume, sdf_c, X, Y, Z, dtype
    )
    t_eval_c = max(t_eval - t_floor, 1e-9)
    rates = weather.probe_rates(X, Y, Z, floor=t_floor)

    # --- accounting (all on floor-corrected times) --------------------
    FL = weather.EXAMPLE_FLOPS_PER_POINT
    SQ = weather.EXAMPLE_SQRTS_PER_POINT
    eval_gflops = FL * n / t_eval_c / 1e9
    util, tm_ratio = weather.eval_utilization(n, t_eval_c, rates)
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
                "model_flops_per_point": FL,
                "model_sqrts_per_point": SQ,
                "eval_gflops": round(eval_gflops, 1),
                "probe_muladd_gflops": round(rates["muladd_gflops"], 1),
                "probe_sqrt_gops": round(rates["sqrt_gops"], 2),
                "probe_copy_gbs": round(rates["copy_gbs"], 1),
                "vpu_utilization": round(util, 3),
                "hbm_utilization_write": round(
                    4.0 * n / t_eval_c / 1e9 / rates["copy_gbs"], 3
                ),
                "time_model_ratio": round(tm_ratio, 3),
            }
        )
    )


if __name__ == "__main__":
    lg = 26
    if "--samples" in sys.argv:
        lg = int(sys.argv[sys.argv.index("--samples") + 1])
    main(lg)
