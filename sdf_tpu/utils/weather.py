"""Session weather probes: what is THIS runtime/session actually capable of?

Through the tunneled TPU runtime, dispatch latency and transfer bandwidth
drift 2-10x between (and within) driver sessions, so raw wall-clock numbers
in a bench artifact cannot distinguish "the code got slower" from "the
tunnel got slower" (round-4 verdict item 1).  These probes measure, in the
same session as the benchmark itself:

  * ``dispatch_floor()``   -- the per-dispatch overhead of an amortized
    tiny jitted copy (~1.8-4 ms through the tunnel, ~0.1 ms on a normal
    host); every raw phase time includes it.
  * ``probe_rates(X, Y, Z)`` -- achievable mul-add GFLOP/s, sqrt Gop/s and
    HBM copy GB/s on the SAME grid shape and input structure as the
    headline eval (three 1-D coordinate arrays broadcast in-kernel).

Normalized metrics built on these (utilization = achieved / same-session
probe rate) hold a tight band across weather, which is what the perf gate
checks; raw throughputs are reported as informational fields.

Used by bench.py (every invocation -- the weather index travels in the
BENCH_r*.json artifact) and tools/roofline.py (the full MFU accounting).
"""

import time
from functools import partial

# flops per point for the canonical example model, counted from
# ops/shapes3.py's formulas (mul/add/sub/cmp = 1; sqrts counted separately
# as transcendentals).  See tools/roofline.py for the per-primitive table.
EXAMPLE_FLOPS_PER_POINT = 90
EXAMPLE_SQRTS_PER_POINT = 4

# mul-add chain length / sqrt chain length used by the probes (long enough
# that the broadcast+write cost is a small fraction of the chain).
_CHAIN = 64
_SQ = 32


def timed_min(f, *args, K=16, reps=3):
    """Best amortized seconds/call over ``reps`` batches of K dispatches.

    One tiny fenced read at the end of each batch (block_until_ready does
    not reliably fence through a tunneled runtime); the minimum across
    batches is the least weather-contaminated estimate.
    """
    import jax
    import numpy as np

    def fence(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

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


def dispatch_floor(K=32):
    """Per-dispatch overhead (seconds) of a tiny jitted copy, amortized."""
    import jax
    import jax.numpy as jnp

    tiny = jnp.ones((2048, 128), jnp.float32)
    t, _ = timed_min(jax.jit(lambda v: v + 1.0), tiny, K=K)
    return t


def probe_rates(X, Y, Z, floor=None):
    """Measure achievable rates on the given grid axes.

    Returns a dict with ``muladd_gflops``, ``sqrt_gops``, ``copy_gbs``
    and ``dispatch_floor_ms`` (measured here when not supplied).  All
    rates are floor-corrected (the amortized per-dispatch overhead is
    subtracted before dividing), matching how bench.py corrects the
    phases they normalize.
    """
    import jax
    import jax.numpy as jnp

    if floor is None:
        floor = dispatch_floor()
    n = len(X) * len(Y) * len(Z)
    xj = jnp.asarray(X, jnp.float32)
    yj = jnp.asarray(Y, jnp.float32)
    zj = jnp.asarray(Z, jnp.float32)

    @partial(jax.jit, static_argnames=("chain",))
    def muladd(x, y, z, chain=_CHAIN):
        acc = x[:, None, None] + y[None, :, None] + z[None, None, :]
        c = jnp.float32(1.0000001)
        for _ in range(chain):
            acc = acc * c + y[None, :, None]
        return acc

    t_ma, _ = timed_min(muladd, xj, yj, zj)
    muladd_gflops = 2.0 * _CHAIN * n / max(t_ma - floor, 1e-9) / 1e9

    @partial(jax.jit, static_argnames=("chain",))
    def sqrts(x, y, z, chain=_SQ):
        acc = x[:, None, None] + y[None, :, None] + z[None, None, :]
        acc = jnp.abs(acc) + 1.0
        for _ in range(chain):
            acc = jnp.sqrt(acc) + 1.0
        return acc

    t_sq, _ = timed_min(sqrts, xj, yj, zj)
    sqrt_gops = _SQ * n / max(t_sq - floor, 1e-9) / 1e9

    # HBM copy bandwidth on a 1 GiB buffer (big enough that the floor is
    # a small fraction of the call).
    big = jnp.ones((1 << 21, 128), jnp.float32)
    jax.block_until_ready(big)
    t_copy, _ = timed_min(jax.jit(lambda v: v + 1.0), big, K=8)
    copy_gbs = 2 * big.nbytes / max(t_copy - floor, 1e-9) / 1e9
    del big

    return {
        "dispatch_floor_ms": floor * 1e3,
        "muladd_gflops": muladd_gflops,
        "sqrt_gops": sqrt_gops,
        "copy_gbs": copy_gbs,
    }


def eval_utilization(n_points, t_eval_corrected, rates,
                     flops_per_point=EXAMPLE_FLOPS_PER_POINT,
                     sqrts_per_point=EXAMPLE_SQRTS_PER_POINT):
    """(vpu_utilization, time_model_ratio) for an eval phase.

    ``vpu_utilization``: achieved GFLOP/s over the same-session mul-add
    probe rate -- the weather-normalized headline (a genuine compute
    regression moves it; a slow tunnel moves numerator and denominator
    together).  ``time_model_ratio``: the flops-at-muladd-rate +
    sqrts-at-sqrt-rate + one-f32-write-at-copy-bandwidth decomposition
    over the measured time (~0.9 when those three explain the kernel).
    """
    gflops = flops_per_point * n_points / t_eval_corrected / 1e9
    util = gflops / rates["muladd_gflops"]
    t_model = (
        flops_per_point * n_points / (rates["muladd_gflops"] * 1e9)
        + sqrts_per_point * n_points / (rates["sqrt_gops"] * 1e9)
        + 4.0 * n_points / (rates["copy_gbs"] * 1e9 / 2)
    )
    return util, t_model / t_eval_corrected
