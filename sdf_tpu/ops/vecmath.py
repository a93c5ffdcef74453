"""Shared SoA vector helpers for the 2D/3D op libraries.

Dimension-agnostic by construction (they iterate ``Points`` components),
so shapes2 and shapes3 share one implementation -- in particular the
grad-safe norm and the MXU-avoiding small-dot must never diverge
between the 2D and 3D paths.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.node import Points

_min = jnp.minimum
_max = jnp.maximum

_vec = Points


# --- kernel-safe arctan2 ---------------------------------------------------
# Mosaic has no atan/atan2 lowering, so expressions that compute angles
# (circular_array, wrap_around) would force the whole tree off the fused
# Pallas kernels.  Inside kernel tracing (hybrid.in_kernel) arctan2 is a
# degree-9 polynomial in t^2 after the standard octant reduction
# (max |err| 7.6e-9 over the reduced range -- below f32 resolution at pi
# scale); everywhere else it is jnp.arctan2.  The two paths can differ by
# ~1 ulp, like every other Mosaic-vs-XLA op (the engine already keys its
# count memos on the eval path).
_ATAN_POLY = np.array(
    [
        0.9999999981419239, -0.3333329278773662, 0.19998532264227084,
        -0.14264888592365205, 0.1095834127545905, -0.08427560868449623,
        0.058456508067943565, -0.03174908480101869, 0.011256773885438904,
        -0.0018773524043047003,
    ]
)


def _atan_01(t):
    """atan(t) for t in [0, 1]: t * P(t^2), Horner.  Coefficients enter
    as weak Python floats so they never promote the field dtype."""
    u = t * t
    p = float(_ATAN_POLY[-1])
    for c in _ATAN_POLY[-2::-1]:
        p = p * u + float(c)
    return t * p


def arctan2(y, x):
    """jnp.arctan2 outside kernels; polynomial reduction inside (see above)."""
    from ..core import hybrid

    if not hybrid.in_kernel_trace():
        return jnp.arctan2(y, x)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    lo = jnp.minimum(ax, ay)
    hi = jnp.maximum(ax, ay)
    t = lo / jnp.where(hi == 0, 1.0, hi)
    a = _atan_01(t)
    a = jnp.where(ay > ax, np.pi / 2 - a, a)  # octant unswap
    a = jnp.where(x < 0, np.pi - a, a)
    a = jnp.where(y < 0, -a, a)  # y == +/-0: keeps +pi for x<0, 0 else
    return a


def _dotv(a, b):
    """Scalar dot of two tiny parameter vectors as explicit multiply-adds
    (a (k,)-dot lowers to a dot_general XLA pads onto the MXU -- and
    Mosaic cannot lower scalar-output dots at all)."""
    return sum(a[i] * b[i] for i in range(a.shape[0]))


def _length(a):
    # Double-where safe norm: value-identical to a euclidean norm, but the
    # gradient at ||a|| == 0 is 0 instead of NaN (interior points of
    # box-like shapes evaluate _length(max(d, 0)) at exactly 0, which
    # would poison parameter gradients under jax.grad).
    sq = sum(c * c for c in a.c)
    return jnp.where(sq == 0, 0.0, jnp.sqrt(jnp.where(sq == 0, 1.0, sq)))


def _normalize(a):
    return a / np.linalg.norm(a)


def _dot(a, b):
    return sum(x * y for x, y in zip(a.c, b.c))


def _mdot(p, m):
    """``p @ m`` for Points and a tiny vector/matrix, as explicit
    multiply-adds (a dot_general's size-2/3 contraction would pad onto
    the 128-wide MXU: ~40x wasted work per point on TPU)."""
    m = jnp.asarray(m)
    if m.ndim == 1:
        return sum(c * m[i] for i, c in enumerate(p.c))
    return Points(
        *[sum(c * m[i, j] for i, c in enumerate(p.c)) for j in range(m.shape[1])]
    )


def _vmul(v, s):
    """Per-component product of a tiny (d,) vector with a field array."""
    v = jnp.asarray(v)
    return Points(*[v[i] * s for i in range(v.shape[0])])


def _pmax(a, b):
    """Componentwise maximum of Points against a scalar or Points."""
    if isinstance(b, Points):
        return Points(*[jnp.maximum(x, y) for x, y in zip(a.c, b.c)])
    return Points(*[jnp.maximum(x, b) for x in a.c])
