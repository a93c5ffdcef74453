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
