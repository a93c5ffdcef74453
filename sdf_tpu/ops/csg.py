"""Dimension-agnostic CSG operators (behavioral parity with ref sdf/dn.py).

Each builder returns ``(fn, params)`` for an SDF pytree node (see
``sdf_tpu.core.node``).  Child SDF nodes live *inside* the params pytree, so
the whole CSG tree is one pytree and XLA fuses its evaluation into a single
program.

Smooth-k semantics replicated exactly (ref sdf/dn.py:12, SURVEY.md 2.4.2-3):

  * ``K = k or b._k`` -- the explicit ``k`` argument wins unless falsy
    (``k=0`` falls back to the operand tag), and only the *right-hand*
    operand's tag is consulted.
  * the tag is read lazily at trace time, so ``.k()`` applied after an
    expression captured the node still takes effect.
  * polynomial smooth min/max: ``h = clip(0.5 +/- 0.5 (d2 -/+ d1)/K, 0, 1)``,
    blended with a ``-/+ K h (1-h)`` correction (ref sdf/dn.py:16-18, 31-33,
    46-48).
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np

from ..core.node import as_param, node_k


def _resolve_k(k_param, b):
    """Trace-time K resolution: explicit op k, else the operand's tag."""
    return k_param if k_param is not None else node_k(b)


def union(a, *bs, k=None):
    k_param = as_param(k) if k else None  # falsy k -> fall back to b._k
    params = {"a": a, "bs": list(bs), "k": k_param}

    def fn(q, p):
        d1 = q["a"](p)
        for b in q["bs"]:
            d2 = b(p)
            K = _resolve_k(q["k"], b)
            if K is None:
                d1 = jnp.minimum(d1, d2)
            else:
                h = jnp.clip(0.5 + 0.5 * (d2 - d1) / K, 0, 1)
                m = d2 + (d1 - d2) * h
                d1 = m - K * h * (1 - h)
        return d1

    return fn, params


def difference(a, *bs, k=None):
    k_param = as_param(k) if k else None
    params = {"a": a, "bs": list(bs), "k": k_param}

    def fn(q, p):
        d1 = q["a"](p)
        for b in q["bs"]:
            d2 = b(p)
            K = _resolve_k(q["k"], b)
            if K is None:
                d1 = jnp.maximum(d1, -d2)
            else:
                h = jnp.clip(0.5 - 0.5 * (d2 + d1) / K, 0, 1)
                m = d1 + (-d2 - d1) * h
                d1 = m + K * h * (1 - h)
        return d1

    return fn, params


def intersection(a, *bs, k=None):
    k_param = as_param(k) if k else None
    params = {"a": a, "bs": list(bs), "k": k_param}

    def fn(q, p):
        d1 = q["a"](p)
        for b in q["bs"]:
            d2 = b(p)
            K = _resolve_k(q["k"], b)
            if K is None:
                d1 = jnp.maximum(d1, d2)
            else:
                h = jnp.clip(0.5 - 0.5 * (d2 - d1) / K, 0, 1)
                m = d2 + (d1 - d2) * h
                d1 = m + K * h * (1 - h)
        return d1

    return fn, params


def blend(a, *bs, k=0.5):
    k_param = as_param(k) if k else None
    params = {"a": a, "bs": list(bs), "k": k_param}

    def fn(q, p):
        d1 = q["a"](p)
        for b in q["bs"]:
            d2 = b(p)
            K = _resolve_k(q["k"], b)
            d1 = K * d2 + (1 - K) * d1  # plain lerp (ref sdf/dn.py:52-60)
        return d1

    return fn, params


def negate(other):
    def fn(q, p):
        return -q["other"](p)

    return fn, {"other": other}


def dilate(other, r):
    def fn(q, p):
        return q["other"](p) - q["r"]

    return fn, {"other": other, "r": as_param(r)}


def erode(other, r):
    def fn(q, p):
        return q["other"](p) + q["r"]

    return fn, {"other": other, "r": as_param(r)}


def shell(other, thickness):
    def fn(q, p):
        return jnp.abs(q["other"](p)) - q["thickness"] / 2

    return fn, {"other": other, "thickness": as_param(thickness)}


def repeat(other, spacing, count=None, padding=0):
    """Lattice repetition with optional finite count and neighbor padding.

    Matches ref sdf/dn.py:82-114: tiles are found by rounding ``p / spacing``
    (axes with zero spacing disabled), optionally clipped to ``+/-count``,
    and the child is min-reduced over a ``(2 padding + 1)^dim`` neighbor
    stencil.  The stencil is static, so under jit it unrolls into
    ``len(stencil)`` fused child evaluations.

    NOTE: the axis-enable pattern and the stencil are fixed at
    construction (exactly like the reference's closure capture); when
    substituting the ``spacing`` pytree leaf, keep its zero-pattern --
    switching an axis between zero and nonzero requires rebuilding the op.
    """
    spacing_np = np.atleast_1d(np.asarray(spacing, dtype=np.float64))
    params = {
        "other": other,
        "spacing": as_param(spacing),
        "count": as_param(count) if count is not None else None,
    }

    def _neighbors(dim):
        try:
            pad = [padding[i] for i in range(dim)]
        except Exception:
            pad = [padding] * dim
        try:
            sp = [spacing_np[i] for i in range(dim)]
        except Exception:
            sp = [float(spacing_np.reshape(-1)[0])] * dim
        for i, s in enumerate(sp):
            if s == 0:
                pad[i] = 0
        axes = [list(range(-p, p + 1)) for p in pad]
        return list(itertools.product(*axes))

    def fn(q, p):
        from ..core.node import Points

        dim = p.dim
        nonzero = np.broadcast_to(spacing_np != 0, (dim,))
        sp = jnp.broadcast_to(jnp.asarray(q["spacing"]), (dim,))
        if q["count"] is not None:
            cnt = jnp.broadcast_to(jnp.asarray(q["count"]), (dim,))
        # Per-axis tile index (componentwise: axes with zero spacing are
        # disabled, ref sdf/dn.py:102-106).
        index = []
        for i in range(dim):
            if not nonzero[i]:
                index.append(None)
                continue
            idx = jnp.round(p.c[i] / sp[i])
            if q["count"] is not None:
                idx = jnp.clip(idx, -cnt[i], cnt[i])
            index.append(idx)
        ds = []
        for n in _neighbors(dim):
            shifted = Points(
                *[
                    p.c[i]
                    if index[i] is None
                    else p.c[i] - sp[i] * (index[i] + n[i])
                    for i in range(dim)
                ]
            )
            ds.append(q["other"](shifted))
        a = ds[0]
        for b in ds[1:]:
            a = jnp.minimum(a, b)
        return a

    return fn, params
