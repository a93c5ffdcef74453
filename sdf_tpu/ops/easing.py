"""Easing curves ``t in [0,1] -> R`` (behavioral parity with ref sdf/ease.py).

The reference ships 34 hand-written numpy functions.  Here each family is
defined once by its core acceleration curve and the rest of the trio is
*derived* through the two standard easing identities:

  * reflection     ``out(t) = 1 - in(1 - t)``     (decelerate = mirrored
    accelerate)
  * symmetrization ``in_out(t) = in(2t)/2``            for t < 1/2,
                   ``1 - in(2 - 2t)/2``               otherwise

Derived values match the reference's explicit formulas to ~1 ulp (the
identities are exact in real arithmetic; parity is pinned to 1e-12 by
``tests/test_parity_3d.py``).  Two families stay explicit: ``square``
(step functions whose t=1/2 boundary value the identities would flip)
and the piecewise-parabola ``out_bounce`` spec itself.

Everything is ``jax.numpy`` so the curves trace, fuse, and differentiate
inside jitted SDF expressions (they parameterize bend/transition/
extrude_to/wrap_around).  Branchy curves use ``jnp.where`` over full
arrays; domain guards (`circ`) live in the cores so unselected branches
stay NaN-free under ``jax.grad``.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp


def _named(name, f):
    f.__name__ = f.__qualname__ = name
    return f


def reflected(ease_in, name=None):
    """Derive the decelerating curve: ``out(t) = 1 - in(1 - t)``."""

    def out(t, *args, **kw):
        # kw passes through so out_elastic(t, k=...) keeps the
        # reference's keyword signature (ref sdf/ease.py).
        return 1 - ease_in(1 - jnp.asarray(t), *args, **kw)

    return _named(name or "out", out)


def symmetrized(ease_in, name=None):
    """Derive the ease-in-out curve: accelerate into t=1/2, then the
    point-reflected deceleration out of it."""

    def in_out(t, *args, **kw):
        t = jnp.asarray(t)
        first = ease_in(2 * t, *args, **kw) / 2
        second = 1 - ease_in(2 - 2 * t, *args, **kw) / 2
        return jnp.where(t < 0.5, first, second)

    return _named(name or "in_out", in_out)


def _trio(ease_in, stem, in_out_core=None):
    """(in, out, in_out) from a core curve; ``in_out_core`` overrides the
    curve symmetrization composes (back uses a different overshoot k)."""
    return (
        _named("in_" + stem, ease_in),
        reflected(ease_in, "out_" + stem),
        symmetrized(in_out_core or ease_in, "in_out_" + stem),
    )


# --- polynomial / trigonometric / exponential cores ------------------------

def linear(t):
    return t


def _power(t, p):
    return jnp.asarray(t) ** p


in_quad, out_quad, in_out_quad = _trio(partial(_power, p=2), "quad")
in_cubic, out_cubic, in_out_cubic = _trio(partial(_power, p=3), "cubic")
in_quart, out_quart, in_out_quart = _trio(partial(_power, p=4), "quart")
in_quint, out_quint, in_out_quint = _trio(partial(_power, p=5), "quint")


def _sine(t):
    return 1 - jnp.cos(jnp.asarray(t) * (jnp.pi / 2))


in_sine, out_sine, in_out_sine = _trio(_sine, "sine")


def _expo(t):
    # 2^(10(t-1)) with the reference's exact-zero pin at t == 0.
    t = jnp.asarray(t)
    return jnp.where(t == 0, jnp.zeros_like(t), 2.0 ** (10 * (t - 1)))


in_expo, out_expo, in_out_expo = _trio(_expo, "expo")


def _circ(t):
    # Guarded sqrt: symmetrized() evaluates both branches, and the
    # unselected branch sees t > 1; max() keeps it (and its gradient)
    # NaN-free.
    t = jnp.asarray(t)
    return 1 - jnp.sqrt(jnp.maximum(1 - t * t, 0))


in_circ, out_circ, in_out_circ = _trio(_circ, "circ")


# --- elastic (parameterized period k) ---------------------------------------

def _elastic(t, k=0.5):
    u = jnp.asarray(t) - 1
    return -(2.0 ** (10 * u)) * jnp.sin((u - k / 4) * (2 * jnp.pi) / k)


in_elastic, out_elastic, in_out_elastic = _trio(_elastic, "elastic")


# --- back (overshoot; in_out uses a widened overshoot constant) -------------

def _back(t, k):
    t = jnp.asarray(t)
    return t * t * ((k + 1) * t - k)


in_back, out_back, in_out_back = _trio(
    partial(_back, k=1.70158), "back",
    in_out_core=partial(_back, k=1.70158 * 1.525),
)


# --- bounce (the piecewise-parabola OUT curve is the spec) -------------------

def out_bounce(t):
    t = jnp.asarray(t)
    a = (121 * t * t) / 16
    b = (363 / 40 * t * t) - (99 / 10 * t) + 17 / 5
    c = (4356 / 361 * t * t) - (35442 / 1805 * t) + 16061 / 1805
    d = (54 / 5 * t * t) - (513 / 25 * t) + 268 / 25
    return jnp.where(
        t < 4 / 11, a, jnp.where(t < 8 / 11, b, jnp.where(t < 9 / 10, c, d))
    )


in_bounce = reflected(out_bounce, "in_bounce")  # reflection is an involution
in_out_bounce = symmetrized(in_bounce, "in_out_bounce")


# --- square (step functions: boundary semantics are the contract) -----------

def in_square(t):
    t = jnp.asarray(t)
    return jnp.where(t < 1, jnp.zeros_like(t), jnp.ones_like(t))


def out_square(t):
    t = jnp.asarray(t)
    return jnp.where(t > 0, jnp.ones_like(t), jnp.zeros_like(t))


def in_out_square(t):
    t = jnp.asarray(t)
    return jnp.where(t < 0.5, jnp.zeros_like(t), jnp.ones_like(t))


def _main():
    """Plot every easing curve (debug affordance, ref sdf/ease.py:164-185)."""
    import matplotlib.pyplot as plt
    import numpy as np

    fs = [
        linear,
        in_quad, out_quad, in_out_quad,
        in_cubic, out_cubic, in_out_cubic,
        in_quart, out_quart, in_out_quart,
        in_quint, out_quint, in_out_quint,
        in_sine, out_sine, in_out_sine,
        in_expo, out_expo, in_out_expo,
        in_circ, out_circ, in_out_circ,
        in_elastic, out_elastic, in_out_elastic,
        in_back, out_back, in_out_back,
        in_bounce, out_bounce, in_out_bounce,
        in_square, out_square, in_out_square,
    ]
    x = np.linspace(0, 1, 1000)
    for f in fs:
        plt.plot(x, np.asarray(f(x)), label=f.__name__)
    plt.legend()
    plt.show()


if __name__ == "__main__":
    _main()
