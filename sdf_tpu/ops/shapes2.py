"""2D primitives, positioning ops and 2D->3D lifts (parity: ref sdf/d2.py).

Same pytree-node + structure-of-arrays design as shapes3; see that module's
docstring.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.node import SDF2, Points, as_param, op2, op23, sdf2
from . import csg, easing as ease

# Constants (ref sdf/d2.py:9-14)

ORIGIN = np.array((0, 0))

X = np.array((1, 0))
Y = np.array((0, 1))

UP = Y

# Helpers shared with shapes3 (see ops/vecmath.py)

from .vecmath import (  # noqa: E402
    _dot,
    _length,
    _max,
    _mdot,
    _min,
    _normalize,
    _pmax,
    _vec,
    _vmul,
)


# Primitives


@sdf2
def circle(radius=1, center=ORIGIN):
    params = {"radius": as_param(radius), "center": as_param(center)}

    def fn(q, p):
        return _length(p - q["center"]) - q["radius"]

    return fn, params


@sdf2
def line(normal=UP, point=ORIGIN):
    params = {
        "normal": as_param(_normalize(np.asarray(normal, dtype=np.float64))),
        "point": as_param(point),
    }

    def fn(q, p):
        return _mdot(q["point"] - p, q["normal"])

    return fn, params


@sdf2
def slab(x0=None, y0=None, x1=None, y1=None, k=None):
    fs = []
    if x0 is not None:
        fs.append(line(X, (x0, 0)))
    if x1 is not None:
        fs.append(line(-X, (x1, 0)))
    if y0 is not None:
        fs.append(line(Y, (0, y0)))
    if y1 is not None:
        fs.append(line(-Y, (0, y1)))
    return intersection(*fs, k=k)


@sdf2
def rectangle(size=1, center=ORIGIN, a=None, b=None):
    if a is not None and b is not None:
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        size = b - a
        center = a + size / 2
        return rectangle(size, center)
    params = {"size": as_param(size), "center": as_param(center)}

    def fn(q, p):
        d = abs(p - q["center"]) - jnp.asarray(q["size"]) / 2
        return _length(_pmax(d, 0)) + _min(d.hmax(), 0)

    return fn, params


@sdf2
def rounded_rectangle(size, radius, center=ORIGIN):
    try:
        r0, r1, r2, r3 = radius
    except TypeError:
        r0 = r1 = r2 = r3 = radius
    params = {
        "size": as_param(size),
        "r": as_param((r0, r1, r2, r3)),
        "center": as_param(center),
    }

    def fn(q, p):
        x, y = p.c
        r0_, r1_, r2_, r3_ = q["r"]
        # Per-quadrant corner radius (ref sdf/d2.py:122-129 uses boolean
        # assignment; jnp.where is the traced equivalent).
        r = jnp.where(
            x > 0,
            jnp.where(y > 0, r0_, r1_),
            jnp.where(y <= 0, r2_, r3_),
        )
        d = abs(p) - jnp.asarray(q["size"]) / 2 + r
        return _min(_max(d.c[0], d.c[1]), 0) + _length(_pmax(d, 0)) - r

    return fn, params


@sdf2
def equilateral_triangle():
    def fn(q, p):
        k = 3**0.5
        p = _vec(jnp.abs(p.c[0]) - 1, p.c[1] + 1 / k)
        w = p.c[0] + k * p.c[1] > 0
        vx = (p.c[0] - k * p.c[1]) / 2
        vy = (-k * p.c[0] - p.c[1]) / 2
        p = _vec(jnp.where(w, vx, p.c[0]), jnp.where(w, vy, p.c[1]))
        p = _vec(p.c[0] - jnp.clip(p.c[0], -2, 0), p.c[1])
        return -_length(p) * jnp.sign(p.c[1])

    return fn, {}


@sdf2
def hexagon(r):
    params = {"r": as_param(float(r) * 3**0.5 / 2)}

    def fn(q, p):
        r_ = q["r"]
        k = np.array((3**0.5 / -2, 0.5, np.tan(np.pi / 6)))
        p = abs(p)
        m = _min(k[0] * p.c[0] + k[1] * p.c[1], 0)
        p = _vec(p.c[0] - 2 * k[0] * m, p.c[1] - 2 * k[1] * m)
        p = _vec(
            p.c[0] - jnp.clip(p.c[0], -k[2] * r_, k[2] * r_),
            p.c[1] - r_,
        )
        return _length(p) * jnp.sign(p.c[1])

    return fn, params


@sdf2
def rounded_x(w, r):
    params = {"w": as_param(w), "r": as_param(r)}

    def fn(q, p):
        p = abs(p)
        d = _min(p.c[0] + p.c[1], q["w"]) * 0.5
        # subtract the per-point field from EACH component explicitly:
        # `p - d` would misread a (dim,)-shaped field as a per-component
        # vector when the batch size happens to equal dim (reproduced by
        # code review at exactly 2 points).
        return _length(_vec(p.c[0] - d, p.c[1] - d)) - q["r"]

    return fn, params


@sdf2
def polygon(points):
    # One (n, 2) param leaf + a rolled lax.fori_loop over edges: the
    # reference's per-vertex Python loop would unroll ~15 ops per vertex
    # into the jaxpr (minutes-long compiles for digitized outlines).
    params = {"points": as_param(np.asarray(points, dtype=np.float64))}

    from ..core.hybrid import mark_gather

    @mark_gather  # rolled edge loop: dynamic_slice, no Mosaic lowering
    def fn(q, p):
        import jax

        pts = jnp.asarray(q["points"])  # (n, 2); jnp: indexed by traced i
        n = pts.shape[0]
        x, y = p.c
        shape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y))
        d0x = x - pts[0, 0]
        d0y = y - pts[0, 1]
        d = jnp.broadcast_to(d0x * d0x + d0y * d0y, shape)
        s = jnp.ones(shape, dtype=d.dtype)

        def body(i, carry):
            d, s = carry
            vi = pts[i]
            vj = pts[(i + n - 1) % n]
            ex, ey = vj[0] - vi[0], vj[1] - vi[1]
            wx, wy = x - vi[0], y - vi[1]
            t = jnp.clip((wx * ex + wy * ey) / (ex * ex + ey * ey), 0, 1)
            bx, by = wx - ex * t, wy - ey * t
            d = _min(d, bx * bx + by * by)
            c1 = y >= vi[1]
            c2 = y < vj[1]
            c3 = ex * wy > ey * wx
            s = jnp.where((c1 & c2 & c3) | (~c1 & ~c2 & ~c3), -s, s)
            return d, s

        d, s = jax.lax.fori_loop(0, n, body, (d, s))
        return s * jnp.sqrt(d)

    return fn, params


@sdf2
def vesica(r, d):
    params = {"r": as_param(r), "d": as_param(d)}

    def fn(q, p):
        r_, d_ = q["r"], q["d"]
        p = abs(p)
        b = jnp.sqrt(r_ * r_ - d_ * d_)
        return jnp.where(
            (p.c[1] - b) * d_ > p.c[0] * b,
            _length(_vec(p.c[0], p.c[1] - b)),
            _length(_vec(p.c[0] + d_, p.c[1])) - r_,
        )

    return fn, params


# Positioning


@op2
def translate(other, offset):
    params = {"other": other, "offset": as_param(offset)}

    def fn(q, p):
        return q["other"](p - q["offset"])

    return fn, params


@op2
def scale(other, factor):
    try:
        x, y = factor
    except TypeError:
        x = y = factor
    params = {"other": other, "s": as_param((x, y)), "m": as_param(min(x, y))}

    def fn(q, p):
        return q["other"](p / q["s"]) * q["m"]

    return fn, params


@op2
def rotate(other, angle):
    s = np.sin(angle)
    c = np.cos(angle)
    matrix = np.array([[c, -s], [s, c]]).T
    params = {"other": other, "matrix": as_param(matrix)}

    def fn(q, p):
        return q["other"](_mdot(p, q["matrix"]))

    return fn, params


@op2
def circular_array(other, count):
    # True k-way union of rotated copies in 2D (ref sdf/d2.py:242-245),
    # unlike the 2-evaluation 3D variant.
    angles = [i / count * 2 * np.pi for i in range(count)]
    return union(*[other.rotate(a) for a in angles])


# Alterations


@op2
def elongate(other, size):
    params = {"other": other, "size": as_param(size)}

    def fn(q, p):
        d = abs(p) - q["size"]
        x, y = d.c
        w = _min(_max(x, y), 0)
        return q["other"](_pmax(d, 0)) + w

    return fn, params


# 2D => 3D Operations


@op23
def extrude(other, h):
    params = {"other": other, "h": as_param(h)}

    def fn(q, p):
        d = q["other"](p[:, :2])
        w = _vec(d, jnp.abs(p.c[2]) - q["h"] / 2)
        return _min(_max(w.c[0], w.c[1]), 0) + _length(_pmax(w, 0))

    return fn, params


@op23
def extrude_to(a, b, h, e=ease.linear):
    params = {"a": a, "b": b, "h": as_param(h)}

    def fn(q, p):
        d1 = q["a"](p[:, :2])
        d2 = q["b"](p[:, :2])
        t = e(jnp.clip(p.c[2] / q["h"], -0.5, 0.5) + 0.5)
        d = d1 + (d2 - d1) * t
        w = _vec(d, jnp.abs(p.c[2]) - q["h"] / 2)
        return _min(_max(w.c[0], w.c[1]), 0) + _length(_pmax(w, 0))

    return fn, params


@op23
def revolve(other, offset=0):
    params = {"other": other, "offset": as_param(offset)}

    def fn(q, p):
        w = _vec(_length(p[:, :2]) - q["offset"], p.c[2])
        return q["other"](w)

    return fn, params


# Common n-D CSG ops registered for SDF2 (ref sdf/d2.py:290-298)

union = op2(csg.union)
difference = op2(csg.difference)
intersection = op2(csg.intersection)
blend = op2(csg.blend)
negate = op2(csg.negate)
dilate = op2(csg.dilate)
erode = op2(csg.erode)
shell = op2(csg.shell)
repeat = op2(csg.repeat)
