"""Numerical parity of 2D primitives/ops and 2D->3D lifts vs the reference.

Same oracle strategy as test_parity_3d: both libraries build the same
shape; distances compared on a random point cloud in float64.
"""

import numpy as np
import pytest

import sdf_tpu as st
from ref_oracle import ref

RNG = np.random.RandomState(7)
P2 = RNG.uniform(-3, 3, (4096, 2))
P3 = RNG.uniform(-3, 3, (4096, 3))

POLY = [(-1.0, -0.8), (1.2, -0.5), (0.9, 1.1), (-0.2, 1.4), (-1.3, 0.4)]


def check2(build, p=P2, rtol=1e-9, atol=1e-9):
    a = np.asarray(build(st.d2)(p)).reshape(-1)
    b = np.asarray(build(ref.d2)(p)).reshape(-1)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)


def check3(build, p=P3, rtol=1e-9, atol=1e-9):
    a = np.asarray(build(st)(p)).reshape(-1)
    b = np.asarray(build(ref)(p)).reshape(-1)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)


CASES_2D = [
    ("circle", lambda m: m.circle(1.3)),
    ("circle_center", lambda m: m.circle(0.8, (0.4, -0.3))),
    ("line", lambda m: m.line((1, 2), (0.1, -0.2))),
    ("slab2", lambda m: m.slab(x0=-1, y1=0.5)),
    ("rectangle", lambda m: m.rectangle(1.4)),
    ("rectangle_ab", lambda m: m.rectangle(a=(-1, -0.5), b=(0.8, 1.2))),
    # size as np array: the reference computes size/2 and a tuple TypeErrors
    ("rounded_rectangle", lambda m: m.rounded_rectangle(np.array((1.5, 1.0)), 0.2)),
    ("rounded_rectangle_per_corner",
     lambda m: m.rounded_rectangle(np.array((1.5, 1.0)), (0.1, 0.2, 0.3, 0.05))),
    ("equilateral_triangle", lambda m: m.equilateral_triangle()),
    ("hexagon", lambda m: m.hexagon(1.1)),
    ("rounded_x", lambda m: m.rounded_x(1.5, 0.2)),
    ("polygon", lambda m: m.polygon(POLY)),
    ("vesica", lambda m: m.vesica(1.2, 0.4)),
    ("translate2", lambda m: m.circle(1).translate((0.5, -0.25))),
    ("scale2_uniform", lambda m: m.rectangle(1.2).scale(1.6)),
    ("scale2_nonuniform", lambda m: m.rectangle(1.2).scale((1.5, 0.7))),
    ("rotate2", lambda m: m.rectangle((1.5, 0.8)).rotate(0.7)),
    ("circular_array2", lambda m: m.circle(0.3).translate((1.2, 0)).circular_array(5)),
    ("elongate2", lambda m: m.circle(0.5).elongate((0.4, 0.8))),
    ("union2", lambda m: m.circle(1) | m.rectangle((1.8, 0.6))),
    ("difference2", lambda m: m.rectangle(1.6) - m.circle(0.7)),
    ("smooth_union2", lambda m: m.circle(1).union(m.rectangle((1.8, 0.6)), k=0.25)),
    ("repeat2", lambda m: m.circle(0.3).repeat(1.5, padding=1)),
]


@pytest.mark.parametrize("name,build", CASES_2D, ids=[n for n, _ in CASES_2D])
def test_2d(name, build):
    check2(build)


def _lift_build(m, name):
    d2 = m.d2
    if name == "extrude":
        return d2.hexagon(1).extrude(1.2)
    if name == "extrude_to":
        return d2.rectangle(1.5).extrude_to(d2.circle(0.8), 2)
    if name == "revolve":
        return d2.hexagon(0.8).revolve(2.0)
    if name == "slice_then_extrude":
        return (m.sphere(1) & m.box(1.5)).slice().extrude(0.2)
    raise KeyError(name)


@pytest.mark.parametrize(
    "name", ["extrude", "extrude_to", "revolve", "slice_then_extrude"]
)
def test_lift(name):
    a = np.asarray(_lift_build(st, name)(P3)).reshape(-1)
    b = np.asarray(_lift_build(ref, name)(P3)).reshape(-1)
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9)
