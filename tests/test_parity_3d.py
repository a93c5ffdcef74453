"""Numerical parity of every 3D primitive/op against the reference library.

Each case builds the same shape in both libraries and compares distances on
a random point cloud.  Ours evaluates in float64 here (x64 enabled in
conftest) so tolerances are tight; the float32 TPU path is covered by
looser-tolerance tests elsewhere.
"""

import numpy as np
import pytest

import sdf_tpu as st
from ref_oracle import ref

RNG = np.random.RandomState(42)
P = RNG.uniform(-3, 3, (4096, 3))


def check(ours, theirs, p=P, rtol=1e-9, atol=1e-9):
    a = np.asarray(ours(p)).reshape(-1)
    b = np.asarray(theirs(p)).reshape(-1)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)


PRIMITIVES = [
    ("sphere", lambda m: m.sphere(1.3)),
    ("sphere_center", lambda m: m.sphere(0.7, (0.5, -0.25, 1.0))),
    ("plane", lambda m: m.plane((1, 2, 3), (0.1, 0.2, 0.3))),
    ("slab", lambda m: m.slab(x0=-1, y1=0.5, z0=-0.25, z1=0.75)),
    ("box", lambda m: m.box(1.5)),
    ("box_size", lambda m: m.box((1, 2, 3), (0.3, -0.2, 0.1))),
    ("box_ab", lambda m: m.box(a=(-1, -2, -3), b=(1, 1, 1))),
    ("rounded_box", lambda m: m.rounded_box((1, 2, 1.5), 0.25)),
    ("wireframe_box", lambda m: m.wireframe_box((2, 1.5, 1), 0.1)),
    ("torus", lambda m: m.torus(1.5, 0.35)),
    ("capsule", lambda m: m.capsule((-1, -1, -1), (1, 1, 1), 0.5)),
    ("cylinder", lambda m: m.cylinder(0.8)),
    ("capped_cylinder", lambda m: m.capped_cylinder((0, 0, -1), (0.2, 0.1, 1), 0.6)),
    ("rounded_cylinder", lambda m: m.rounded_cylinder(0.8, 0.2, 2.0)),
    ("capped_cone", lambda m: m.capped_cone((0, 0, -1), (0, 0.2, 1), 0.9, 0.3)),
    ("rounded_cone", lambda m: m.rounded_cone(0.7, 0.3, 1.2)),
    ("ellipsoid", lambda m: m.ellipsoid((1, 1.5, 0.7))),
    ("pyramid", lambda m: m.pyramid(1.1)),
    ("tetrahedron", lambda m: m.tetrahedron(1.0)),
    ("octahedron", lambda m: m.octahedron(1.2)),
    ("dodecahedron", lambda m: m.dodecahedron(1.1)),
    ("icosahedron", lambda m: m.icosahedron(1.1)),
]


@pytest.mark.parametrize("name,build", PRIMITIVES, ids=[n for n, _ in PRIMITIVES])
def test_primitive(name, build):
    check(build(st), build(ref))


OPS = [
    ("translate", lambda m: m.sphere(1).translate((0.5, -1, 0.25))),
    ("scale_uniform", lambda m: m.box(1.2).scale(1.7)),
    ("scale_nonuniform", lambda m: m.box(1.2).scale((1.5, 0.7, 2.0))),
    ("rotate", lambda m: m.box((1, 2, 0.5)).rotate(0.6, (1, 1, 0))),
    ("rotate_to", lambda m: m.capsule((0, 0, -1), (0, 0, 1), 0.3).rotate_to((0, 0, 1), (1, 2, 3))),
    ("orient", lambda m: m.cylinder(0.5).orient((1, 0, 0))),
    ("circular_array", lambda m: m.cylinder(0.25).circular_array(16, 2)),
    ("elongate", lambda m: m.sphere(0.5).elongate((0.5, 1.0, 0.25))),
    ("twist", lambda m: m.box((1, 1, 4)).twist(0.75)),
    ("bend", lambda m: m.box((4, 1, 1)).bend(0.4)),
    (
        "bend_linear",
        lambda m: m.rounded_box([3.2, 1, 0.25], 0.1).bend_linear(
            np.array((0.75, 0, 0)), np.array((2.25, 0, 0)), np.array((0, 0, -0.1875))
        ),
    ),
    ("bend_radial", lambda m: m.box((4, 4, 0.5)).bend_radial(0.5, 1.5, 0.25)),
    (
        "transition_linear",
        lambda m: m.transition_linear(m.box(1.5), m.sphere(1.0)),
    ),
    (
        "transition_radial",
        lambda m: m.transition_radial(m.box(1.5), m.sphere(1.0), 0.25, 1.5),
    ),
    ("wrap_around", lambda m: m.box((6, 1, 1)).wrap_around(-3, 3)),
    ("union", lambda m: m.sphere(1) | m.box((2, 0.5, 0.5))),
    ("union_k", lambda m: m.sphere(1).union(m.box((2, 0.5, 0.5)), k=0.25)),
    ("difference", lambda m: m.sphere(1) - m.box((2, 0.5, 0.5))),
    ("difference_k", lambda m: m.sphere(1).difference(m.box((2, 0.5, 0.5)), k=0.25)),
    ("intersection", lambda m: m.sphere(1) & m.box(1.5)),
    ("intersection_k", lambda m: m.sphere(1).intersection(m.box(1.5), k=0.25)),
    ("blend", lambda m: m.sphere(1).blend(m.box(1.5), k=0.33)),
    ("negate", lambda m: m.sphere(1).negate()),
    ("dilate", lambda m: m.box(1).dilate(0.2)),
    ("erode", lambda m: m.box(1.4).erode(0.2)),
    ("shell", lambda m: m.sphere(1.2).shell(0.15)),
    ("repeat", lambda m: m.sphere(0.3).repeat(1.5)),
    ("repeat_axis0", lambda m: m.sphere(0.3).repeat((1.5, 0, 0))),
    ("repeat_count", lambda m: m.sphere(0.3).repeat(1.2, count=2)),
    ("repeat_padding", lambda m: m.sphere(0.6).repeat(1.0, padding=1)),
    ("repeat_padding_per_axis",
     lambda m: m.sphere(0.6).repeat((1.2, 1.0, 0), padding=(1, 2, 0))),
    (
        "k_tag",
        lambda m: m.sphere(2) & m.slab(z0=-0.5, z1=0.5).k(0.1),
    ),
    (
        "k_tag_difference",
        lambda m: m.sphere(2) - m.cylinder(1).k(0.1),
    ),
]


@pytest.mark.parametrize("name,build", OPS, ids=[n for n, _ in OPS])
def test_op(name, build):
    check(build(st), build(ref))


EASE_NAMES = [
    "linear",
    "in_quad", "out_quad", "in_out_quad",
    "in_cubic", "out_cubic", "in_out_cubic",
    "in_quart", "out_quart", "in_out_quart",
    "in_quint", "out_quint", "in_out_quint",
    "in_sine", "out_sine", "in_out_sine",
    "in_expo", "out_expo", "in_out_expo",
    "in_circ", "out_circ", "in_out_circ",
    "in_elastic", "out_elastic", "in_out_elastic",
    "in_back", "out_back", "in_out_back",
    "in_bounce", "out_bounce", "in_out_bounce",
    "in_square", "out_square", "in_out_square",
]


@pytest.mark.parametrize("name", EASE_NAMES)
def test_easing(name):
    t = np.linspace(0, 1, 1001)
    ours = np.asarray(getattr(st.ease, name)(t))
    theirs = getattr(ref.ease, name)(t)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize(
    "name", ["in_elastic", "out_elastic", "in_out_elastic"]
)
def test_easing_k_keyword(name):
    # The reference's elastic trio takes k= by keyword (ref
    # sdf/ease.py:100-107); derived out_/in_out_ curves must pass it
    # through, not just positionally.
    t = np.linspace(0, 1, 501)
    for k in (0.3, 0.5, 0.8):
        ours = np.asarray(getattr(st.ease, name)(t, k=k))
        theirs = getattr(ref.ease, name)(t, k=k)
        np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize(
    "name", ["linear", "in_out_quad", "out_bounce", "in_out_elastic"]
)
def test_easing_inside_op(name):
    e_ours = getattr(st.ease, name)
    e_ref = getattr(ref.ease, name)
    ours = st.box((4, 1, 1)).bend_linear((0, 0, -1), (0, 0, 1), (0.5, 0, 0), e_ours)
    theirs = ref.box((4, 1, 1)).bend_linear((0, 0, -1), (0, 0, 1), (0.5, 0, 0), e_ref)
    check(ours, theirs)


def test_lazy_k_tag_after_capture():
    """Tagging .k() after an expression captured the node must still apply
    (ref sdf/dn.py:12 lazy getattr; SURVEY.md 2.4.2c)."""
    ours_c = st.cylinder(1)
    ours = st.sphere(2) - ours_c
    theirs_c = ref.cylinder(1)
    theirs = ref.sphere(2) - theirs_c
    check(ours, theirs)  # sharp first
    ours_c.k(0.3)
    theirs_c.k(0.3)
    check(ours, theirs)  # now smoothed in both


def test_k_explicit_zero_falls_back_to_tag():
    """k=0 is falsy: falls back to the operand tag (ref sdf/dn.py:12)."""
    ours = st.sphere(2).union(st.box(1.5).k(0.5), k=0)
    theirs = ref.sphere(2).union(ref.box(1.5).k(0.5), k=0)
    check(ours, theirs)


def test_slice_to_2d():
    ours = (st.sphere(1) & st.box(1.5)).slice()
    theirs = (ref.sphere(1) & ref.box(1.5)).slice()
    p2 = RNG.uniform(-2, 2, (2048, 2))
    a = np.asarray(ours(p2)).reshape(-1)
    b = np.asarray(theirs(p2)).reshape(-1)
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9)
