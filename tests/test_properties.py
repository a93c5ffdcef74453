"""Property tests (SURVEY.md section 4): mathematical invariants of SDFs.

The reference has no tests at all; these pin down properties that hold
for *exact* SDFs independent of any oracle: the 1-Lipschitz bound, sign
correctness, smooth-min converging to hard min as k -> 0, and the
dilate/erode/shell identities.
"""

import numpy as np
import pytest

import sdf_tpu as st

RNG = np.random.RandomState(123)

# Exact SDFs (ellipsoid and non-uniform scale are documented *bounds*,
# ref sdf/d3.py:252-259/335-345, and are excluded).
EXACT = [
    ("sphere", lambda: st.sphere(1.2)),
    ("box", lambda: st.box((1.5, 1.0, 0.75))),
    ("rounded_box", lambda: st.rounded_box((1.5, 1.0, 0.75), 0.2)),
    ("torus", lambda: st.torus(1.0, 0.3)),
    ("capsule", lambda: st.capsule((-1, 0, 0), (1, 0.5, 0), 0.4)),
    ("capped_cylinder", lambda: st.capped_cylinder((0, 0, -1), (0, 0, 1), 0.6)),
    ("octahedron", lambda: st.octahedron(1.1)),
    ("union", lambda: st.sphere(1) | st.box(1.2).translate((0.8, 0, 0))),
    ("difference", lambda: st.box(1.5) - st.sphere(0.8)),
    ("rotated", lambda: st.box((1.5, 0.7, 0.4)).rotate(0.7, (1, 2, 3))),
    ("translated", lambda: st.sphere(1).translate((0.3, -0.2, 0.7))),
]


@pytest.mark.parametrize("name,build", EXACT, ids=[n for n, _ in EXACT])
def test_lipschitz_bound(name, build):
    # |d(p) - d(q)| <= ||p - q|| for exact SDFs.
    f = build()
    p = RNG.uniform(-3, 3, (2048, 3))
    q = p + RNG.uniform(-0.5, 0.5, (2048, 3))
    dp = np.asarray(f(p)).reshape(-1)
    dq = np.asarray(f(q)).reshape(-1)
    dist = np.linalg.norm(p - q, axis=1)
    assert np.all(np.abs(dp - dq) <= dist + 1e-9)


@pytest.mark.parametrize("name,build", EXACT, ids=[n for n, _ in EXACT])
def test_zero_at_surface_march(name, build):
    # Walking distance d along any direction from p cannot cross the
    # surface: d(p + d * u) >= 0 when d(p) > 0 (sphere-tracing soundness).
    f = build()
    p = RNG.uniform(-3, 3, (1024, 3))
    d = np.asarray(f(p)).reshape(-1)
    outside = d > 1e-6
    u = RNG.normal(size=(1024, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    stepped = p + u * d[:, None] * 0.999
    d2 = np.asarray(f(stepped)).reshape(-1)
    assert np.all(d2[outside] >= -1e-7)


def test_smooth_union_converges_to_min():
    a = st.sphere(1)
    b = st.box(1.2).translate((0.9, 0, 0))
    p = RNG.uniform(-2.5, 2.5, (2048, 3))
    hard = np.asarray((a | b)(p)).reshape(-1)
    for k, tol in ((1e-2, 3e-3), (1e-4, 3e-5)):
        smooth = np.asarray(a.union(b, k=k)(p)).reshape(-1)
        assert np.max(np.abs(smooth - hard)) <= tol
    # smooth union is never larger than the hard union
    smooth = np.asarray(a.union(b, k=0.3)(p)).reshape(-1)
    assert np.all(smooth <= hard + 1e-9)


def test_dilate_erode_shell_identities():
    f = st.box((1.4, 1.0, 0.8))
    p = RNG.uniform(-2, 2, (2048, 3))
    d = np.asarray(f(p)).reshape(-1)
    r = 0.17
    np.testing.assert_allclose(
        np.asarray(f.dilate(r)(p)).reshape(-1), d - r, rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(f.erode(r)(p)).reshape(-1), d + r, rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(f.shell(2 * r)(p)).reshape(-1), np.abs(d) - r, atol=1e-12
    )


def test_sign_correctness_sphere():
    f = st.sphere(1.0)
    inside = RNG.normal(size=(512, 3))
    inside = inside / np.linalg.norm(inside, axis=1, keepdims=True) * 0.9
    outside = inside / 0.9 * 1.1
    assert np.all(np.asarray(f(inside)) < 0)
    assert np.all(np.asarray(f(outside)) > 0)


def test_rotation_invariance_of_sphere():
    f = st.sphere(1.3).rotate(1.1, (1, 2, 3))
    g = st.sphere(1.3)
    p = RNG.uniform(-2, 2, (1024, 3))
    np.testing.assert_allclose(
        np.asarray(f(p)), np.asarray(g(p)), rtol=1e-12, atol=1e-12
    )


def test_translate_equivariance():
    f = st.box((1.2, 0.8, 1.5))
    off = np.array([0.4, -0.9, 0.3])
    p = RNG.uniform(-2, 2, (1024, 3))
    a = np.asarray(f.translate(off)(p + off))
    b = np.asarray(f(p))
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_k_zero_is_sharp():
    a, b = st.sphere(1), st.box(1.2)
    p = RNG.uniform(-2, 2, (1024, 3))
    np.testing.assert_array_equal(
        np.asarray(a.union(b, k=0)(p)), np.asarray((a | b)(p))
    )


def test_scale_bound_property():
    # Non-uniform scale is a conservative bound: |d_scaled| <= true
    # distance to the scaled surface, and sign is preserved.
    f = st.sphere(1).scale((1.0, 2.0, 3.0))
    p = RNG.uniform(-4, 4, (2048, 3))
    d = np.asarray(f(p)).reshape(-1)
    # sign: inside iff (x, y/2, z/3) inside unit sphere
    q = p / np.array([1.0, 2.0, 3.0])
    truth = np.linalg.norm(q, axis=1) - 1
    assert np.all(np.sign(d) == np.sign(truth))
