"""Reference-style custom SDFs: bare closures under @sdf3/@op3
(ref README.md:258-285)."""

import jax.numpy as jnp
import numpy as np

import sdf_tpu as st
from sdf_tpu import ORIGIN, sdf3, op3


def test_custom_jnp_closure():
    # jnp-based closure in the reference's documented style.
    @sdf3
    def my_sphere(radius=1, center=ORIGIN):
        def f(p):
            return jnp.linalg.norm(p - center, axis=1) - radius

        return f

    f = my_sphere(1.1)
    p = np.random.RandomState(0).uniform(-2, 2, (256, 3))
    expect = np.linalg.norm(p, axis=1) - 1.1
    np.testing.assert_allclose(
        np.asarray(f(p)).reshape(-1), expect, rtol=1e-12
    )
    # composes with built-ins and generates end-to-end
    g = f & st.box(1.5)
    pts = g.generate(samples=2**12, verbose=False)
    assert len(pts) > 0


def test_custom_numpy_closure_host_callback():
    # Verbatim reference closure: pure numpy, runs via pure_callback.
    @sdf3
    def np_sphere(radius=1, center=ORIGIN):
        def f(p):
            return np.linalg.norm(np.asarray(p) - center, axis=1) - radius

        return f

    f = np_sphere(0.9)
    pts = f.generate(samples=2**12, verbose=False, use_pallas=False)
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r, 0.9, atol=2e-2)


def test_custom_op3_closure():
    @op3
    def my_translate(other, offset):
        def f(p):
            return other(p - np.asarray(offset))

        return f

    f = st.sphere(1).my_translate((0, 0, 2))
    p = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 0.0]])
    d = np.asarray(f(p)).reshape(-1)
    np.testing.assert_allclose(d, [-1.0, 1.0], atol=1e-6)
    pts = f.generate(samples=2**12, verbose=False)
    assert len(pts) > 0


def test_points_native_closure():
    # A closure written against the SoA Points API works in tier 1.
    @sdf3
    def torus_like(r1=1.0, r2=0.3):
        def f(p):
            a = jnp.sqrt(p[:, 0] ** 2 + p[:, 1] ** 2) - r1
            return jnp.sqrt(a * a + p[:, 2] ** 2) - r2

        return f

    f = torus_like()
    pts = f.generate(samples=2**12, verbose=False)
    assert len(pts) > 0


def test_custom_closure_respects_dtype_cast():
    # Legacy closures capture float64 numpy params invisibly; the wrapper
    # must cast output to the coordinate dtype so the fused expression
    # does not promote to float64 (code-review finding).
    from sdf_tpu.core.node import Points, cast

    @op3
    def my_translate(other, offset):
        def f(p):
            return other(p - np.asarray(offset))

        return f

    node = cast(st.sphere(1).my_translate((0, 0, 2)), jnp.float32)
    p = Points(
        jnp.zeros((4,), jnp.float32),
        jnp.zeros((4,), jnp.float32),
        jnp.zeros((4,), jnp.float32),
    )
    assert node(p).dtype == jnp.float32


def test_custom_closure_bug_surfaces_clearly():
    # A genuine typo inside the closure must raise, not be silently
    # routed to the host-callback tier (code-review finding).
    @sdf3
    def broken():
        def f(p):
            return np.linalg.nrom(p, axis=1)  # typo

        return f

    f = broken()
    with __import__("pytest").raises(AttributeError):
        f.generate(samples=2**9, verbose=False, use_pallas=False)


def test_call_on_exactly_dim_points_unambiguous():
    # N == dim is the one case where an SoA field array has the same
    # shape as a (dim,) parameter vector; the __call__ boundary pads it
    # away.  A field-dependent op must give the same answers at N=3 as
    # within a larger batch (node.py Points._coerce).
    f = st.sphere(1).twist(2.0) | st.box(1.1).bend(1.5)
    p4 = np.random.RandomState(1).uniform(-1.5, 1.5, (4, 3))
    d4 = np.asarray(f(p4)).reshape(-1)
    d3 = np.asarray(f(p4[:3])).reshape(-1)
    assert d3.shape == (3,)
    np.testing.assert_allclose(d3, d4[:3], rtol=1e-6)
    # 2D: N == 2
    g = st.circle(1).elongate((0.3, 0.1))
    p2 = np.random.RandomState(2).uniform(-1.5, 1.5, (3, 2))
    d2 = np.asarray(g(p2[:2])).reshape(-1)
    np.testing.assert_allclose(
        d2, np.asarray(g(p2)).reshape(-1)[:2], rtol=1e-6
    )
