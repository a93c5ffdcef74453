"""Fused Pallas eval+classify kernel vs the XLA path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdf_tpu.core import engine, mc, pallas_eval
from sdf_tpu.core.node import cast
from sdf_tpu.models import example, gearlike
from sdf_tpu.models.zoo import sphere


@pytest.mark.parametrize("builder", [sphere, example, gearlike])
def test_pallas_matches_xla(builder):
    f = builder()
    sdf_c = cast(f, jnp.float64)
    bounds = engine._estimate_bounds(f, jnp.float64)
    (x0, y0, z0), (x1, y1, z1) = bounds
    step = 0.13
    X = np.arange(x0, x1, step)
    Y = np.arange(y0, y1, step)
    Z = np.arange(z0, z1, step)

    vol_ref = np.asarray(engine._eval_volume(sdf_c, X, Y, Z, jnp.float64))
    case_ref = np.asarray(mc._cell_cases(jnp.asarray(vol_ref)))

    vol, case = pallas_eval.eval_and_classify(
        sdf_c, X, Y, Z, jnp.float64, bz=4, interpret=True
    )
    # Angle-bearing models (gearlike: circular_array) use the kernel-safe
    # polynomial arctan2 inside kernel traces (Mosaic has no atan
    # lowering; vecmath.arctan2) -- 7.6e-9 max error by construction.
    tol = dict(rtol=2e-8, atol=2e-8) if builder is gearlike else dict(
        rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(vol), vol_ref, **tol)
    mism = int((np.asarray(case) != case_ref).sum())
    assert mism <= (case_ref.size // 10000), mism  # sign flips only at
    # |d| < 2e-8 crossings (none expected at this grid)


def test_generate_with_pallas_matches_default():
    import jax
    from sdf_tpu.parallel.grid import make_mesh

    f = example()
    mesh1 = make_mesh(jax.devices()[:1])  # same (single-device) tri order
    a = engine.generate(
        f, samples=2**13, verbose=False, dtype=jnp.float64, mesh=mesh1
    )
    b = engine.generate(
        f, samples=2**13, verbose=False, dtype=jnp.float64, use_pallas=True,
        mesh=mesh1,
    )
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_generate_pallas_failure_fallback_and_required(monkeypatch):
    # On real TPUs non-vectorizable expressions fail Mosaic lowering (in
    # CPU interpret mode even host callbacks run, so force a failure):
    # auto must fall back to XLA and cache the failure; use_pallas=True
    # means REQUIRED and must surface the error on both code paths.
    import pytest
    import jax
    import sdf_tpu as st
    from sdf_tpu.core import pallas_eval
    from sdf_tpu.parallel.grid import make_mesh

    def boom(*a, **kw):
        raise RuntimeError("mosaic lowering failed (simulated)")

    monkeypatch.setattr(pallas_eval, "eval_and_classify", boom)
    monkeypatch.setattr(pallas_eval, "eval_and_classify_traced", boom)

    engine._PALLAS_BROKEN.clear()
    f = st.sphere(1)
    mesh1 = make_mesh(jax.devices()[:1])

    # single-device auto: fallback + cached
    pts = engine.generate(
        f, samples=2**12, verbose=False, use_pallas="auto", mesh=mesh1
    )
    assert len(pts) > 0 and len(engine._PALLAS_BROKEN) == 1

    # sharded auto: fallback + cached
    pts = engine.generate(
        f, samples=2**12, verbose=False, use_pallas="auto"
    )
    assert len(pts) > 0 and len(engine._PALLAS_BROKEN) >= 1

    # required: raises on both paths, even though the key is cached
    with pytest.raises(RuntimeError):
        engine.generate(
            f, samples=2**12, verbose=False, use_pallas=True, mesh=mesh1
        )
    with pytest.raises(RuntimeError):
        engine.generate(f, samples=2**12, verbose=False, use_pallas=True)
    engine._PALLAS_BROKEN.clear()


def test_sharded_pallas_matches_sharded_xla():
    import jax
    from sdf_tpu.core.node import cast
    from sdf_tpu.parallel.grid import make_mesh, mesh_and_march

    f = cast(example(), jnp.float64)
    mesh = make_mesh()
    X = np.arange(-1.3, 1.3, 0.11)
    skip = np.zeros((1, 1, 1), dtype=bool)
    a, pta = mesh_and_march(f, X, X, X, skip, 32, mesh, jnp.float64)
    b, ptb = mesh_and_march(
        f, X, X, X, skip, 32, mesh, jnp.float64,
        use_pallas=True, interpret=True,
    )
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(pta), np.asarray(ptb))


def test_fused_tile_kernel_matches_xla_tiles():
    """sparse='tiles' with the fused per-tile Pallas kernel (interpret
    mode on CPU) matches the XLA tiles path.  1-ulp eval differences
    between the two compiled programs are expected (fma contraction);
    canonicalize + tolerance like the sharded-path tests."""
    import numpy as np
    import jax.numpy as jnp
    import sdf_tpu as st
    import jax
    from sdf_tpu.parallel.grid import make_mesh

    f = st.sphere(1) & st.box(1.5)
    c = st.cylinder(0.5)
    f -= c.orient(st.X) | c.orient(st.Y) | c.orient(st.Z)
    kw = dict(samples=2**14, verbose=False, dtype=jnp.float64,
              bounds=((-1.05,) * 3, (1.05,) * 3), batch_size=8,
              mesh=make_mesh(jax.devices()[:1]))  # force the single-
    # device tiles path: with 8 virtual devices generate() auto-meshes
    # into the SHARDED tiles path, which ignores use_pallas (the fused
    # tile kernel would never run -- vacuous test).
    a = f.generate(sparse="tiles", use_pallas=False, **kw)
    b = f.generate(sparse="tiles", use_pallas=True, **kw)
    assert len(a) == len(b)
    ta = np.asarray(a).reshape(-1, 9).round(6)
    tb = np.asarray(b).reshape(-1, 9).round(6)
    ta = ta[np.lexsort(ta.T[::-1])]
    tb = tb[np.lexsort(tb.T[::-1])]
    np.testing.assert_allclose(ta, tb, atol=1e-5)


def _hybrid_case(f):
    """Fused-kernel (interpret) vol+case vs the XLA eval for one expr."""
    import numpy as np
    import jax.numpy as jnp
    from sdf_tpu.core import pallas_eval, engine, mc
    from sdf_tpu.core.node import cast

    X = np.arange(-1.0, 1.0, 0.1)
    sdf_c = cast(f, jnp.float32)
    vol, case = pallas_eval.eval_and_classify(
        sdf_c, X, X, X, jnp.float32, interpret=True
    )
    ref = engine._eval_volume(sdf_c, X, X, X, jnp.float32)
    np.testing.assert_allclose(np.asarray(vol), np.asarray(ref), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(case), np.asarray(mc._cell_cases(ref))
    )


def test_hybrid_gather_split_texture():
    """Texture SDFs run in the fused kernel via the XLA-gather pre-pass
    (core/hybrid.py), including under a point transform above them."""
    import numpy as np
    import sdf_tpu as st

    g = np.meshgrid(np.linspace(-1, 1, 32), np.linspace(-1, 1, 32))
    img = (np.hypot(*g) < 0.7).astype(np.uint8) * 255
    _hybrid_case(st.image(img, width=1.5).extrude(0.5) & st.sphere(0.8))
    _hybrid_case(st.image(img, width=1.5).extrude(0.8).twist(2.0))


def test_hybrid_gather_split_polygon_and_legacy():
    import numpy as np
    import sdf_tpu as st

    _hybrid_case(st.polygon([(0.5, 0), (0, 0.5), (-0.5, 0)]).extrude(0.5))
    _hybrid_case(st.sdf3(lambda: (lambda p: np.linalg.norm(p, axis=1) - 0.7))())


def test_hybrid_gather_multi_call_parent():
    """circular_array evaluates its child twice: two recordings must pair
    with two placeholder pops in execution order."""
    import sdf_tpu as st

    blade = st.polygon([(0.4, 0), (0.6, 0.1), (0.6, -0.1)]).extrude(0.2)
    _hybrid_case(st.circular_array(blade, 6))


def test_hybrid_gather_sparse_tiles():
    """sparse='tiles' + use_pallas=True works for gather expressions."""
    import numpy as np
    import jax.numpy as jnp
    import sdf_tpu as st
    import jax
    from sdf_tpu.parallel.grid import make_mesh

    g = np.meshgrid(np.linspace(-1, 1, 32), np.linspace(-1, 1, 32))
    img = (np.hypot(*g) < 0.7).astype(np.uint8) * 255
    f = st.image(img, width=1.5).extrude(0.5)
    kw = dict(samples=2**14, verbose=False, dtype=jnp.float64,
              bounds=((-1.05,) * 3, (1.05,) * 3), batch_size=8,
              mesh=make_mesh(jax.devices()[:1]))  # force the single-
    # device tiles path: with 8 virtual devices generate() auto-meshes
    # into the SHARDED tiles path, which ignores use_pallas (the fused
    # tile kernel would never run -- vacuous test).
    a = f.generate(sparse="tiles", use_pallas=False, **kw)
    b = f.generate(sparse="tiles", use_pallas=True, **kw)
    assert len(a) == len(b)
    ta = np.asarray(a).reshape(-1, 9).round(6)
    tb = np.asarray(b).reshape(-1, 9).round(6)
    ta = ta[np.lexsort(ta.T[::-1])]
    tb = tb[np.lexsort(tb.T[::-1])]
    np.testing.assert_allclose(ta, tb, atol=1e-5)


def test_sharded_pallas_hybrid_gather():
    """The shard_map dense path runs the fused kernel for gather-bearing
    expressions too (hybrid split inside each device's slab)."""
    import numpy as np
    import jax.numpy as jnp
    import sdf_tpu as st
    from sdf_tpu.core.node import cast
    from sdf_tpu.parallel.grid import make_mesh, mesh_and_march

    g = np.meshgrid(np.linspace(-1, 1, 32), np.linspace(-1, 1, 32))
    img = (np.hypot(*g) < 0.7).astype(np.uint8) * 255
    f = cast(st.image(img, width=1.5).extrude(0.5) & st.sphere(0.8),
             jnp.float64)
    mesh = make_mesh()
    X = np.arange(-0.8, 0.8, 0.07)
    skip = np.zeros((1, 1, 1), dtype=bool)
    a, pta = mesh_and_march(f, X, X, X, skip, 32, mesh, jnp.float64)
    b, ptb = mesh_and_march(
        f, X, X, X, skip, 32, mesh, jnp.float64,
        use_pallas=True, interpret=True,
    )
    ta = np.asarray(a).reshape(-1, 9).round(6)
    tb = np.asarray(b).reshape(-1, 9).round(6)
    ta = ta[np.lexsort(ta.T[::-1])]
    tb = tb[np.lexsort(tb.T[::-1])]
    assert ta.shape == tb.shape
    np.testing.assert_allclose(ta, tb, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pta), np.asarray(ptb))


def test_hybrid_gather_sparse_tiles_multi_call_parent():
    """Gather subtree under circular_array in the TILES kernel: the
    recorded field count is the child-EVALUATION count (2 here), not the
    tree-occurrence count (1) -- the kernel must slice len(wins) gather
    refs or the placeholders pop an empty deque (review finding)."""
    import numpy as np
    import jax.numpy as jnp
    import sdf_tpu as st
    import jax
    from sdf_tpu.parallel.grid import make_mesh

    blade = st.polygon([(0.4, 0), (0.6, 0.1), (0.6, -0.1)]).extrude(0.2)
    f = st.circular_array(blade, 6)
    kw = dict(samples=2**13, verbose=False, dtype=jnp.float64,
              bounds=((-0.8,) * 3, (0.8,) * 3), batch_size=8,
              mesh=make_mesh(jax.devices()[:1]))  # see note above
    a = f.generate(sparse="tiles", use_pallas=False, **kw)
    b = f.generate(sparse="tiles", use_pallas=True, **kw)
    assert len(a) == len(b) > 0
    ta = np.asarray(a).reshape(-1, 9).round(6)
    tb = np.asarray(b).reshape(-1, 9).round(6)
    ta = ta[np.lexsort(ta.T[::-1])]
    tb = tb[np.lexsort(tb.T[::-1])]
    np.testing.assert_allclose(ta, tb, atol=1e-5)


def test_batched_tile_kernel_matches_xla():
    import sdf_tpu as st
    """Lane-major batched tile kernel (interpret): vols + cases equal the
    XLA chunked tile eval, including edge tiles (index clamping) and
    padded tile rows; covers rotate/circular_array (the kernel-safe
    polynomial arctan2, vecmath.arctan2)."""
    import numpy as np
    import jax.numpy as jnp
    from sdf_tpu.core import pallas_eval, sparse as sp
    from sdf_tpu.core.node import cast
    import jax

    f = st.sphere(1) & st.box(1.5)
    f |= st.capsule(-st.Z, st.Z, 0.3).rotate(st.pi / 4).circular_array(6, 0.8)
    sdf_c = cast(f, jnp.float32)
    X = np.arange(-1.3, 1.3, 0.04)
    s = 16
    ncx = (len(X) - 1 + s - 1) // s
    tiles = np.argwhere(np.ones((ncx,) * 3, bool)).astype(np.int32)
    ntc = len(tiles)  # every tile, incl. clamped edge tiles
    Xd = jnp.asarray(X, jnp.float32)
    tiles_d = jnp.asarray(tiles)
    ref = sp._eval_tiles(sdf_c, Xd, Xd, Xd, tiles_d, ntc, 128, s)
    case_ref = jax.jit(sp._tile_cases, static_argnums=1)(ref, s)
    for cz, xs in ((4, None), (2, 8), (1, 4), (2, 5)):
        v2, c2 = pallas_eval.eval_tiles_and_classify_batched(
            sdf_c, Xd, Xd, Xd, tiles_d, ntc, s, interpret=True, cz=cz, xs=xs
        )
        np.testing.assert_allclose(
            np.asarray(v2), np.asarray(ref), atol=2e-6
        )
        # the polynomial arctan2 can flip sign classifications only for
        # |d| < 3e-7; allow a vanishing fraction of case flips
        mism = int((np.asarray(c2) != np.asarray(case_ref)).sum())
        assert mism <= case_ref.size * 1e-4, mism


def test_tiles_auto_routing_interpret():
    import sdf_tpu as st
    """mesh_sparse_tiles(use_pallas=True) routes gather-free expressions
    to the batched kernel and produces the XLA path's triangles."""
    import numpy as np
    import jax.numpy as jnp

    f = st.sphere(1) | st.sphere(0.5).translate((1.2, 0, 0))
    kw = dict(samples=2**14, verbose=False, dtype=jnp.float32,
              bounds=((-1.3, -1.2, -1.2), (1.9, 1.2, 1.2)), batch_size=8)
    import jax
    from sdf_tpu.parallel.grid import make_mesh

    kw["mesh"] = make_mesh(jax.devices()[:1])
    a = f.generate(sparse="tiles", use_pallas=False, **kw)
    b = f.generate(sparse="tiles", use_pallas=True, **kw)
    ta = np.asarray(a).reshape(-1, 9).round(5)
    tb = np.asarray(b).reshape(-1, 9).round(5)
    ta = ta[np.lexsort(ta.T[::-1])]
    tb = tb[np.lexsort(tb.T[::-1])]
    np.testing.assert_allclose(ta, tb, atol=1e-4)
