"""Randomized CSG expression fuzzing vs the reference oracle.

Builds random expression trees from a grammar of primitives, transforms
and CSG combinators in BOTH libraries simultaneously and compares
distances on random clouds -- catches combinatorial interactions the
hand-written parity cases miss.
"""

import numpy as np
import pytest

import sdf_tpu as st
from ref_oracle import ref


def _leaf(m, rng):
    c = rng.randint(5)
    if c == 0:
        return m.sphere(rng.uniform(0.3, 1.5), rng.uniform(-0.5, 0.5, 3))
    if c == 1:
        return m.box(rng.uniform(0.4, 1.8, 3), rng.uniform(-0.5, 0.5, 3))
    if c == 2:
        return m.torus(rng.uniform(0.6, 1.4), rng.uniform(0.1, 0.4))
    if c == 3:
        return m.capsule(
            rng.uniform(-1, 1, 3), rng.uniform(-1, 1, 3), rng.uniform(0.2, 0.6)
        )
    return m.rounded_box(rng.uniform(0.5, 1.6, 3), 0.1)


def _transform(m, f, rng):
    c = rng.randint(5)
    if c == 0:
        return f.translate(rng.uniform(-0.8, 0.8, 3))
    if c == 1:
        return f.rotate(rng.uniform(0, 3.1), rng.uniform(0.1, 1, 3))
    if c == 2:
        return f.scale(rng.uniform(0.5, 2.0))
    if c == 3:
        return f.dilate(rng.uniform(0.0, 0.2))
    return f.twist(rng.uniform(-0.5, 0.5))


def _combine(m, a, b, rng):
    c = rng.randint(6)
    if c == 0:
        return a | b
    if c == 1:
        return a - b
    if c == 2:
        return a & b
    if c == 3:
        return a.union(b, k=rng.uniform(0.05, 0.4))
    if c == 4:
        return a.difference(b, k=rng.uniform(0.05, 0.4))
    return a.intersection(b, k=rng.uniform(0.05, 0.4))


def _build(m, rng, depth):
    if depth == 0:
        return _leaf(m, rng)
    c = rng.randint(3)
    if c == 0:
        return _transform(m, _build(m, rng, depth - 1), rng)
    return _combine(
        m, _build(m, rng, depth - 1), _build(m, rng, rng.randint(depth)), rng
    )


@pytest.mark.parametrize("seed", range(20))
def test_random_expression_parity(seed):
    p = np.random.RandomState(1000 + seed).uniform(-2.5, 2.5, (1024, 3))
    ours = _build(st, np.random.RandomState(seed), depth=4)
    theirs = _build(ref, np.random.RandomState(seed), depth=4)
    a = np.asarray(ours(p)).reshape(-1)
    b = np.asarray(theirs(p)).reshape(-1)
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9)


def _leaf2(m, rng):
    c = rng.randint(4)
    if c == 0:
        return m.circle(rng.uniform(0.3, 1.4), rng.uniform(-0.5, 0.5, 2))
    if c == 1:
        return m.rectangle(rng.uniform(0.4, 1.6, 2), rng.uniform(-0.5, 0.5, 2))
    if c == 2:
        return m.hexagon(rng.uniform(0.4, 1.2))
    return m.vesica(rng.uniform(0.8, 1.4), rng.uniform(0.2, 0.6))


def _build2(m, rng, depth):
    if depth == 0:
        return _leaf2(m, rng)
    c = rng.randint(4)
    f = _build2(m, rng, depth - 1)
    if c == 0:
        return f.translate(rng.uniform(-0.6, 0.6, 2))
    if c == 1:
        return f.rotate(rng.uniform(0, 3.1))
    g = _build2(m, rng, rng.randint(depth))
    if c == 2:
        return f | g
    return f.union(g, k=rng.uniform(0.05, 0.3))


@pytest.mark.parametrize("seed", range(10))
def test_random_2d_expression_parity(seed):
    p = np.random.RandomState(2000 + seed).uniform(-2.5, 2.5, (1024, 2))
    ours = _build2(st.d2, np.random.RandomState(seed), depth=4)
    theirs = _build2(ref.d2, np.random.RandomState(seed), depth=4)
    np.testing.assert_allclose(
        np.asarray(ours(p)).reshape(-1),
        np.asarray(theirs(p)).reshape(-1),
        rtol=1e-9, atol=1e-9,
    )


def _transform_exact(m, f, rng):
    # Exact-SDF transforms only: the probe cull is provably conservative
    # for exact SDFs, so every sparse mode must reproduce the dense mesh
    # bit-for-bit.  (twist is inexact and may legitimately differ --
    # ref README.md:171-178.)
    c = rng.randint(4)
    if c == 0:
        return f.translate(rng.uniform(-0.8, 0.8, 3))
    if c == 1:
        return f.rotate(rng.uniform(0, 3.1), rng.uniform(0.1, 1, 3))
    if c == 2:
        return f.scale(rng.uniform(0.5, 2.0))
    return f.dilate(rng.uniform(0.0, 0.2))


def _build_exact(m, rng, depth):
    if depth == 0:
        return _leaf(m, rng)
    c = rng.randint(3)
    if c == 0:
        return _transform_exact(m, _build_exact(m, rng, depth - 1), rng)
    return _combine(
        m,
        _build_exact(m, rng, depth - 1),
        _build_exact(m, rng, rng.randint(depth)),
        rng,
    )


def _soup(pts):
    return np.sort(np.asarray(pts).reshape(-1, 9), axis=0)


@pytest.mark.parametrize("seed", range(5))
def test_random_expression_sparse_modes_agree(seed):
    """End-to-end: dense, speculative sparse=True, and sparse='tiles'
    produce the same mesh for random exact-SDF expressions (the engine's
    three execution paths share no code above mc.py, so this pins them
    against each other).  Same triangle count exactly; vertex positions
    to ~1 ulp of float32 (each path traces a different XLA program --
    per-tile vs dense vs cull-fused evaluation -- so volume values can
    differ in the last bit, shifting interpolated vertices by
    O(1e-7))."""
    f = _build_exact(st, np.random.RandomState(100 + seed), depth=3)
    kw = dict(
        samples=2**14, batch_size=8, verbose=False,
        bounds=((-3.0,) * 3, (3.0,) * 3),
    )
    dense = f.generate(sparse=False, **kw)
    if len(dense) == 0:
        pytest.skip("surface outside fuzz bounds")
    spec = f.generate(sparse=True, **kw)
    tiles = f.generate(sparse="tiles", **kw)
    assert len(spec) == len(dense) and len(tiles) == len(dense)
    np.testing.assert_allclose(
        _soup(dense), _soup(spec), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        _soup(dense), _soup(tiles), rtol=1e-5, atol=1e-6
    )
