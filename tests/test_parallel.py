"""Sharded (multi-device) grid engine vs. the single-device path.

Runs on the 8-virtual-CPU-device mesh from conftest.py, exercising the
exact shard_map / halo / gather code used on a real TPU pod slice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sdf_tpu
from sdf_tpu.parallel import grid as pgrid


def _example_model():
    f = sdf_tpu.sphere(1) & sdf_tpu.box(1.5)
    c = sdf_tpu.cylinder(0.5)
    f -= (
        c.orient(sdf_tpu.X)
        | c.orient(sdf_tpu.Y)
        | c.orient(sdf_tpu.Z)
    )
    return f


def _tri_set(points):
    """Canonicalize a (3T, 3) vertex soup into a sorted triangle array."""
    tris = np.asarray(points, dtype=np.float64).reshape(-1, 3, 3).round(5)
    if len(tris) == 0:
        return tris.reshape(-1, 9)
    # sort vertices within each triangle, then sort triangles
    tris = np.array([t[np.lexsort(t.T[::-1])] for t in tris])
    flat = tris.reshape(-1, 9)
    return flat[np.lexsort(flat.T[::-1])]


@pytest.mark.parametrize("sparse", [True, False])
def test_sharded_matches_single_device(sparse):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    f = _example_model()
    # float64: single-device and shard_map programs compile to different
    # fusions, and f32 reassociation noise near zero crossings can flip
    # marching-cubes cells; at f64 the noise (~1e-16) cannot.
    kwargs = dict(samples=2**14, verbose=False, sparse=sparse, dtype=jnp.float64)
    mesh1 = pgrid.make_mesh(jax.devices()[:1])
    p1 = sdf_tpu.generate(f, mesh=mesh1, **kwargs)
    p8 = sdf_tpu.generate(f, mesh=pgrid.make_mesh(), **kwargs)
    assert len(p1) == len(p8)
    np.testing.assert_allclose(_tri_set(p1), _tri_set(p8), atol=1e-5)


def test_sharded_nondivisible_slabs():
    # Grid z-cell count not divisible by device count: padding + mask path.
    f = sdf_tpu.sphere(1)
    bounds = ((-1.1, -1.1, -1.1), (1.1, 1.1, 1.1))
    kwargs = dict(step=0.09, bounds=bounds, verbose=False, dtype=jnp.float64)  # 25 samples/axis
    mesh1 = pgrid.make_mesh(jax.devices()[:1])
    p1 = sdf_tpu.generate(f, mesh=mesh1, **kwargs)
    p8 = sdf_tpu.generate(f, mesh=pgrid.make_mesh(), **kwargs)
    assert len(p1) == len(p8)
    np.testing.assert_allclose(_tri_set(p1), _tri_set(p8), atol=1e-5)


def test_sharded_empty_result():
    # Surface entirely outside the sampled window -> zero triangles.
    f = sdf_tpu.sphere(1)
    bounds = ((2.0, 2.0, 2.0), (3.0, 3.0, 3.0))
    p8 = sdf_tpu.generate(
        f, bounds=bounds, step=0.1, verbose=False, sparse=False,
        mesh=pgrid.make_mesh(),
    )
    assert p8.shape == (0, 3)


def test_multihost_helpers_single_process(tmp_path):
    # Single-process degenerate path of the multi-host API.
    from sdf_tpu import parallel

    idx, count = parallel.initialize()
    assert idx == 0 and count >= 1
    pts = np.arange(27, dtype=np.float64).reshape(9, 3)
    out = parallel.gather_triangles(pts)
    np.testing.assert_array_equal(out, pts)
    path = str(tmp_path / "mh.stl")
    parallel.write_on_process0(path, pts)
    from sdf_tpu.io import stl

    v, tris = stl.read_binary_stl(path)
    assert len(tris) == 3


@pytest.mark.parametrize("builder", ["example", "sphere"])
def test_sparse_tiles_matches_dense(builder):
    f = _example_model() if builder == "example" else sdf_tpu.sphere(1)
    kwargs = dict(samples=2**14, verbose=False, dtype=jnp.float64)
    mesh1 = pgrid.make_mesh(jax.devices()[:1])
    dense = sdf_tpu.generate(f, mesh=mesh1, sparse=True, **kwargs)
    tiles = sdf_tpu.generate(f, mesh=mesh1, sparse="tiles", **kwargs)
    assert len(dense) == len(tiles)
    np.testing.assert_allclose(_tri_set(dense), _tri_set(tiles), atol=1e-9)


def test_sparse_tiles_stats_match_dense(capsys):
    f = _example_model()
    sdf_tpu.generate(f, samples=2**14, verbose=True, sparse="tiles",
                     mesh=pgrid.make_mesh(jax.devices()[:1]))
    out = capsys.readouterr().out
    assert "skipped" in out and "nonempty" in out


def test_sparse_tiles_respects_batch_size():
    # tile size must follow the engine batch_size (code-review finding:
    # hardcoded 32 lost triangles with batch_size=16)
    f = sdf_tpu.sphere(1)
    kwargs = dict(step=0.05, bounds=((-1.2,) * 3, (1.2,) * 3), verbose=False,
                  dtype=jnp.float64, mesh=pgrid.make_mesh(jax.devices()[:1]))
    dense = sdf_tpu.generate(f, sparse=True, batch_size=16, **kwargs)
    tiles = sdf_tpu.generate(f, sparse="tiles", batch_size=16, **kwargs)
    assert len(dense) == len(tiles)
    np.testing.assert_allclose(_tri_set(dense), _tri_set(tiles), atol=1e-9)


def test_sparse_tiles_sharded_matches_single_device():
    f = _example_model()
    kwargs = dict(samples=2**14, verbose=False, sparse="tiles",
                  dtype=jnp.float64)
    p1 = sdf_tpu.generate(f, mesh=pgrid.make_mesh(jax.devices()[:1]), **kwargs)
    p8 = sdf_tpu.generate(f, mesh=pgrid.make_mesh(), **kwargs)
    assert len(p1) == len(p8)
    np.testing.assert_allclose(_tri_set(p1), _tri_set(p8), atol=1e-9)


def test_sparse_tiles_sharded_nondivisible_and_empty():
    # tile count not divisible by device count + fully-culled window
    f = sdf_tpu.sphere(1)
    p = sdf_tpu.generate(
        f, step=0.09, bounds=((-1.1,) * 3, (1.1,) * 3), verbose=False,
        sparse="tiles", batch_size=8, dtype=jnp.float64,
        mesh=pgrid.make_mesh(),
    )
    q = sdf_tpu.generate(
        f, step=0.09, bounds=((-1.1,) * 3, (1.1,) * 3), verbose=False,
        sparse=True, batch_size=8, dtype=jnp.float64,
        mesh=pgrid.make_mesh(jax.devices()[:1]),
    )
    assert len(p) == len(q)
    np.testing.assert_allclose(_tri_set(p), _tri_set(q), atol=1e-9)
    empty = sdf_tpu.generate(
        f, bounds=((2.0,) * 3, (3.0,) * 3), step=0.1, verbose=False,
        sparse="tiles", mesh=pgrid.make_mesh(),
    )
    assert empty.shape == (0, 3)


def test_auto_sparsity_routes_to_tiles():
    """sparse=True must not densely evaluate heavily-culled volumes: a
    small model in a huge bounding box routes to the tiled path
    automatically (reference skip semantics, ref sdf/core.py:45-48)."""
    from sdf_tpu.core import engine

    f = sdf_tpu.sphere(1)
    bounds = ((-6.0,) * 3, (6.0,) * 3)
    kwargs = dict(step=0.12, bounds=bounds, verbose=False, dtype=jnp.float64)
    mesh1 = pgrid.make_mesh(jax.devices()[:1])
    auto = sdf_tpu.generate(f, sparse=True, mesh=mesh1, **kwargs)
    stats = dict(engine.LAST_STATS)
    assert "auto_tiles" in stats and stats["auto_tiles"] >= 0.6
    assert "sparse_tiles" in stats  # tiled phase actually ran
    dense = sdf_tpu.generate(f, sparse=False, mesh=mesh1, **kwargs)
    np.testing.assert_allclose(
        _tri_set(auto), _tri_set(dense), atol=1e-12
    )
    # explicit opt-outs keep the dense path
    sdf_tpu.generate(f, sparse=False, mesh=mesh1, **kwargs)
    assert "auto_tiles" not in engine.LAST_STATS


def test_sharded_phases_accept_pallas_kernels(monkeypatch):
    """On TPU, compact.indices_of/indices_and_ranktable_of are pallas_calls
    whose out_shapes carry no vma annotation; every shard_map wrapping
    them must pass check_vma=False or multi-device generate() crashes at
    trace time.  CPU CI normally takes the flatnonzero fallback and
    never sees it -- force the interpret-mode kernels here so the
    z-slab AND tile-sharded emit phases trace the same ops TPU would
    (round-2 review finding)."""
    from sdf_tpu.core import compact

    calls = {"n": 0}

    def fake_indices(m, cap, backend=None):
        calls["n"] += 1
        return compact.indices_of_pallas(m, cap, interpret=True)[0]

    orig_ranktable = compact.indices_and_ranktable_of

    def fake_ranktable(m, cap, backend=None, _interpret=False):
        calls["n"] += 1
        return orig_ranktable(m, cap, backend="tpu", _interpret=True)

    monkeypatch.setattr(compact, "indices_of", fake_indices)
    monkeypatch.setattr(
        compact, "indices_and_ranktable_of", fake_ranktable
    )
    jax.clear_caches()  # force retracing through the patched kernels
    f = sdf_tpu.sphere(1)
    kwargs = dict(samples=2**12, verbose=False)
    mesh1 = pgrid.make_mesh(jax.devices()[:1])
    p1 = sdf_tpu.generate(f, mesh=mesh1, **kwargs)
    p8 = sdf_tpu.generate(f, mesh=pgrid.make_mesh(), **kwargs)
    np.testing.assert_array_equal(_tri_set(p1), _tri_set(p8))
    t1 = sdf_tpu.generate(f, mesh=mesh1, sparse="tiles", **kwargs)
    t8 = sdf_tpu.generate(f, mesh=pgrid.make_mesh(), sparse="tiles", **kwargs)
    np.testing.assert_array_equal(_tri_set(t1), _tri_set(t8))
    assert calls["n"] > 0, "patched kernels never traced (vacuous test)"



def test_bench_mesh_harness():
    """bench.py --mesh plumbing on the 8-virtual-device CI topology: mesh
    sizes 1..8, dense + tiles rows, weak-scaling efficiencies computed.
    (The >=85% north-star number itself needs real multi-chip hardware;
    this pins that the command will produce it when pointed there.)"""
    import json
    import sys
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    lines = []
    result = bench.mesh_main(base_samples=2**13, out=lines.append)
    assert result == json.loads(lines[0])
    assert result["metric"] == "mesh_weak_scaling"
    assert result["visible_devices"] == 8
    assert [r["devices"] for r in result["rows"]] == [1, 2, 4, 8]
    for row in result["rows"]:
        assert row["samples"] == 2**13 * row["devices"]
        for path in ("dense", "tiles"):
            assert row[f"{path}_s"] > 0
            assert row[f"{path}_triangles"] > 0
            assert 0 < row[f"{path}_weak_eff"]
    assert result["rows"][0]["dense_weak_eff"] == 1.0
    assert result["value"] == result["rows"][-1]["dense_weak_eff"]


def test_tiles_race_memo_not_clobbered_by_required():
    """A use_pallas=True call must not overwrite a race-lost False memo
    with its compiled block size: 'compiles' and 'won the race' are
    different facts, and auto-mode routing owns the memo (code-review
    finding)."""
    import jax.numpy as jnp
    from sdf_tpu.core import sparse as sp
    from sdf_tpu.core.node import cast
    from sdf_tpu.core import engine

    f = cast(sdf_tpu.sphere(1.0), jnp.float32)
    X = Y = Z = np.linspace(-1.2, 1.2, 17).astype(np.float32)
    tiles = np.zeros((1, 3), np.int32)
    args = (f, jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z),
            jnp.asarray(tiles), 1, 16, jnp.float32, 128, True)
    key = (engine._pallas_key(f, jnp.float32, (17, 17)), 16, 1)
    sp._BATCHED_CZ.clear()
    # simulate a prior race loss
    sp._BATCHED_CZ[key] = False
    vols, case, mode = sp._eval_tiles_auto(*args, required=True)
    assert mode == "batched"  # required forces the kernel
    assert sp._BATCHED_CZ[key] is False, (
        "required call clobbered the auto-mode race verdict"
    )
    # auto mode still honors the False memo (interpret CI: no race)
    vols2, case2, mode2 = sp._eval_tiles_auto(*args, required=False)
    assert mode2 == "xla"
    sp._BATCHED_CZ.clear()
