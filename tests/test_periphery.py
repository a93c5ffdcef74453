"""Text/image SDFs, mesh import -> SDF, IO formats, slices, progress."""

import os

import numpy as np
import pytest

import sdf_tpu as st
from ref_oracle import ref

FONT = "DejaVuSans"


# --- text / image textures --------------------------------------------------

def test_text_parity_with_reference():
    ours = st.text(FONT, "Ab", height=1)
    theirs = ref.text(FONT, "Ab", height=1)
    rng = np.random.RandomState(0)
    p = rng.uniform(-1.5, 1.5, (2048, 2))
    a = np.asarray(ours(p)).reshape(-1)
    b = np.asarray(theirs(p)).reshape(-1)
    # float32 texture leaf vs the reference's float64; distances are in
    # world units so 1e-5 is tight.
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_measure_text_matches_reference():
    assert st.measure_text(FONT, "Hello") == pytest.approx(
        ref.measure_text(FONT, "Hello")
    )


def test_image_parity_with_reference(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(1)
    arr = (rng.rand(48, 64) > 0.5).astype(np.uint8) * 255
    path = str(tmp_path / "img.png")
    Image.fromarray(arr, mode="L").save(path)

    ours = st.image(path, width=2)
    theirs = ref.image(path, width=2)
    p = rng.uniform(-2, 2, (2048, 2))
    np.testing.assert_allclose(
        np.asarray(ours(p)).reshape(-1),
        np.asarray(theirs(p)).reshape(-1),
        atol=1e-5,
    )
    assert st.measure_image(path) == pytest.approx(ref.measure_image(path))


def test_text_extrude_generates(tmp_path):
    f = st.rounded_box((3, 1.5, 0.2), 0.1) - st.text(FONT, "Hi").extrude(1)
    pts = f.generate(samples=2**14, verbose=False)
    assert len(pts) > 0


# --- mesh import / mesh -> SDF ----------------------------------------------

def _cube_mesh(half=1.0):
    v = np.array(
        [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ],
        dtype=np.float64,
    ) * half
    faces = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # bottom (z=-1), outward -z
            [4, 5, 6], [4, 6, 7],  # top
            [0, 1, 5], [0, 5, 4],  # y=-1
            [2, 3, 7], [2, 7, 6],  # y=+1
            [1, 2, 6], [1, 6, 5],  # x=+1
            [3, 0, 4], [3, 4, 7],  # x=-1
        ],
        dtype=np.int64,
    )
    return st.Mesh(v, faces)


def test_mesh_sdf_approximates_box():
    mesh = _cube_mesh(1.0)
    f = mesh.sdf(voxel_size=0.1, half_width=0.5)
    rng = np.random.RandomState(2)
    p = rng.uniform(-1.4, 1.4, (512, 3))
    ours = np.asarray(f(p)).reshape(-1)
    expect = np.asarray(st.box(2.0)(p)).reshape(-1)
    band = np.abs(expect) < 0.3  # narrow band only
    # trilinear grid + winding sign vs exact box SDF (corners round off a
    # little at 0.1 voxels, hence the tolerance)
    np.testing.assert_allclose(ours[band], expect[band], atol=0.04)
    # sign correctness everywhere within the band region
    assert np.all(np.sign(ours[band]) == np.sign(expect[band]))


def test_mesh_sdf_attribute_fallthrough():
    f = _cube_mesh(0.5).sdf(voxel_size=0.1)
    assert f.array.ndim == 3
    assert len(f.xyz) == 3
    assert f.background > 0


def test_mesh_helpers():
    m = _cube_mesh(1.0).translated((1, 0, 0)).scaled(2)
    a, b = m.bounding_box
    np.testing.assert_allclose(a, (0, -2, -2))
    np.testing.assert_allclose(b, (4, 2, 2))
    c = m.centered()
    a, b = c.bounding_box
    np.testing.assert_allclose(np.add(a, b), (0, 0, 0), atol=1e-12)


def test_mesh_sdf_composes_with_ops():
    f = _cube_mesh(1.0).sdf(voxel_size=0.15, half_width=0.6)
    g = f.erode(0.1).shell(0.2)  # the hollowed() pattern (ref examples/mesh.py)
    pts = g.generate(step=0.15, verbose=False, sparse=False)
    assert len(pts) > 0


# --- IO ---------------------------------------------------------------------

def test_save_obj_roundtrip(tmp_path):
    from sdf_tpu.io import meshfmt

    path = str(tmp_path / "out.obj")
    pts = st.sphere(1).save(path, samples=2**14, verbose=False)
    v, tris = meshfmt.read_mesh(path)
    assert len(tris) == len(pts) // 3
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=2e-2)


def test_save_ply_roundtrip(tmp_path):
    from sdf_tpu.io import meshfmt

    path = str(tmp_path / "out.ply")
    pts = st.sphere(1).save(path, samples=2**14, verbose=False)
    v, tris = meshfmt.read_mesh(path)
    assert len(tris) == len(pts) // 3


# --- slices & debug ---------------------------------------------------------

def test_sample_slice_axes():
    f = st.sphere(1)
    a, extent, axes = st.sample_slice(f, w=64, h=64, z=0)
    assert a.shape == (64, 64) and axes == "YX"
    a, extent, axes = st.sample_slice(f, w=32, h=32, x=0)
    assert a.shape == (32, 32) and axes == "ZY"
    with pytest.raises(Exception):
        st.sample_slice(f)


def test_verbose_output_format(capsys):
    st.sphere(1).generate(samples=2**12, verbose=True)
    out = capsys.readouterr().out
    assert "min " in out and "max " in out and "step " in out
    assert "skipped" in out and "empty" in out and "nonempty" in out
    assert "triangles in" in out


# --- checkpoint / resume ----------------------------------------------------

def test_checkpoint_resume(tmp_path):
    path = str(tmp_path / "run.ckpt")
    f = st.sphere(1)
    a = f.generate(samples=2**12, verbose=False, checkpoint=path)
    assert os.path.exists(path)
    b = f.generate(samples=2**12, verbose=False, checkpoint=path)
    np.testing.assert_array_equal(a, b)
    # different model -> fingerprint mismatch -> recompute, not stale load
    c = st.sphere(1.2).generate(samples=2**12, verbose=False, checkpoint=path)
    assert len(c) != len(a) or not np.array_equal(a, c)


def test_bounds_estimation_matches_reference():
    import jax.numpy as jnp
    from sdf_tpu.core import engine
    import sdf.core as refcore  # via ref_oracle sys.path

    def build(m):
        f = m.sphere(1) & m.box(1.5)
        c = m.cylinder(0.5)
        return f - (c.orient(m.X) | c.orient(m.Y) | c.orient(m.Z))

    ours = np.asarray(engine._estimate_bounds(build(st), jnp.float64))
    theirs = np.asarray(refcore._estimate_bounds(build(ref)))
    # jnp.linspace and np.linspace differ by ~1 ulp; the 32 refinement
    # iterations amplify that to ~1e-7, which is far below a grid step.
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_bounds_estimation_float32_tracks_reference():
    """float32-eval bounds stay next to the reference's float64 box.

    The refinement arithmetic runs in host float64 regardless of the
    eval dtype (engine._estimate_bounds_host); when the loop state was
    carried in float32 on device, the canonical example model converged
    to an asymmetric (-0.795, 0.902) box instead of the reference's
    (-0.845, 0.845) -- an 8% triangle-count swing at equal samples, and
    a different answer per backend.  Pin that f32 bounds now agree with
    the f64 box to well under one probe-cell, and are symmetric for
    this symmetric model."""
    import jax.numpy as jnp
    from sdf_tpu.core import engine

    def build(m):
        f = m.sphere(1) & m.box(1.5)
        c = m.cylinder(0.5)
        return f - (c.orient(m.X) | c.orient(m.Y) | c.orient(m.Z))

    b32 = np.asarray(engine._estimate_bounds(build(st), jnp.float32))
    b64 = np.asarray(engine._estimate_bounds(build(st), jnp.float64))
    np.testing.assert_allclose(b32, b64, atol=2e-4)
    np.testing.assert_allclose(b32[0], -b32[1], atol=2e-4)


def test_checkpoint_fingerprint_stable_across_builds():
    # Two separately-built identical expressions must fingerprint
    # identically (code-review finding: repr(treedef) embedded closure
    # addresses, so resume after restart never matched).
    from sdf_tpu.utils import checkpoint as ckpt

    X = np.arange(5.0)
    a = ckpt.fingerprint(st.sphere(1.25), X, X, X, True)
    b = ckpt.fingerprint(st.sphere(1.25), X, X, X, True)
    assert a == b
    c = ckpt.fingerprint(st.sphere(1.35), X, X, X, True)
    assert a != c


def test_per_axis_step_tuple():
    # step may be a per-axis tuple (ref sdf/core.py:100-103)
    f = st.sphere(1)
    pts = f.generate(step=(0.2, 0.25, 0.3), bounds=((-1.1,) * 3, (1.1,) * 3),
                     verbose=False)
    assert len(pts) > 0
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r, 1.0, atol=0.05)


def test_progress_bar_output(capsys):
    from sdf_tpu.utils.progress import Bar

    bar = Bar(10, enabled=True)
    bar.update(5)
    bar.done()
    out = capsys.readouterr().out
    assert "%" in out and "10" in out


def test_checkpoint_fingerprint_covers_closure_statics():
    # Statics captured in op closures (circular_array's count, an easing
    # function) are invisible to the pytree; the fingerprint must still
    # distinguish them (advisor finding: circular_array(4) vs (12) hit
    # the same cache entry).
    from sdf_tpu.utils import checkpoint as ckpt

    X = np.arange(5.0)

    def fp(f):
        return ckpt.fingerprint(f, X, X, X, True)

    base = st.capsule(-st.Z, st.Z, 0.2)
    a = fp(base.circular_array(4))
    b = fp(base.circular_array(12))
    assert a != b
    # stable across rebuilds of the same model
    assert fp(base.circular_array(4)) == a

    g = st.box(1)
    e1 = fp(g.bend_linear(-st.Z, st.Z, st.X * 0.2, st.ease.linear))
    e2 = fp(g.bend_linear(-st.Z, st.Z, st.X * 0.2, st.ease.in_out_quad))
    assert e1 != e2


def test_checkpoint_statics_regression(tmp_path):
    # End-to-end: changing ONLY a closure-captured static must not
    # resume from the other model's checkpoint.
    path = str(tmp_path / "run.ckpt")
    base = st.capsule(-st.Z, st.Z, 0.3)
    kw = dict(samples=2**12, verbose=False, checkpoint=path,
              bounds=((-1.5,) * 3, (1.5,) * 3))
    a = base.circular_array(4).generate(**kw)
    b = base.circular_array(12).generate(**kw)
    assert len(a) != len(b) or not np.array_equal(a, b)


def test_structure_key_stable_and_static_sensitive():
    from sdf_tpu.utils import checkpoint as ckpt

    base = st.capsule(-st.Z, st.Z, 0.2)
    a = ckpt.structure_key(base.circular_array(4), "f32")
    assert ckpt.structure_key(base.circular_array(4), "f32") == a
    assert ckpt.structure_key(base.circular_array(12), "f32") != a
    # leaf VALUES must not affect the structure key (same program)
    assert (
        ckpt.structure_key(st.sphere(1.0), "f32")
        == ckpt.structure_key(st.sphere(2.0), "f32")
    )


def test_workers_kwarg_warns():
    with pytest.warns(UserWarning, match="workers"):
        st.sphere(1).generate(
            samples=2**10, verbose=False, workers=8,
            bounds=((-1.2,) * 3, (1.2,) * 3),
        )


def test_debug_triangles_marks_skipped_and_empty():
    # debug=True appends one 12-triangle inset box per skipped/empty
    # batch (ref sdf/core.py:49,57,166-200).
    from sdf_tpu.core import engine

    kw = dict(step=0.1, bounds=((-2.0,) * 3, (2.0,) * 3), verbose=False,
              batch_size=8)
    plain = st.sphere(1).generate(**kw)
    stats = dict(engine.LAST_STATS)
    dbg = st.sphere(1).generate(debug=True, **kw)
    flagged = stats["skipped"] + stats["empty"]
    assert flagged > 0
    assert len(dbg) == len(plain) + 36 * flagged
    # the marker boxes live strictly inside their batch extents
    extra = dbg[len(plain):]
    assert np.all(extra >= -2.0) and np.all(extra <= 2.0)


def test_bounds_memo_keyed_on_expression():
    """Repeat generate() on an unchanged model reuses memoized bounds;
    any parameter or static change re-probes."""
    import sdf_tpu as st
    from sdf_tpu.core import engine

    engine._BOUNDS_MEMO.clear()
    a = engine._estimate_bounds(st.sphere(1.0))
    assert len(engine._BOUNDS_MEMO) == 1
    # Rebuilt-identical expression: memo hit (fresh fn identities).
    b = engine._estimate_bounds(st.sphere(1.0))
    assert a == b and len(engine._BOUNDS_MEMO) == 1
    # Changed parameter leaf: memo miss, different bounds.
    c = engine._estimate_bounds(st.sphere(2.0))
    assert len(engine._BOUNDS_MEMO) == 2 and c != a
    # Changed closure static (circular_array count): memo miss.
    base = st.sphere(0.3).translate((1.0, 0, 0))
    engine._estimate_bounds(st.circular_array(base, 4))
    engine._estimate_bounds(st.circular_array(base, 12))
    assert len(engine._BOUNDS_MEMO) == 4


def test_write_mesh_stl_routes_to_builtin(tmp_path):
    # write_mesh/.write_indexed must handle .stl via the in-tree binary
    # writer (meshio-free envs included); read/write APIs are symmetric.
    from sdf_tpu.io import meshfmt, stl

    soup = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
        dtype=np.float64,
    )
    path = str(tmp_path / "m.stl")
    meshfmt.write_mesh(path, soup)
    v, tris = stl.read_binary_stl(path)
    assert len(tris) == 2
    np.testing.assert_allclose(
        np.sort(v[tris.reshape(-1)], axis=0), np.sort(soup, axis=0)
    )


def test_read_obj_negative_relative_indices(tmp_path):
    from sdf_tpu.io import meshfmt

    path = str(tmp_path / "rel.obj")
    with open(path, "w") as fp:
        fp.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    v, tris = meshfmt._read_obj(path)
    np.testing.assert_array_equal(tris, [[0, 1, 2]])


def test_read_ascii_stl_clear_error(tmp_path):
    from sdf_tpu.io import stl

    path = str(tmp_path / "a.stl")
    with open(path, "w") as fp:
        fp.write(
            "solid a\nfacet normal 0 0 1\nouter loop\n"
            "vertex 0 0 0\nvertex 1 0 0\nvertex 0 1 0\n"
            "endloop\nendfacet\nendsolid a\n"
        )
    with pytest.raises(ValueError, match="ASCII STL"):
        stl.read_binary_stl(path)


def _load_perf_checker():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_docs_perf",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "check_docs_perf.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_docs_perf_consistency():
    """Every committed BENCH_r*.json satisfies the canonical quotes
    (docs/PERF_QUOTES.json), and the canonical range strings appear in
    the docs that quote them -- so a quoted headline can never again
    exclude a driver-captured session (round-3 verdict; gate semantics
    weather-normalized in round 5)."""
    mod = _load_perf_checker()
    errors = mod.check()
    assert not errors, "\n".join(errors)


def test_perf_gate_catches_compute_regression():
    """The weather-normalized gate still catches a REAL regression: a
    synthetic artifact with normal probe rates but collapsed eval
    utilization (what a 2x+ compute regression looks like in any
    weather) must fail, while an in-band utilization passes (round-4
    verdict item 1's done-criterion)."""
    mod = _load_perf_checker()
    q = mod.load_quotes()["quotes"]["eval_util_2p26"]
    assert "lo" in q, "eval_util_2p26 must carry a hard band"
    slow = {"eval_util_2p26": q["lo"] * 0.45}  # ~2x compute regression
    assert mod.check_value("eval_util_2p26", q, slow, "synthetic")
    ok = {"eval_util_2p26": (q["lo"] + q["hi"]) / 2}
    assert not mod.check_value("eval_util_2p26", q, ok, "synthetic")


def test_perf_gate_weather_fields_have_no_band():
    """Raw wall-clock fields drift 2-4x with tunnel weather (round-4:
    0.32 vs 0.76 G pts/s on identical code within the hour), so none of
    them may carry a two-sided band -- only the absolute BASELINE.md
    north-star floor (>10x CPU) or informational status."""
    mod = _load_perf_checker()
    quotes = mod.load_quotes()["quotes"]
    for fld in ("value", "vs_baseline", "e2e_ms", "knurling_2p26_e2e_s",
                "device_pipeline_ms", "eval_2p26_pts_per_s",
                "dispatch_floor_ms"):
        q = quotes[fld]
        assert "lo" not in q and "hi" not in q, (
            f"{fld}: raw wall-clock metrics must not carry a hard band"
        )
    # a weather-hole session (r04's measured 0.32 G = 68x) passes ...
    q = quotes["value"]
    assert not mod.check_value("value", q, {"value": 0.32e9}, "syn")
    # ... but sub-north-star throughput still fails, in any weather
    assert mod.check_value("value", q, {"value": 30e6}, "syn")
