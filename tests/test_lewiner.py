"""Lewiner-variant (trilinear-faithful MC33) topology tests.

Validates the extended table set three ways:
  * structurally -- every entry is watertight at the table level (interior
    edges pair with opposite orientation; boundary edges are exactly the
    marching-squares loops, traversed in the pinned surface direction);
  * against the numerical oracle -- sampled realizable entries reproduce
    the loop partition of a densely sampled trilinear interpolant;
  * end-to-end -- the device classify matches the float64 mirror, tunnels
    are emitted where the trilinear has them, Euler characteristics and
    the dense/tiles/sharded path agreement hold under the variant.

Matches the decision procedure of skimage's Lewiner mesher, the
reference's default (ref sdf/core.py:16-18); see docs/TOPOLOGY.md.
"""

import hashlib
import os

import numpy as np
import pytest

import sdf_tpu as st
from sdf_tpu.core import mc
from sdf_tpu.core import mc33
from sdf_tpu.core import mc33_build as mb
from sdf_tpu.core.mc_tables import NTRI_TABLE, TRI_TABLE

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "example_topology_lewiner.npz"
)


def _tables():
    return mc33.load_tables()


def test_layout_census():
    """Extended-code layout: 9 interior slots per facebits combo, offsets
    consistent, total 5904 = sum over cases of 2^ambiguous * 9."""
    d = _tables()
    assert d["tri_table"].shape[0] == mb.N_EXT == 5904
    nxt = 0
    for case in range(256):
        assert mb.OFFSET[case] == nxt
        nxt += (1 << len(mb.ambiguous_faces(case))) * 9
    assert nxt == mb.N_EXT


def test_forced_slice_equals_default():
    """The (facebits=0, ibits=0) slice IS the default table, case by case,
    bit for bit -- the default rule is the all-separated/no-tunnel slice
    of the extended tables."""
    d = _tables()
    for case in range(256):
        e = mb.OFFSET[case]
        n = int(d["ntri"][e])
        assert n == int(NTRI_TABLE[case]), case
        assert np.array_equal(
            d["tri_table"][e][:n].astype(np.int32), TRI_TABLE[case][:n]
        ), case


def _entry_boundary_check(case, fb, tris):
    """Table-level watertightness of one entry: every interior directed
    edge pairs with its reverse; the boundary is exactly the loops of
    (case, fb), each loop edge traversed once in REVERSED (surface)
    direction."""
    from collections import Counter

    directed = Counter()
    for a, b, c in tris:
        for u, v in ((a, b), (b, c), (c, a)):
            directed[(u, v)] += 1
    # expected boundary: reversed loop edges
    expected = Counter()
    for loop in mb.loops_of(case, fb):
        for i in range(len(loop)):
            expected[(loop[(i + 1) % len(loop)], loop[i])] += 1
    # peel the expected boundary off; the rest must pair up exactly
    for e, k in expected.items():
        assert directed[e] >= k, (case, fb, e)
        directed[e] -= k
    directed = +directed
    for (u, v), k in directed.items():
        assert directed[(v, u)] == k, (case, fb, (u, v))


def test_all_entries_watertight_with_pinned_boundary():
    d = _tables()
    tri = d["tri_table"]
    ntri = d["ntri"]
    for case in range(256):
        for fb in range(1 << len(mb.ambiguous_faces(case))):
            for ib in range(9):
                e = mb.OFFSET[case] + fb * 9 + ib
                tris = [tuple(t) for t in tri[e][: ntri[e]]]
                _entry_boundary_check(case, fb, tris)


def test_classify_matches_float64_oracle():
    """Device classify (jax, f64 under x64) == mc33_build.ext_code."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    vol = rng.standard_normal((12, 11, 13))
    ext_dev = np.asarray(mc33.classify_ext(jnp.asarray(vol, jnp.float64)))
    nx, ny, nz = vol.shape
    corners = np.stack(
        [
            vol[ox : nx - 1 + ox, oy : ny - 1 + oy, oz : nz - 1 + oz]
            for ox, oy, oz in np.asarray(mb.CORNER_OFFSETS)
        ],
        axis=-1,
    )
    ext_ref = mb.ext_code(corners.reshape(-1, 8)).reshape(ext_dev.shape)
    assert np.array_equal(ext_dev, ext_ref)


# Degenerate cells harvested from the canonical example model at step
# 0.04 (grid-aligned CSG: flat faces make the interior test's quadratic
# an exact boundary double root) -- exactly the family where the naive
# pre-guard solver let numpy-vs-XLA rounding (FMA contraction) flip
# tunnel bits (38 cells diverged on this model before the shared guarded
# interior_flags).  Corner order: CORNER_OFFSETS.
_DEGENERATE_CELLS = [
    [0.3580868897091918, 0.3258959235173755, 0.3113351974228378,
     0.3499999999999992, 0.3499999999999992, 0.30999999999999517,
     0.30999999999999517, 0.3499999999999992],
    [-0.05000000000000071, -0.08309518948453065, -0.04332310828824326,
     -0.04332310828824326, -0.05000000000000071, -0.0803447251418774,
     -0.040370243444249, -0.040370243444249],
    [0.3499999999999992, 0.3499999999999992, 0.3499999999999992,
     0.35572858640658467, 0.30999999999999517, 0.30999999999999517,
     0.30999999999999517, 0.32348026052524403],
    [0.23336936884292925, 0.2300000000000022, 0.2300000000000022,
     0.2300000000000022, 0.27000000000000046, 0.27000000000000046,
     0.27000000000000046, 0.27000000000000046],
    [0.23923190379189396, 0.23923190379189574, 0.23923190379189574,
     0.19933407243254475, 0.2331667187174724, 0.23316671871747374,
     0.23316671871747374, 0.19405882918443362],
    [0.11337325277733967, 0.11767616061182906, 0.08719823399415105,
     0.08277421469112767, 0.10999999999999943, 0.10999999999999943,
     0.0699999999999994, 0.0699999999999994],
    [0.20470353879533149, 0.18999999999999995, 0.16894109285506342,
     0.20470353879533149, 0.22143223445631932, 0.18999999999999995,
     0.183772233983162, 0.22143223445631932],
    [-0.0035871324805683003, -0.043323108288245926, -0.00999999999999801,
     -0.0035871324805683003, -0.009901951359280403, -0.04918120870983955,
     -0.00999999999999801, -0.009901951359280403],
    [0.2729493312775664, 0.30999999999999517, 0.3174217244299484,
     0.28545711713771027, 0.27000000000000046, 0.30999999999999517,
     0.30999999999999517, 0.27000000000000046],
]

# Engineered exact interior tie: f = 1 - x - y - z + 4 x y z has a
# critical point exactly at the cell center with critical value exactly
# 0 (the surface passes exactly through it) -- Lewiner's strict
# inequality on the exact value means NO tunnel; the guarded test's fv
# deadband makes both backends classify it that way regardless of the
# sign of rounding residue.  Scaled variants make the arithmetic inexact
# so the decision rides on the deadband, not on exact dyadic math.
_TIE_CELL = [1.0, 0.0, -1.0, 0.0, 0.0, -1.0, 2.0, -1.0]


def _vol_of(v8, dtype):
    import jax.numpy as jnp

    vol = np.zeros((2, 2, 2))
    for ci, (ox, oy, oz) in enumerate(np.asarray(mb.CORNER_OFFSETS)):
        vol[ox, oy, oz] = v8[ci]
    return jnp.asarray(vol, dtype)


@pytest.mark.parametrize("scale", [1.0, 0.1, 1 / 3, np.pi / 10])
def test_tie_cell_no_tunnel_both_backends(scale):
    """The engineered exact-tie cell classifies 'no tunnel' in f64 and
    f32, jit and eager, device and oracle -- the deadband absorbs the
    rounding residue whose sign is backend-dependent."""
    import jax
    import jax.numpy as jnp

    v = [x * scale for x in _TIE_CELL]
    assert int(mb.interior_bits(np.asarray(v)[None])[0]) == 0
    for dt in (jnp.float64, jnp.float32):
        vol = _vol_of(v, dt)
        jitted = int(np.asarray(mc33.classify_ext(vol))[0, 0, 0])
        with jax.disable_jit():
            eager = int(np.asarray(mc33._classify_ext_jit(vol, 0.0, None))[0, 0, 0])
        assert jitted == eager, dt
    ext64 = int(np.asarray(mc33.classify_ext(_vol_of(v, jnp.float64)))[0, 0, 0])
    assert ext64 == int(mb.ext_code(np.asarray(v, np.float64)[None])[0])


def test_degenerate_cells_match_oracle():
    """Model-harvested degenerate cells: f64 device (jit AND eager) ==
    float64 oracle; f32 jit == f32 eager (same-dtype determinism)."""
    import jax
    import jax.numpy as jnp

    for v in _DEGENERATE_CELLS + [_TIE_CELL]:
        ref = int(mb.ext_code(np.asarray(v, np.float64)[None])[0])
        vol64 = _vol_of(v, jnp.float64)
        assert int(np.asarray(mc33.classify_ext(vol64))[0, 0, 0]) == ref, v
        with jax.disable_jit():
            assert (
                int(np.asarray(mc33._classify_ext_jit(vol64, 0.0, None))[0, 0, 0])
                == ref
            ), v
        vol32 = _vol_of(v, jnp.float32)
        jitted = int(np.asarray(mc33.classify_ext(vol32))[0, 0, 0])
        with jax.disable_jit():
            eager = int(np.asarray(mc33._classify_ext_jit(vol32, 0.0, None))[0, 0, 0])
        assert jitted == eager, v


def test_example_volume_classify_matches_oracle():
    """The FULL example-model volume (the grid-aligned CSG workload where
    the pre-guard solver diverged on 38 degenerate cells): jitted device
    classify == float64 oracle, cell for cell."""
    import jax.numpy as jnp

    from sdf_tpu.core import engine
    from sdf_tpu.core.node import cast

    f = st.sphere(1) & st.box(1.5)
    c = st.cylinder(0.5)
    f -= c.orient(st.X) | c.orient(st.Y) | c.orient(st.Z)
    step = 0.04
    X = np.arange(-1.1, 1.1, step)
    vol = engine._eval_volume(cast(f, jnp.float64), X, X, X, jnp.float64)
    ext_dev = np.asarray(mc33.classify_ext(vol))
    voln = np.asarray(vol)
    nx, ny, nz = voln.shape
    corners = np.stack(
        [
            voln[ox : nx - 1 + ox, oy : ny - 1 + oy, oz : nz - 1 + oz]
            for ox, oy, oz in np.asarray(mb.CORNER_OFFSETS)
        ],
        axis=-1,
    )
    ext_ref = mb.ext_code(corners.reshape(-1, 8)).reshape(ext_dev.shape)
    assert np.array_equal(ext_dev, ext_ref)


def _partition_from_tris(loops, tris):
    """Loop partition implied by a triangulation: loops whose edges are
    connected through shared triangle vertices."""
    parent = list(range(12))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent[find(a)] = find(b)

    for a, b, c in tris:
        union(a, b)
        union(b, c)
    groups = {}
    for li, loop in enumerate(loops):
        groups.setdefault(find(loop[0]), []).append(li)
    return tuple(sorted(tuple(sorted(g)) for g in groups.values()))


def test_sampled_entries_match_trilinear_oracle():
    """For a deterministic sample of realizable extended codes: the table
    entry's loop partition equals the densely-sampled trilinear topology
    of a fresh random realization (not the builder's representative).
    Entries with recorded class mixture (conflict_rate > 0; see
    docs/TOPOLOGY.md) are excluded -- their majority choice is pinned by
    the builder instead."""
    d = _tables()
    realizable = np.flatnonzero(d["realizable"] & (d["conflict_rate"] == 0))
    rng = np.random.default_rng(23)
    chosen = rng.choice(realizable, size=60, replace=False)
    by_case = {}
    for e in chosen:
        case = int(np.searchsorted(mb.OFFSET, e, "right") - 1)
        by_case.setdefault(case, []).append(int(e))
    checked = 0
    for case, exts in by_case.items():
        v = mb.sample_realizations(case, 40000, rng)
        codes = mb.ext_code(v, np.full(len(v), case))
        for e in exts:
            idx = np.flatnonzero(codes == e)
            if not len(idx):
                continue  # rare code not re-hit in this draw
            rel = e - mb.OFFSET[case]
            fb = rel // 9
            loops = mb.loops_of(case, fb)
            part = mb._partition_escalating(v[idx[0]], loops, 64)
            if part is None:
                continue  # adversarially thin sample
            tris = d["tri_table"][e][: d["ntri"][e]]
            assert _partition_from_tris(loops, tris) == part, (case, fb, e)
            checked += 1
    assert checked >= 30  # the sample must actually exercise entries


def _tunnel_realization():
    """A case-65 (body-diagonal pair) realization whose trilinear has a
    tunnel: corners 0 and 6 inside, a negative interior critical value
    (any saddle-index slot), and oracle-confirmed joined loops."""
    rng = np.random.default_rng(5)
    loops = mb.loops_of(65, 0)
    for _ in range(200):
        v = mb.sample_realizations(65, 500, rng)
        ib = mb.interior_bits(v)
        for hit in np.flatnonzero(np.isin(ib, (1, 3, 4))):
            if mb._partition_escalating(v[hit], loops, 64) == ((0, 1),):
                return v[hit]
    raise AssertionError("no tunnel realization found")


def test_case4_tunnel_emitted():
    """A 2x2x2 volume with a trilinear tunnel: the default variant caps
    the two corners (2 triangles), the lewiner variant emits the tube
    (6 triangles, one connected component)."""
    import jax.numpy as jnp

    v = _tunnel_realization()
    vol = np.zeros((2, 2, 2))
    for ci, (ox, oy, oz) in enumerate(np.asarray(mb.CORNER_OFFSETS)):
        vol[ox, oy, oz] = v[ci]
    volj = jnp.asarray(vol, jnp.float64)
    mask = jnp.ones((1, 1, 1), dtype=bool)
    verts_d, n_d = mc.emit(volj, mask, 16)
    verts_l, n_l = mc.emit(volj, mask, 16, variant="lewiner")
    assert int(n_d) == 2
    assert int(n_l) == 6
    # the 6 lewiner triangles form one connected tube over the 6 edges
    d = _tables()
    ext = int(mb.ext_code(v[None])[0])
    tris = d["tri_table"][ext][: d["ntri"][ext]]
    loops = mb.loops_of(65, 0)
    assert len(loops) == 2
    assert _partition_from_tris(loops, tris) == ((0, 1),)


@pytest.mark.parametrize(
    "name,chi", [("sphere", 2), ("torus", 0), ("two_spheres", 4)]
)
def test_euler_characteristic_lewiner(name, chi):
    import jax.numpy as jnp

    from test_topology import _euler

    if name == "sphere":
        f, b = st.sphere(1), 1.3
    elif name == "torus":
        f, b = st.torus(1, 0.3), 1.6
    else:
        f = st.sphere(0.5).translate((-0.8, 0, 0)) | st.sphere(0.5).translate(
            (0.8, 0, 0)
        )
        b = 1.6
    pts = f.generate(
        samples=2**15, verbose=False, dtype=jnp.float64, sparse=False,
        bounds=((-b,) * 3, (b,) * 3), mc_variant="lewiner",
    )
    assert _euler(pts) == chi


def test_paths_agree_under_lewiner():
    """dense, sparse="tiles" and the 8-device sharded path produce the
    same triangle set under mc_variant="lewiner"."""
    import jax
    import jax.numpy as jnp

    f = st.sphere(1) | st.sphere(0.6).translate((1.1, 0, 0))
    kw = dict(
        samples=2**14, verbose=False, dtype=jnp.float64,
        bounds=((-1.4, -1.2, -1.2), (2.0, 1.2, 1.2)),
        mc_variant="lewiner",
    )
    dense = f.generate(sparse=False, **kw)
    tiles = f.generate(sparse="tiles", **kw)

    def soup(p):
        t = np.asarray(p, np.float64).reshape(-1, 9)
        return t[np.lexsort(t.T[::-1])]

    assert np.array_equal(soup(dense), soup(tiles))
    from sdf_tpu.parallel import grid as pgrid

    mesh = pgrid.make_mesh(jax.devices()[:8])
    sharded = f.generate(mesh=mesh, sparse=False, **kw)
    assert np.array_equal(soup(dense), soup(sharded))


def test_example_model_golden_lewiner():
    """Golden pin of the canonical example model under the variant: full
    per-cell EXTENDED case grid + soup hash + Euler number."""
    import jax.numpy as jnp

    from test_topology import _euler

    f = st.sphere(1) & st.box(1.5)
    c = st.cylinder(0.5)
    f -= c.orient(st.X) | c.orient(st.Y) | c.orient(st.Z)
    bounds = ((-1.1,) * 3, (1.1,) * 3)
    step = 0.04
    pts = f.generate(
        step=step, bounds=bounds, verbose=False, dtype=jnp.float64,
        sparse=False, mc_variant="lewiner",
    )
    X = np.arange(-1.1, 1.1, step)
    from sdf_tpu.core import engine
    from sdf_tpu.core.node import cast

    vol = engine._eval_volume(cast(f, jnp.float64), X, X, X, jnp.float64)
    ext = np.asarray(mc33.classify_ext(vol), dtype=np.int32)
    tris = np.asarray(pts).round(9).reshape(-1, 9)
    order = np.lexsort(tris.T[::-1])
    got = {
        "ext": ext,
        "n_triangles": np.int64(len(pts) // 3),
        "euler": np.int64(_euler(pts)),
        "soup_sha256": np.str_(
            hashlib.sha256(tris[order].tobytes()).hexdigest()
        ),
    }
    if os.environ.get("SDF_TPU_REGEN_GOLDEN") == "1":
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, **got)
    with np.load(GOLDEN) as z:
        assert np.array_equal(z["ext"], got["ext"]), "ext codes changed"
        assert int(z["n_triangles"]) == int(got["n_triangles"])
        assert int(z["euler"]) == int(got["euler"])
        assert str(z["soup_sha256"]) == str(got["soup_sha256"])


def test_resolve_faces_middle_branch_lewiner():
    """Grids past 2^18 cells overflow the (cell index | 13-bit ext code)
    int32 pack, taking _resolve_faces' lin-fill + case-gather branch:
    its triangle soup must equal the tiles path's (which packs
    tile-locally and never overflows at tile=32)."""
    import jax
    import jax.numpy as jnp

    from sdf_tpu.parallel import grid as pgrid

    f = st.sphere(1) | st.sphere(0.55).translate((1.05, 0, 0))
    mesh1 = pgrid.make_mesh(jax.devices()[:1])
    kw = dict(
        samples=2**20, verbose=False, dtype=jnp.float64, mesh=mesh1,
        bounds=((-1.3, -1.2, -1.2), (1.9, 1.2, 1.2)),
        mc_variant="lewiner",
    )
    dense = f.generate(sparse=False, **kw)
    # 2^20 samples -> ~100^3 cells > 2^18: the dense path used the
    # middle branch (the packed branch needs < 2^18 cells at cbits=13)
    n_cells = np.prod(
        [len(np.arange(a, b, (3.2 * 2.4 * 2.4 / 2**20) ** (1 / 3))) - 1
         for a, b in ((-1.3, 1.9), (-1.2, 1.2), (-1.2, 1.2))]
    )
    assert n_cells >= (1 << 18)
    tiles = f.generate(sparse="tiles", **kw)

    # round(9) canonicalization (same as the goldens): at this grid size
    # the dense and tiles EVAL programs fuse differently and vertex
    # values drift by last-ulp f64 -- the triangle structure (what the
    # middle branch computes) must agree exactly
    def soup(p):
        t = np.asarray(p, np.float64).round(9).reshape(-1, 9)
        return t[np.lexsort(t.T[::-1])]

    assert np.array_equal(soup(dense), soup(tiles))


def test_conflicted_cells_stat():
    """The dense lewiner path surfaces LAST_STATS['mc33_conflicted_cells']
    (count of kept cells on majority-voted table entries), matching an
    oracle recount; fast-variant runs leave the key absent."""
    import jax.numpy as jnp

    import jax

    from sdf_tpu.core import engine
    from sdf_tpu.parallel import grid as pgrid

    f = st.sphere(1) & st.box(1.5)
    kw = dict(
        samples=2**14, verbose=False, dtype=jnp.float64, sparse=False,
        bounds=((-1.1,) * 3, (1.1,) * 3),
        # a 1-device mesh pins the DENSE path (the stat's scope) under
        # the 8-virtual-device CI topology
        mesh=pgrid.make_mesh(jax.devices()[:1]),
    )
    f.generate(mc_variant="lewiner", **kw)
    assert "mc33_conflicted_cells" in engine.LAST_STATS
    got = engine.LAST_STATS["mc33_conflicted_cells"]

    # oracle recount on the same grid
    from sdf_tpu.core.node import cast

    step = (2.2 * 2.2 * 2.2 / 2**14) ** (1 / 3)  # generate()'s formula
    X = np.arange(-1.1, 1.1, step)
    vol = np.asarray(
        engine._eval_volume(cast(f, jnp.float64), X, X, X, jnp.float64)
    )
    nx = len(X)
    corners = np.stack(
        [
            vol[ox : nx - 1 + ox, oy : nx - 1 + oy, oz : nx - 1 + oz]
            for ox, oy, oz in np.asarray(mb.CORNER_OFFSETS)
        ],
        axis=-1,
    )
    ext = mb.ext_code(corners.reshape(-1, 8))
    confl = (_tables()["conflict_rate"] > 0)[ext].sum()
    assert got == int(confl)

    f.generate(mc_variant="fast", **kw)
    assert "mc33_conflicted_cells" not in engine.LAST_STATS


def test_classify_ext_jit_matches_split_path():
    """classify_ext == ext_from_bits(base, extra_bits(corners)) with and
    without a precomputed base_case -- pins the refactor seam between
    the float saddle/interior math and the table combine, and that a
    nonzero level shifts both halves consistently."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    v = jnp.asarray(rng.standard_normal((12, 11, 10)).astype(np.float32))
    for level in (0.0, 0.125):
        ref = np.asarray(mc33.classify_ext(v, level))
        base = np.asarray(mc33.classify_ext(v, level))  # determinism
        assert np.array_equal(ref, base)
        got = np.asarray(
            jax.jit(
                lambda v: mc33.ext_from_bits(
                    _base_of(v, level), mc33.extra_bits(mc33._corners(v, level))
                )
            )(v)
        )
        assert np.array_equal(ref, got), level
    base8 = mc._cell_cases(v)
    got2 = np.asarray(mc33.classify_ext(v, base_case=base8))
    assert np.array_equal(np.asarray(mc33.classify_ext(v)), got2)


def _base_of(v, level):
    import jax.numpy as jnp

    c = mc33._corners(v, level)
    case = jnp.zeros(c[0].shape, dtype=jnp.int32)
    for i in range(8):
        case = case | (jnp.int32(1 << i) * (c[i] < 0).astype(jnp.int32))
    return case


def test_ext_table_kernel_matches_xla_form():
    """The in-VMEM Pallas table pass (_ext_from_bits_kernel, the TPU
    classify path -- 50 -> 19 ms at 67M cells on v5e) must equal
    ext_from_bits bit-for-bit over the full (case, extra) domain and at
    non-multiple-of-block sizes (padding path), exercised in interpret
    mode on CPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sdf_tpu.core import mc33

    # full extra domain: facebits in [0, 64) | ibits9 in [0, 9) << 6
    extras = np.asarray(
        [fb | (ib << 6) for ib in range(9) for fb in range(64)], np.int32
    )
    c_all = jnp.asarray(np.repeat(np.arange(256), len(extras)).astype(np.int32))
    e_all = jnp.asarray(np.tile(extras, 256))
    want = np.asarray(mc33.ext_from_bits(c_all, e_all))
    got = np.asarray(
        mc33._ext_from_bits_kernel(c_all, e_all, _interpret=True)
    )
    np.testing.assert_array_equal(got, want)
    # ragged tail (n not a multiple of the 16384-cell block)
    rng = np.random.RandomState(3)
    c = jnp.asarray(rng.randint(0, 256, 20000).astype(np.int32))
    e = jnp.asarray(rng.randint(0, 256, 20000).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(mc33._ext_from_bits_kernel(c, e, _interpret=True)),
        np.asarray(mc33.ext_from_bits(c, e)),
    )
