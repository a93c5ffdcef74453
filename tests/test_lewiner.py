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
    """Extended-code layout: 4 interior slots per facebits combo, offsets
    consistent, total 2624 = sum over cases of 2^ambiguous * 4."""
    d = _tables()
    assert d["tri_table"].shape[0] == mb.N_EXT == 2624
    nxt = 0
    for case in range(256):
        assert mb.OFFSET[case] == nxt
        nxt += (1 << len(mb.ambiguous_faces(case))) * 4
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
            for ib in range(4):
                e = mb.OFFSET[case] + fb * 4 + ib
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
            fb = rel // 4
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
    tunnel: corners 0 and 6 inside, interior critical value negative."""
    rng = np.random.default_rng(5)
    for _ in range(200):
        v = mb.sample_realizations(65, 500, rng)
        ib = mb.interior_bits(v)
        hit = np.flatnonzero(ib == 1)
        if len(hit):
            return v[hit[0]]
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
