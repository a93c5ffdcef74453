"""Device marching-cubes validation.

No skimage is available offline, so instead of golden-file comparison these
tests validate the stronger structural properties our table construction
guarantees (see sdf_tpu/core/mc_tables.py):

  * every emitted vertex lies on the isosurface (|sdf| small),
  * the mesh is watertight (every edge shared by exactly two triangles,
    opposite orientation) -- classic published MC tables do NOT pass this on
    ambiguous cases; our construction does by design,
  * triangle winding gives outward normals,
  * enclosed volume and area match analytic ground truth.
"""

import numpy as np
import pytest

import sdf_tpu as st
from sdf_tpu.core import mc, mc_tables


def _triangulate_volume(volume, tile=32):
    import jax.numpy as jnp

    vol = jnp.asarray(volume, dtype=jnp.float32)
    mask = jnp.ones(tuple(s - 1 for s in volume.shape), dtype=bool)
    total, _, _, _ = mc.count(vol, mask, tile)
    n = int(total)
    if n == 0:
        return np.zeros((0, 3, 3))
    capacity = 1 << (n - 1).bit_length()
    verts, n_tris = mc.emit(vol, mask, capacity)  # (9, capacity) SoA
    return (
        np.asarray(verts[:, : int(n_tris)], dtype=np.float64)
        .T.reshape(-1, 3, 3)
    )


def _edge_multiset(tris_idx):
    """Directed edge counts from triangle soup in index space."""
    edges = {}
    for tri in tris_idx:
        for i in range(3):
            # Exact coordinates: seam vertices are bit-identical by the
            # canonical edge-direction construction, so no rounding is needed
            # (rounding can collapse distinct near-corner vertices).
            a = tuple(tri[i])
            b = tuple(tri[(i + 1) % 3])
            edges[(a, b)] = edges.get((a, b), 0) + 1
    return edges


def _sphere_volume(n=48, r=0.8):
    lin = np.linspace(-1.2, 1.2, n)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.sqrt(X**2 + Y**2 + Z**2) - r, lin


def test_tables_structurally_valid():
    t = mc_tables
    for case in range(256):
        inside = [(case >> c) & 1 for c in range(8)]
        crossing = {
            e
            for e, (a, b) in enumerate(np.asarray(t.EDGE_CORNERS))
            if inside[a] != inside[b]
        }
        used = set()
        for tri in t.TRI_TABLE[case][: t.NTRI_TABLE[case]]:
            tri = [int(x) for x in tri]
            assert len(set(tri)) == 3
            assert set(tri) <= crossing
            used.update(tri)
        # every crossing edge must be used by some triangle (no dropped
        # surface), unless the case has no triangles at all
        if t.NTRI_TABLE[case] > 0:
            assert used == crossing, case


def test_sphere_vertices_on_surface():
    vol, lin = _sphere_volume()
    tris = _triangulate_volume(vol)
    assert len(tris) > 500
    step = lin[1] - lin[0]
    pts = tris.reshape(-1, 3) * step + lin[0]
    d = np.abs(np.linalg.norm(pts, axis=1) - 0.8)
    # linear interpolation error is O(step^2 / r)
    assert d.max() < step * step / 0.8 * 2.0


def test_sphere_watertight_and_oriented():
    vol, _ = _sphere_volume(n=24)
    tris = _triangulate_volume(vol)
    edges = _edge_multiset(tris)
    for (a, b), count in edges.items():
        assert count == 1, "duplicate directed edge => non-manifold"
        assert edges.get((b, a), 0) == 1, "boundary edge => hole in mesh"


def test_sphere_outward_normals_and_volume():
    vol, lin = _sphere_volume()
    tris = _triangulate_volume(vol)
    step = lin[1] - lin[0]
    world = tris * step + lin[0]
    a, b, c = world[:, 0], world[:, 1], world[:, 2]
    normals = np.cross(b - a, c - a)
    centers = (a + b + c) / 3
    # outward = pointing away from the origin for a sphere
    outward = np.sum(normals * centers, axis=1)
    frac = np.mean(outward > 0)
    assert frac > 0.99, f"only {frac:.2%} of normals outward"
    # divergence theorem: signed volume of the closed mesh
    vol6 = np.sum(np.einsum("ij,ij->i", a, np.cross(b, c)))
    mesh_volume = vol6 / 6.0
    true_volume = 4 / 3 * np.pi * 0.8**3
    assert abs(mesh_volume - true_volume) / true_volume < 0.01


def test_random_volumes_closed():
    """On adversarial noise volumes the surface must be *closed*: every
    interior directed edge is balanced by its reverse.  (Strict manifoldness
    can be violated on ambiguous faces -- two sheets touching along an edge --
    which is inherent to per-cell MC triangulations; smooth-SDF manifoldness
    is covered by the sphere test.)"""
    rng = np.random.RandomState(7)
    for trial in range(5):
        vol = rng.standard_normal((6, 6, 6))
        tris = _triangulate_volume(vol)
        edges = _edge_multiset(tris)
        for (a, b), count in edges.items():
            # interior edges must balance; volume-boundary edges are open by
            # definition, so only check edges strictly inside the domain
            mid = (np.array(a) + np.array(b)) / 2
            if np.all(mid > 1e-6) and np.all(mid < 5 - 1e-6):
                assert edges.get((b, a), 0) == count, (trial, a, b)


def test_all_cases_reachable_and_consistent():
    """Brute-force all 256 corner configurations as 2x2x2 volumes; each must
    triangulate without error and cover every crossing edge."""
    for case in range(256):
        vol = np.ones((2, 2, 2), dtype=np.float32)
        for c, (ox, oy, oz) in enumerate(np.asarray(mc_tables.CORNER_OFFSETS)):
            if (case >> c) & 1:
                vol[ox, oy, oz] = -1.0
        tris = _triangulate_volume(vol, tile=1)
        assert len(tris) == int(mc_tables.NTRI_TABLE[case])


def test_compact_kernel_matches_flatnonzero():
    """The Pallas stream compaction (interpret mode on CPU) must be
    bit-identical to jnp.flatnonzero across densities and capacities."""
    import jax.numpy as jnp
    from sdf_tpu.core import compact

    rng = np.random.RandomState(3)
    for n, frac in ((700, 0.2), (8192, 0.5), (40000, 0.02), (9000, 0.0)):
        m = jnp.asarray(rng.rand(n) < frac)
        na = int(m.sum())
        cap = max(1, 1 << max(0, na - 1).bit_length()) + 256
        idx, tot = compact.indices_of_pallas(m, cap, interpret=True)
        ref = jnp.flatnonzero(m, size=cap, fill_value=0)
        assert int(tot) == na
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))


def test_gather1d_row_path_matches_plain_gather():
    """gather1d's TPU row-of-128 path (forced on CPU) must be bit-exact
    vs table[idx] for int and float tables -- including tables whose
    OTHER row lanes hold Inf/NaN (the select must not leak NaN the way a
    one-hot multiply would) and non-multiple-of-128 table lengths."""
    import jax.numpy as jnp
    from sdf_tpu.core import compact

    rng = np.random.RandomState(7)
    for n in (1, 127, 128, 129, 1000, 5000):
        idx = jnp.asarray(rng.randint(0, n, size=777), jnp.int32)
        ti = jnp.asarray(rng.randint(-(2**31), 2**31 - 1, size=n, dtype=np.int64)
                         .astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(compact.gather1d(ti, idx, _force_rows=True)),
            np.asarray(ti[idx]),
        )
        tf = rng.standard_normal(n).astype(np.float32)
        tf[rng.rand(n) < 0.1] = np.inf
        tf[rng.rand(n) < 0.1] = -np.inf
        tf[rng.rand(n) < 0.1] = np.nan
        tf = jnp.asarray(tf)
        np.testing.assert_array_equal(
            np.asarray(compact.gather1d(tf, idx, _force_rows=True)),
            np.asarray(tf[idx]),
        )


def test_indexed_emit_matches_soup_exactly():
    """The indexed path (unique per-edge vertices + int32 faces) must
    reconstruct ``emit``'s triangle soup bit-for-bit -- same zero-crossing
    formula, same canonical edge direction, same cell-major order -- for
    smooth volumes, random volumes, and partial cull masks."""
    import jax.numpy as jnp

    rng = np.random.RandomState(11)
    cases = []
    sph, _ = _sphere_volume(n=24)
    cases.append((sph.astype(np.float32), None))
    cases.append((rng.standard_normal((9, 13, 8)).astype(np.float32), None))
    vol3 = rng.standard_normal((12, 12, 12)).astype(np.float32)
    cases.append((vol3, rng.rand(11, 11, 11) > 0.3))

    for volume, keep_np in cases:
        vol = jnp.asarray(volume)
        cshape = tuple(s - 1 for s in volume.shape)
        keep = jnp.asarray(
            keep_np if keep_np is not None else np.ones(cshape, dtype=bool)
        )
        tile, tshape = 8, tuple(-(-c // 8) for c in cshape)

        # Soup oracle: the production soup pipeline (diffmesh's path).
        total, per_tile, _, case = mc.count(vol, keep, tile)
        nt = int(total)
        cap = mc.round_capacity(nt)
        dverts, n_tris = mc.emit(vol, keep, cap, case=case)
        assert int(n_tris) == nt
        soup = np.asarray(dverts[:, :nt]).T.reshape(-1, 3)

        # Indexed path under test (the engine's dense pipeline).
        ncells2, total2, n_edges, per_tile2, active, emask = (
            mc.count_indexed(vol, case, keep, tile, tshape)
        )
        assert int(total2) == nt
        np.testing.assert_array_equal(
            np.asarray(per_tile), np.asarray(per_tile2)
        )
        ccap = mc.round_capacity(int(ncells2))
        ne = int(n_edges)
        ecap = mc.round_capacity(ne)
        everts, faces = mc.gather_emit_indexed(
            vol, case, active, emask, ecap, cap, ccap
        )
        vh = np.asarray(everts[:, :ne]).T
        fh = np.asarray(faces[:, :nt])
        assert fh.min() >= 0 and fh.max() < ne
        np.testing.assert_array_equal(vh[fh.T.reshape(-1)], soup)
        # Dedup really happened: strictly fewer vertices than soup rows.
        assert ne < 3 * nt


def test_rank_table_matches_materialized_ranks():
    """compact.indices_and_ranktable_of + rank_lookup must equal the
    materialized flatnonzero/cumsum ranks at every True slot, on BOTH
    the CPU fallback and the forced TPU-style (interpret kernel +
    row-pair fetch) paths.  The table replaces the full-domain ranks
    array in the emit phase (2 uint32 per 32 slots; gather locality at
    2^26 -- see PERF.md round 4)."""
    import jax.numpy as jnp
    from sdf_tpu.core import compact

    rng = np.random.RandomState(11)
    for n, frac in ((700, 0.2), (8192, 0.5), (40000, 0.02), (513, 1.0),
                    (9000, 0.0)):
        m = jnp.asarray(rng.rand(n) < frac)
        na = int(m.sum())
        cap = max(1, 1 << max(0, na - 1).bit_length()) + 256
        ranks_ref = np.cumsum(np.asarray(m).astype(np.int64)) - 1
        tru = np.flatnonzero(np.asarray(m)).astype(np.int32)
        for kw in (dict(), dict(backend="tpu", _interpret=True)):
            idx, tab, tot = compact.indices_and_ranktable_of(m, cap, **kw)
            assert int(tot) == na
            np.testing.assert_array_equal(
                np.asarray(idx)[:na], tru
            )
            if na:
                for force in (False, True):
                    got = compact.rank_lookup(
                        tab, jnp.asarray(tru), _force_rows=force
                    )
                    np.testing.assert_array_equal(
                        np.asarray(got), ranks_ref[tru]
                    )


def test_ragged_expand_matches_slot_compaction():
    """compact.ragged_expand must reproduce the old slot-mask compaction
    (ascending (row, rank) pairs, (0, 0) padding) across zero counts,
    interleaved zeros, exact-fit, overage capacity, and OVERFLOW
    (capacity < total must truncate to the first `capacity` slots --
    diffmesh.extract relies on clean truncation)."""
    import jax
    import jax.numpy as jnp
    from sdf_tpu.core import compact

    rng = np.random.RandomState(9)
    cases = [
        (np.array([0, 0, 3, 0, 1, 5, 0], np.int32), 16),
        (np.array([2, 2, 2], np.int32), 6),  # exact fit
        (np.array([0, 0, 0], np.int32), 4),  # all empty
        (np.array([3, 0, 4, 2, 5], np.int32), 7),  # OVERFLOW: 14 > 7
        (rng.randint(0, 6, size=1000).astype(np.int32), 4096),
        (rng.randint(0, 6, size=1000).astype(np.int32), 100),  # overflow
    ]
    for counts, cap in cases:
        M = int(counts.max()) + 1 if counts.max() > 0 else 1
        nrows = len(counts)
        slot_valid = (
            jax.lax.broadcasted_iota(jnp.int32, (nrows, M), 1)
            < jnp.asarray(counts)[:, None]
        ).reshape(-1)
        tri_idx = jnp.flatnonzero(slot_valid, size=cap, fill_value=0)
        want_row = np.asarray(tri_idx) // M
        want_rank = np.asarray(tri_idx) % M
        row, rank, total = compact.ragged_expand(jnp.asarray(counts), cap)
        assert int(total) == int(counts.sum())
        np.testing.assert_array_equal(np.asarray(row), want_row)
        np.testing.assert_array_equal(np.asarray(rank), want_rank)

        # fill= (row-payload broadcast) must equal the plain gather
        # values[row], padding included (values[0]).
        vals = np.cumsum(rng.randint(1, 9, size=nrows)).astype(np.int32)
        r2, k2, t2, filled = compact.ragged_expand(
            jnp.asarray(counts), cap, fill=jnp.asarray(vals)
        )
        np.testing.assert_array_equal(np.asarray(r2), want_row)
        np.testing.assert_array_equal(np.asarray(filled), vals[want_row])

        # Fill values are arbitrary -- no ordering requirement (the
        # sparse tiles path passes per-tile words that reset per tile):
        # a fully random fill, with dead rows blown up, must still equal
        # the plain gather.
        vals_hot = np.where(
            counts == 0, 10**6, rng.randint(-(10**6), 10**6, size=nrows)
        ).astype(np.int32)
        *_, filled_hot = compact.ragged_expand(
            jnp.asarray(counts), cap, fill=jnp.asarray(vals_hot)
        )
        want_fill = np.where(
            np.arange(cap) < min(int(counts.sum()), cap),
            vals_hot[want_row],
            vals_hot[0],
        )
        np.testing.assert_array_equal(np.asarray(filled_hot), want_fill)


def test_ranks_kernel_matches_cumsum():
    """The fused kernel's rank structure (Pallas prefix + byte-pack,
    interpret mode) must reproduce cumsum(mask) - 1 at every True slot
    via rank_lookup, across sizes the other rank-table test doesn't
    cover (full rows, near-empty, all-False)."""
    import jax.numpy as jnp
    from sdf_tpu.core import compact

    rng = np.random.RandomState(5)
    for n, frac in ((500, 0.3), (8192, 0.9), (50001, 0.01), (4000, 0.0)):
        m = jnp.asarray(rng.rand(n) < frac)
        _, tab, tot = compact.indices_and_ranktable_of(
            m, 8, backend="tpu", _interpret=True
        )
        tru = np.flatnonzero(np.asarray(m)).astype(np.int32)
        if len(tru) == 0:
            # all-False: no slot has any True before it, so the rank
            # structure must report 0 "Trues below" everywhere.
            assert int(tot) == 0
            probe = jnp.asarray(np.arange(0, n, 7, dtype=np.int32))
            got = compact.rank_lookup(tab, probe, _force_rows=True)
            np.testing.assert_array_equal(np.asarray(got), 0)
            continue
        ref = (np.cumsum(np.asarray(m).astype(np.int64)) - 1)[tru]
        got = compact.rank_lookup(tab, jnp.asarray(tru), _force_rows=True)
        np.testing.assert_array_equal(np.asarray(got), ref)


def test_tiles_indexed_emit_matches_soup_exactly():
    """The tiled indexed emit must reconstruct _emit_tiles's soup
    bit-for-bit (per-tile local edge dedup, global coords)."""
    import jax.numpy as jnp
    from sdf_tpu.core import sparse as sp

    vol_np, lin = _sphere_volume(n=25)
    nx = len(lin)
    cshape = (nx - 1, nx - 1, nx - 1)
    tile = 8
    ntx = -(-cshape[0] // tile)
    active = np.argwhere(np.ones((ntx, ntx, ntx), dtype=bool))
    nt = len(active)
    ntc = mc.round_capacity(nt)
    tiles = np.zeros((ntc, 3), dtype=np.int32)
    tiles[:nt] = active
    live = np.zeros((ntc,), dtype=bool)
    live[:nt] = True

    # Per-tile (tile+1)^3 volumes sampled from the dense field, with the
    # same edge clamping as _eval_tiles.
    TS = tile + 1
    ar = np.arange(TS)
    vols = np.zeros((ntc, TS, TS, TS), dtype=np.float32)
    for t in range(nt):
        ix = np.clip(active[t][0] * tile + ar, 0, nx - 1)
        iy = np.clip(active[t][1] * tile + ar, 0, nx - 1)
        iz = np.clip(active[t][2] * tile + ar, 0, nx - 1)
        vols[t] = vol_np[np.ix_(ix, iy, iz)]
    vols = jnp.asarray(vols)
    tiles_d, live_d = jnp.asarray(tiles), jnp.asarray(live)

    total, per_tile, ncell, case, nedge, emask = sp._count_tiles(
        vols, tiles_d, live_d, cshape, tile
    )
    n, ncl, ne = int(total), int(ncell), int(nedge)
    cap, ccap, ecap = (mc.round_capacity(v) for v in (n, ncl, ne))

    verts9, n_tris = sp._emit_tiles(
        vols, tiles_d, live_d, case, cshape, cap, ccap, tile
    )
    nt_old = int(n_tris)
    soup = np.asarray(verts9[:, :nt_old]).T.reshape(-1, 3)

    everts, faces, n_tris2 = sp._emit_tiles_indexed(
        vols, tiles_d, live_d, case, emask, cshape, ecap, cap, ccap, tile
    )
    assert int(n_tris2) == nt_old == n
    vh = np.asarray(everts[:, :ne]).T
    fh = np.asarray(faces[:, :nt_old])
    assert fh.min() >= 0 and fh.max() < ne
    np.testing.assert_array_equal(vh[fh.T.reshape(-1)], soup)
    assert ne < 3 * nt_old  # dedup happened within tiles


def test_generate_mesh_matches_soup():
    """generate(output='mesh') / generate_mesh must return an indexed mesh
    whose reconstructed soup equals generate()'s points exactly, on both
    the dense and tiled paths, with every vertex referenced."""
    import sdf_tpu as stp

    f = stp.sphere(1) & stp.box(1.5)
    for kw in ({}, {"sparse": "tiles"}):
        pts = f.generate(samples=2**15, verbose=False, **kw)
        verts, faces = f.generate_mesh(samples=2**15, verbose=False, **kw)
        assert faces.dtype == np.int32 and faces.shape[1] == 3
        assert faces.min() >= 0 and faces.max() < len(verts)
        np.testing.assert_array_equal(verts[faces.reshape(-1)], pts)
        # native indexed output: every vertex referenced, real dedup
        assert len(np.unique(faces)) == len(verts)
        assert len(verts) < len(pts)

    # checkpoint is soup-only
    with pytest.raises(ValueError):
        f.generate(samples=2**12, output="mesh", checkpoint="/tmp/x.ckpt")


def test_engine_routes_wide_wire_format(monkeypatch):
    """generate() must fall back to the 'wide' (unpacked uint32 faces)
    wire format when the vertex count can exceed the 21-bit pack limit,
    with byte-identical output.  Forced by shrinking FACE_PACK_BITS so
    the dense branch at engine.py takes the ne >= 2**bits route."""
    import sdf_tpu as stp
    from sdf_tpu.core import engine

    f = stp.sphere(1) & stp.box(1.5)
    kw = dict(samples=2**14, verbose=False)
    want = f.generate(**kw)
    monkeypatch.setattr(mc, "FACE_PACK_BITS", 2)
    engine._COUNTS_MEMO.clear()  # re-run the routing branch, not the memo
    got = f.generate(**kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_packed_wire_format_bit_identical():
    """emit_indexed_packed + unpack_indexed must reproduce emit_indexed's
    outputs bit-for-bit (both 21-bit and wide face variants)."""
    import jax.numpy as jnp

    vol_np, lin = _sphere_volume(n=21)
    vol = jnp.asarray(vol_np.astype(np.float32))
    case = mc._cell_cases(vol)
    keep = jnp.ones(tuple(s - 1 for s in vol.shape), bool)
    ncells, total, nedges, _, active, emask = mc.count_indexed(
        vol, case, keep, 32, (1, 1, 1)
    )
    nc, nt, ne = int(ncells), int(total), int(nedges)
    ccap, cap, ecap = (mc.round_capacity(x) for x in (nc, nt, ne))
    ev, fa = mc.gather_emit_indexed(vol, case, active, emask, ecap, cap, ccap)
    vh1 = np.asarray(ev[:, :ne]).astype(np.float64).T
    fh1 = np.asarray(fa[:, :nt]).T
    for packed in (True, "wide"):
        ep, fp = mc.gather_emit_indexed(
            vol, case, active, emask, ecap, cap, ccap, packed=packed
        )
        assert ep.dtype == jnp.uint32 and fp.shape[0] == (2 if packed is True else 3)
        vh2, fh2 = mc.unpack_indexed(
            np.asarray(ep[:, :ne]), np.asarray(fp[:, :nt]), vol.shape
        )
        np.testing.assert_array_equal(fh1, fh2)
        np.testing.assert_array_equal(vh1, vh2)


def test_tiles_packed_wire_bit_identical():
    """Packed tiles emit + unpack must reproduce the plain tiles emit
    bit-for-bit (both face variants)."""
    import jax.numpy as jnp
    from sdf_tpu.core import sparse as sp

    vol_np, lin = _sphere_volume(n=25)
    nx = len(lin)
    cshape = (nx - 1,) * 3
    tile = 8
    ntx = -(-cshape[0] // tile)
    active = np.argwhere(np.ones((ntx,) * 3, dtype=bool))
    nt = len(active)
    ntc = mc.round_capacity(nt)
    tiles = np.zeros((ntc, 3), dtype=np.int32)
    tiles[:nt] = active
    live = np.zeros((ntc,), dtype=bool)
    live[:nt] = True
    TS = tile + 1
    ar = np.arange(TS)
    vols = np.zeros((ntc, TS, TS, TS), dtype=np.float32)
    for t in range(nt):
        ix = np.clip(active[t][0] * tile + ar, 0, nx - 1)
        iy = np.clip(active[t][1] * tile + ar, 0, nx - 1)
        iz = np.clip(active[t][2] * tile + ar, 0, nx - 1)
        vols[t] = vol_np[np.ix_(ix, iy, iz)]
    vols = jnp.asarray(vols)
    tiles_d, live_d = jnp.asarray(tiles), jnp.asarray(live)
    total, per_tile, ncell, case, nedge, emask = sp._count_tiles(
        vols, tiles_d, live_d, cshape, tile
    )
    n, ncl, ne = int(total), int(ncell), int(nedge)
    cap, ccap, ecap = (mc.round_capacity(v) for v in (n, ncl, ne))
    ev, fa, _ = sp._emit_tiles_indexed(
        vols, tiles_d, live_d, case, emask, cshape, ecap, cap, ccap, tile
    )
    vh1 = np.asarray(ev[:, :ne]).astype(np.float64).T
    fh1 = np.asarray(fa[:, :n]).T
    for packed in (True, "wide"):
        ep, fp = (np.asarray(a) for a in sp._emit_tiles_indexed(
            vols, tiles_d, live_d, case, emask, cshape, ecap, cap, ccap,
            tile, packed=packed,
        )[:2])
        vh2, fh2 = sp.unpack_tiles_indexed(ep[:, :ne], fp[:, :n], tiles, tile)
        np.testing.assert_array_equal(fh1, fh2)
        np.testing.assert_array_equal(vh1, vh2)


def test_tiles_emit_large_tile_no_word_overflow():
    """tile > 203 overflows the packed (li,lj,lk,case) int32 word; the
    5-slot fallback branch must produce a correct mesh (generate's
    batch_size= is the public knob behind tile)."""
    import jax.numpy as jnp
    from sdf_tpu.core import sparse as sp

    vol_np, lin = _sphere_volume(n=17)
    nx = len(lin)
    cshape = (nx - 1,) * 3
    tile = 204  # 204^3 * 256 > 2^31
    TS = tile + 1
    tiles = np.zeros((1, 3), dtype=np.int32)
    live = np.ones((1,), dtype=bool)
    ar = np.arange(TS)
    ix = np.clip(ar, 0, nx - 1)
    vols = jnp.asarray(vol_np[np.ix_(ix, ix, ix)][None].astype(np.float32))
    tiles_d, live_d = jnp.asarray(tiles), jnp.asarray(live)
    total, per_tile, ncell, case, nedge, emask = sp._count_tiles(
        vols, tiles_d, live_d, cshape, tile
    )
    n, ncl, ne = int(total), int(ncell), int(nedge)
    assert n > 0
    cap, ccap, ecap = (mc.round_capacity(v) for v in (n, ncl, ne))
    ev, fa, nt = sp._emit_tiles_indexed(
        vols, tiles_d, live_d, case, emask, cshape, ecap, cap, ccap, tile
    )
    assert int(nt) == n
    vh = np.asarray(ev[:, :ne]).astype(np.float64).T
    fh = np.asarray(fa[:, :n]).T
    assert fh.min() >= 0 and fh.max() < ne
    # Same triangle count and vertex set as the small-tile path.
    r = np.linalg.norm(vh[fh.reshape(-1)] - (nx - 1) / 2, axis=1)
    assert np.all(np.isfinite(r))


def test_ntri_kernel_matches_tables():
    """The in-VMEM ntri lookup kernel (mc._ntri_of_kernel, the TPU path
    of ntri_of) must equal the raw table at every code for BOTH
    variants, including the padded ragged tail, in interpret mode."""
    import jax.numpy as jnp
    from sdf_tpu.core import mc

    rng = np.random.RandomState(9)
    for variant in ("default", "lewiner"):
        tab = mc.get_tables(variant)
        for n in (7, 16384, 50001):
            codes = rng.randint(0, tab.ncase, n).astype(np.int32)
            want = tab.ntri[codes]
            got = np.asarray(
                mc._ntri_of_kernel(jnp.asarray(codes), variant,
                                   _interpret=True)
            )
            np.testing.assert_array_equal(got, want)
