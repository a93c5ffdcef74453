"""Sparse tiled evaluation: evaluate only tiles the coarse cull kept.

The dense engine evaluates every grid sample and uses the probe-based
skip mask (ref sdf/core.py:28-43) only to mask marching-cubes cells.
This module completes the reference's sparsity story on device
(SURVEY.md section 7 step 4): the skip mask selects *active*
batch_size^3-cell tiles, their (+1-halo-sample -- the reference's batch overlap)
volumes are evaluated in one vmapped pass, and marching cubes runs
tile-locally -- work scales with surface area instead of grid volume.

Triangle order is (tile, cell) ascending with tiles in x-major order --
exactly the reference's batch-then-cell order (its batches iterate the
same product order, ref sdf/core.py:114-119).

Enable with ``generate(..., sparse="tiles")``.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import compact, mc
from .mc_tables import CORNER_OFFSETS
from .mc import interpolate_slots, round_capacity
from .node import Points


@partial(jax.jit, static_argnames=("ntc", "chunk", "tile"))
def _eval_tiles(sdf, X, Y, Z, tiles, ntc, chunk, tile):
    """Evaluate (ntc, tile+1, tile+1, tile+1) tile volumes.

    tiles: (ntc, 3) int32 tile indices (padded rows repeat tile 0 and are
    masked downstream).  Edge tiles clip their sample indices to the grid
    (the repeated boundary samples belong to cells masked as out-of-grid).
    """
    TS = tile + 1
    nx, ny, nz = X.shape[0], Y.shape[0], Z.shape[0]
    ar = jnp.arange(TS)

    def tile_vol(t):
        x = X[jnp.clip(t[0] * tile + ar, 0, nx - 1)]
        y = Y[jnp.clip(t[1] * tile + ar, 0, ny - 1)]
        z = Z[jnp.clip(t[2] * tile + ar, 0, nz - 1)]
        p = Points(x[:, None, None], y[None, :, None], z[None, None, :])
        return jnp.broadcast_to(sdf(p), (TS, TS, TS))

    return jax.lax.map(tile_vol, tiles, batch_size=min(chunk, ntc))


def _tile_cases(vols, tile, variant="default"):
    """Case codes for every tile-local cell: (ntc, tile, tile, tile).

    Called inside other jits (count/emit); ``_tile_cases_jit`` below is
    the standalone-dispatch form (used by the routing race)."""
    if variant != "default":
        from . import mc33

        return mc33.classify_ext(vols)
    case = jnp.zeros((vols.shape[0], tile, tile, tile), dtype=jnp.int32)
    for b, (ox, oy, oz) in enumerate(np.asarray(CORNER_OFFSETS)):
        corner = vols[:, ox : tile + ox, oy : tile + oy, oz : tile + oz]
        case = case | ((corner < 0).astype(jnp.int32) << b)
    return case


_tile_cases_jit = partial(jax.jit, static_argnums=(1, 2))(_tile_cases)


def _cell_valid(tiles, live, cshape, tile):
    """(ntc, tile^3) mask: cell inside the global grid + live tile."""
    ncx, ncy, ncz = cshape
    ar = jnp.arange(tile)
    gx = tiles[:, 0, None] * tile + ar[None, :]  # (ntc, tile)
    gy = tiles[:, 1, None] * tile + ar[None, :]
    gz = tiles[:, 2, None] * tile + ar[None, :]
    m = (
        (gx < ncx)[:, :, None, None]
        & (gy < ncy)[:, None, :, None]
        & (gz < ncz)[:, None, None, :]
    )
    return m & live[:, None, None, None]


def _tile_edge_mask(vols, active, tile):
    """(ntc, 3 * tile * TS^2) bool: per-tile local active-edge mask.

    Within each tile: sign-crossing AND adjacent to an active cell (same
    rule as mc._edge_mask, tile-locally).  An edge on a face shared by
    two active tiles appears in both -- those vertices stay duplicated
    (like slab boundaries in the sharded path); within a tile they dedup.
    Layout per tile: [x-edge block | y | z], each block row-major over
    its (tile, TS, TS)/(TS, tile, TS)/(TS, TS, tile) edge grid.
    """
    TS = tile + 1
    sign = vols < 0

    def adj(a, axes):
        pads = [(0, 0)] * 4
        for ax in axes:
            pads[ax] = (1, 1)
        b = jnp.pad(a, pads)
        for ax in axes:
            lo = [slice(None)] * 4
            hi = [slice(None)] * 4
            lo[ax] = slice(0, b.shape[ax] - 1)
            hi[ax] = slice(1, None)
            b = b[tuple(lo)] | b[tuple(hi)]
        return b

    ntc = vols.shape[0]
    ex = (sign[:, :-1] != sign[:, 1:]) & adj(active, (2, 3))
    ey = (sign[:, :, :-1] != sign[:, :, 1:]) & adj(active, (1, 3))
    ez = (sign[:, :, :, :-1] != sign[:, :, :, 1:]) & adj(active, (1, 2))
    return jnp.concatenate(
        [ex.reshape(ntc, -1), ey.reshape(ntc, -1), ez.reshape(ntc, -1)],
        axis=1,
    )


@partial(jax.jit, static_argnames=("cshape", "tile", "variant"))
def _count_tiles(vols, tiles, live, cshape, tile, case=None,
                 variant="default"):
    if case is None:
        case = _tile_cases(vols, tile, variant)
    valid = _cell_valid(tiles, live, cshape, tile)
    ntri = mc.ntri_of(case, variant) * valid.astype(jnp.int32)
    per_tile = ntri.sum(axis=(1, 2, 3))
    ncell = jnp.sum((ntri > 0).astype(jnp.int32))
    emask = _tile_edge_mask(vols, ntri > 0, tile)
    nedge = jnp.sum(emask.astype(jnp.int32))
    return jnp.sum(ntri), per_tile, ncell, case, nedge, emask


@partial(
    jax.jit, static_argnames=("cshape", "capacity", "cell_capacity", "tile",
                              "variant")
)
def _emit_tiles(vols, tiles, live, case, cshape, capacity, cell_capacity, tile,
                variant="default"):
    """Tile-local marching cubes -> (9, capacity) SoA triangles + count.

    Same 1D-SoA layout discipline as mc.emit (interpolation shared via
    mc.interpolate_slots); the only difference is that cell base
    coordinates come from ``tiles[t] * tile + local`` instead of a dense
    unravel.
    """
    TS = tile + 1
    valid = _cell_valid(tiles, live, cshape, tile)
    ntri = mc.ntri_of(case, variant) * valid.astype(jnp.int32)

    active = (ntri > 0).reshape(-1)
    cell_idx = compact.indices_of(active, cell_capacity)
    n_cells = jnp.sum(active.astype(jnp.int32))
    cell_live = jnp.arange(cell_capacity) < n_cells

    t_of = cell_idx // (tile * tile * tile)
    local = cell_idx % (tile * tile * tile)
    li, rem = local // (tile * tile), local % (tile * tile)
    lj, lk = rem // tile, rem % tile

    cell_case = case.reshape(-1)[cell_idx]
    cell_ntri = jnp.where(cell_live, ntri.reshape(-1)[cell_idx], 0)

    vflat = vols.reshape(-1)
    corner = []
    for ox, oy, oz in np.asarray(CORNER_OFFSETS):
        lin = ((t_of * TS + li + ox) * TS + (lj + oy)) * TS + (lk + oz)
        corner.append(vflat[lin])
    dt = vols.dtype
    base = (
        (tiles[:, 0][t_of] * tile + li).astype(dt),
        (tiles[:, 1][t_of] * tile + lj).astype(dt),
        (tiles[:, 2][t_of] * tile + lk).astype(dt),
    )
    return interpolate_slots(
        corner, base, cell_case, cell_ntri, capacity, cell_capacity, variant
    )


@partial(
    jax.jit,
    static_argnames=("cshape", "edge_capacity", "capacity", "cell_capacity",
                     "tile", "packed", "variant"),
)
def _emit_tiles_indexed(vols, tiles, live, case, emask, cshape,
                        edge_capacity, capacity, cell_capacity, tile,
                        packed=False, variant="default"):
    """Tile-local indexed marching cubes: unique per-edge vertices (3,
    edge_capacity) in global fractional index coords + int32 faces (3,
    capacity) + triangle count.

    The tile analog of mc.emit_indexed: edge ids live in per-tile local
    edge grids (``tid * Stile + axis block + row-major local``), so
    vertices dedup within a tile and stay duplicated across tile
    boundaries (~10% of vertices at tile=32).  Reconstructing
    ``everts.T[faces.T.reshape(-1)]`` yields exactly ``_emit_tiles``'s
    soup.  Assumes ntc * Stile < 2^31 (grids to ~2^28 samples at
    tile=32).
    """
    TS = tile + 1
    Sblk = tile * TS * TS  # one axis' edge block per tile
    Stile = 3 * Sblk
    dt = vols.dtype
    cbits = mc.get_tables(variant).case_bits
    max_tris = mc.get_tables(variant).max_tris
    valid = _cell_valid(tiles, live, cshape, tile)
    ntri = mc.ntri_of(case, variant) * valid.astype(jnp.int32)

    active = (ntri > 0).reshape(-1)
    cell_idx = compact.indices_of(active, cell_capacity)
    n_cells = jnp.sum(active.astype(jnp.int32))
    cell_live = jnp.arange(cell_capacity) < n_cells

    t_of = cell_idx // (tile * tile * tile)
    local = cell_idx % (tile * tile * tile)
    li, rem = local // (tile * tile), local % (tile * tile)
    lj, lk = rem // tile, rem % tile
    cell_case = case.reshape(-1)[cell_idx]
    cell_ntri = jnp.where(cell_live, ntri.reshape(-1)[cell_idx], 0)

    # --- one vertex per tile-local active edge ------------------------
    emf = emask.reshape(-1)
    # One fused kernel pass: compacted edge ids (vertex order) + the
    # compact rank structure (face resolution below; see
    # compact.indices_and_ranktable_of -- gather locality at big grids).
    eidx, ranktab, _ = compact.indices_and_ranktable_of(emf, edge_capacity)
    tid = eidx // Stile
    block = eidx % Stile
    a = block // Sblk
    le = block % Sblk  # the three axis blocks are equal-sized

    def dec(l, d1, d2):  # row-major (d0, d1, d2) decode, constant divisors
        return l // (d1 * d2), (l // d2) % d1, l % d2

    e0 = dec(le, TS, TS)  # x-edges: (tile, TS, TS)
    e1 = dec(le, tile, TS)  # y-edges: (TS, tile, TS)
    e2 = dec(le, TS, tile)  # z-edges: (TS, TS, tile)

    def pick(i):
        return jnp.where(a == 0, e0[i], jnp.where(a == 1, e1[i], e2[i]))

    x, y, z = pick(0), pick(1), pick(2)
    vflat = vols.reshape(-1)
    vlin = ((tid * TS + x) * TS + y) * TS + z
    stride = jnp.where(a == 0, TS * TS, jnp.where(a == 1, TS, 1))
    va = vflat[vlin]
    vb = vflat[vlin + stride]
    denom = va - vb
    # Same zero-crossing formula as interpolate_slots, term for term.
    t = jnp.clip(va / jnp.where(denom == 0, 1.0, denom), 0.0, 1.0)
    if packed is not False:
        # Wire format (see mc.emit_indexed_packed): (edge id, t bits);
        # the host rebuilds positions with the same float32 ops below.
        everts = jnp.stack(
            [eidx.astype(jnp.uint32),
             jax.lax.bitcast_convert_type(t, jnp.uint32)],
            axis=0,
        )
    else:
        trow = tiles[tid]  # (edge_capacity, 3) row gather
        everts = jnp.stack(
            [
                (trow[:, 0] * tile + x).astype(dt) + t * (a == 0).astype(dt),
                (trow[:, 1] * tile + y).astype(dt) + t * (a == 1).astype(dt),
                (trow[:, 2] * tile + z).astype(dt) + t * (a == 2).astype(dt),
            ],
            axis=0,
        )

    # --- tri-major face resolution (see mc.emit_indexed) --------------
    # ragged_expand's fill broadcasts the (arbitrary-valued) tile-local
    # word w to the triangle slots; the tile id rides a row-of-128
    # gather1d on the same row indices (cheaper than the per-triangle
    # element gather it replaces, ~11 ns each on v5e).
    # The word pack needs tile^3 << case_bits distinct values, so it
    # only fits int32 for tile <= 203 with 8-bit codes (tile <= 80 for
    # the 12-bit lewiner codes; generate(batch_size=) is the public knob
    # behind ``tile``); larger tiles keep the staging gather, mirroring
    # mc._resolve_faces' guard.
    if tile**3 * (1 << cbits) <= 2**31:
        w = ((li * tile + lj) * tile + lk) * (1 << cbits) + cell_case
        ctri, slot, n_tris, wt = compact.ragged_expand(
            cell_ntri, capacity, fill=w
        )
        tt = compact.gather1d(t_of, ctri)
        case_t = wt & ((1 << cbits) - 1)
        loc = wt >> cbits
        cx = loc // (tile * tile)
        cy = (loc // tile) % tile
        cz = loc % tile
    else:
        ctri, slot, n_tris = compact.ragged_expand(cell_ntri, capacity)
        cellpack = jnp.concatenate([t_of, li, lj, lk, cell_case])
        cd = cellpack[
            jnp.concatenate([ctri + i * cell_capacity for i in range(5)])
        ]
        tt = cd[:capacity]
        cx = cd[capacity : 2 * capacity]
        cy = cd[2 * capacity : 3 * capacity]
        cz = cd[3 * capacity : 4 * capacity]
        case_t = cd[4 * capacity :]

    tep = jnp.asarray(
        mc._gid_pack(
            [(TS * TS, TS), (tile * TS, TS), (TS * tile, tile)],
            [0, Sblk, 2 * Sblk],
            variant,
        )
    )
    row = tep[case_t * max_tris + slot]  # (capacity, 9)
    gids = [
        tt * Stile
        + cx * row[:, 3 * v]
        + cy * row[:, 3 * v + 1]
        + cz
        + row[:, 3 * v + 2]
        for v in range(3)
    ]
    faces = compact.rank_lookup(ranktab, jnp.concatenate(gids)).reshape(
        3, capacity
    )
    if packed is True:  # 21-bit face pack (vertex count fits)
        f = faces.astype(jnp.uint32)
        B = mc.FACE_PACK_BITS
        lo_mask = jnp.uint32((1 << (32 - B)) - 1)
        w0 = f[0] | (f[1] & lo_mask) << B
        w1 = (f[1] >> (32 - B)) | f[2] << (2 * B - 32)
        faces = jnp.stack([w0, w1], axis=0)
    elif packed == "wide":
        faces = faces.astype(jnp.uint32)
    return everts, faces, n_tris


@partial(jax.jit, static_argnames=("ntc", "tile", "interpret"))
def _eval_tiles_pallas(sdf, Xp, Yp, Zp, tiles, ntc, tile, interpret):
    """Fused Pallas per-tile eval + classify (see pallas_eval)."""
    from . import pallas_eval

    return pallas_eval.eval_tiles_and_classify(
        sdf, Xp, Yp, Zp, tiles, ntc, tile, interpret=interpret
    )


# Memoized batched-kernel routing: (expression-structure, tile, ntc)
# key -> chosen (cz, xs) | False (= XLA: tree too wide for VMEM, or it
# lost the measured race).  Mosaic holds every live intermediate in
# VMEM (no spilling), so deep CSG trees overflow the scoped budget -- a
# failed compile costs seconds through a tunneled runtime and must not
# be retried per call.  ntc is in the key because the winner is
# scale-dependent: measured on v5e, the batched kernel ties XLA at
# ~200 tiles (2^22 grids) and LOSES ~1.2x at ~1500 tiles (knurling at
# 2^26), where XLA's chunked eval amortizes its dispatch (PERF.md).
_BATCHED_CZ = {}


def _race(contenders, rounds=2, K=4):
    """min amortized seconds per contender, interleaved.

    Interleaving is mandatory on this runtime: dispatch/transfer
    latency drifts 2-3x within a session, so back-to-back (rather than
    interleaved) A/B timings can invert the true ranking.  Round 3's
    "batched kernel 1.3-1.8x faster than XLA" was exactly that artifact
    (plus per-phase fencing); interleaved minima show parity at 2^22.
    """
    import time

    best = {name: float("inf") for name, _ in contenders}
    for _ in range(rounds):
        for name, fn in contenders:
            t0 = time.perf_counter()
            for _ in range(K):
                r = fn()
            jax.block_until_ready(r)
            np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
            best[name] = min(best[name], (time.perf_counter() - t0) / K)
    return best


def _eval_tiles_auto(sdf_c, Xd, Yd, Zd, tiles_d, ntc, tile, dtype,
                     chunk_tiles, interpret, required=False):
    """Pick the fastest available tile evaluator, by measurement.

    Returns ``(vols, case_or_None, mode)``.  First call per
    (expression structure, tile, ntc): find the largest batched-kernel
    block that compiles (ladder below), then RACE it against XLA's
    chunked eval interleaved and memoize the winner -- the ranking is
    scale- and model-dependent, so it is measured, not assumed.
    ``required`` (use_pallas=True) skips the race and raises if the
    kernel cannot compile.
    """
    from . import pallas_eval
    from .engine import _pallas_key

    # VMEM fit depends on the TILE size (block shapes are (cz, xs, TS,
    # K)); the race winner additionally depends on the tile count.
    key = (_pallas_key(sdf_c, dtype, (int(Xd.shape[0]), int(Yd.shape[0]))),
           tile, int(ntc))
    # Memo states: absent | False (auto -> XLA: compile failure, or the
    # kernel LOST the race) | ("unraced", cz, xs) (compiles; only a
    # use_pallas=True call has exercised it) | ("raced", cz, xs) (won
    # the measured race).  "compiles" and "won the race" are different
    # facts: a required call must never install a block in a way that
    # lets auto mode skip the race (code-review finding, twice).
    blk = _BATCHED_CZ.get(key)
    last_exc = None

    def batched(cz, xs):
        return pallas_eval.eval_tiles_and_classify_batched(
            sdf_c, Xd, Yd, Zd, tiles_d, ntc, tile, interpret=interpret,
            cz=cz, xs=xs,
        )

    def xla():
        return _eval_tiles(sdf_c, Xd, Yd, Zd, tiles_d, ntc, chunk_tiles,
                           tile)

    xla_vols = [None]  # last xla() eval, reusable if XLA wins the race

    def xla_classified():
        # The fair XLA contender for the race: the kernel fuses
        # classification, the XLA route pays it inside _count_tiles
        # (_tile_cases), so the race must charge XLA for it too
        # (jitted here; in the real path it fuses into the count jit).
        xla_vols[0] = xla()
        return _tile_cases_jit(xla_vols[0], tile, "default")

    def memo(value):
        if len(_BATCHED_CZ) > 256:
            _BATCHED_CZ.clear()
        _BATCHED_CZ[key] = value

    def race(block, vols, case):
        """Race the compiled kernel block against XLA and memoize the
        verdict.  Returns the routed result.  Costs rounds*K extra
        evals once per (expression, tile, ntc)."""
        jax.block_until_ready(xla_classified())  # warm (also compiles)
        t = _race(
            [("batched", lambda: batched(*block)),
             ("xla", xla_classified)]
        )
        if t["xla"] < t["batched"]:
            memo(False)
            return xla_vols[0], None, "xla"
        memo(("raced",) + block)
        return vols, case, "batched"

    if blk is False and required:
        # A False memo can mean "lost the race", not "cannot compile";
        # use_pallas=True must re-try the ladder.
        blk = None
    won = None
    if isinstance(blk, tuple):
        # Memoized block size: still guard the call (a stale entry must
        # degrade to the ladder, not crash).
        ok = None
        try:
            vols, case = batched(blk[1], blk[2])
            if required or interpret or blk[0] == "raced":
                return vols, case, "batched"
            jax.block_until_ready(vols)
            ok = (blk[1], blk[2])
        except Exception as e:
            last_exc = e
            blk = None
        if ok is not None:
            # An unraced block (installed by a use_pallas=True call):
            # auto mode still owes the race.
            return race(ok, vols, case)
    if blk is None:
        # Block-size ladder: shrink (z-rows, x-rows) until the tree's
        # live intermediates fit VMEM; the z halo is carried in scratch
        # (free), so only the x halo recompute (xs+1)/xs grows as x
        # blocks shrink -- try the largest first.
        for trycz, tryxs in ((2, None), (3, 16), (3, 10), (1, 4)):
            try:
                vols, case = batched(trycz, tryxs)
                jax.block_until_ready(vols)
                won = (trycz, tryxs)
                break
            except Exception as e:
                last_exc = e
                continue
        if won is None:
            memo(False)
        elif required or interpret:
            # No race here: required forces the kernel, and interpret
            # (CI) timing is meaningless.  Record the block as UNRACED
            # so the first auto call still measures -- but never
            # overwrite an existing verdict (a required call must not
            # change auto-mode routing).
            if _BATCHED_CZ.get(key) is None:
                memo(("unraced",) + won)
            return vols, case, "batched"
        else:
            return race(won, vols, case)
    if required:
        raise RuntimeError(
            "use_pallas=True: the batched tile kernel failed for this "
            "expression at every block size (VMEM overflow for wide "
            "trees, or a lowering failure -- see the chained exception "
            "and PERF.md)"
        ) from last_exc
    if xla_vols[0] is None:
        xla_vols[0] = xla()
    return xla_vols[0], None, "xla"


def unpack_tiles_indexed(epack, fpack, tiles_np, tile, dtype=np.float32):
    """Host decode of the packed tiles emit (numpy): bit-identical to the
    plain ``_emit_tiles_indexed`` outputs (same IEEE float32 ops)."""
    TS = tile + 1
    Sblk = tile * TS * TS
    Stile = 3 * Sblk
    eidx = epack[0].astype(np.int64)
    t = epack[1].view(np.float32) if epack.dtype == np.uint32 else epack[1]
    tid = eidx // Stile
    block = eidx % Stile
    a = block // Sblk
    le = block % Sblk
    ft = np.dtype(dtype)
    vh32 = np.empty((len(eidx), 3), dtype=ft)
    base = tiles_np[tid] * tile  # (ne, 3) int
    dims = ((tile, TS, TS), (TS, tile, TS), (TS, TS, tile))
    for av in range(3):
        m = a == av
        d0, d1, d2 = dims[av]
        l = le[m]
        z = l % d2
        rem = l // d2
        exyz = (rem // d1, rem % d1, z)
        for c in range(3):
            comp = (base[m, c] + exyz[c]).astype(ft)
            if c == av:
                comp = comp + t[m].astype(ft)
            vh32[m, c] = comp
    return vh32.astype(np.float64), mc.unpack_faces(fpack)


# Memoized (n_tris, n_cells, n_edges) per engine-provided key + cull mask
# + eval path: deterministic, so repeat runs skip the pre-emit sync and
# fetch stats with the mesh readback (mirrors engine._COUNTS_MEMO).
_COUNTS_MEMO = {}


# When True, mesh_sparse_tiles splits its wall time into device /
# d2h / decode sub-phases in ``stats`` (one extra tiny fenced read per
# run to separate device completion from transfer -- off by default so
# the warm path keeps its no-pre-transfer-sync property).  bench.py
# turns it on to decompose the flagship 2^26 e2e (round-4 verdict
# item 6: a bad-weather transfer must not masquerade as a device
# regression).
PROFILE = False


def mesh_sparse_tiles(sdf_c, X, Y, Z, skip, tile, dtype, chunk_tiles=128,
                      use_pallas=False, interpret=False,
                      return_indexed=False, memo_key=None,
                      variant="default", stats=None):
    """Tiled sparse pipeline: eval + marching cubes on active tiles only.

    Returns (verts (3T, 3) float64 in fractional index coords,
    per_tile_counts (tx, ty, tz)) -- or, with ``return_indexed=True``,
    ``((everts (V, 3), faces (T, 3) int32), per_tile_counts)`` with the
    indexed mesh the device emitted (soup == everts[faces.reshape(-1)]).
    ``skip`` is the probe-cull mask from the engine (True = culled) at
    ``tile`` (= engine batch_size) cells per tile per axis.
    ``use_pallas`` selects the evaluator: None = auto (on TPU,
    gather-free expressions RACE the lane-major batched Pallas kernel
    against XLA's chunked eval+classify once per (expression, tile,
    ntc) and memoize the measured winner -- see _eval_tiles_auto);
    True = Pallas required (batched, or the per-tile hybrid kernel for
    gather-bearing expressions; raises if neither lowers); False = XLA.
    ``memo_key`` (an expression+grid fingerprint from the engine) enables
    count memoization across repeat runs.
    """
    import hashlib

    _t_entry = time.perf_counter()
    nx, ny, nz = len(X), len(Y), len(Z)
    cshape = (nx - 1, ny - 1, nz - 1)

    def empty(pt):
        v = np.zeros((0, 3), dtype=np.float64)
        return ((v, np.zeros((0, 3), np.int32)) if return_indexed else v), pt

    keep = ~skip
    active = np.argwhere(keep)  # (nt, 3) host, x-major order
    nt = len(active)
    if nt == 0:
        return empty(np.zeros(skip.shape, dtype=np.int64))
    ntc = round_capacity(nt)
    tiles = np.zeros((ntc, 3), dtype=np.int32)
    tiles[:nt] = active
    live = np.zeros((ntc,), dtype=bool)
    live[:nt] = True

    Xd = jnp.asarray(X, dtype=dtype)
    Yd = jnp.asarray(Y, dtype=dtype)
    Zd = jnp.asarray(Z, dtype=dtype)
    tiles_d = jnp.asarray(tiles)
    live_d = jnp.asarray(live)

    from . import hybrid

    ngather = hybrid.count_gathers(sdf_c)
    if use_pallas is None:
        use_pallas = (
            "auto" if (jax.default_backend() == "tpu" and ngather == 0)
            else False
        )
    mode = "xla"
    if use_pallas is True and ngather:
        # Gather-bearing expressions: the per-tile kernel with the
        # hybrid XLA pre-pass.  Edge tiles read one tile past the end:
        # pad each axis with its last coordinate (the same samples
        # _eval_tiles's index clamping produces; the repeated-sample
        # cells are masked downstream).
        def padf(A):
            return jnp.concatenate(
                [A, jnp.full((tile,), A[-1], dtype=A.dtype)]
            )

        vols, case = _eval_tiles_pallas(
            sdf_c, padf(Xd), padf(Yd), padf(Zd), tiles_d, ntc, tile,
            interpret,
        )
        mode = "pertile"
    elif use_pallas and not ngather:
        vols, case, mode = _eval_tiles_auto(
            sdf_c, Xd, Yd, Zd, tiles_d, ntc, tile, dtype, chunk_tiles,
            interpret, required=(use_pallas is True),
        )
    else:
        # XLA (also the auto route for gather-bearing expressions: their
        # per-tile hybrid kernel measured slower than XLA's chunked eval)
        vols, case = (
            _eval_tiles(sdf_c, Xd, Yd, Zd, tiles_d, ntc, chunk_tiles, tile),
            None,
        )
    if variant != "default" and case is not None:
        # extend the kernels' 8-bit codes with the variant bits
        from . import mc33

        case = mc33.classify_ext(vols, base_case=case)
    total, per_tile, ncell, case, nedge, emask = _count_tiles(
        vols, tiles_d, live_d, cshape, tile, case, variant
    )
    # Counts are deterministic in (expression, grid, dtype, cull mask,
    # eval path): on a memoized repeat run, skip the pre-emit sync and
    # fetch per-tile stats WITH the mesh readback in one device_get.
    ckey = cached = None
    if memo_key is not None:
        ckey = (
            memo_key, mode, tile, variant,
            hashlib.sha256(np.ascontiguousarray(skip).tobytes()).hexdigest(),
        )
        cached = _COUNTS_MEMO.get(ckey)
    pt = np.zeros(skip.shape, dtype=np.int64)
    if cached is not None:
        n, ncl, ne = cached
        per_tile_h = None
    else:
        # One round trip for all three capacity counts + stats.
        n, ncl, ne, per_tile_h = jax.device_get(
            (total, ncell, nedge, per_tile)
        )
        n, ncl, ne = int(n), int(ncl), int(ne)
        if ckey is not None:
            if len(_COUNTS_MEMO) > 256:
                _COUNTS_MEMO.clear()
            _COUNTS_MEMO[ckey] = (n, ncl, ne)

    if n == 0:
        if per_tile_h is None:
            per_tile_h = np.asarray(per_tile)
        pt[tuple(active.T)] = per_tile_h[:nt]
        return empty(pt)

    capacity = round_capacity(n)
    cell_capacity = round_capacity(ncl)
    edge_capacity = round_capacity(ne)
    # Packed wire format (8 B/vertex + 8 B/triangle; see
    # mc.emit_indexed_packed) for float32 volumes; host decode is
    # bit-identical to the plain indexed emit.
    packed = False
    if jnp.dtype(dtype) == jnp.float32:
        packed = True if ne < (1 << mc.FACE_PACK_BITS) else "wide"
    everts, faces, _ = _emit_tiles_indexed(
        vols, tiles_d, live_d, case, emask, cshape, edge_capacity, capacity,
        cell_capacity, tile, packed=packed, variant=variant,
    )
    if PROFILE and stats is not None:
        # Fence device completion with a tiny read so the d2h phase
        # below measures TRANSFER, not residual device work; "device"
        # is everything from call entry (dispatch + eval + count sync
        # on cold runs + emit) to that fence.
        np.asarray(faces.ravel()[:1])
        stats["tiles_device"] = round(time.perf_counter() - _t_entry, 4)
        _t0 = time.perf_counter()
    # Indexed readback (a third of the soup bytes); the emitted count
    # always equals ``total`` (already fetched/memoized), so no extra
    # scalar sync (~40 ms RTT on a tunneled runtime) is needed.
    if per_tile_h is None:
        eh, fh_raw, per_tile_h = jax.device_get(
            (everts[:, :ne], faces[:, :n], per_tile)
        )
    else:
        eh = np.asarray(everts[:, :ne])
        fh_raw = np.asarray(faces[:, :n])
    if PROFILE and stats is not None:
        stats["tiles_d2h"] = round(time.perf_counter() - _t0, 4)
        stats["tiles_d2h_bytes"] = int(eh.nbytes + fh_raw.nbytes)
        _t0 = time.perf_counter()
    pt[tuple(active.T)] = per_tile_h[:nt]
    if packed is not False:
        vh, fh = unpack_tiles_indexed(eh, fh_raw, tiles, tile)
    else:
        vh = eh.astype(np.float64).T  # (ne, 3)
        fh = fh_raw.T
    if PROFILE and stats is not None:
        stats["tiles_decode"] = round(time.perf_counter() - _t0, 4)
    if return_indexed:
        return (vh, fh), pt
    return vh[fh.reshape(-1)], pt
