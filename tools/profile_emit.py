"""Per-sub-phase profile of mc.gather_emit_indexed on real TPU.

Decomposes the fused gather+emit dispatch (the dominant device phase at
2^22: ~15 ms of a ~21 ms pipeline) into its constituent kernels, each
timed with the repo's amortized-dispatch methodology (K back-to-back
dispatches, one final fence), so optimization effort lands where the
time actually goes.

Usage: python tools/profile_emit.py [log2_samples]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sdf_tpu.core import compact, engine, mc
from sdf_tpu.core.node import cast
from sdf_tpu.models import example


def _timed(f, *args, K=20, reps=3):
    r = f(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(K):
            r = f(*args)
        jax.block_until_ready(r)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / K)
    return best, r


def main():
    p2 = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    f = example()
    dtype = jnp.float32
    sdf_c = cast(f, dtype)
    bounds = engine._estimate_bounds(f, dtype)
    (x0, y0, z0), (x1, y1, z1) = bounds
    volume = (x1 - x0) * (y1 - y0) * (z1 - z0)
    step = (volume / 2**p2) ** (1 / 3)
    X = np.arange(x0, x1, step)
    Y = np.arange(y0, y1, step)
    Z = np.arange(z0, z1, step)
    s = engine.BATCH_SIZE
    cshape = (len(X) - 1, len(Y) - 1, len(Z) - 1)
    tshape = tuple(-(-c // s) for c in cshape)
    keep = jnp.ones(cshape, dtype=bool)

    vol = jax.block_until_ready(engine._eval_volume(sdf_c, X, Y, Z, dtype))
    case = jax.block_until_ready(jax.jit(mc._cell_cases)(vol))
    ncells_dev, total, n_edges, per_tile, active, emask = mc.count_indexed(
        vol, case, keep, s, tshape
    )
    n_cells, n, ne = (int(v) for v in (ncells_dev, total, n_edges))
    ccap = mc.round_capacity(n_cells)
    cap = mc.round_capacity(n)
    ecap = mc.round_capacity(ne)
    ncells_grid = int(np.prod(cshape))
    nedges_grid = int(emask.shape[0])
    print(f"grid={len(X)}x{len(Y)}x{len(Z)}  cells={ncells_grid/1e6:.1f}M "
          f"edges={nedges_grid/1e6:.1f}M")
    print(f"n_cells={n_cells} (ccap {ccap})  n_tris={n} (cap {cap})  "
          f"n_edges={ne} (ecap {ecap})")

    packed = True if ne < (1 << mc.FACE_PACK_BITS) else "wide"
    t, _ = _timed(
        partial(mc.gather_emit_indexed, packed=packed),
        vol, case, active, emask, ecap, cap, ccap,
    )
    print(f"gather_emit_indexed (whole): {t*1e3:7.2f} ms")

    # --- sub-phase: cell compaction ------------------------------------
    cc = jax.jit(mc.compact_cells, static_argnames=("cell_capacity",))
    t, cell_state = _timed(partial(cc, cell_capacity=ccap), case, active)
    print(f"  compact_cells (4.2M mask pack + gathers):  {t*1e3:7.2f} ms")

    # --- sub-phase: edge-mask pack + rank table -------------------------
    iro = jax.jit(
        compact.indices_and_ranktable_of,
        static_argnames=("capacity", "backend"),
    )
    t, (eidx, ranktab, _) = _timed(
        partial(iro, capacity=ecap, backend="tpu"), emask
    )
    print(f"  indices_and_ranktable_of (edge mask):      {t*1e3:7.2f} ms")

    # pack-only variant (no ranks output): isolates the ranks cost.
    @partial(jax.jit, static_argnames=("capacity",))
    def pack_only(mask, capacity):
        i, _ = compact.indices_of_pallas(mask, capacity)
        return i

    t, _ = _timed(partial(pack_only, capacity=ecap), emask)
    print(f"    pack-only (indices_of, no ranks):        {t*1e3:7.2f} ms")

    # raw rowpack kernel alone (no ragged concat):
    @jax.jit
    def rowpack_only(mask):
        return compact._rowpack(compact._pad_rows(mask))

    t, _ = _timed(rowpack_only, emask)
    print(f"    rowpack kernel alone:                    {t*1e3:7.2f} ms")

    @jax.jit
    def rowpack_ranks(mask):
        m2 = compact._pad_rows(mask)
        from jax.experimental import pallas as pl

        rows_padded = m2.shape[0]
        return pl.pallas_call(
            compact._rowpack_ranks_bytes_kernel,
            grid=(rows_padded // compact._R,),
            in_specs=[pl.BlockSpec((compact._R, compact._LANES),
                                   lambda i: (i, 0))],
            out_specs=[
                pl.BlockSpec((compact._R, compact._LANES), lambda i: (i, 0)),
                pl.BlockSpec((compact._R, compact._LANES), lambda i: (i, 0)),
                pl.BlockSpec((compact._R, 16), lambda i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rows_padded, compact._LANES),
                                     jnp.int32),
                jax.ShapeDtypeStruct((rows_padded, compact._LANES),
                                     jnp.int32),
                jax.ShapeDtypeStruct((rows_padded, 16), jnp.int32),
            ],
        )(m2)

    t, _ = _timed(rowpack_ranks, emask)
    print(f"    rowpack+ranks+bytes kernel alone:        {t*1e3:7.2f} ms")

    # --- sub-phase: edge decode + endpoint gather + t -------------------
    @partial(jax.jit, static_argnames=())
    def edge_verts(volume, eidx):
        nx, ny, nz = volume.shape
        Sx = (nx - 1) * ny * nz
        Sy = nx * (ny - 1) * nz
        ax = (eidx >= Sx).astype(jnp.int32) + (eidx >= Sx + Sy).astype(
            jnp.int32
        )

        def decode(local, My, Mz):
            z = local % Mz
            rem = local // Mz
            return rem // My, rem % My, z

        d0 = decode(eidx, ny, nz)
        d1 = decode(eidx - Sx, ny - 1, nz)
        d2 = decode(eidx - Sx - Sy, ny, nz - 1)

        def pick(i):
            return jnp.where(ax == 0, d0[i], jnp.where(ax == 1, d1[i], d2[i]))

        ex, ey, ez = pick(0), pick(1), pick(2)
        vflat = volume.reshape(-1)
        lin_a = (ex * ny + ey) * nz + ez
        vstride = jnp.where(ax == 0, ny * nz, jnp.where(ax == 1, nz, 1))
        vab = compact.gather1d(vflat, jnp.concatenate([lin_a, lin_a + vstride]))
        va = vab[: lin_a.shape[0]]
        vb = vab[lin_a.shape[0]:]
        denom = va - vb
        t = jnp.clip(va / jnp.where(denom == 0, 1.0, denom), 0.0, 1.0)
        return ex, ey, ez, t

    t, _ = _timed(edge_verts, vol, eidx)
    print(f"  edge decode + endpoint gather + t:         {t*1e3:7.2f} ms")

    # --- sub-phase: face resolution -------------------------------------
    nx, ny, nz = vol.shape
    Sx = (nx - 1) * ny * nz
    Sy = nx * (ny - 1) * nz
    rf = jax.jit(
        mc._resolve_faces,
        static_argnames=("capacity", "cell_capacity", "ny", "nz", "Sx", "Sy"),
    )
    t, _ = _timed(
        partial(rf, capacity=cap, cell_capacity=ccap, ny=ny, nz=nz, Sx=Sx,
                Sy=Sy),
        ranktab, cell_state,
    )
    print(f"  _resolve_faces (expand+edgeids+rank lookup): {t*1e3:7.2f} ms")

    # within resolve: ragged_expand with fill
    cell_ntri = cell_state[4]

    @partial(jax.jit, static_argnames=("capacity",))
    def rexp(cn, w, capacity):
        return compact.ragged_expand(cn, capacity, fill=w)

    cbits = mc.get_tables().case_bits
    ci, cj, ck, cell_case, _ = cell_state
    w = ((ci * (ny - 1) + cj) * (nz - 1) + ck) * (1 << cbits) + cell_case
    t, (_, slot, _, wt) = _timed(partial(rexp, capacity=cap), cell_ntri, w)
    print(f"    ragged_expand(fill):                     {t*1e3:7.2f} ms")

    @partial(jax.jit, static_argnames=())
    def edge_ids(case_t, slot):
        return mc._edge_ids_of(case_t, slot)

    case_t = wt & ((1 << cbits) - 1)
    t, ev = _timed(edge_ids, case_t, slot)
    print(f"    _edge_ids_of (packed 3x4-bit gather):       {t*1e3:7.2f} ms")

    lin = wt >> cbits
    ny1, nz1 = ny - 1, nz - 1
    cx = lin // (ny1 * nz1)
    rem = lin % (ny1 * nz1)
    cy = rem // nz1
    cz = rem % nz1

    @partial(jax.jit, static_argnames=("ny", "nz", "Sx", "Sy"))
    def gids_rank(ev0, ev1, ev2, cx, cy, cz, tab, ny, nz, Sx, Sy):
        gids = [mc._edge_gid(e, cx, cy, cz, ny, nz, Sx, Sy)
                for e in (ev0, ev1, ev2)]
        return compact.rank_lookup(tab, jnp.concatenate(gids))

    t, _ = _timed(
        partial(gids_rank, ny=ny, nz=nz, Sx=Sx, Sy=Sy),
        ev[0], ev[1], ev[2], cx, cy, cz, ranktab,
    )
    print(f"    _edge_gid + rank lookup (pair table):    {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
