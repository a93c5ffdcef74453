"""Fused Pallas evaluation + marching-cubes classification kernel.

One kernel evaluates the SDF expression over a z-slab of the sample grid
AND computes the per-cell marching-cubes case codes in the same pass, so
the classification phase never re-reads the volume from HBM (XLA runs
eval and count as separate programs with an HBM round trip between them).

TPU layout notes (see /opt/skills/guides/pallas_guide.md):

  * Blocks are laid out (bz, nx, ny) -- z on the grid dimension, y on the
    128-wide lanes, x on sublanes.  A z-minor block would put the tiny z
    extent on lanes and pad it to 128 (~16x VMEM waste).
  * The +1 sample halo each cell slab needs is *recomputed* from
    host-pre-sliced overlapping z-coordinate windows (Mosaic cannot prove
    alignment of in-kernel dynamic slices) -- same
    recompute-over-communicate choice as the sharded engine.
  * The expression tree is ordinary jnp code traced into the kernel body;
    Mosaic fuses it into vector loops, so deep CSG trees do not
    materialize per-op VMEM temporaries.

Expressions whose evaluation needs gathers (texture/mesh SDFs, polygon,
legacy closures) are not Mosaic-vectorizable by themselves; those
subtrees are pre-evaluated by XLA at their true transformed query points
and fed to the kernel as blocked inputs, so the closed-form majority of
the tree still evaluates fused in VMEM (see core/hybrid.py).  Only if
that split itself fails (gather under a lax-loop ancestor) do callers
fall back to the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import hybrid
from .node import Points

# Corner bit b of a cell is set iff sample at offset CORNER_OFFSETS[b] is
# inside (d < 0); order must match mc.CORNER_OFFSETS / the tri tables.
from .mc_tables import CORNER_OFFSETS


def _eval_root(root, p):
    """Static kernel-side eval entry: the unflattened pytree IS the node."""
    return root(p)


def _kernel(x_ref, y_ref, z_ref, *rest, fn, treedef, scalar, bz, nx, ny,
            nvols=0):
    """Dense fused eval+classify for one z-chunk of bz output planes.

    The +1 z halo plane is CARRIED in VMEM scratch, not recomputed: the
    1-D chunk grid runs sequentially, so chunk i's plane 0 (global
    plane i*bz) is exactly chunk i-1's last evaluated plane (same
    coordinate, elementwise eval -- bit-identical).  Only chunk 0
    evaluates its plane 0, under pl.when.  Halo tax (bz+1)/bz -> 1.
    """
    param_refs = rest[: len(rest) - 3 - nvols]
    gather_refs = rest[len(rest) - 3 - nvols : len(rest) - 3]
    vol_ref, case_ref, carry_ref = rest[-3:]

    # The full padded z-coordinate vector lives in SMEM (scalar memory
    # supports dynamic indexing); assemble this block's coordinates
    # from unrolled scalar reads at a dynamic base offset with an iota
    # select -- Mosaic cannot reshape a 1D vector to 3D.
    i = pl.program_id(0)
    x = x_ref[...]
    y = y_ref[...]

    # Scalar leaves travel as (1,) blocks (TPU lowering requires rank>=1).
    leaves = [
        r[...][0] if is_scalar else r[...]
        for r, is_scalar in zip(param_refs, scalar)
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    gvols = [r[...][0] for r in gather_refs]  # (bz+1, nx, ny) each

    @pl.when(i == 0)
    def _init_carry():
        kidx0 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1), 0)
        z0 = jnp.where(kidx0 == 0, z_ref[0, 0], 0.0)
        p0 = Points(x[None, :, None], y[None, None, :], z0)
        with hybrid.kernel_vols([g[:1] for g in gvols]):
            carry_ref[...] = jnp.broadcast_to(fn(params, p0), (1, nx, ny))

    kidx = jax.lax.broadcasted_iota(jnp.int32, (bz, 1, 1), 0)
    z = sum(
        jnp.where(kidx == k, z_ref[0, i * bz + 1 + k], 0.0)
        for k in range(bz)
    )
    # SoA broadcast evaluation, (z, x, y) axis order for lane-friendliness.
    p = Points(x[None, :, None], y[None, None, :], z)
    with hybrid.kernel_vols([g[1:] for g in gvols]):
        d_rest = jnp.broadcast_to(fn(params, p), (bz, nx, ny))

    d = jnp.concatenate([carry_ref[...], d_rest], axis=0)
    carry_ref[...] = d_rest[bz - 1 :]
    vol_ref[...] = d[:bz]

    inside = d < 0
    case = jnp.zeros((bz, nx - 1, ny - 1), dtype=jnp.int32)
    for b, (ox, oy, oz) in enumerate(np.asarray(CORNER_OFFSETS)):
        corner = inside[oz : bz + oz, ox : nx - 1 + ox, oy : ny - 1 + oy]
        case = case | (corner.astype(jnp.int32) << b)
    case_ref[...] = case


def _pallas_invoke(leaves, X, Y, Zw, fn, treedef, scalar, nz, bz, interpret,
                   wins=()):
    """Raw pallas_call invocation; traced-input safe (usable in shard_map).

    ``wins``: per-block pre-computed gather fields, each
    (nchunks, bz+1, nx, ny) (see core/hybrid.py); block i of each is
    handed to the kernel alongside the parameter leaves.
    """
    nx, ny = X.shape[0], Y.shape[0]
    nchunks = (Zw.shape[1] - 1) // bz
    kern = partial(
        _kernel, fn=fn, treedef=treedef, scalar=scalar, bz=bz, nx=nx, ny=ny,
        nvols=len(wins),
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    zspec = pl.BlockSpec(Zw.shape, lambda i: (0, 0), memory_space=pltpu.SMEM)
    wspec = pl.BlockSpec((1, bz + 1, nx, ny), lambda i: (i, 0, 0, 0))
    vol_t, case_t = pl.pallas_call(
        kern,
        grid=(nchunks,),
        in_specs=[full(X), full(Y), zspec]
        + [full(l) for l in leaves]
        + [wspec for _ in wins],
        out_specs=(
            pl.BlockSpec((bz, nx, ny), lambda i: (i, 0, 0)),
            pl.BlockSpec((bz, nx - 1, ny - 1), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nchunks * bz, nx, ny), X.dtype),
            jax.ShapeDtypeStruct((nchunks * bz, nx - 1, ny - 1), jnp.int32),
        ),
        # z-plane carry (see _kernel): the chunk grid must run
        # sequentially; "arbitrary" (the sequential default) is pinned
        # so a future parallel-semantics change cannot corrupt it.
        # vmem_limit_bytes: same rationale as the batched tile kernel
        # (v5e has 128 MB physical; the default 16 MB scoped budget
        # rejects wide trees / big-nx*ny slabs that in fact fit).
        scratch_shapes=[pltpu.VMEM((1, nx, ny), X.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(X, Y, Zw, *leaves, *wins)
    # (z, x, y) -> (x, y, z); trim z padding.
    vol = jnp.moveaxis(vol_t, 0, 2)[:, :, :nz]
    case = jnp.moveaxis(case_t, 0, 2)[:, :, : nz - 1]
    return vol, case


def _tile_kernel(x_ref, y_ref, z_ref, t_ref, *rest, fn, treedef, scalar,
                 tile, nvols=0):
    """Fused eval + classify for ONE active tile (sparse='tiles' path).

    Coordinates for the tile's (tile+1)^3 sample cube are assembled from
    scalar SMEM reads at the tile's dynamic offsets (same iota-select
    trick as the dense kernel's z column; Mosaic cannot reshape 1D
    vectors to 3D).  Outputs the tile volume and its tile^3 case codes.
    """
    param_refs = rest[: len(rest) - 2 - nvols]
    gather_refs = rest[len(rest) - 2 - nvols : len(rest) - 2]
    vol_ref, case_ref = rest[-2:]
    TS = tile + 1
    t = pl.program_id(0)
    tx = t_ref[t, 0] * tile
    ty = t_ref[t, 1] * tile
    tz = t_ref[t, 2] * tile

    def axis_coords(ref, base, shape, dim):
        idx = jax.lax.broadcasted_iota(jnp.int32, shape, dim)
        return sum(
            jnp.where(idx == k, ref[0, base + k], 0.0) for k in range(TS)
        )

    x = axis_coords(x_ref, tx, (TS, 1, 1), 0)
    y = axis_coords(y_ref, ty, (1, TS, 1), 1)
    z = axis_coords(z_ref, tz, (1, 1, TS), 2)

    leaves = [
        r[...][0] if is_scalar else r[...]
        for r, is_scalar in zip(param_refs, scalar)
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    with hybrid.kernel_vols([r[...][0] for r in gather_refs]):
        d = jnp.broadcast_to(fn(params, Points(x, y, z)), (TS, TS, TS))
    vol_ref[0] = d

    inside = d < 0
    case = jnp.zeros((tile, tile, tile), dtype=jnp.int32)
    for b, (ox, oy, oz) in enumerate(np.asarray(CORNER_OFFSETS)):
        corner = inside[ox : tile + ox, oy : tile + oy, oz : tile + oz]
        case = case | (corner.astype(jnp.int32) << b)
    case_ref[0] = case


def eval_tiles_and_classify(sdf_c, X, Y, Z, tiles, ntc, tile,
                            interpret=False):
    """Fused per-tile eval + classify over the active-tile list.

    X/Y/Z: (padded) device axis coordinate vectors; tiles: (ntc, 3) int32
    tile indices (clamped so tile*t + tile stays in range -- the caller
    pads the coordinate vectors by one tile, see core.sparse).  Returns
    (vols (ntc, TS, TS, TS), case (ntc, tile, tile, tile)).
    """
    TS = tile + 1
    ngather = hybrid.count_gathers(sdf_c)
    wins = ()
    tree = sdf_c
    if ngather:
        # XLA pre-pass over per-tile coordinate windows only, so the
        # gather work still scales with the active-tile count.
        off = jnp.arange(TS)
        Xw = X[tiles[:, 0][:, None] * tile + off[None, :]]
        Yw = Y[tiles[:, 1][:, None] * tile + off[None, :]]
        Zw = Z[tiles[:, 2][:, None] * tile + off[None, :]]
        wins = hybrid.record_tile_windows(
            hybrid.to_recording_tree(sdf_c), Xw, Yw, Zw
        )
        tree = hybrid.to_pallas_tree(sdf_c)
    leaves, prep = _prep_tree(tree, X.dtype)
    # nvols = number of RECORDED FIELDS (child evaluations), not tree
    # occurrences: a gather subtree under circular_array records 2
    # fields, under padded repeat (2p+1)^3 -- the kernel must slice and
    # the placeholders pop exactly len(wins).
    kern = partial(_tile_kernel, tile=tile, nvols=len(wins), **prep)
    smem = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.SMEM
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    wspec = pl.BlockSpec((1, TS, TS, TS), lambda i: (i, 0, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(ntc,),
        in_specs=[smem(X[None, :]), smem(Y[None, :]), smem(Z[None, :]),
                  smem(tiles)]
        + [full(l) for l in leaves]
        + [wspec for _ in wins],
        out_specs=(
            pl.BlockSpec((1, TS, TS, TS), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, tile, tile, tile), lambda i: (i, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ntc, TS, TS, TS), X.dtype),
            jax.ShapeDtypeStruct((ntc, tile, tile, tile), jnp.int32),
        ),
        interpret=interpret,
    )(X[None, :], Y[None, :], Z[None, :], tiles, *leaves, *wins)


def _tile_kernel_batched(xw_ref, yw_ref, zw_ref, *rest, fn, treedef, scalar,
                         tile, cz, xs):
    """Fused eval+classify for K=128 tiles at once, tiles on the LANES.

    The per-tile kernel (``_tile_kernel``) lays one (TS, TS, TS) volume
    per program: the minor dim TS(=33) pads to 128 lanes (~3.9x wasted
    vector work) and each program is too small to amortize its overhead
    -- measured SLOWER than XLA's chunked tile eval in round 2.  This
    variant makes the tile axis the minor dim (exactly 128 lanes) and
    chunks the tile z (and optionally x) extent across the grid, so
    every vector op is full width: dims are (z-rows, x-rows, y, K) with
    (y-sublane, K-lane) tiling.  Smaller (cz, xs) blocks trade halo
    recompute for VMEM -- Mosaic holds every live intermediate in VMEM
    (no spilling), so wide expression trees only fit at small blocks.

    Block shapes: xw (1, xs+1, 1, K), yw (1, 1, TS, K), zw
    (1, cz+1, 1, K) coordinate windows precomputed by XLA (cheap
    gathers); outputs vol (cz, xs, TS, K) and case (cz, xs, tile, K)
    per (group, xchunk, zchunk) grid step.

    The z halo plane is CARRIED, not recomputed: TPU grids execute
    sequentially (z-chunks innermost), so a VMEM scratch holds the last
    evaluated z plane of the previous chunk, which is exactly this
    chunk's plane 0 (same clamped coordinate window, same (g, xc)
    block, elementwise eval -- bit-identical to re-evaluating it).
    Only the first chunk of each (g, xc) column evaluates its plane 0,
    under ``pl.when(zc == 0)``.  This cuts the eval halo tax from
    (cz+1)/cz * (xs+1)/xs (1.5x at cz=2) to just (xs+1)/xs (~1.03x at
    full-x blocks), and shrinks the per-intermediate VMEM footprint by
    cz/(cz+1), letting wider trees fit bigger blocks.
    """
    TS = tile + 1
    param_refs = rest[:-3]
    vol_ref, case_ref, carry_ref = rest[-3:]
    x = xw_ref[...]  # (1, xs+1, 1, K): varies along the x dim
    y = yw_ref[...]  # (1, 1, TS, K)
    K = x.shape[-1]
    zfull = zw_ref[...]  # (1, cz+1, 1, K)
    leaves = [
        r[...][0] if is_scalar else r[...]
        for r, is_scalar in zip(param_refs, scalar)
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    @pl.when(pl.program_id(2) == 0)
    def _init_carry():
        z0 = zfull[:, :1].reshape(1, 1, 1, K)
        with hybrid.in_kernel():
            carry_ref[...] = jnp.broadcast_to(
                fn(params, Points(x, y, z0)), (1, xs + 1, TS, K)
            )

    z = zfull[:, 1:].reshape(cz, 1, 1, K)  # leading-dims reshape only
    with hybrid.in_kernel():
        d_rest = jnp.broadcast_to(
            fn(params, Points(x, y, z)), (cz, xs + 1, TS, K)
        )
    d = jnp.concatenate([carry_ref[...], d_rest], axis=0)
    carry_ref[...] = d_rest[cz - 1 :]
    vol_ref[...] = d[:cz, :xs]

    inside = d < 0
    case = jnp.zeros((cz, xs, tile, K), dtype=jnp.int32)
    for b, (ox, oy, oz) in enumerate(np.asarray(CORNER_OFFSETS)):
        corner = inside[oz : cz + oz, ox : xs + ox, oy : tile + oy, :]
        case = case | (corner.astype(jnp.int32) << b)
    case_ref[...] = case


@partial(jax.jit, static_argnames=("ntc", "tile", "interpret", "cz", "xs",
                                   "lanes"))
def eval_tiles_and_classify_batched(sdf_c, X, Y, Z, tiles, ntc, tile,
                                    interpret=False, cz=4, xs=None,
                                    lanes=128):
    """Lane-major fused per-tile eval+classify (see _tile_kernel_batched).

    Same contract as ``eval_tiles_and_classify``, except X/Y/Z are the
    UNPADDED device axis coordinate vectors (indices clamp to the grid):
    tiles (ntc, 3) int32; returns (vols (ntc, TS, TS, TS),
    case (ntc, tile, tile, tile)).  ``cz``/``xs`` are the z/x rows per
    kernel block (xs=None = the full tile extent).  Gather-bearing
    expressions are not supported here (callers route those to the
    per-tile kernel or XLA).
    """
    TS = tile + 1
    K = lanes
    ng = -(-ntc // K)
    npad = ng * K
    nzc = -(-TS // cz)  # z-chunks covering the TS sample rows
    if xs is None:
        xs = TS
    nxc = -(-TS // xs)
    nx, ny, nz = X.shape[0], Y.shape[0], Z.shape[0]
    tiles_p = (
        jnp.concatenate([tiles, jnp.zeros((npad - ntc, 3), tiles.dtype)])
        if npad != ntc
        else tiles
    )

    ar = jnp.arange(TS)

    def windows(axis_coords, t_axis, n_axis, nc, rows):
        # per-chunk rows c*rows + i for i in [0, rows], clamped into the
        # tile (overrun rows are trimmed after the kernel).
        wi = jnp.clip(
            jnp.arange(nc)[:, None] * rows + jnp.arange(rows + 1)[None, :],
            0, TS - 1,
        )  # (nc, rows+1)
        return axis_coords[jnp.clip(
            tiles_p[:, t_axis][:, None, None] * tile + wi[None], 0,
            n_axis - 1,
        )]  # (npad, nc, rows+1)

    xw = windows(X, 0, nx, nxc, xs)
    yw = Y[jnp.clip(tiles_p[:, 1][:, None] * tile + ar, 0, ny - 1)]
    zw = windows(Z, 2, nz, nzc, cz)

    def lanes_of(a):  # (npad, ...) -> (ng, ..., K)
        return jnp.moveaxis(a.reshape(ng, K, *a.shape[1:]), 1, -1)

    xw4 = lanes_of(xw).reshape(ng, nxc * (xs + 1), 1, K)
    yw4 = lanes_of(yw)[:, None, :, :]  # (ng, 1, TS, K)
    zw4 = lanes_of(zw).reshape(ng, nzc * (cz + 1), 1, K)

    leaves, prep = _prep_tree(sdf_c, X.dtype)
    kern = partial(_tile_kernel_batched, tile=tile, cz=cz, xs=xs, **prep)
    full = lambda a: pl.BlockSpec(a.shape, lambda g, xc, zc: (0,) * a.ndim)
    vol4, case4 = pl.pallas_call(
        kern,
        grid=(ng, nxc, nzc),
        in_specs=[
            pl.BlockSpec((1, xs + 1, 1, K), lambda g, xc, zc: (g, xc, 0, 0)),
            pl.BlockSpec((1, 1, TS, K), lambda g, xc, zc: (g, 0, 0, 0)),
            pl.BlockSpec((1, cz + 1, 1, K), lambda g, xc, zc: (g, zc, 0, 0)),
        ]
        + [full(l) for l in leaves],
        out_specs=(
            pl.BlockSpec(
                (cz, xs, TS, K),
                lambda g, xc, zc: (g * nzc + zc, xc, 0, 0),
            ),
            pl.BlockSpec(
                (cz, xs, tile, K),
                lambda g, xc, zc: (g * nzc + zc, xc, 0, 0),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ng * nzc * cz, nxc * xs, TS, K), X.dtype),
            jax.ShapeDtypeStruct(
                (ng * nzc * cz, nxc * xs, tile, K), jnp.int32
            ),
        ),
        # The z-plane carry (see _tile_kernel_batched) requires the
        # z-chunk grid dim to run sequentially; "arbitrary" (the
        # sequential default) is pinned explicitly so a future
        # parallel-semantics change cannot silently corrupt the carry.
        scratch_shapes=[pltpu.VMEM((1, xs + 1, TS, K), X.dtype)],
        # vmem_limit_bytes raises Mosaic's default 16 MB *scoped* vmem
        # budget (v5e has 128 MB physical); wide CSG trees (knurling:
        # ~19 MB of live intermediates at (3, 16) blocks) then compile
        # at large low-halo blocks instead of degrading down the
        # ladder.  96 MB leaves room for the in/out block pipeline
        # buffers, which share the same physical VMEM.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3,
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xw4, yw4, zw4, *leaves)

    def detile(a, zrows, xrows):
        a = a.reshape(ng, nzc * cz, a.shape[1], a.shape[2], K)
        a = a[:, :zrows, :xrows]
        a = jnp.moveaxis(a, (1, 4), (4, 1))  # (g,z,x,y,k) -> (g,k,x,y,z)
        return a.reshape(ng * K, xrows, a.shape[3], zrows)[:ntc]

    return detile(vol4, TS, TS), detile(case4, tile, tile)


def _prep_tree(sdf_c, dtype):
    """Flatten an expression for kernel use: leaves + static kernel kwargs."""
    leaves, treedef = jax.tree_util.tree_flatten(sdf_c)
    leaves = [jnp.asarray(l, dtype=dtype) for l in leaves]
    scalar = tuple(l.ndim == 0 for l in leaves)
    leaves = [l.reshape(1) if l.ndim == 0 else l for l in leaves]
    return tuple(leaves), dict(fn=_eval_root, treedef=treedef, scalar=scalar)


def _pick_bz(nx, ny, dtype, nvols=0):
    """Largest z block keeping a (bz+1, nx, ny) slab within ~8 MB VMEM.

    Each pre-computed gather field adds one more (bz+1, nx, ny) block to
    the kernel's working set, so the budget is shared 1 + nvols ways.
    """
    slab_bytes = nx * ny * np.dtype(dtype).itemsize
    budget = (8 << 20) // (1 + nvols)
    return int(max(1, min(8, budget // max(1, slab_bytes) - 1)))


def eval_and_classify_traced(sdf_c, X, Y, Zblk, bz=None, interpret=False):
    """Traced-input fused eval+classify, for use INSIDE jit/shard_map.

    X (nx,), Y (ny,), Zblk (nz,) are traced device arrays (e.g. one
    device's z-slab inside the sharded engine).  Returns
    (vol (nx,ny,nz), case (nx-1,ny-1,nz-1)).
    """
    nx, ny, nz = X.shape[0], Y.shape[0], Zblk.shape[0]
    dtype = X.dtype
    ngather = hybrid.count_gathers(sdf_c)
    bz_given = bz is not None

    def _blocks(bz):
        nchunks = max(1, -(-nz // bz))
        need = nchunks * bz + 1
        Zp = jnp.concatenate(
            [Zblk, jnp.full((need - nz,), Zblk[-1], dtype=Zblk.dtype)]
        )
        return nchunks, Zp

    if not bz_given:
        bz = _pick_bz(nx, ny, dtype, ngather)
    nchunks, Zp = _blocks(bz)
    wins = ()
    tree = sdf_c
    if ngather:
        # XLA pre-pass: evaluate gather subtrees at their transformed
        # query points over overlapping per-block z windows; the kernel
        # evaluates the rest of the tree with placeholders popping these.
        widx = np.arange(nchunks)[:, None] * bz + np.arange(bz + 1)[None, :]
        wins = hybrid.record_dense_windows(
            hybrid.to_recording_tree(sdf_c), X, Y, Zp[widx]
        )
        if not bz_given and len(wins) != ngather:
            # The recorded field count is the child-EVALUATION count
            # (circular_array doubles it, padded repeat multiplies it),
            # and every field adds a (bz+1, nx, ny) block to the
            # kernel's VMEM working set: re-pick bz against the true
            # count and re-record over the new windows.
            bz = _pick_bz(nx, ny, dtype, len(wins))
            nchunks, Zp = _blocks(bz)
            widx = (
                np.arange(nchunks)[:, None] * bz
                + np.arange(bz + 1)[None, :]
            )
            wins = hybrid.record_dense_windows(
                hybrid.to_recording_tree(sdf_c), X, Y, Zp[widx]
            )
        tree = hybrid.to_pallas_tree(sdf_c)
    Zw = Zp[None, :]
    leaves, prep = _prep_tree(tree, dtype)
    return _pallas_invoke(
        leaves, X, Y, Zw, prep["fn"], prep["treedef"], prep["scalar"],
        nz, bz, interpret, wins,
    )


@partial(jax.jit, static_argnames=("bz", "interpret"))
def _eval_classify_jit(sdf_c, X, Y, Z, bz, interpret):
    return eval_and_classify_traced(sdf_c, X, Y, Z, bz=bz, interpret=interpret)


def eval_and_classify(sdf_c, X, Y, Z, dtype, bz=None, interpret=False):
    """Evaluate + classify a dense grid in one fused Pallas pass.

    sdf_c: dtype-cast SDF expression.  X/Y/Z: host float64 axis coords.
    Returns (vol (nx,ny,nz), case (nx-1,ny-1,nz-1) int32) device arrays.
    Raises if the expression does not vectorize (callers fall back to the
    XLA path).  ``bz`` (z samples per block) defaults to whatever keeps a
    (bz+1, nx, ny) slab within ~8 MB of VMEM.
    """
    # bz=None passes through: eval_and_classify_traced picks it with the
    # gather-field count folded into the VMEM budget (pre-picking here
    # would size the budget as if the kernel held a single slab).
    return _eval_classify_jit(
        sdf_c,
        jnp.asarray(X, dtype=dtype),
        jnp.asarray(Y, dtype=dtype),
        jnp.asarray(Z, dtype=dtype),
        bz,
        interpret,
    )
