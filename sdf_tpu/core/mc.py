"""On-device marching cubes (replaces skimage, ref sdf/core.py:16-18,54).

XLA needs static shapes, but marching cubes has a data-dependent output
size.  The pipeline therefore runs in two jitted phases with one host sync
in between (the idiomatic TPU pattern for compaction):

  * ``count``: per-cell case classification over the whole volume ->
    per-cell triangle counts (+ per-tile totals for the reference's
    skipped/empty/nonempty stats, ref sdf/core.py:129-145).
  * ``emit``: given a static capacity (rounded up to a power of two so the
    executable is reused across runs), gather the active cells, interpolate
    the crossing-edge vertices and write a fixed-size triangle buffer plus a
    validity count.

Vertices are produced in fractional index coordinates, exactly like
skimage's output, and mapped to world space by ``verts * step + origin``
(ref sdf/core.py:58-60).  Because the reference's batches overlap by one
sample plane, per-batch marching cubes over tiles is identical to one global
pass over the full volume -- so this kernel runs globally and keeps the
reference's tile semantics via masks.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from . import compact
from .mc_tables import CORNER_OFFSETS, EDGE_CORNERS, NTRI_TABLE, TRI_TABLE

MAX_TRIS_PER_CELL = TRI_TABLE.shape[1]


def round_capacity(n):
    """Static buffer capacity for ``n`` items: the next power of two OR
    1.5x a power of two (two sizes per octave).

    Every distinct capacity compiles a fresh executable, so sizes must
    quantize hard; but plain pow2 overshoots by up to 2x, and every
    downstream per-triangle gather pays for the padding.  Two steps per
    octave caps the waste at 33% while a model regenerated at the same
    sample count still reuses its executable.
    """
    n = max(1, int(n))
    p = 1 << (n - 1).bit_length()
    if n <= (p // 2) + (p // 4):  # fits in 1.5 * previous power
        return (p // 2) + (p // 4)
    return p

_EDGE_A = EDGE_CORNERS[:, 0]
_EDGE_B = EDGE_CORNERS[:, 1]


class Tables:
    """Per-variant case-table bundle consumed by the jitted MC phases.

    ``variant="default"`` is the repo's fixed separated-ambiguity rule
    (mc_tables); ``"lewiner"`` the trilinear-faithful extended tables
    (mc33/mc33_build), whose case codes carry face-saddle and interior
    bits -- same kernel structure, wider tables.  Instances hash/compare
    by name so they ride jit static arguments; all derived arrays are
    trace-time numpy constants.
    """

    def __init__(self, name, tri_table, ntri_table):
        self.name = name
        tri_table = np.asarray(tri_table, np.int32)
        self.tri = tri_table  # (ncase, max_tris, 3), -1 padded
        self.ntri = np.asarray(ntri_table, np.int32)
        self.ncase = tri_table.shape[0]
        self.max_tris = tri_table.shape[1]
        self.nsv = self.max_tris * 3
        self.case_bits = int(self.ncase - 1).bit_length()
        self.tf3 = np.maximum(tri_table, 0)  # padding clamped to edge 0
        # (ncase * max_tris,) packed 3x4-bit cube-edge ids per (case,
        # slot) for _edge_ids_of's single row gather (ids <= 11).
        self.eid_pack = (
            self.tf3[:, :, 0] | (self.tf3[:, :, 1] << 4)
            | (self.tf3[:, :, 2] << 8)
        ).reshape(-1).astype(np.int32)
        # ntri as a (rows, 16) nibble-decomposed table (see ntri_of).
        rows = -(-self.ncase // 16)
        pad = rows * 16 - self.ncase
        self.ntri_2d = np.pad(
            self.ntri.astype(np.float32), (0, pad)
        ).reshape(rows, 16)
        # packed per-case interpolation table (see interpolate_slots):
        # [ca | cb | pax pay paz | pbx pby pbz], each nsv wide.
        flat = self.tf3.reshape(self.ncase, -1)
        ca = _EDGE_A[flat]
        cb = _EDGE_B[flat]
        offs = np.asarray(CORNER_OFFSETS)
        self.wide_pack = np.concatenate(
            [
                ca,
                cb,
                offs[ca].transpose(0, 2, 1).reshape(self.ncase, -1),
                offs[cb].transpose(0, 2, 1).reshape(self.ncase, -1),
            ],
            axis=1,
        ).astype(np.float32)

    def classify(self, volume, level=0.0):
        """Per-cell case codes for this variant."""
        if self.name == "default":
            return _cell_cases(volume, level)
        from . import mc33

        return mc33.classify_ext(volume, level)

    def __hash__(self):
        return hash(self.name)

    def __eq__(self, other):
        return isinstance(other, Tables) and other.name == self.name

    def __repr__(self):
        return f"Tables({self.name!r})"


_TABLES = {}


def get_tables(variant="default"):
    """The (cached) table bundle for an MC variant name.  "fast" is the
    user-facing spelling of the fixed separated-ambiguity rule whose
    internal table name remains "default" (it was generate()'s default
    through round 3); "lewiner" is generate()'s out-of-the-box default."""
    if variant == "fast":
        variant = "default"
    if variant not in _TABLES:
        if variant == "default":
            _TABLES[variant] = Tables("default", TRI_TABLE, NTRI_TABLE)
        elif variant == "lewiner":
            from . import mc33

            d = mc33.load_tables()
            _TABLES[variant] = Tables("lewiner", d["tri_table"], d["ntri"])
        else:
            raise ValueError(
                f"unknown mc_variant {variant!r}: use 'lewiner' (the "
                "default) or 'fast' ('default' is a legacy alias of 'fast')"
            )
    return _TABLES[variant]


_NTRI_BLOCK = 131072  # cells per ntri-kernel program ((8, 16384) blocks)


def _ntri_kernel(case_ref, tab_ref, out_ref):
    """In-VMEM two-stage ntri lookup for one (8, Bc) block of codes.

    Per sub-row: one-hot the row nibble (case >> 4) against the (rows,
    16) table on the MXU, then select the column (case & 15) with an
    iota compare -- the same decomposition as the XLA form below, but
    the one-hot never touches HBM (8 B in + 4 B out per cell vs an
    (N, rows) bf16 stream: at a 2^26 grid the XLA form measures
    ~16 ms default / ~19 ms lewiner, this kernel ~2-7 ms)."""
    case = case_ref[...]  # (8, Bc) int32
    tabT = tab_ref[...]  # (16, rows) bf16
    rows = tabT.shape[1]
    R, Bc = case.shape
    for r in range(R):
        hi = case[r : r + 1] >> 4  # (1, Bc)
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, Bc), 0)
            == jnp.broadcast_to(hi, (rows, Bc))
        ).astype(jnp.bfloat16)
        tmp = jax.lax.dot_general(
            tabT, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (16, Bc)
        sel = jax.lax.broadcasted_iota(jnp.int32, (16, Bc), 0) == (
            jnp.broadcast_to(case[r : r + 1] & 15, (16, Bc))
        )
        out_ref[r, :] = jnp.sum(
            jnp.where(sel, tmp, 0.0), axis=0
        ).astype(jnp.int32)


def _ntri_of_kernel(case, variant, _interpret=False):
    """ntri_of via the in-VMEM Pallas lookup (TPU path); bit-exact same
    results as the XLA form."""
    tab = get_tables(variant)
    shape = case.shape
    flat = case.reshape(-1)
    n = flat.shape[0]
    Bc = _NTRI_BLOCK // 8
    nb = -(-n // _NTRI_BLOCK)
    c2 = jnp.pad(flat, (0, nb * _NTRI_BLOCK - n)).reshape(nb * 8, Bc)
    tabT = jnp.asarray(tab.ntri_2d.T, jnp.bfloat16)  # (16, rows)
    nt = pl.pallas_call(
        _ntri_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, Bc), lambda i: (i, 0)),
            pl.BlockSpec(tabT.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, Bc), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nb * 8, Bc), jnp.int32),
        interpret=_interpret,
    )(c2, tabT)
    return nt.reshape(-1)[:n].reshape(shape)


@functools.lru_cache()
def _ntri_kernel_ok(variant):
    """One-time EAGER probe of the ntri kernel per variant (table shapes
    differ).  A try/except around the traced call cannot catch Mosaic
    compile failures (they happen after tracing returns -- code-review
    finding); the eager probe downgrades to the XLA form instead of
    crashing every count phase."""
    try:
        z = jnp.zeros(16, jnp.int32)
        jax.block_until_ready(_ntri_of_kernel(z, variant))
        return True
    except Exception:
        return False


def ntri_of(case, variant="default"):
    """Per-cell triangle counts WITHOUT a table gather.

    A 256-entry element gather over the full cell grid costs ~8 ns/cell
    on TPU (33 ms at a 2^22 grid -- it was the whole count phase).  A
    256-wide one-hot matvec cut that to 4.2 ms but streams an (N, 256)
    bf16 one-hot through HBM.  Decomposing the lookup by nibbles --
    ``tmp = one_hot(case >> 4, rows) @ NTRI_2D`` picks the table row,
    then an iota-compare select-sum picks column ``case & 15`` -- keeps
    every intermediate 16 lanes wide: 1.1 ms at a 2^22 grid on v5e.
    Exact: entries <= 10 are bf16-representable; the sum happens after
    the int32 cast.

    On TPU the same decomposition runs as an in-VMEM Pallas kernel
    (_ntri_of_kernel): even 16 lanes wide, the XLA intermediates stream
    multi-GB at a 2^26 grid (~16 ms default / ~19 ms lewiner, whose
    row table is 164 wide); in VMEM the lookup is ~2-7 ms.
    """
    if jax.default_backend() == "tpu" and _ntri_kernel_ok(
        "default" if variant == "fast" else variant
    ):
        return _ntri_of_kernel(case, variant)
    tab = get_tables(variant)
    flat = case.reshape(-1)
    oh_hi = jax.nn.one_hot(flat >> 4, tab.ntri_2d.shape[0], dtype=jnp.bfloat16)
    tmp = oh_hi @ jnp.asarray(tab.ntri_2d, jnp.bfloat16)  # (N, 16)
    sel = jax.lax.broadcasted_iota(jnp.int32, tmp.shape, 1) == (
        flat & 15
    )[:, None]
    nt = jnp.sum(jnp.where(sel, tmp, 0), axis=1)
    return nt.astype(jnp.int32).reshape(case.shape)


@jax.jit
def _cell_cases(volume, level=0.0):
    """Case index per cell: bit c set iff corner c is inside (< level).

    Jitted: the engine's XLA-fallback path calls it eagerly, where the
    9 full-grid slice/compare/or steps would otherwise dispatch one by
    one with HBM temporaries; call sites already inside a trace simply
    inline it.
    """
    nx, ny, nz = volume.shape
    case = jnp.zeros((nx - 1, ny - 1, nz - 1), dtype=jnp.int32)
    for c, (ox, oy, oz) in enumerate(np.asarray(CORNER_OFFSETS)):
        corner = volume[ox : nx - 1 + ox, oy : ny - 1 + oy, oz : nz - 1 + oz]
        case = case | (jnp.int32(1 << c) * (corner < level).astype(jnp.int32))
    return case


def _gather_corners(volume, ci, cj, ck):
    """The 8 corner values of each active cell, as 8 1D arrays.

    ONE batched element gather instead of 8 separate ones: each XLA
    gather op carries fixed per-op overhead on TPU, so batching the
    index math measures ~9% faster for this phase on v5e (8.6 -> 7.9 ms
    at 48k active cells, amortized A/B)."""
    nx, ny, nz = volume.shape
    lin0 = (ci * ny + cj) * nz + ck
    doff = np.asarray(
        [(ox * ny + oy) * nz + oz for ox, oy, oz in np.asarray(CORNER_OFFSETS)],
        dtype=np.int32,
    )
    allv = volume.reshape(-1)[(lin0[None, :] + doff[:, None]).reshape(-1)]
    return list(allv.reshape(8, -1))


# ---------------------------------------------------------------------------
# Indexed-mesh emit: unique vertices per crossing EDGE + int32 face indices.
#
# Marching-cubes vertices live on grid edges, and every cell sharing an edge
# interpolates the same two corner values in the same canonical direction
# (EDGE_CORNERS order) -- so the soup stores each position ~6x redundantly.
# Emitting (vertices-per-unique-edge, faces) instead halves the bytes read
# back to the host (12 B/vertex + 12 B/triangle vs 36 B/triangle), which is
# the dominant end-to-end cost at large grids; the host reconstructs the
# reference's flat soup with one gather, bit-identical to ``emit``'s output
# (same t formula, same canonical edge direction, same triangle order).
#
# Edge ids: the three axis-aligned edge grids are flattened back-to-back --
# x-edges (nx-1, ny, nz), then y-edges (nx, ny-1, nz), then z-edges
# (nx, ny, nz-1).
# ---------------------------------------------------------------------------

# Per cube edge: its axis and the (coordinate-wise lower) origin corner.
_EDGE_AXIS = np.argmax(
    CORNER_OFFSETS[EDGE_CORNERS[:, 1]] - CORNER_OFFSETS[EDGE_CORNERS[:, 0]],
    axis=1,
).astype(np.int32)
_EDGE_ORIG = CORNER_OFFSETS[EDGE_CORNERS[:, 0]]  # (12, 3)

def _edge_ids_of(case_t, slot, variant="default"):
    """Cube-edge ids of the three vertices of triangle ``slot`` of cell
    case ``case_t``: three ``(n,)`` int32 arrays, via ONE row-of-128
    gather of a (ncase * max_tris)-entry table packing the triple as
    3 x 4 bits (ids <= 11).  Replaces a (n, ncase) one-hot matmul + a
    slot one-hot select: the packed gather moves ~1/30th the bytes and
    needs no f32 round trip."""
    tab = get_tables(variant)
    packed = compact.gather1d(
        jnp.asarray(tab.eid_pack), case_t * tab.max_tris + slot
    )
    return [(packed >> (4 * v)) & 15 for v in range(3)]


def _sel12(e, tab):
    """12-entry constant-table lookup as a compare-select chain (pure VPU
    work; an element gather would pay ~11 ns/element)."""
    out = jnp.full(e.shape, int(tab[11]), jnp.int32)
    for k in range(10, -1, -1):
        out = jnp.where(e == k, int(tab[k]), out)
    return out


def _edge_gid(e, cx, cy, cz, ny, nz, Sx, Sy):
    """Global edge id of cube edge ``e`` of the cell at ``(cx, cy, cz)``:
    the axis/origin maps are 12-entry constants, so the whole map is
    selects + integer math (see ``_gid_pack`` for the layout)."""
    ax = _sel12(e, _EDGE_AXIS)
    x = cx + _sel12(e, _EDGE_ORIG[:, 0])
    y = cy + _sel12(e, _EDGE_ORIG[:, 1])
    z = cz + _sel12(e, _EDGE_ORIG[:, 2])
    my = jnp.where(ax == 1, ny - 1, ny)
    mz = jnp.where(ax == 2, nz - 1, nz)
    base = jnp.where(ax == 0, 0, jnp.where(ax == 1, Sx, Sx + Sy))
    return base + (x * my + y) * mz + z


def _gid_pack(strides, bases, variant="default"):
    """Per (case, slot): packed edge-id coefficients for the three
    vertices, as one (ncase * max_tris, 9) int32 row-gather table.

    A vertex's edge id is affine in its cell coordinates:
    ``gid = cx * sx + cy * sy + cz + K`` where (sx, sy, K) depend only on
    the edge's axis and origin-corner offset -- constants per (case,
    slot, vertex) once the (static) grid dims are known, so the whole
    table is a trace-time numpy constant.  ``strides[a] = (sx, sy)`` and
    ``bases[a]`` give each axis' edge-grid layout.  Row layout:
    ``[sx0 sy0 K0 sx1 sy1 K1 sx2 sy2 K2]``.
    """
    tab = get_tables(variant)
    strides = np.asarray(strides)
    bases = np.asarray(bases)
    ax = _EDGE_AXIS[tab.tf3]  # (ncase, max_tris, 3)
    o = _EDGE_ORIG[tab.tf3]  # (ncase, max_tris, 3, 3)
    sx = strides[ax, 0]
    sy = strides[ax, 1]
    k = bases[ax] + o[..., 0] * sx + o[..., 1] * sy + o[..., 2]
    return (
        np.stack([sx, sy, k], axis=-1)
        .reshape(tab.ncase * tab.max_tris, 9)
        .astype(np.int32)
    )


def _edge_mask(volume, active):
    """Flat bool mask over all grid edges: sign-crossing AND adjacent to an
    active cell (so culled regions contribute no stray vertices)."""
    sign = volume < 0

    def adj(a, axes):
        # Dilate the active-cell mask by one cell along the two axes
        # orthogonal to the edge direction: an edge touches up to 4 cells.
        pads = [(0, 0)] * 3
        for ax in axes:
            pads[ax] = (1, 1)
        b = jnp.pad(a, pads)
        for ax in axes:
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[ax] = slice(0, b.shape[ax] - 1)
            hi[ax] = slice(1, None)
            b = b[tuple(lo)] | b[tuple(hi)]
        return b

    ex = (sign[:-1] != sign[1:]) & adj(active, (1, 2))
    ey = (sign[:, :-1] != sign[:, 1:]) & adj(active, (0, 2))
    ez = (sign[:, :, :-1] != sign[:, :, 1:]) & adj(active, (0, 1))
    return jnp.concatenate([ex.reshape(-1), ey.reshape(-1), ez.reshape(-1)])


def compact_cells(case, active, cell_capacity, variant="default"):
    """Traced helper: compact the active cells into ``cell_state``
    (shared by the single-device and sharded indexed paths).  Returns
    ``(ci, cj, ck, cell_case, cell_ntri)``, each ``(cell_capacity,)``.
    """
    cshape = case.shape
    aflat = active.reshape(-1)
    cell_idx = compact.indices_of(aflat, cell_capacity)
    n_cells = jnp.sum(aflat.astype(jnp.int32))
    live = jnp.arange(cell_capacity) < n_cells
    cell_case = compact.gather1d(case.reshape(-1), cell_idx)
    cell_ntri = jnp.where(live, ntri_of(cell_case, variant), 0)
    ci, cj, ck = jnp.unravel_index(cell_idx, cshape)
    return (ci.astype(jnp.int32), cj.astype(jnp.int32), ck.astype(jnp.int32),
            cell_case, cell_ntri)


@partial(jax.jit, static_argnames=("tile", "tshape", "variant"))
def count_indexed(volume, case, keep, tile, tshape, variant="default"):
    """Single-dispatch phase 1 for the indexed path: EVERY count the host
    needs, so one ``device_get`` sizes all three static buffers.

    A scalar sync through a tunneled TPU runtime costs ~40 ms of pure
    round-trip latency, so the old classify -> count -> gather -> emit
    chain (three separate syncs) paid ~120 ms of RTT per generate().
    The full-grid ``NTRI_TABLE[case]`` gather this needs measures free
    (0.04 ms at 4M cells -- XLA lowers small-table gathers well), so
    total/per-tile counts no longer need to wait for cell compaction.

    Returns ``(n_cells, total_tris, n_edges, per_tile, active, emask)``;
    fetch the first four in ONE device_get, keep the last two on device
    for ``gather_emit_indexed``.
    """
    ntri_all = ntri_of(case, variant)
    # Equivalent to (case != 0) & (case != 255) in the default variant
    # (every crossing case emits >= 1 triangle), and correct for extended
    # variant codes, whose empty entries are per-table.
    active = keep & (ntri_all > 0)
    ntri = ntri_all * active.astype(jnp.int32)
    cx, cy, cz = ntri.shape
    px, py, pz = (-cx) % tile, (-cy) % tile, (-cz) % tile
    padded = jnp.pad(ntri, ((0, px), (0, py), (0, pz)))
    tx, ty, tz = tshape
    per_tile = padded.reshape(tx, tile, ty, tile, tz, tile).sum(axis=(1, 3, 5))
    emask = _edge_mask(volume, active)
    return (
        jnp.sum(active.astype(jnp.int32)),
        jnp.sum(ntri),
        jnp.sum(emask.astype(jnp.int32)),
        per_tile,
        active,
        emask,
    )


@partial(
    jax.jit,
    static_argnames=("edge_capacity", "capacity", "cell_capacity", "packed",
                     "variant"),
)
def gather_emit_indexed(volume, case, active, emask, edge_capacity, capacity,
                        cell_capacity, packed=False, variant="default"):
    """Single-dispatch phases 2+3: cell compaction + indexed emit, no
    intermediate host sync (all capacities come from ``count_indexed``'s
    one fetch; the emitted triangle count always equals ``total_tris``
    from there, so the host never needs to read ``n_tris``).

    ``packed`` selects the wire format (see ``emit_indexed_packed``):
    False = plain ``(everts, faces)``; True = packed with 21-bit faces;
    ``"wide"`` = packed vertices but plain uint32 faces (vertex count
    may reach 2^21).  float32 volumes only when not False.
    """
    state = compact_cells(case, active, cell_capacity, variant)
    if packed is not False:
        return emit_indexed_packed(
            volume, emask, state, edge_capacity, capacity, cell_capacity,
            pack_faces=(packed is True), variant=variant,
        )
    everts, faces, _ = emit_indexed(
        volume, emask, state, edge_capacity, capacity, cell_capacity,
        variant=variant,
    )
    return everts, faces


def _emit_indexed_core(volume, emask, cell_state, edge_capacity, capacity,
                       cell_capacity, z_offset=0, variant="default"):
    """Shared body of the indexed emit: per-edge ``(eidx, ax, exyz, t)``
    plus resolved ``faces (3, capacity)`` and ``n_tris``.

    ``z_offset`` shifts the emitted integer z indices into global space
    BEFORE the float interpolation add, so a sharded slab's vertices are
    bit-identical to a single-device run over the global grid (adding the
    slab offset to ``local_z + t`` after the fact rounds differently)."""
    ci, cj, ck, cell_case, cell_ntri = cell_state
    nx, ny, nz = volume.shape
    Sx = (nx - 1) * ny * nz
    Sy = nx * (ny - 1) * nz

    # --- one vertex per active edge -----------------------------------
    # One fused kernel pass yields both the compacted edge ids (vertex
    # order) and the compact rank structure (face resolution below):
    # 2 uint32 per 32 edge slots instead of a full-domain ranks array,
    # because random row-gathers from the 800 MB ranks array at a 2^26
    # grid cost ~2x more per element than from the 50 MB table
    # (measured, PERF.md round 4).
    eidx, ranktab, _ = compact.indices_and_ranktable_of(
        emask, edge_capacity
    )

    ax = (eidx >= Sx).astype(jnp.int32) + (eidx >= Sx + Sy).astype(jnp.int32)

    # Decode (x, y, z) under each axis' grid dims and select: divisions by
    # traced (axis-dependent) values don't lower to the fast
    # multiply-shift form on TPU, so decode with CONSTANT divisors three
    # times instead (cheap VPU ops) rather than once dynamically.
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
    # ONE batched row-of-128 gather for both endpoints (see gather1d; a
    # dense all-edges t + compacted fetch was also tried and measured
    # slower -- 12.6M f32 divides cost ~3.4 ms on v5e).
    vab = compact.gather1d(vflat, jnp.concatenate([lin_a, lin_a + vstride]))
    va = vab[: lin_a.shape[0]]
    vb = vab[lin_a.shape[0] :]
    denom = va - vb
    # Same zero-crossing formula as interpolate_slots, term for term, so
    # positions match the soup path bit-for-bit.
    t = jnp.clip(va / jnp.where(denom == 0, 1.0, denom), 0.0, 1.0)

    faces, n_tris = _resolve_faces(
        ranktab, cell_state, capacity, cell_capacity, ny, nz, Sx, Sy, variant
    )
    # The global z shift applies to the OUTPUT coordinate only (the volume
    # gather above uses slab-local indices).
    return eidx, ax, (ex, ey, ez + z_offset), t, faces, n_tris


@partial(jax.jit, static_argnames=("edge_capacity", "capacity", "cell_capacity",
                                   "variant"))
def emit_indexed(volume, emask, cell_state, edge_capacity, capacity,
                 cell_capacity, z_offset=0, variant="default"):
    """Phase 3 for the indexed path: unique vertices + int32 faces.

    Returns ``(everts (3, edge_capacity), faces (3, capacity), n_tris)``:
    ``everts`` holds one interpolated vertex per active edge (ascending
    global edge id -- x-edge block, then y, then z) in fractional index
    coordinates; ``faces[v, i]`` indexes triangle i's vertex v into that
    array.  Reconstructing ``everts.T[faces.T.reshape(-1)]`` yields
    exactly ``emit``'s soup (same values, same order).  ``z_offset``
    (traced int) shifts z indices to global space pre-interpolation --
    see ``_emit_indexed_core``.
    """
    dtype = volume.dtype
    _, ax, (ex, ey, ez), t, faces, n_tris = _emit_indexed_core(
        volume, emask, cell_state, edge_capacity, capacity, cell_capacity,
        z_offset, variant,
    )
    everts = jnp.stack(
        [
            ex.astype(dtype) + t * (ax == 0).astype(dtype),
            ey.astype(dtype) + t * (ax == 1).astype(dtype),
            ez.astype(dtype) + t * (ax == 2).astype(dtype),
        ],
        axis=0,
    )  # (3, edge_capacity)
    return everts, faces, n_tris


def _resolve_faces(ranktab, cell_state, capacity, cell_capacity, ny, nz,
                   Sx, Sy, variant="default"):
    """Face resolution: per-triangle global edge ids -> compacted ranks.

    ``ranktab`` is compact.indices_and_ranktable_of's rank structure
    over the edge mask (global edge id -> compacted vertex rank via
    rank_lookup).  History: a scatter of arange over eidx measured
    33 ms at a 2^22 grid vs ~2 ms for the prefix-rank kernel; the
    materialized full-domain ranks array that followed was retired in
    round 4 when its 800 MB of random row-gathers at 2^26 measured ~2x
    the per-element cost of the compact-table lookup."""
    ci, cj, ck, cell_case, cell_ntri = cell_state
    cbits = get_tables(variant).case_bits  # 8 default, 13 lewiner

    # Per-triangle cell data.  Element gathers cost ~8 ns each on TPU
    # regardless of table size, so pack (ci, cj, ck, case) into ONE
    # int32 word per cell when the cell grid fits 31 - case_bits bits
    # (grids to ~2^24 samples with 8-bit codes).  The slot expansion
    # broadcasts the word via ragged_expand's fill -- the triangles need
    # NO per-slot cell gather at all.  Bigger grids keep the 4-slot
    # staging gather.
    nx1 = Sx // (ny * nz)  # nx - 1
    ny1, nz1 = ny - 1, nz - 1
    if nx1 * ny1 * nz1 < (1 << (31 - cbits)):
        w = ((ci * ny1 + cj) * nz1 + ck) * (1 << cbits) + cell_case
        _, slot, n_tris, wt = compact.ragged_expand(
            cell_ntri, capacity, fill=w
        )
        case_t = wt & ((1 << cbits) - 1)
        lin = wt >> cbits
        cx = lin // (ny1 * nz1)
        rem = lin % (ny1 * nz1)
        cy = rem // nz1
        cz = rem % nz1
    elif nx1 * ny1 * nz1 < (1 << 31):
        # The case bits don't fit next to the cell index in one int32
        # (the 12-bit lewiner codes overflow at > 2^19 cells, i.e. every
        # grid past ~2^21 samples): pack ONLY the linear cell index as
        # the fill word and recover the case by one per-triangle
        # row-of-128 gather from the compacted cells.  Measured on v5e
        # at 2^22: this branch 16.2 ms vs the 4-slot staging gather's
        # 32.1 ms for the lewiner default, within 1 ms of the fast
        # variant's fully-packed 15.2 ms (the staging branch now only
        # covers > 2^31-cell grids).
        lin = (ci * ny1 + cj) * nz1 + ck
        ctri, slot, n_tris, lin_t = compact.ragged_expand(
            cell_ntri, capacity, fill=lin
        )
        case_t = compact.gather1d(cell_case, ctri)
        cx = lin_t // (ny1 * nz1)
        rem = lin_t % (ny1 * nz1)
        cy = rem // nz1
        cz = rem % nz1
    else:
        # --- expand live slots, then resolve only real triangles ------
        # (tri-major: gathers per emitted triangle, not per (cell, slot))
        ctri, slot, n_tris = compact.ragged_expand(cell_ntri, capacity)
        cellpack = jnp.concatenate([ci, cj, ck, cell_case])
        cd = cellpack[
            jnp.concatenate(
                [ctri + i * cell_capacity for i in range(4)]
            )
        ]
        cx = cd[:capacity]
        cy = cd[capacity : 2 * capacity]
        cz = cd[2 * capacity : 3 * capacity]
        case_t = cd[3 * capacity :]

    # Cube-edge ids per vertex from the packed 3x4-bit row gather, the
    # edge -> global edge id map as VPU selects, then ONE batched rank
    # lookup.
    ev = _edge_ids_of(case_t, slot, variant)
    gids = [_edge_gid(ev[v], cx, cy, cz, ny, nz, Sx, Sy) for v in range(3)]
    faces = compact.rank_lookup(ranktab, jnp.concatenate(gids)).reshape(
        3, capacity
    )
    return faces, n_tris


# ---------------------------------------------------------------------------
# Packed readback: the device-to-host transfer is the dominant warm cost
# (a tunneled runtime moves ~30 MB/s; PCIe hosts still pay bandwidth at
# 2^26 grids), so the wire format matters.  Vertices travel as
# (edge id: uint32, t: float32 bit pattern) -- 8 B instead of 12 B --
# and faces as two uint32 words holding three 21-bit vertex ranks
# (8 B instead of 12 B) whenever the vertex count fits 21 bits.  The host
# reconstructs positions with the same IEEE float32 ops the device would
# have used, so the unpacked mesh is bit-identical to emit_indexed's.
# ---------------------------------------------------------------------------

FACE_PACK_BITS = 21  # 3 * 21 = 63 bits across two words; ne < 2^21


@partial(jax.jit, static_argnames=("edge_capacity", "capacity", "cell_capacity",
                                   "pack_faces", "variant"))
def emit_indexed_packed(volume, emask, cell_state, edge_capacity, capacity,
                        cell_capacity, pack_faces, variant="default"):
    """``emit_indexed`` with the wire-format outputs described above.

    Returns ``(epack (2, edge_capacity) uint32, fpack (2 or 3, capacity)
    uint32)``; decode with ``unpack_indexed``.  ``pack_faces`` must be
    False when the live vertex count can reach 2^21.  float32 volumes
    only (the t bit pattern travels in the uint32 lane).
    """
    eidx, _, _, t, faces, _ = _emit_indexed_core(
        volume, emask, cell_state, edge_capacity, capacity, cell_capacity,
        variant=variant,
    )
    epack = jnp.stack(
        [eidx.astype(jnp.uint32),
         jax.lax.bitcast_convert_type(t, jnp.uint32)],
        axis=0,
    )
    f = faces.astype(jnp.uint32)
    if pack_faces:
        B = FACE_PACK_BITS
        lo_mask = jnp.uint32((1 << (32 - B)) - 1)  # low 11 bits of f1
        w0 = f[0] | (f[1] & lo_mask) << B
        w1 = (f[1] >> (32 - B)) | f[2] << (2 * B - 32)
        fpack = jnp.stack([w0, w1], axis=0)
    else:
        fpack = f
    return epack, fpack


def unpack_indexed(epack, fpack, grid_shape, dtype=np.float32):
    """Host-side decode of ``emit_indexed_packed`` outputs (numpy).

    ``epack (2, ne)`` / ``fpack (2|3, n)`` are already sliced to live
    counts.  Returns ``(vh (ne, 3) float64, fh (n, 3) int32)``
    bit-identical to slicing ``emit_indexed``'s outputs: positions are
    recomputed with the same IEEE float32 adds/multiplies the device
    kernel performs.
    """
    nx, ny, nz = grid_shape
    Sx = (nx - 1) * ny * nz
    Sy = nx * (ny - 1) * nz
    eidx = epack[0].astype(np.int64)
    t = epack[1].view(np.float32) if epack.dtype == np.uint32 else epack[1]

    # eidx ascends (stream compaction preserves order), so the three
    # axis blocks are contiguous slices -- decode each with plain
    # integer math instead of np.where chains over the whole array.
    b0, b1 = np.searchsorted(eidx, [Sx, Sx + Sy])
    ft = np.dtype(dtype)
    vh32 = np.empty((len(eidx), 3), dtype=ft)
    for a, (sl, base, My, Mz) in enumerate(
        (
            (slice(0, b0), 0, ny, nz),
            (slice(b0, b1), Sx, ny - 1, nz),
            (slice(b1, None), Sx + Sy, ny, nz - 1),
        )
    ):
        local = eidx[sl] - base
        z = local % Mz
        rem = local // Mz
        exyz = (rem // My, rem % My, z)
        for c in range(3):
            # Same op order and precision as the device: base.astype(f32)
            # + t * (axis == c) in f32, widened to f64 only afterwards.
            comp = exyz[c].astype(ft)
            if c == a:
                comp = comp + t[sl].astype(ft)
            vh32[sl, c] = comp
    vh = vh32.astype(np.float64)

    return vh, unpack_faces(fpack)


def unpack_faces(fpack):
    """Host decode of the (2|3, n) uint32 face wire format -> (n, 3)
    int32 (shared by the dense and tiled packed paths)."""
    if fpack.shape[0] == 3:
        return fpack.T.astype(np.int32)
    B = FACE_PACK_BITS
    w0 = fpack[0].astype(np.uint64)
    w1 = fpack[1].astype(np.uint64)
    m = np.uint64((1 << B) - 1)
    f0 = w0 & m
    f1 = ((w0 >> np.uint64(B)) | (w1 << np.uint64(32 - B))) & m
    f2 = (w1 >> np.uint64(2 * B - 32)) & m
    return np.stack([f0, f1, f2], axis=1).astype(np.int32)


@partial(jax.jit, static_argnames=("tile", "variant"))
def count(volume, cell_mask, tile, case=None, variant="default"):
    """Phase 1: per-cell triangle counts and per-tile totals.

    ``cell_mask`` zeroes cells culled by sparse tile skipping (the
    reference's ``_skip``, ref sdf/core.py:28-43).  ``tile`` is the cell
    tile size (reference ``batch_size``, default 32).

    Returns (total_triangles, per_tile_triangle_counts, active_cells,
    case_codes); pass ``case_codes`` back into ``emit`` to skip
    reclassification.  ``case=`` accepts precomputed codes (e.g. from the
    fused Pallas eval+classify kernel).
    """
    if case is None:
        case = get_tables(variant).classify(volume)
    ntri = ntri_of(case, variant) * cell_mask.astype(jnp.int32)
    cx, cy, cz = ntri.shape
    # Pad cells up to tile multiples, then reduce per tile.
    px, py, pz = (-cx) % tile, (-cy) % tile, (-cz) % tile
    padded = jnp.pad(ntri, ((0, px), (0, py), (0, pz)))
    tx, ty, tz = (cx + px) // tile, (cy + py) // tile, (cz + pz) // tile
    per_tile = padded.reshape(tx, tile, ty, tile, tz, tile).sum(axis=(1, 3, 5))
    return jnp.sum(ntri), per_tile, jnp.sum((ntri > 0).astype(jnp.int32)), case


@partial(jax.jit, static_argnames=("capacity", "cell_capacity", "variant"))
def emit(volume, cell_mask, capacity, cell_capacity=None, case=None,
         variant="default"):
    """Phase 2: triangle soup with a static ``capacity``.

    Returns ``(verts, n_tris)`` where ``verts`` is ``(9, capacity)`` in
    fractional index coordinates -- row ``v * 3 + c`` holds component c of
    vertex v, so the host reconstructs triangles with
    ``verts[:, :n].T.reshape(-1, 3)``; columns ``[0:n_tris]`` are valid.

    Layout discipline: every big intermediate is a 1D ``(cell_capacity,)``
    (or ``(5 * cell_capacity,)``) array.  Any (N, k) array with tiny k
    pads its minor dim onto the 128 vector lanes -- a (capacity, 3, 3)
    output tiles as (4, 128) per triangle, a 42x blowup that OOMed HBM at
    2^26 grids (21.5 GB for 4M triangles).

    Two-level compaction: ``flatnonzero`` on TPU is sort-based, so
    compacting at (cell, slot) granularity costs O(5 * ncells log) -- the
    dominant emit cost (measured 180ms of a 370ms emit at 20M slots).
    Instead compact *cells* first (ncells bools), run the slot/table/
    interpolation work only on the <= ``cell_capacity`` surviving cells,
    then compact their <= 5x slots (a tiny second pass).  Triangle order
    is unchanged: ascending (cell, slot), exactly the reference's
    batch-then-cell order.
    """
    if cell_capacity is None:
        # n_active_cells <= n_triangles, so the triangle capacity is a
        # safe (if generous) bound.
        cell_capacity = capacity
    if case is None:
        case = get_tables(variant).classify(volume)
    ntri = ntri_of(case, variant) * cell_mask.astype(jnp.int32)
    cshape = case.shape

    # --- level 1: compact active cells --------------------------------
    active = (ntri > 0).reshape(-1)
    cell_idx = compact.indices_of(active, cell_capacity)
    n_cells = jnp.sum(active.astype(jnp.int32))
    cell_live = jnp.arange(cell_capacity) < n_cells

    ci, cj, ck = jnp.unravel_index(cell_idx, cshape)
    cell_case = case.reshape(-1)[cell_idx]
    cell_ntri = jnp.where(cell_live, ntri.reshape(-1)[cell_idx], 0)

    corner = _gather_corners(volume, ci, cj, ck)
    base = (ci.astype(volume.dtype), cj.astype(volume.dtype),
            ck.astype(volume.dtype))

    # Per slot-vertex: one tiny (256,) table gather per endpoint, 8-way
    # masked selects for the corner values AND the (constant) corner
    # offsets -- everything stays (cell_capacity,) 1D.
    return interpolate_slots(
        corner, base, cell_case, cell_ntri, capacity, cell_capacity, variant
    )


_INTERP_CHUNK = 1 << 18  # cells per wide-math chunk (memory bound)


def interpolate_slots(corner, base, cell_case, cell_ntri, capacity,
                      cell_capacity, variant="default"):
    """Shared emit tail: slot-vertex interpolation + slot compaction.

    corner: list of 8 (cell_capacity,) corner values per active cell.
    base: 3 (cell_capacity,) cell base coordinates (fractional index).
    Returns ``(verts (9, capacity), n_tris)`` -- the 1D-SoA triangle
    block described in ``emit``.  Used by both the dense path (emit) and
    the tiled sparse path (core.sparse._emit_tiles).

    The per-case data arrives via ONE row gather from a packed (256, 120)
    table per chunk (30 separate tiny-table gathers paid ~2 ms fixed cost
    each); the (chunk, 15)-wide intermediates pad 15 -> 128 lanes, so the
    math runs in lax.map chunks to bound that amplification (a single
    wide pass OOMed HBM at 2^26 capacities).
    """
    tab = get_tables(variant)
    max_tris = tab.max_tris
    dtype = corner[0].dtype
    pack = jnp.asarray(tab.wide_pack, dtype=dtype)
    N = tab.nsv

    nchunks = max(1, -(-cell_capacity // _INTERP_CHUNK))
    chunk = -(-cell_capacity // nchunks)
    pad = nchunks * chunk - cell_capacity

    def padded(a):
        return jnp.pad(a, (0, pad)).reshape(nchunks, chunk)

    cstack = jnp.stack([padded(c) for c in corner], axis=-1)  # (nc, ch, 8)
    bstack = jnp.stack([padded(b) for b in base], axis=-1)  # (nc, ch, 3)
    case_ch = padded(cell_case)

    def do_chunk(args):
        cs, cn, bs = args  # (chunk,), (chunk, 8), (chunk, 3)
        p = pack[cs]  # (chunk, 120)
        ca = p[:, 0:N]
        cb = p[:, N : 2 * N]
        va = sum((ca == c) * cn[:, c][:, None] for c in range(8))
        vb = sum((cb == c) * cn[:, c][:, None] for c in range(8))
        denom = va - vb
        t = va / jnp.where(denom == 0, 1.0, denom)  # zero crossing, lvl 0
        t = jnp.clip(t, 0.0, 1.0)
        outs = []
        for c in range(3):
            pa = p[:, (2 + c) * N : (3 + c) * N]
            pb = p[:, (5 + c) * N : (6 + c) * N]
            outs.append(bs[:, c][:, None] + pa + t * (pb - pa))
        # (chunk, 45): columns ordered [c * NSV + k]
        return jnp.concatenate(outs, axis=1)

    wide = jax.lax.map(do_chunk, (case_ch, cstack, bstack))  # (nc, ch, 3N)
    # -> 3N cell-major 1D arrays indexed [c * NSV + (s * 3 + v)].
    flat = jnp.moveaxis(wide, 2, 0).reshape(3 * N, -1)[:, :cell_capacity]
    comp = [[None] * 9 for _ in range(max_tris)]  # [slot][v*3+c]
    for s in range(max_tris):
        for v in range(3):
            for c in range(3):
                comp[s][v * 3 + c] = flat[c * N + s * 3 + v]

    # Expand live slots (ascending (cell, slot), the reference's order);
    # the staging arrays below are slot-major blocks, so index as
    # slot * cell_capacity + cell.
    ctri, slot, n_tris = compact.ragged_expand(cell_ntri, capacity)
    g_idx = slot * cell_capacity + ctri
    rows = []
    for j in range(9):
        staged = jnp.concatenate([comp[s][j] for s in range(max_tris)])
        rows.append(staged[g_idx])
    return jnp.stack(rows, axis=0), n_tris
