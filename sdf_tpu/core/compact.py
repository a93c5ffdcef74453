"""Stream compaction on TPU: indices of True elements, in order.

``indices_of(mask, capacity)`` is a drop-in replacement for
``jnp.flatnonzero(mask, size=capacity, fill_value=0)``.  XLA's lowering of
flatnonzero is cumsum + bincount, whose scatter-add over all N elements
runs at ~10 ns/element on TPU (~80 ms for a 2^23-cell grid) -- the
dominant cost of marching-cubes emit (VERDICT round 1, item 1).  Here the
O(N) work runs in a Pallas kernel at VPU speed and the only remaining
XLA scatter touches N/128 elements:

  1. **Pallas row-pack kernel** (grid over row groups): each 128-lane row
     of the mask is packed independently -- an inclusive lane prefix sum
     (7 rotate-add rounds), then every active lane is routed LEFT to its
     destination ``prefix - 1`` by a 7-round LSB-first barrel shift (one
     ``pltpu.roll`` per round; see ``_pack_barrel`` for why the routing
     is conflict-free).  Output: ``(rows, 128)`` front-packed global
     indices.  ~10 VPU ops per element, no scatter, no cross-row
     communication, no lane-dynamic gather.  A binary-search
     formulation (8 rounds of ``take_along_axis`` over the in-register
     prefix) measures within noise of the barrel router on v5e (3.0 vs
     2.8 ms on a 12.7M mask, same session) -- the barrel is kept for
     its lower op count and because it needs no lane-dynamic gather
     support; the MXU prefix frees the VPU rounds the Hillis-Steele
     rotate-adds spent.
  2. **XLA ragged concat**: row counts come from a dense reduce; row
     offsets from a tiny cumsum (N/128); each output slot finds its
     source row via a scatter of the N/128 row starts into the capacity-
     sized output domain followed by cumsum, fetches the row's start
     offset by a row-of-128 gather, then ONE gather of ``capacity``
     elements for the payload.

Cost scales as O(N) VPU + O(N/128) scatter + O(capacity) gather: measured
~6 ms at N = 4.2M vs 81 ms for flatnonzero-with-table-gather it replaces.

On non-TPU backends (CPU tests) the public entry falls back to
``jnp.flatnonzero`` -- bit-identical results, no interpreter overhead;
the kernel itself is still exercised on CPU via ``interpret=True`` tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows of 128 lanes per kernel program: 512 measured fastest on v5e
# (8.4 -> 7.0 ms on a 12.6M mask vs 64 rows; bigger blocks amortize
# per-program overhead, and 256 KB of VMEM per operand still leaves the
# pipeline double-buffered).
_R = 512
_LANES = 128


def _pack_barrel(m, p, lane):
    """Route every active lane LEFT to destination ``p - 1`` (its rank)
    with an LSB-first barrel shift: at round k each element whose pending
    shift has bit k set moves k lanes left (one ``pltpu.roll`` of a
    single packed state word per round).

    Why conflict-free: for active lanes a < b with shifts s_a <= s_b
    (shift = lane - rank is non-decreasing over active lanes) and
    inclusive ranks differing by >= 1, s_b - s_a <= b - a - 1; after any
    LSB-prefix of rounds the applied partial shifts differ by at most
    s_b - s_a, so b's position stays strictly right of a's at every
    round -- no two live elements ever occupy one lane.  A mover's
    vacated lane is killed the same round (``depart``), so no stale
    copies travel either.  Returns the front-packed ORIGIN LANE of each
    rank (garbage lanes zeroed by the caller's rank mask).
    """
    # State word: origin lane (bits 8..14) | pending shift (bits 1..7)
    # | alive (bit 0).  Only this one word moves.
    st = jnp.where(m > 0, (lane << 8) | ((lane - (p - 1)) << 1) | 1, 0)
    for k in (1, 2, 4, 8, 16, 32, 64):
        ss = pltpu.roll(st, _LANES - k, 1)  # left by k (wraps)
        # arrive: the element k lanes right is alive, wants to move k
        # (shift bit k set -- at word bit 2k), and did not wrap around.
        arrive = ((ss & (2 * k + 1)) == (2 * k + 1)) & (lane < _LANES - k)
        depart = (st & (2 * k + 1)) == (2 * k + 1)
        st = jnp.where(arrive, ss, jnp.where(depart, 0, st))
    return st >> 8


def _prefix_pack(m):
    """Shared kernel body: inclusive lane prefix + row pack of one
    (R, 128) mask block.  Returns ``(packed, p)`` where ``packed`` holds
    front-packed global element indices (garbage lanes zeroed -- the
    consumer masks by count) and ``p`` the inclusive per-row prefix."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 1)
    # Inclusive prefix sum along lanes ON THE MXU: one (R, 128) @
    # (128, 128) multiply by a triangular ones matrix.  The MXU is
    # otherwise idle in this kernel; the VPU alternative (7 Hillis-
    # Steele rotate-add rounds = ~450 multi-cycle lane rolls per
    # 512-row block) measures within noise at this size but burns VPU
    # issue slots the barrel router below can use.  Exact: mask bits
    # are bf16-representable and row sums <= 128 accumulate in f32.
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    )
    p = jax.lax.dot_general(
        m.astype(jnp.bfloat16),
        tri.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    packed_lane = _pack_barrel(m, p, lane)
    base = pl.program_id(0) * (_R * _LANES)
    subl = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 0)
    val = base + subl * _LANES + packed_lane
    rank = lane + 1
    return jnp.where(rank <= p[:, _LANES - 1 :], val, 0), p


def _rowpack_kernel(m_ref, out_ref):
    out_ref[...] = _prefix_pack(m_ref[...])[0]


def _rowpack(mask2d, interpret=False):
    """(rows, 128) int32 mask -> (rows, 128) front-packed global indices."""
    rows = mask2d.shape[0]
    ngrid = rows // _R
    return pl.pallas_call(
        _rowpack_kernel,
        grid=(ngrid,),
        in_specs=[pl.BlockSpec((_R, _LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((_R, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        interpret=interpret,
    )(mask2d)


def _pad_rows(mask):
    """1D bool/int mask -> (rows_padded, 128) int32 block grid."""
    n = mask.shape[0]
    rows = -(-n // _LANES)
    rows_padded = -(-rows // _R) * _R
    return (
        jnp.pad(mask.astype(jnp.int32), (0, rows_padded * _LANES - n))
        .reshape(rows_padded, _LANES)
    )


def gather1d(table, idx, _force_rows=False):
    """``table[idx]`` for 1D ``table``, via a row-of-128 gather plus a
    one-hot lane combine on TPU.

    XLA lowers a 1D element gather to ~11 ns/element on v5e regardless of
    table size.  Reshaping the table to 128-wide rows (the native lane
    width, so the reshape is layout-free -- narrower rows pad their minor
    dim to 128 lanes, a 16x memory blowup), gathering whole rows, and
    selecting the lane with a one-hot select-sum measures ~3-4x faster:
    the row fetch is a contiguous 512 B move and the select fuses into
    pure VPU work.  The select (not multiply) keeps non-finite table
    values in OTHER lanes of a fetched row from leaking NaN into the
    result (Inf * 0 == NaN), so it is exact for any dtype and any values.
    Non-TPU backends use the plain gather (bit-identical result);
    ``_force_rows`` exercises the row path in CPU tests.
    """
    if jax.default_backend() != "tpu" and not _force_rows:
        return table[idx]
    r = -(-table.shape[0] // _LANES)
    t2 = jnp.pad(table, (0, r * _LANES - table.shape[0])).reshape(r, _LANES)
    rows = t2[idx >> 7]
    oh = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) == (
        idx & (_LANES - 1)
    )[:, None]
    return jnp.sum(jnp.where(oh, rows, 0), axis=1)


def _ragged_concat(packed, cnt, capacity):
    """Ragged concat of front-packed rows: output slot j takes the
    rank-th packed element of its source row.  Returns (out, total).

    Single scatter-max + cummax instead of ragged_expand's scatter-add +
    cumsum + boff gather: slot j's gather source is
    ``row * 128 + (j - boff[row]) = A[row] + j`` with
    ``A[r] = r * 128 - boff[r]``.  A is non-decreasing (per-row counts
    are <= 128, so A[r+1] - A[r] = 128 - cnt[r] >= 0), and
    row(j) = max{r : boff[r] <= j}, so
    ``A[row(j)] = cummax(scatter-max of A at boff)[j]`` -- the source
    index arrives with NO per-slot gather of boff and no row cumsum.
    Measured at a 2^26 grid's 201.8M-slot edge mask (1.58M rows,
    capacity 1M): whole indices_of 38.3 -> ~27 ms on v5e."""
    cnt = cnt.astype(jnp.int32)
    offs = jnp.cumsum(cnt)
    total = offs[-1]
    boff = offs - cnt
    rows = cnt.shape[0]
    A = jnp.arange(rows, dtype=jnp.int32) * _LANES - boff
    pos = jnp.minimum(boff, capacity)
    # Init below min(A) = A[0] = 0 so the cummax starts on a real row.
    acc = jnp.full((capacity,), jnp.int32(-1)).at[pos].max(A, mode="drop")
    src_base = jax.lax.cummax(acc)
    j = jnp.arange(capacity, dtype=jnp.int32)
    src = jnp.minimum(src_base + j, rows * _LANES - 1)  # dead-slot clamp
    out = gather1d(packed.reshape(-1), src)
    return jnp.where(j < total, out, 0), total


def indices_of_pallas(mask, capacity, interpret=False):
    """Pallas path: indices of True in ``mask`` (1D), ascending, padded
    with 0 to ``capacity``.  Returns (indices, count)."""
    m2 = _pad_rows(mask)
    packed = _rowpack(m2, interpret=interpret)  # (rows_padded, 128)
    out, total = _ragged_concat(packed, m2.sum(axis=1, dtype=jnp.int32),
                                capacity)
    return out, total


def _rowpack_ranks_bytes_kernel(m_ref, out_ref, p_ref, b_ref):
    """Row-pack + inclusive lane prefix + in-kernel mask byte-pack.

    One kernel pass serves the whole emit phase: the compacted indices
    (vertex order), the per-row prefix (rank-table offsets below), and
    the mask bytes (rank-table words) of the SAME edge mask.

    ``b_ref`` (R, 16) int32: byte j of a row = the mask bits of lanes
    8j..8j+7, LSB-first.  Computed here (the mask is already in VMEM)
    because the same pack as an XLA pass materializes an (N/32, 32)-
    shaped u32 intermediate -- ~60 ms at a 2^26 grid's 201.8M-slot edge
    mask vs ~0 in-kernel.  The (128, 16) weight matrix
    W[lane, lane >> 3] = 2^(lane & 7) is built from iotas (Pallas
    kernels cannot capture array constants); products and per-column
    sums (<= 255, 8 distinct powers of two) are exact in
    bf16 x bf16 -> f32."""
    m = m_ref[...]
    out_ref[...], p_ref[...] = _prefix_pack(m)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_LANES, 16), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_LANES, 16), 1)
    w = jnp.where((lane >> 3) == col, 1 << (lane & 7), 0)
    b_ref[...] = jax.lax.dot_general(
        m.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)


def _words_of_bytes(b16):
    """(rows, 16) int32 mask bytes -> (rows, 4) uint32 words (LSB-first:
    word k = bytes 4k..4k+3)."""
    rows = b16.shape[0]
    b = b16.astype(jnp.uint32).reshape(rows, 4, 4)
    return (
        b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16)
        | (b[:, :, 3] << 24)
    )


def _interleave_table(excl4, words):
    """Interleaved per-32-slot (exclusive offset, bitmask word) u32 table.

    Flat layout [off(s=0), word(s=0), off(1), word(1), ...] so ONE
    512 B row fetch of the 128-lane-reshaped table serves both halves
    of a pair (see rank_lookup)."""
    pairs = jnp.stack([excl4.astype(jnp.uint32), words], axis=-1)
    return pairs.reshape(-1)


def _subgroup_table(m2, excl4):
    """_interleave_table built directly from the (rows, 128) mask (the
    non-kernel path; the TPU path gets its bytes from the fused
    rowpack kernel instead)."""
    rows = m2.shape[0]
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    words = jnp.sum(
        m2.reshape(rows, 4, 32).astype(jnp.uint32) * weights[None, None, :],
        axis=2, dtype=jnp.uint32,
    )
    return _interleave_table(excl4, words)


def indices_and_ranktable_of(mask, capacity, backend=None,
                             _interpret=False):
    """``indices_of`` plus a COMPACT rank structure instead of a
    full-domain ranks array.

    Returns ``(indices, table, total)`` where ``rank_lookup(table, i)``
    == the rank (index in the compacted stream) of slot ``i`` for True
    slots.  The table is 2 uint32 per 32 mask slots (~1/16 the memory
    of the materialized ranks array); the point is GATHER LOCALITY: at
    a 2^26 grid the edge-rank array is 800 MB and random row-gathers
    from it cost ~2x more per element than from sub-50 MB tables
    (measured on v5e, see PERF.md round 4) -- the table form is 50 MB
    at the same scale and one row fetch serves a whole (offset, word)
    pair."""
    if backend is None:
        backend = jax.default_backend()
    n = mask.shape[0]
    m2 = _pad_rows(mask)
    rows_padded = m2.shape[0]
    if backend == "tpu":
        packed, p, b16 = pl.pallas_call(
            _rowpack_ranks_bytes_kernel,
            grid=(rows_padded // _R,),
            in_specs=[pl.BlockSpec((_R, _LANES), lambda i: (i, 0))],
            out_specs=[
                pl.BlockSpec((_R, _LANES), lambda i: (i, 0)),
                pl.BlockSpec((_R, _LANES), lambda i: (i, 0)),
                pl.BlockSpec((_R, 16), lambda i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rows_padded, _LANES), jnp.int32),
                jax.ShapeDtypeStruct((rows_padded, _LANES), jnp.int32),
                jax.ShapeDtypeStruct((rows_padded, 16), jnp.int32),
            ],
            interpret=_interpret,
        )(m2)
        cnt = p[:, _LANES - 1]
        boff = jnp.cumsum(cnt) - cnt
        # exclusive prefix at lanes 0/32/64/96: 0 and the inclusive
        # prefix at the previous subgroup's last lane.
        excl4 = boff[:, None] + jnp.concatenate(
            [jnp.zeros((rows_padded, 1), jnp.int32), p[:, 31:96:32]], axis=1
        )
        out, total = _ragged_concat(packed, cnt, capacity)
        table = _interleave_table(excl4, _words_of_bytes(b16))
    else:
        mi = m2.reshape(-1)
        c = jnp.cumsum(mi)
        excl4 = (c - mi)[::32].reshape(rows_padded, 4)
        out = jnp.flatnonzero(mask, size=capacity, fill_value=0)
        total = jnp.sum(mask.astype(jnp.int32))
        table = _subgroup_table(m2, excl4)
    return out, table, total


def rank_lookup(table, idx, _force_rows=False):
    """Rank of mask slot ``idx`` from an ``indices_and_ranktable_of``
    table: pair-row gather + popcount of the word bits below the lane.

    On TPU one 512 B row fetch of the 128-lane-reshaped table yields
    BOTH pair halves (they are adjacent lanes), so the cost is one
    gather1d-style fetch per element from a table ~16x smaller than the
    materialized ranks array."""
    sub = idx >> 5
    bit = (idx & 31).astype(jnp.uint32)
    if jax.default_backend() != "tpu" and not _force_rows:
        off = table[2 * sub]
        word = table[2 * sub + 1]
    else:
        r = -(-table.shape[0] // _LANES)
        t2 = jnp.pad(table, (0, r * _LANES - table.shape[0])).reshape(
            r, _LANES
        )
        rows = t2[sub >> 6]
        lane0 = ((sub & 63) * 2)[:, None]
        li = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
        off = jnp.sum(jnp.where(li == lane0, rows, 0), axis=1)
        word = jnp.sum(jnp.where(li == lane0 + 1, rows, 0), axis=1)
    below = word & ((jnp.uint32(1) << bit) - jnp.uint32(1))
    return (off + jax.lax.population_count(below)).astype(jnp.int32)


def ragged_expand(counts, capacity, fill=None):
    """Expand per-row ``counts`` into ``capacity`` (row, rank) pairs in
    ascending (row, rank) order: output slot ``j < sum(counts)`` holds the
    rank-th element of its source row.  Padding slots are (0, 0), matching
    ``indices_of``'s fill.  Returns ``(row, rank, total)``.

    Drop-in for the emit paths' slot compaction
    (``indices_of(iota < counts[:, None], capacity)`` followed by
    div/mod): this skips materializing the ``len(counts) * max`` slot
    mask and its O(N) pack entirely.  ONE scatter-add of ``len(counts)``
    row starts + a cumsum gives every slot its source row; the row's
    start offset (for the rank) and optional payload then arrive by a
    batched ``gather1d`` -- measured ~20% faster than the previous
    scatter-max + cummax broadcast at emit shapes on v5e, and it drops
    that variant's fill-monotonicity invariant (the gather reads the
    true source row, no tie-break).

    Source-row resolution with zero-count rows: every zero-count row
    shares its ``boff`` scatter slot with the NEXT live row, which has a
    higher row index, so the ``cumsum(starts) - 1`` "last row at this
    slot" rule always lands live slots on live rows; zero-count rows can
    appear anywhere, including between live rows.

    ``fill``: optional per-row int32 values (any values -- no ordering
    requirement).  Appends ``fill[row]`` per output slot to the return
    tuple; padding slots get ``fill[0]``, matching what a 0-filled
    gather index would fetch.
    """
    counts = counts.astype(jnp.int32)
    offs = jnp.cumsum(counts)
    total = offs[-1]
    boff = offs - counts
    pos = jnp.minimum(boff, capacity)
    starts = jnp.zeros((capacity,), jnp.int32).at[pos].add(1, mode="drop")
    row = jnp.cumsum(starts) - 1
    j = jnp.arange(capacity, dtype=jnp.int32)
    live = j < total
    if fill is None:
        boff_r = gather1d(boff, row)
        return (jnp.where(live, row, 0), jnp.where(live, j - boff_r, 0), total)
    v = fill.astype(jnp.int32)
    # One fused gather for both per-row payloads (offset + fill value).
    n = counts.shape[0]
    got = gather1d(jnp.concatenate([boff, v]),
                   jnp.concatenate([row, row + n]))
    boff_r = got[:capacity]
    v_r = got[capacity:]
    return (jnp.where(live, row, 0), jnp.where(live, j - boff_r, 0), total,
            jnp.where(live, v_r, v[0]))


def indices_of(mask, capacity, backend=None):
    """Indices of True elements of 1D ``mask``, ascending, padded with 0
    to static ``capacity`` -- same contract as
    ``jnp.flatnonzero(mask, size=capacity, fill_value=0)``.

    Uses the Pallas row-pack kernel on TPU and jnp.flatnonzero elsewhere
    (identical results; CPU interpret mode would only add overhead).
    """
    if backend is None:
        backend = jax.default_backend()
    if backend == "tpu":
        idx, _ = indices_of_pallas(mask, capacity)
        return idx
    return jnp.flatnonzero(mask, size=capacity, fill_value=0)
