"""Runtime side of the Lewiner-compatible MC variant (``mc_variant=
"lewiner"``): extended-case classification on device.

The table set (see mc33_build.py for the derivation) is addressed by
``ext = OFFSET[case] + facebits * 9 + ibits`` where ``facebits`` holds the
bilinear-saddle sign of each ambiguous face (Lewiner's face test) and
``ibits`` in [0, 9) the per-saddle-index interior code of the trilinear's
body saddles (the interior/tunnel test; mc33_build.interior_bits).  This
module computes that code per cell with pure XLA ops
over the evaluated volume -- a handful of VPU flops per cell, fused by XLA
into the classification pass.

Replaces the per-batch topology decisions of skimage's Lewiner mesher
(ref sdf/core.py:16-18) with a whole-volume device pass.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .mc_tables import CORNER_OFFSETS, _FACES

_NPZ = os.path.join(os.path.dirname(__file__), "mc33_tables.npz")


@functools.lru_cache()
def load_tables():
    """The committed table artifact, sanity-checked against the
    deterministic offsets the builder derives."""
    if not os.path.exists(_NPZ):
        raise FileNotFoundError(
            f"{_NPZ} missing -- run `python tools/build_mc33_tables.py` to "
            "derive the Lewiner-variant tables"
        )
    d = dict(np.load(_NPZ))
    from . import mc33_build as mb

    if not (
        np.array_equal(d["offset"], mb.OFFSET)
        and np.array_equal(d["weight"], mb.WEIGHT)
    ):
        raise ValueError(
            "mc33_tables.npz layout does not match mc33_build.build_offsets();"
            " regenerate with tools/build_mc33_tables.py"
        )
    d["tri_table"] = d["tri_table"].astype(np.int32)
    return d


# (256, 8) [OFFSET >> 8 | OFFSET & 255 | WEIGHT per face] -- one shared
# one-hot matmul resolves all per-case constants.  The offset (<= 5904)
# travels as two bytes because every table entry must be bf16-exact
# (8 significant bits); weights are 9 * 2^rank (4 significant bits, bf16-
# exact).  The one-hot stays bf16 (0/1 entries exact) with f32
# accumulation.
@functools.lru_cache()
def _offw_tab():
    d = load_tables()
    return np.concatenate(
        [d["offset"][:, None] >> 8, d["offset"][:, None] & 255, d["weight"]],
        axis=1,
    ).astype(np.float32)


def extra_bits(c):
    """Packed per-cell topology-resolution bits from the 8 corner values
    ``c`` (broadcastable arrays, any common shape): int32
    ``facebits | ibits9 << 6`` with ``ibits9 = s1 + 3 * s2`` in [0, 9)
    (mc33_build.interior_bits' per-saddle-index interior code).

    Pure jnp math (no tables, no gathers).  The interior test is the
    SHARED guarded algorithm mc33_build.interior_flags -- the float64
    numpy oracle runs the identical code, so oracle and device agree by
    construction even on degenerate cells (flat faces, boundary double
    roots, exact-tie critical values), where naive formulas let FMA
    contraction / evaluation order flip tunnel bits between backends.
    """
    # Face test: joined iff the bilinear saddle value is inside, i.e.
    # (a c - b d) and (a + c - b - d) have opposite signs (orientation-
    # free; see mc33_build.face_joined_bits).  Computing the bit on
    # unambiguous faces is harmless (their table weights are zero).
    fb = jnp.zeros(jnp.broadcast_shapes(*(x.shape for x in c)), jnp.int32)
    for f, corners in enumerate(_FACES):
        a, b, cc, dd = (c[i] for i in corners)
        joined = ((a * cc - b * dd) * (a + cc - b - dd)) < 0
        fb = fb | (joined.astype(jnp.int32) << f)

    from . import mc33_build as mb

    neg1, pos1, neg2, pos2 = mb.interior_flags(
        jnp, c, float(jnp.finfo(c[0].dtype).eps)
    )
    s1 = jnp.where(neg1, 1, jnp.where(pos1, 2, 0)).astype(jnp.int32)
    s2 = jnp.where(neg2, 1, jnp.where(pos2, 2, 0)).astype(jnp.int32)
    return fb | ((s1 + 3 * s2) << 6)


def ext_from_bits(case, extra):
    """Extended case code from the 8-bit corner-sign ``case`` and the
    packed ``extra`` bits (see extra_bits): the table part of the
    classification -- one one-hot matmul for the per-case offset/weights,
    then integer bit combines.  Shapes broadcast; returns int32.

    The matmul runs TRANSPOSED -- (8, 256) @ (256, N) -> (8, N) -- so
    the result's minor dim is the cell axis: an (N, 8) result pads its
    8-wide minor dim onto the 128 vector lanes (16x HBM amplification;
    the transpose cut whole-classify from 9.1 to 6.3 ms at a 2^22 grid,
    same session, v5e)."""
    flat = case.reshape(-1)
    oh = jax.nn.one_hot(flat, 256, dtype=jnp.bfloat16, axis=0)  # (256, N)
    ow = jnp.matmul(
        jnp.asarray(_offw_tab().T, jnp.bfloat16), oh,
        preferred_element_type=jnp.float32,
    )  # (8, N) exact
    ext = ow[0] * 256.0 + ow[1]
    eflat = extra.reshape(-1)
    for f in range(6):
        ext = ext + jnp.where(((eflat >> f) & 1) > 0, ow[2 + f], 0.0)
    ext = ext.astype(jnp.int32)
    ext = ext + ((eflat >> 6) & 15)  # ibits9 in [0, 9)
    return ext.reshape(case.shape)


@functools.lru_cache()
def _conflicted_codes():
    """The extended codes whose builder oracle saw a class mixture
    (conflict_rate > 0), so their triangulation is a majority vote
    (docs/TOPOLOGY.md section 4.2).  EMPTY with the round-5 tables (the
    saddle-index interior code resolved all 21 votes); kept as a
    tripwire so a future table rebuild that reintroduces votes surfaces
    per run."""
    return tuple(
        int(c) for c in np.nonzero(load_tables()["conflict_rate"] > 0)[0]
    )


@jax.jit
def count_conflicted(ext, keep):
    """Number of kept cells whose extended code is a majority-voted
    (conflicted) table entry -- structurally 0 with the round-5 tables
    (zero conflicted codes; see _conflicted_codes).  Surfaces as
    LAST_STATS['mc33_conflicted_cells'] (engine.generate).

    Formulated as an unrolled chain of elementwise equality tests
    against the (static, ~21-entry) conflicted-code list: a table
    gather ``tab[ext]`` over all cells measured 558 ms at a 2^26 grid
    on v5e (element-gather lowering), and the row-of-128 gather1d
    materializes an (N, 128) row buffer (34 GB at 2^26); the compare
    chain fuses into one VPU pass over ``ext`` with no intermediate
    (~5 ms amortized at 2^26 on v5e)."""
    hit = jnp.zeros(ext.shape, bool)
    for code in _conflicted_codes():
        hit = hit | (ext == code)
    return jnp.sum(hit & keep).astype(jnp.int32)


def _corners(volume, level=0.0):
    """The 8 per-cell corner value arrays of ``volume`` (level-shifted)."""
    nx, ny, nz = volume.shape[-3:]
    return [
        volume[
            ...,
            ox : nx - 1 + ox,
            oy : ny - 1 + oy,
            oz : nz - 1 + oz,
        ] - level
        for ox, oy, oz in np.asarray(CORNER_OFFSETS)
    ]


_EXT_BLOCK = 16384  # cells per table-kernel program (one_hot = 8 MB VMEM)


def _ext_table_kernel(case_ref, extra_ref, tab_ref, ext_ref):
    """In-VMEM table pass: ext codes for one (8, Bc) block of cells.

    The XLA form streams a (256, N) bf16 one-hot through HBM (~34 GB at
    a 2^26 grid, ~31-50 ms -- the dominant classify cost, PERF.md).
    Here the one-hot lives and dies in VMEM: per block sub-row, build
    (256, Bc) by an iota==broadcast compare, one MXU matmul against the
    (8, 256) byte-split table (all entries <= 255, bf16-exact; f32
    accumulate), then the same bit combines as ext_from_bits.  HBM
    traffic: 8 bytes in + 4 out per cell."""
    case = case_ref[...]  # (8, Bc) int32
    extra = extra_ref[...]
    R, Bc = case.shape
    tab = tab_ref[...]  # (8, 256) bf16
    for r in range(R):
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (256, Bc), 0)
            == jnp.broadcast_to(case[r : r + 1], (256, Bc))
        ).astype(jnp.bfloat16)
        ow = jax.lax.dot_general(
            tab, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, Bc) exact
        ext = ow[0] * 256.0 + ow[1]
        er = extra[r]
        for f in range(6):
            ext = ext + jnp.where(((er >> f) & 1) > 0, ow[2 + f], 0.0)
        exti = ext.astype(jnp.int32)
        ext_ref[r, :] = exti + ((er >> 6) & 15)  # ibits9 in [0, 9)


def _ext_from_bits_kernel(case, extra, _interpret=False):
    """ext_from_bits via the in-VMEM Pallas table kernel (TPU path).

    Same contract and bit-exact same results as ext_from_bits; measured
    on v5e at 67M cells the XLA one-hot pass costs ~31-50 ms vs ~5 ms
    here (the one-hot never touches HBM)."""
    shape = case.shape
    flat_c = case.reshape(-1)
    flat_e = extra.reshape(-1)
    n = flat_c.shape[0]
    Bc = _EXT_BLOCK // 8
    nb = -(-n // _EXT_BLOCK)
    pad = nb * _EXT_BLOCK - n
    c2 = jnp.pad(flat_c, (0, pad)).reshape(nb * 8, Bc)
    e2 = jnp.pad(flat_e, (0, pad)).reshape(nb * 8, Bc)
    tab = jnp.asarray(_offw_tab().T, jnp.bfloat16)  # (8, 256)
    ext = pl.pallas_call(
        _ext_table_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, Bc), lambda i: (i, 0)),
            pl.BlockSpec((8, Bc), lambda i: (i, 0)),
            pl.BlockSpec(tab.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, Bc), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nb * 8, Bc), jnp.int32),
        interpret=_interpret,
    )(c2, e2, tab)
    return ext.reshape(-1)[:n].reshape(shape)


@functools.lru_cache()
def _ext_kernel_ok():
    """One-time EAGER probe of the table kernel on this backend.

    A try/except around the traced call could never catch a Mosaic
    compile failure (compilation happens after tracing returns, outside
    any per-call try -- code-review finding); probing on concrete tiny
    inputs executes eagerly even when the caller is mid-trace, so a
    lowering failure downgrades to the XLA form instead of crashing
    every lewiner-variant generate()."""
    try:
        z = jnp.zeros(16, jnp.int32)
        jax.block_until_ready(_ext_from_bits_kernel(z, z))
        return True
    except Exception:
        return False


@jax.jit
def _classify_ext_jit(volume, level, base_case):
    c = _corners(volume, level)
    if base_case is not None:
        case = base_case
    else:
        case = jnp.zeros(c[0].shape, dtype=jnp.int32)
        for i in range(8):
            case = case | (jnp.int32(1 << i) * (c[i] < 0).astype(jnp.int32))
    extra = extra_bits(c)
    if jax.default_backend() == "tpu" and _ext_kernel_ok():
        return _ext_from_bits_kernel(case, extra)
    return ext_from_bits(case, extra)


def classify_ext(volume, level=0.0, base_case=None):
    """Extended case code per cell (int32, shape (..., nx-1, ny-1, nz-1)).

    Accepts leading batch dims (the tiled path classifies (ntc, TS, TS,
    TS) tile volumes).  ``base_case`` reuses an already-computed 8-bit
    corner-sign grid (e.g. from the fused Pallas eval+classify kernel)
    instead of re-deriving it from corner compares.  Mirrors
    mc33_build.ext_code (the float64 numpy oracle-side implementation)
    in the volume's dtype; agreement is pinned by tests/test_topology.py.

    A Pallas kernel for the saddle/interior float math was built and
    measured (round 3): it computes the bits in 4.9 ms at a 2^22 grid,
    but the XLA fusion absorbs that math into the table pass's streaming
    for free -- the split (4.9 + 6.0 table) LOSES to the single fused
    XLA program (6.3 ms, same session), so classification stays one
    jitted XLA pass (PERF.md "lewiner classify").
    """
    return _classify_ext_jit(volume, level, base_case)
