"""Runtime side of the Lewiner-compatible MC variant (``mc_variant=
"lewiner"``): extended-case classification on device.

The table set (see mc33_build.py for the derivation) is addressed by
``ext = OFFSET[case] + facebits * 4 + ibits`` where ``facebits`` holds the
bilinear-saddle sign of each ambiguous face (Lewiner's face test) and
``ibits`` the interior-critical-value signs of the trilinear (the interior/
tunnel test).  This module computes that code per cell with pure XLA ops
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
# one-hot matmul resolves all per-case constants.  The offset (<= 2624)
# travels as two bytes because every table entry must be bf16-exact
# (integers <= 256); weights are powers of two <= 128.  The one-hot stays
# bf16 (0/1 entries exact) with f32 accumulation.
@functools.lru_cache()
def _offw_tab():
    d = load_tables()
    return np.concatenate(
        [d["offset"][:, None] >> 8, d["offset"][:, None] & 255, d["weight"]],
        axis=1,
    ).astype(np.float32)


def classify_ext(volume, level=0.0, base_case=None):
    """Extended case code per cell (int32, shape (..., nx-1, ny-1, nz-1)).

    Accepts leading batch dims (the tiled path classifies (ntc, TS, TS,
    TS) tile volumes).  ``base_case`` reuses an already-computed 8-bit
    corner-sign grid (e.g. from the fused Pallas eval+classify kernel)
    instead of re-deriving it from corner compares.  Mirrors
    mc33_build.ext_code (the float64 numpy oracle-side implementation)
    in the volume's dtype; agreement is pinned by tests/test_topology.py.
    """
    nx, ny, nz = volume.shape[-3:]
    c = [
        volume[
            ...,
            ox : nx - 1 + ox,
            oy : ny - 1 + oy,
            oz : nz - 1 + oz,
        ] - level
        for ox, oy, oz in np.asarray(CORNER_OFFSETS)
    ]
    if base_case is not None:
        case = base_case
    else:
        case = jnp.zeros(c[0].shape, dtype=jnp.int32)
        for i in range(8):
            case = case | (jnp.int32(1 << i) * (c[i] < 0).astype(jnp.int32))

    # Per-case offset + face weights via one one-hot matmul.
    flat = case.reshape(-1)
    oh = jax.nn.one_hot(flat, 256, dtype=jnp.bfloat16)
    ow = jnp.matmul(
        oh, jnp.asarray(_offw_tab(), jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (N, 8) exact
    ext = ow[:, 0] * 256.0 + ow[:, 1]

    # Face test: joined iff the bilinear saddle value is inside, i.e.
    # (a c - b d) and (a + c - b - d) have opposite signs (orientation-
    # free; see mc33_build.face_joined_bits).  Weights are zero for
    # unambiguous faces, so computing the bit everywhere is harmless.
    for f, corners in enumerate(_FACES):
        a, b, cc, dd = (c[i].reshape(-1) for i in corners)
        joined = ((a * cc - b * dd) * (a + cc - b - dd)) < 0
        ext = ext + jnp.where(joined, ow[:, 2 + f], 0.0)
    ext = ext.astype(jnp.int32)

    # Interior test: signs of the trilinear's critical values at critical
    # points strictly inside the open cell (see mc33_build.interior_bits;
    # identical formulas, volume dtype instead of float64).
    c000, c100, c110, c010, c001, c101, c111, c011 = (
        x.reshape(-1) for x in c
    )
    k1 = c100 - c000
    k2 = c010 - c000
    k3 = c001 - c000
    k4 = c110 - c000 - k1 - k2
    k5 = c101 - c000 - k1 - k3
    k6 = c011 - c000 - k2 - k3
    k7 = c111 - c000 - k1 - k2 - k3 - k4 - k5 - k6
    m = k3 * k7 - k5 * k6
    A = k7 * m
    B = 2.0 * k4 * m
    C = k3 * k4 * k4 - k4 * (k2 * k5 + k1 * k6) + k7 * k1 * k2
    lin = A == 0
    disc = B * B - 4.0 * A * C
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    neg = jnp.zeros(lin.shape, dtype=bool)
    pos = jnp.zeros(lin.shape, dtype=bool)
    for sgn in (1.0, -1.0):
        zq = (-B + sgn * sq) / jnp.where(A == 0, 1.0, 2.0 * A)
        zl = -C / jnp.where(B == 0, 1.0, B)
        z = jnp.where(lin, zl, zq)
        valid = jnp.where(lin, B != 0, disc >= 0)
        den = k4 + k7 * z
        y = -(k1 + k5 * z) / jnp.where(den == 0, 1.0, den)
        x = -(k2 + k6 * z) / jnp.where(den == 0, 1.0, den)
        fv = (
            c000
            + k1 * x + k2 * y + k3 * z
            + k4 * x * y + k5 * x * z + k6 * y * z
            + k7 * x * y * z
        )
        ok = (
            valid & (den != 0)
            & (x > 0) & (x < 1) & (y > 0) & (y < 1) & (z > 0) & (z < 1)
        )
        neg = neg | (ok & (fv < 0))
        pos = pos | (ok & (fv > 0))
    ext = ext + neg.astype(jnp.int32) + 2 * pos.astype(jnp.int32)
    return ext.reshape(case.shape)
