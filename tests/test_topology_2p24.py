"""North-star-scale topology certificate: examples/example.py at
samples=2**24 (BASELINE.md: "bit-matching isosurface topology on
examples/example.py at 2^24").

Pins, as committed string hashes (not arrays):
  * the full extended-case grid (lewiner classification of the f64
    volume on the north-star grid) -- the complete per-cell topology
    decision record;
  * the canonicalized triangle-soup sha256 for BOTH mc variants;
  * the triangle count;
  * the fact that the two variants agree bit-for-bit on this model at
    this scale (no topology-affecting ambiguous cell), extending the
    step-0.04 small-grid goldens (tests/test_topology.py,
    tests/test_lewiner.py) to the north-star config.

Slow (several minutes of float64 CPU eval + compile): run explicitly
with

    SDF_TPU_SLOW=1 python -m pytest tests/test_topology_2p24.py -q

The per-round driver artifact witnesses the same config on the bench
device instead: bench.py computes the 2^24 canonicalized-soup hashes for
both variants every run (f32 on the bench backend, so the hash VALUES
differ from the float64 CPU pins here; the bench JSON witnesses the
config and self-consistency, this test certifies bit-exact
reproducibility).
"""

import hashlib
import os

import numpy as np
import pytest

import sdf_tpu as st

SLOW = os.environ.get("SDF_TPU_SLOW") == "1"

# Committed pins (float64, CPU, 1-device mesh, sparse=True -- the
# reference's defaults at samples=2**24 with estimated bounds).
# Re-pinned round 5: the saddle-index interior code renumbered every
# extended case value (stride 4 -> 9; see mc33_build.py).  The SOUP
# hashes and triangle count below were verified UNCHANGED across the
# table rebuild -- the mesh is bit-identical; only the code values moved.
EXT_GRID_SHA256 = (
    "3fb04083920066edbaef61d2d80986b926941df188874e34fdda3b447eb73fcc"
)
# Soup hashes re-pinned after the round-4 bounds overhaul (float64 host
# refinement with np.linspace, commit "Bounds estimation: float64 host
# refinement"): the f64 box moved ~1e-7 (jnp.linspace -> np.linspace),
# shifting every vertex at the 1e-7 level while the discrete ext-grid
# pin and the triangle count were unaffected.
SOUP_SHA256 = {
    "lewiner": "54d4ad9c22a8ce6bb77d8b763e2abb6878eda56ece4a40ea8aa274802b698ca3",
    "fast": "54d4ad9c22a8ce6bb77d8b763e2abb6878eda56ece4a40ea8aa274802b698ca3",
}
N_TRIANGLES = 731152
GRID_SHAPE = (256, 256, 256)


def _example():
    f = st.sphere(1) & st.box(1.5)
    c = st.cylinder(0.5)
    f -= c.orient(st.X) | c.orient(st.Y) | c.orient(st.Z)
    return f


def _soup_hash(pts):
    tris = np.asarray(pts, np.float64).round(9).reshape(-1, 9)
    return hashlib.sha256(
        tris[np.lexsort(tris.T[::-1])].tobytes()
    ).hexdigest()


@pytest.mark.skipif(not SLOW, reason="set SDF_TPU_SLOW=1 (several minutes)")
def test_ext_grid_pin_2p24():
    """Full extended-case grid of the f64 volume on the north-star grid
    equals the committed hash (device classify == the pinned decisions,
    cell for cell, at 2^24)."""
    import jax.numpy as jnp

    from sdf_tpu.core import engine, mc33
    from sdf_tpu.core.node import cast

    f = _example()
    dtype = jnp.float64
    (x0, y0, z0), (x1, y1, z1) = engine._estimate_bounds(f, dtype)
    volume = (x1 - x0) * (y1 - y0) * (z1 - z0)
    step = (volume / 2**24) ** (1 / 3)
    X = np.arange(x0, x1, step)
    Y = np.arange(y0, y1, step)
    Z = np.arange(z0, z1, step)
    assert (len(X), len(Y), len(Z)) == GRID_SHAPE
    vol = engine._eval_volume(cast(f, dtype), X, Y, Z, dtype)
    ext = np.asarray(mc33.classify_ext(vol), dtype=np.int32)
    assert hashlib.sha256(ext.tobytes()).hexdigest() == EXT_GRID_SHA256


@pytest.mark.skipif(not SLOW, reason="set SDF_TPU_SLOW=1 (several minutes)")
@pytest.mark.parametrize("variant", ["lewiner", "fast"])
def test_soup_pin_2p24(variant):
    """Canonicalized triangle soup of the full pipeline at 2^24 equals
    the committed hash, per variant (1-device mesh: the dense/tiles
    single-device path, deterministic on CPU float64)."""
    import jax
    import jax.numpy as jnp

    from sdf_tpu.parallel import grid as pgrid

    f = _example()
    pts = f.generate(
        samples=2**24, verbose=False, dtype=jnp.float64,
        mc_variant=variant, mesh=pgrid.make_mesh(jax.devices()[:1]),
    )
    assert len(pts) // 3 == N_TRIANGLES
    assert _soup_hash(pts) == SOUP_SHA256[variant]
