"""Speculative single-device dense pipeline.

With one device and sparse=True, generate() dispatches the probe-cull
test and the dense pipeline together and fetches the skip mask WITH the
counts in one round trip (engine._skip_mask_device); if the fetched cull
fraction crosses AUTO_TILES_THRESHOLD it discards the dense eval and
runs the tiled path.  The test env has 8 virtual devices (which disables
speculation via auto-sharding), so jax.devices is narrowed to one.
"""

import jax
import numpy as np
import pytest

import sdf_tpu as stp
from sdf_tpu.core import engine


@pytest.fixture
def one_device(monkeypatch):
    real = jax.devices()
    monkeypatch.setattr(jax, "devices", lambda *a, **k: real[:1])
    return real[0]


def canon(p):
    return np.sort(p.reshape(-1, 9), axis=0)


def test_speculative_matches_forced_dense(one_device):
    f = stp.sphere(1) & stp.box(1.5)
    p_spec = f.generate(samples=2**15, verbose=False, sparse=True)
    st = dict(engine.LAST_STATS)
    assert "skip_dispatch" in st and "skip_mask" not in st
    p_dense = f.generate(samples=2**15, verbose=False, sparse=False)
    np.testing.assert_array_equal(canon(p_spec), canon(p_dense))


def test_speculative_auto_tiles_fallback(one_device):
    g = stp.sphere(0.1)
    b = ((-3.0,) * 3, (3.0,) * 3)
    p1 = g.generate(samples=2**19, verbose=False, sparse=True, bounds=b)
    st = dict(engine.LAST_STATS)
    assert st.get("auto_tiles", 0) >= engine.AUTO_TILES_THRESHOLD
    assert "sparse_tiles" in st and "skip_dispatch" in st
    p2 = g.generate(samples=2**19, verbose=False, sparse="tiles", bounds=b)
    assert len(p1) > 0
    np.testing.assert_array_equal(canon(p1), canon(p2))


def test_speculative_indexed_output(one_device):
    f = stp.sphere(1) & stp.box(1.5)
    pts = f.generate(samples=2**15, verbose=False)
    verts, faces = f.generate_mesh(samples=2**15, verbose=False)
    np.testing.assert_array_equal(verts[faces.reshape(-1)], pts)
    assert len(np.unique(faces)) == len(verts)


def test_counts_memo_repeat_and_invalidation(one_device):
    """Repeat generate() hits the counts memo (no pre-emit sync) and
    returns identical output + stats; parameter changes re-count."""
    engine._COUNTS_MEMO.clear()
    f = stp.sphere(1) & stp.box(1.5)
    p1 = f.generate(samples=2**15, verbose=False)
    st1 = dict(engine.LAST_STATS)
    assert len(engine._COUNTS_MEMO) == 1
    p2 = f.generate(samples=2**15, verbose=False)
    st2 = dict(engine.LAST_STATS)
    np.testing.assert_array_equal(p1, p2)
    for k in ("skipped", "empty", "nonempty", "triangles"):
        assert st1[k] == st2[k]
    g = stp.sphere(1.2) & stp.box(1.5)
    p3 = g.generate(samples=2**15, verbose=False)
    assert len(engine._COUNTS_MEMO) == 2
    assert len(p3) != len(p1)


def test_counts_memo_distinguishes_cull_masks(one_device):
    """sparse=False and sparse=True reach the dense path with different
    keep masks (speculate=False via mesh=); their count memo keys must
    differ or an inexact SDF would reuse wrong buffer sizes."""
    from jax.sharding import Mesh

    engine._COUNTS_MEMO.clear()
    f = stp.sphere(1) & stp.box(1.5)
    # bounds/batch_size chosen so the probe cull removes a nonzero
    # fraction below AUTO_TILES_THRESHOLD (0.42 here): the two runs'
    # keep masks genuinely differ and both stay on the dense path.
    kw = dict(
        samples=2**18, batch_size=8, bounds=((-1.1,) * 3, (1.1,) * 3),
        verbose=False,
    )
    f.generate(sparse=False, **kw)
    assert len(engine._COUNTS_MEMO) == 1
    m = Mesh(np.array(jax.devices()[:1]), ("z",))
    f.generate(sparse=True, mesh=m, **kw)
    assert "sparse_tiles" not in engine.LAST_STATS
    assert len(engine._COUNTS_MEMO) == 2


def test_checkpoint_fingerprint_distinguishes_mc_variant(tmp_path):
    """A cached mesh generated under one MC variant must not be resumed
    for another (the fingerprint covers mc_variant)."""
    import numpy as np
    import jax.numpy as jnp
    import sdf_tpu as st
    from sdf_tpu.core import engine

    f = st.sphere(1)
    ck = str(tmp_path / "mesh.ckpt")
    kw = dict(samples=2**12, verbose=False, dtype=jnp.float64,
              bounds=((-1.2,) * 3, (1.2,) * 3), checkpoint=ck)
    a = engine.generate(f, **kw)
    b = engine.generate(f, mc_variant="lewiner", **kw)
    c = engine.generate(f, **kw)  # resumes the default-variant entry
    assert np.array_equal(np.asarray(a), np.asarray(c))
    assert len(a) == len(b)  # sphere: same topology either way


def test_batched_cz_memo_keys_on_tile_size():
    """The batched-tile-kernel block-size memo must not reuse a block
    size validated at one batch_size for another (VMEM fit depends on
    tile+1), and a poisoned memo entry must degrade to the ladder, not
    crash auto mode."""
    import numpy as np
    import jax.numpy as jnp
    import sdf_tpu as st
    from sdf_tpu.core import engine, sparse as sp
    from sdf_tpu.core.node import cast

    f = st.sphere(1)
    sdf_c = cast(f, jnp.float32)
    X = np.arange(-1.2, 1.2, 0.15)
    Xd = jnp.asarray(X, jnp.float32)
    tiles = jnp.zeros((1, 3), jnp.int32)
    sp._BATCHED_CZ.clear()
    v1, c1, m1 = sp._eval_tiles_auto(
        sdf_c, Xd, Xd, Xd, tiles, 1, 8, jnp.float32, 128, True
    )
    v2, c2, m2 = sp._eval_tiles_auto(
        sdf_c, Xd, Xd, Xd, tiles, 1, 4, jnp.float32, 128, True
    )
    keys = list(sp._BATCHED_CZ)
    assert len(keys) == 2 and keys[0][1] != keys[1][1]  # tile in the key

    # poison the memoized entry: reuse must fall back to the ladder
    sp._BATCHED_CZ[keys[0]] = (9999, None)  # invalid block size
    v3, c3, m3 = sp._eval_tiles_auto(
        sdf_c, Xd, Xd, Xd, tiles, 1, 8, jnp.float32, 128, True
    )
    assert m3 in ("batched", "xla")
    np.testing.assert_allclose(
        np.asarray(v3), np.asarray(v1), rtol=1e-6, atol=1e-6
    )
