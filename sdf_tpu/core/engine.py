"""Grid sampling + meshing engine (parity: ref sdf/core.py).

TPU-first redesign of the reference engine.  The reference fans 32^3-sample
batches out to a CPU thread pool and runs numpy + skimage per batch
(ref sdf/core.py:84-150).  Here:

  * grid *coordinates* are built on the host in float64 with ``np.arange``
    (identical grid dimensions to the reference, SURVEY.md 2.4.5),
  * bounds estimation runs as ONE on-device ``lax.while_loop``,
  * sparse tile culling reproduces the reference's ``_skip`` probe test
    (center + 8 corners per tile, ref sdf/core.py:28-43) as one batched
    device evaluation feeding a per-cell mask,
  * evaluation + marching cubes run on device: by default a fused Pallas
    eval+classify kernel (core.pallas_eval) feeding the two-phase
    count/emit mesher (core.mc); ``sparse="tiles"`` instead evaluates
    only culled-in tiles (core.sparse); multi-device meshes shard
    z-slabs (parallel.grid) or the active-tile list (parallel.sparse),
  * because reference batches overlap by one sample plane, the global
    (or per-tile/per-slab) passes are exactly equivalent to its
    per-batch meshing.

Output contract matches the reference: a flat (3*T, 3) array of vertices,
three consecutive rows per triangle (ref sdf/core.py:128-150).
"""

from __future__ import annotations

import hashlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import progress
from ..io import stl
from . import mc
from .node import Points, cast

# None = "all visible devices", resolved at call time: touching
# jax.devices() at import would initialize the XLA backend and break
# jax.distributed.initialize() for multi-host users (ref WORKERS is
# cpu_count(), sdf/core.py:12).
WORKERS = None
SAMPLES = 2**22
BATCH_SIZE = 32

# Culled-tile fraction above which sparse=True automatically uses the
# tiled evaluation path (see generate(); the reference's sparse mode
# never evaluates culled batches, ref sdf/core.py:45-48).
AUTO_TILES_THRESHOLD = 0.6

_TARGET_CHUNK_POINTS = 2**22

# Memoized (n_cells, n_tris, n_edges) per (expression fingerprint, grid,
# dtype, cull mode): counts are deterministic, so repeat generate() calls
# skip the pre-emit sync round trip entirely (see the dense path).
_COUNTS_MEMO = {}

# Probe-cull skip masks, keyed like _COUNTS_MEMO: the mask is
# deterministic in (expression, grid, batch size, dtype), so repeat
# non-speculative sparse runs skip the ~30-60 ms probe dispatch.
_SKIP_MEMO = {}

# Expression structures whose Pallas lowering failed (see generate()).
# Keyed on a *structural fingerprint* (utils.checkpoint.structure_key):
# rebuilding the same model yields fresh closure identities, so treedef
# identity would re-pay one failed TPU compile (minutes through a tunnel)
# per rebuild; the structural hash is stable across rebuilds/processes.
_PALLAS_BROKEN = set()

# Measured dense-path routing: (pallas_key, nz) -> True (fused Pallas
# kernel won the interleaved race) | False (XLA eval + classify won).
# Like the tiles race (sparse._eval_tiles_auto), the winner is scale-
# and model-dependent, so it is measured once per key, not assumed.
_DENSE_RACE = {}


def _pallas_key(sdf_c, dtype, nxy):
    from ..utils import checkpoint as ckpt

    return ckpt.structure_key(sdf_c, jnp.dtype(dtype).str, nxy)

# Structured report of the most recent generate() (phase wall times in
# seconds + batch/triangle counters).  The reference only prints
# (ref sdf/core.py:105-148); this keeps the numbers programmatic.
LAST_STATS = {}

# When True, the dense generate() path fences device completion before
# its d2h phase and records ``stats["device"]`` (wall time from the
# first eval dispatch to the fence) -- one extra tiny read per run, off
# by default.  bench.py enables it (with core.sparse.PROFILE for the
# tiles route) to decompose the flagship 2^26 e2e into device / tunnel
# transfer / host decode, so transfer weather cannot masquerade as a
# device regression (round-4 verdict item 6).
PROFILE = False


class _phase:
    """Context manager: profiler trace annotation + LAST_STATS timing."""

    def __init__(self, name, stats):
        self.name = name
        self.stats = stats

    def __enter__(self):
        self.t0 = time.time()
        self.ann = jax.profiler.TraceAnnotation("sdf_tpu." + self.name)
        self.ann.__enter__()
        return self

    def __exit__(self, *exc):
        self.ann.__exit__(*exc)
        self.stats[self.name] = round(time.time() - self.t0, 4)
        return False


def _cartesian_product(*arrays):
    la = len(arrays)
    dtype = np.result_type(*arrays)
    arr = np.empty([len(a) for a in arrays] + [la], dtype=dtype)
    for i, a in enumerate(np.ix_(*arrays)):
        arr[..., i] = a
    return arr.reshape(-1, la)


@jax.jit
def _eval_points(sdf, p):
    return sdf(p)


def _eval_numpy(sdf, points, dtype=jnp.float32):
    """Evaluate an SDF expression on host points -> host (N, 1) float64."""
    p = jnp.asarray(points, dtype=dtype)
    return np.asarray(_eval_points(cast(sdf, dtype), p), dtype=np.float64)


from functools import partial


@partial(jax.jit, static_argnames=("nchunks",))
def _eval_volume_jit(sdf, X, Y, Z, nchunks):
    nx, ny = X.shape[0], Y.shape[0]
    Zc = Z.reshape(nchunks, -1)

    def slab(zc):
        # SoA evaluation: coordinates stay three broadcast views; XLA fuses
        # the whole expression without ever materializing an (N, 3) array.
        shape = (nx, ny, zc.shape[0])
        p = Points(X[:, None, None], Y[None, :, None], zc[None, None, :])
        return jnp.broadcast_to(sdf(p), shape)

    vols = jax.lax.map(slab, Zc)  # (nchunks, nx, ny, sz)
    return jnp.moveaxis(vols, 0, 2).reshape(nx, ny, Z.shape[0])


def _eval_volume(sdf, X, Y, Z, dtype):
    """Dense volume evaluation, chunked along z.  X/Y/Z are host float64."""
    nx, ny, nz = len(X), len(Y), len(Z)
    sz = max(1, min(nz, -(-_TARGET_CHUNK_POINTS // (nx * ny))))
    nchunks = -(-nz // sz)
    pad = nchunks * sz - nz
    dz = Z[1] - Z[0] if nz > 1 else 1.0
    Zp = np.concatenate([Z, Z[-1] + dz * np.arange(1, pad + 1)])
    vol = _eval_volume_jit(
        sdf,
        jnp.asarray(X, dtype=dtype),
        jnp.asarray(Y, dtype=dtype),
        jnp.asarray(Zp, dtype=dtype),
        nchunks,
    )
    return vol[:, :, :nz]


@partial(jax.jit, static_argnames=("tile", "shape"))
def _expand_tile_mask(keep, tile, shape):
    m = jnp.repeat(jnp.repeat(jnp.repeat(keep, tile, 0), tile, 1), tile, 2)
    return m[: shape[0], : shape[1], : shape[2]]


@jax.jit
def _bounds_probe_jit(sdf, X, Y, Z):
    """One 16^3 probe-grid evaluation for the bounds refinement.

    jit caches on the expression's treedef + leaf shapes, so the 32
    refinement iterations (and repeat expressions of the same
    structure) share one compile."""
    vol = sdf(Points(X[:, None, None], Y[None, :, None], Z[None, None, :]))
    return jnp.broadcast_to(vol, (X.shape[0], Y.shape[0], Z.shape[0]))


def _estimate_bounds_host(sdf, dtype):
    """The reference's bounds refinement (ref sdf/core.py:62-82): 32
    iterations of a 16^3 probe grid, ALL loop arithmetic in host
    float64, the SDF evaluations on the LOCAL CPU backend in ``dtype``.

    CPU evaluation (not the default accelerator) because the probe is
    tiny (4096 points x <=32 sequential iterations) and each iteration
    needs its mask on the host before the next grid exists: on a
    tunneled TPU runtime 32 round trips cost ~2.8 s cold, on local CPU
    ~10 ms -- and bounds become machine-independent (the same box on a
    CPU-only CI node and a TPU pod), which the 1e-4 slack below makes
    robust to the remaining eval-noise ties.

    The loop state (box corners, cell step, threshold) must be float64:
    an earlier all-on-device ``lax.while_loop`` version carried it in
    the eval dtype, and at float32 the accumulated state rounding
    shifted which probe points tie against the threshold -- the
    refinement then converged to a *different* (asymmetric, backend-
    dependent) box: (-0.795, 0.902) vs the reference's (-0.845, 0.845)
    on the canonical example model, an 8% triangle-count swing at the
    same ``samples``.  With f64 host state the trajectory is identical
    on every backend (verified CPU vs TPU per-iteration) and equals the
    reference's bit-for-bit when the evaluation dtype is float64.

    The eval-dtype slack keeps mask decisions stable against the
    ~1e-7-relative cross-backend eval noise: probe points land exactly
    on |d| == threshold for axis-aligned models, and the 1e-4 offset
    moves the cutoff off that structural tie.  Zero at float64 so CPU
    bounds match the reference exactly (tests/test_periphery.py).
    """
    s = 16
    real = jax.dtypes.canonicalize_dtype(jnp.dtype(dtype))
    slack = 0.0 if real.itemsize >= 8 else 1e-4
    lo = np.full(3, -1e9)
    hi = np.full(3, 1e9)
    prev = None
    empty = True
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        # cast() inside the scope so parameter leaves stay uncommitted
        # CPU arrays (a committed-to-TPU leaf would drag the probe back
        # onto the accelerator).
        sdf_c = cast(sdf, dtype)
        for _ in range(32):
            X = np.linspace(lo[0], hi[0], s)
            Y = np.linspace(lo[1], hi[1], s)
            Z = np.linspace(lo[2], hi[2], s)
            d = np.array([X[1] - X[0], Y[1] - Y[0], Z[1] - Z[0]])
            threshold = np.linalg.norm(d) / 2
            if threshold == prev:
                break
            prev = threshold
            vol = np.asarray(
                _bounds_probe_jit(
                    sdf_c,
                    jnp.asarray(X, dtype),
                    jnp.asarray(Y, dtype),
                    jnp.asarray(Z, dtype),
                ),
                dtype=np.float64,
            )
            where = np.argwhere(np.abs(vol) <= threshold * (1 + slack))
            if len(where) == 0:
                break
            empty = False
            hi = lo + where.max(axis=0) * d + d / 2
            lo = lo + where.min(axis=0) * d - d / 2
    return lo, hi, empty


_BOUNDS_MEMO = {}
_EMPTY = np.empty(0)


def _estimate_bounds(sdf, dtype=jnp.float32):
    """Probe-grid bounds estimation (ref sdf/core.py:62-82): device
    evals, float64 host refinement (see _estimate_bounds_host).

    The refinement loop is deterministic in the expression (structure,
    parameter leaves, AND closure statics -- the same fingerprint the
    checkpoint machinery uses), so repeat ``generate()`` calls on an
    unchanged model reuse the memoized result instead of paying the up
    to 32 small device round trips every time.  ``.k()`` tags and
    parameter edits change the fingerprint and re-probe.
    """
    from ..utils import checkpoint as ckpt

    try:
        key = (
            ckpt.fingerprint(sdf, _EMPTY, _EMPTY, _EMPTY, "bounds"),
            str(jnp.dtype(dtype)),
        )
    except Exception:
        key = None  # unhashable exotic closure: just re-estimate
    if key is not None and key in _BOUNDS_MEMO:
        return _BOUNDS_MEMO[key]
    lo, hi, empty = _estimate_bounds_host(sdf, dtype)
    if empty:
        raise ValueError(
            "bounds estimation failed (no surface found); pass bounds= explicitly"
        )
    out = (tuple(lo.tolist()), tuple(hi.tolist()))
    if key is not None:
        if len(_BOUNDS_MEMO) > 256:
            _BOUNDS_MEMO.clear()
        _BOUNDS_MEMO[key] = out
    return out


def _tile_slices(n, size):
    """Tile start indices and (lo, hi) sample index per tile (ref core.py:115)."""
    starts = list(range(0, n, size))
    return [(i, min(i + size, n - 1)) for i in starts]


def _skip_probes(X, Y, Z, batch_size):
    """Probe points for the reference's per-batch ``_skip`` test: center
    + 8 corners per tile (ref sdf/core.py:28-43).  Returns
    ``(probes (nt * 9, 3) float64, radii (nt,), (tx, ty, tz))``."""
    txs = _tile_slices(len(X), batch_size)
    tys = _tile_slices(len(Y), batch_size)
    tzs = _tile_slices(len(Z), batch_size)

    probes = []
    radii = []
    for lox, hix in txs:
        for loy, hiy in tys:
            for loz, hiz in tzs:
                x0, x1 = X[lox], X[hix]
                y0, y1 = Y[loy], Y[hiy]
                z0, z1 = Z[loz], Z[hiz]
                cx, cy, cz = (x0 + x1) / 2, (y0 + y1) / 2, (z0 + z1) / 2
                radii.append(np.linalg.norm([cx - x0, cy - y0, cz - z0]))
                probes.append(
                    [
                        (cx, cy, cz),
                        (x0, y0, z0),
                        (x0, y0, z1),
                        (x0, y1, z0),
                        (x0, y1, z1),
                        (x1, y0, z0),
                        (x1, y0, z1),
                        (x1, y1, z0),
                        (x1, y1, z1),
                    ]
                )
    probes = np.array(probes, dtype=np.float64).reshape(-1, 3)
    return probes, np.array(radii), (len(txs), len(tys), len(tzs))


def _skip_mask(sdf_c, X, Y, Z, batch_size, dtype):
    """Vectorized reproduction of the reference's per-batch ``_skip`` test.

    For every tile: evaluate the center point; if |d| exceeds the distance
    from center to the tile's min corner AND the 8 tile corners all have the
    same sign as corner 0, the tile is skipped (ref sdf/core.py:28-43).
    Returns a (tx, ty, tz) bool array, True = skip.
    """
    probes, radii, tshape = _skip_probes(X, Y, Z, batch_size)
    values = _eval_numpy(sdf_c, probes, dtype).reshape(-1, 9)
    center = np.abs(values[:, 0])
    corners = values[:, 1:]
    # Slight slack keeps borderline float32 comparisons conservative
    # (skipping less rather than more).
    far = center > radii * (1 + 1e-4)
    first_pos = corners[:, 0] > 0
    same = np.where(
        first_pos, np.all(corners > 0, axis=1), np.all(corners < 0, axis=1)
    )
    return (far & same).reshape(tshape)


@jax.jit
def _skip_probe_jit(sdf, probes, thresh):
    """Device-resident ``_skip`` test: same probes and formula as
    ``_skip_mask`` with the comparisons in the evaluation dtype (the host
    version widens to float64 first -- a <= 1-ulp borderline difference
    on the ``far`` test; the cull stays conservative either way).
    Returns a flat (nt,) bool mask, True = skip."""
    values = sdf(probes).reshape(-1, 9)
    center = jnp.abs(values[:, 0])
    corners = values[:, 1:]
    far = center > thresh
    first_pos = corners[:, 0] > 0
    same = jnp.where(
        first_pos,
        jnp.all(corners > 0, axis=1),
        jnp.all(corners < 0, axis=1),
    )
    return far & same


def _skip_mask_device(sdf_c, X, Y, Z, batch_size, dtype):
    """Dispatch the probe-cull test on device WITHOUT syncing: returns
    ``(mask (nt,) bool device array, (tx, ty, tz))`` so the fetch can
    ride the dense pipeline's one counts round trip (see generate())."""
    probes, radii, tshape = _skip_probes(X, Y, Z, batch_size)
    m = _skip_probe_jit(
        cast(sdf_c, dtype),
        jnp.asarray(probes, dtype=dtype),
        jnp.asarray(radii * (1 + 1e-4), dtype=dtype),
    )
    return m, tshape


# Box triangulation used for debug markers: 36 corner ids (12 triangles)
# over corners ordered product((x0,x1),(y0,y1),(z0,z1)); same winding as
# the reference's debug boxes (ref sdf/core.py:166-200).
_DEBUG_BOX_IDX = np.array(
    [3, 5, 7, 5, 3, 1, 0, 6, 4, 6, 0, 2, 0, 5, 1, 5, 0, 4,
     5, 6, 7, 6, 5, 4, 6, 3, 7, 3, 6, 2, 0, 3, 2, 3, 0, 1]
)


def _debug_triangles(X, Y, Z, tiles, batch_size, inset=0.25):
    """Inset marker boxes for a list of (i, j, k) tile indices.

    The reference's visual debugging affordance for skipped/empty batches
    (ref sdf/core.py:49,57,166-200, comment-toggled there; exposed here as
    ``generate(..., debug=True)``): each flagged batch contributes a box
    shrunk ``inset`` into its extent, so holes in a mesh can be attributed
    to culled vs surface-free batches by eye.  Returns (36 * ntiles, 3).
    """
    tiles = np.asarray(tiles).reshape(-1, 3)
    if len(tiles) == 0:
        return np.zeros((0, 3), dtype=np.float64)
    s = batch_size
    axes = []
    for coords, t in zip((X, Y, Z), tiles.T):
        lo = coords[t * s]
        hi = coords[np.minimum(t * s + s, len(coords) - 1)]
        span = (hi - lo) * inset
        axes.append((lo + span, hi - span))  # (2-tuple of (ntiles,))
    corner_id = np.arange(8)
    corners = np.stack(
        [
            np.where((corner_id >> (2 - a)) & 1, axes[a][1][:, None], axes[a][0][:, None])
            for a in range(3)
        ],
        axis=-1,
    )  # (ntiles, 8, 3)
    return corners[:, _DEBUG_BOX_IDX, :].reshape(-1, 3).astype(np.float64)


# User-facing mc_variant spellings -> internal table-bundle names.  The
# fixed separated-ambiguity rule was the out-of-the-box default through
# round 3 under the name "default"; it is now the explicit fast opt-in
# ("fast"), with the reference-parity "lewiner" rule the default.
_MC_VARIANT_ALIASES = {"fast": "default"}


def generate(
    sdf,
    step=None,
    bounds=None,
    samples=SAMPLES,
    workers=WORKERS,
    batch_size=BATCH_SIZE,
    verbose=True,
    sparse=True,
    dtype=None,
    mesh=None,
    checkpoint=None,
    use_pallas=None,
    debug=False,
    output="points",
    mc_variant="lewiner",
):
    """Sample the SDF on a dense grid and mesh it (ref sdf/core.py:84-150).

    Returns a flat (3*T, 3) float64 array of world-space vertices, three
    consecutive rows per triangle.  ``output="mesh"`` instead returns the
    INDEXED mesh ``(verts (V, 3) float64, faces (T, 3) int32)`` the
    device emitted: one vertex per unique crossing edge, every vertex
    referenced, no host dedup pass -- the soup equals
    ``verts[faces.reshape(-1)]`` bit-for-bit.  On multi-device meshes
    and the tiled path, vertices on shard/tile boundary planes stay
    duplicated (once per side); ``debug=True`` marker boxes are
    soup-only, so that combination dedups the soup on the host.
    ``workers`` is accepted for
    compatibility; parallelism is the device mesh, not a thread pool:
    pass ``mesh=`` (a 1D ``jax.sharding.Mesh``) to shard the grid over
    devices, or leave it None to auto-shard when >1 device is visible.
    ``checkpoint=`` names a file that persists the result keyed on a
    fingerprint of the run configuration; a matching re-run resumes from
    it instead of recomputing (see sdf_tpu.utils.checkpoint).
    ``use_pallas=`` selects the fused Pallas eval+classify kernel
    (sdf_tpu.core.pallas_eval): None = on TPU with XLA fallback,
    True = required (interpreted on CPU), False = XLA only.
    ``sparse=`` accepts the reference's True/False plus "tiles", which
    additionally restricts *evaluation* to non-culled tiles (the
    reference skips evaluating culled batches too; the dense device path
    trades that for one fused pass).  With ``sparse=True`` the engine
    picks automatically: when the probe cull removes more than
    ``AUTO_TILES_THRESHOLD`` of the batches, evaluation switches to the
    tiled path so culled volumes are never evaluated densely (matching
    the reference's skip semantics, ref sdf/core.py:45-48); triangle
    *order* then follows the reference's batch-then-cell order instead
    of the dense path's global cell order (same triangle set).
    ``debug=True`` appends an inset marker box for every skipped or empty
    batch (the reference's comment-toggled ``_debug_triangles`` debugging
    affordance, ref sdf/core.py:49,57,166-200).
    ``mc_variant=`` selects the marching-cubes topology rule:
    "lewiner" (the default) = trilinear-faithful ambiguity resolution
    (face-saddle + interior tests), matching the decision procedure of
    skimage's Lewiner mesher, the reference's mesher (ref
    sdf/core.py:16-18) -- so unmodified reference scripts reproduce the
    reference's topology out of the box; "fast" = the repo's fixed
    separated-ambiguity tables, a cheaper explicit opt-in that skips the
    per-cell saddle/interior classification (~6 ms at a 2^22 grid,
    PERF.md) and deviates from the reference on ambiguous faces with a
    negative saddle.  "default" is accepted as a legacy alias of
    "fast".  See docs/TOPOLOGY.md.
    """
    start = time.time()
    dtype = dtype or jnp.float32
    stats = {}
    mc_variant = _MC_VARIANT_ALIASES.get(mc_variant, mc_variant)
    mc.get_tables(mc_variant)  # validate the name / load tables eagerly
    if output not in ("points", "mesh"):
        raise ValueError("output must be 'points' or 'mesh', got %r" % output)
    if output == "mesh" and checkpoint is not None:
        raise ValueError("output='mesh' does not support checkpoint=")
    # Every mesh path emits native indexed output; debug boxes are
    # soup-only, so that combination dedups the soup instead.
    want_indexed = output == "mesh" and not debug

    if workers is not None:
        import warnings

        warnings.warn(
            "generate(workers=...) has no effect: parallelism is the "
            "device mesh (pass mesh=), not a thread pool",
            stacklevel=2,
        )

    if mesh is None and len(jax.devices()) > 1:
        from ..parallel import grid as pgrid

        mesh = pgrid.make_mesh()

    if bounds is None:
        with _phase("bounds", stats):
            bounds = _estimate_bounds(sdf, dtype)
    (x0, y0, z0), (x1, y1, z1) = bounds

    if step is None and samples is not None:
        volume = (x1 - x0) * (y1 - y0) * (z1 - z0)
        step = (volume / samples) ** (1 / 3)

    try:
        dx, dy, dz = step
    except TypeError:
        dx = dy = dz = step

    if verbose:
        print("min %g, %g, %g" % (x0, y0, z0))
        print("max %g, %g, %g" % (x1, y1, z1))
        print("step %g, %g, %g" % (dx, dy, dz))

    X = np.arange(x0, x1, dx)
    Y = np.arange(y0, y1, dy)
    Z = np.arange(z0, z1, dz)

    s = batch_size
    num_batches = (-(-len(X) // s)) * (-(-len(Y) // s)) * (-(-len(Z) // s))
    lens = lambda n: [min(n - i, s + 1) for i in range(0, n, s)]
    num_samples = sum(
        lx * ly * lz for lx in lens(len(X)) for ly in lens(len(Y)) for lz in lens(len(Z))
    )

    if verbose:
        print(
            "%d samples in %d batches with %d devices"
            % (num_samples, num_batches, len(jax.devices()))
        )

    bar = progress.Bar(num_batches, enabled=verbose)

    if len(X) < 2 or len(Y) < 2 or len(Z) < 2:
        bar.done()
        if output == "mesh":
            return (
                np.zeros((0, 3), dtype=np.float64),
                np.zeros((0, 3), dtype=np.int32),
            )
        return np.zeros((0, 3), dtype=np.float64)

    sdf_c = cast(sdf, dtype)

    fp = None
    if checkpoint is not None:
        from ..utils import checkpoint as ckpt

        # batch_size changes the cull granularity (different triangle
        # set for inexact SDFs) and debug= changes the returned points:
        # both must invalidate a cached mesh.
        fp = ckpt.fingerprint(
            sdf, X, Y, Z,
            (sparse, jnp.dtype(dtype).str, s, bool(debug))
            + ((mc_variant,) if mc_variant != "default" else ()),
        )
        cached = ckpt.load(checkpoint, fp)
        if cached is not None:
            bar.done()
            if verbose:
                print("resumed %d triangles from %s" % (len(cached) // 3, checkpoint))
            return cached

    # Single-device sparse=True runs SPECULATIVELY: the probe-cull test
    # is dispatched to the device but not fetched, the dense pipeline is
    # dispatched behind it using the device-resident mask, and the mask
    # comes back WITH the counts in one round trip (a scalar sync costs
    # ~40 ms on a tunneled runtime).  If the fetched cull fraction then
    # routes to the tiled path, the dense eval's device time (a few ms
    # at 2^22) is discarded -- cheap insurance relative to the saved
    # round trip on every dense run.
    speculate = mesh is None and sparse is True
    skip = None
    if not speculate:
        with _phase("skip_mask", stats):
            if sparse:
                from ..utils import checkpoint as ckpt_mod

                try:
                    skey = ckpt_mod.fingerprint(
                        sdf, X, Y, Z, ("skip", jnp.dtype(dtype).str, s)
                    )
                except Exception:
                    skey = None
                skip = _SKIP_MEMO.get(skey) if skey is not None else None
                if skip is None:
                    skip = _skip_mask(sdf_c, X, Y, Z, s, dtype)
                    if skey is not None:
                        if len(_SKIP_MEMO) > 256:
                            _SKIP_MEMO.clear()
                        _SKIP_MEMO[skey] = skip
            else:
                skip = np.zeros(
                    (-(-len(X) // s), -(-len(Y) // s), -(-len(Z) // s)),
                    dtype=bool,
                )
        bar.update(num_batches * 0.1)

    # Auto-sparsity: the reference never evaluates culled batches
    # (ref sdf/core.py:45-48); the dense device path instead evaluates
    # everything and masks cells -- a good trade only when little is
    # culled.  When the probe cull removes most of the volume, route
    # sparse=True to the tiled path, which evaluates only surviving
    # tiles (work scales with surface area, not volume).  Opt out with
    # sparse=False (dense) or pass sparse="tiles" to force tiles.  (The
    # speculative path applies the same rule after its combined fetch.)
    if skip is not None and sparse is True and skip.mean() >= AUTO_TILES_THRESHOLD:
        sparse = "tiles"
        stats["auto_tiles"] = round(float(skip.mean()), 4)

    def _tiles_path(skip):
        # Tiled sparse pipeline: evaluate only the tiles the probe cull
        # kept (SURVEY.md section 7 step 4); work scales with surface
        # area instead of grid volume.  On TPU, gather-free expressions
        # race the lane-major batched Pallas eval+classify kernel (128
        # tiles on the vector lanes) against XLA's chunked tile eval
        # once per scale and keep the measured winner (PERF.md);
        # gather-bearing expressions use the per-tile hybrid kernel
        # only when use_pallas=True.
        from . import sparse as sparse_mod
        from ..utils import checkpoint as ckpt_mod

        try:
            # Uncast expression: host leaves hash without device round
            # trips; the dtype is folded into the extras.
            mkey = ckpt_mod.fingerprint(
                sdf, X, Y, Z,
                ("tiles-counts", jnp.dtype(dtype).str, s)
                + ((mc_variant,) if mc_variant != "default" else ()),
            )
        except Exception:
            mkey = None
        with _phase("sparse_tiles", stats):
            # use_pallas passes through: None = auto (the lane-major
            # batched kernel on TPU where the tree fits VMEM, XLA
            # otherwise -- memoized; see sparse._eval_tiles_auto),
            # True = required, False = XLA.
            return sparse_mod.mesh_sparse_tiles(
                sdf_c, X, Y, Z, skip, s, dtype,
                use_pallas=use_pallas,
                interpret=(jax.default_backend() != "tpu"),
                return_indexed=True, memo_key=mkey, variant=mc_variant,
                stats=stats,
            )

    # mc33_conflicted_cells stat: counted on the dense (default) path
    # only; the tiles/sharded paths classify per-tile inside their own
    # jits and leave it None (key absent from LAST_STATS).
    confl = None
    if mesh is not None and mesh.devices.size > 1:
        if sparse == "tiles":
            # Active-tile-list sharding: load-balanced for sparse models.
            from ..parallel import sparse as psparse

            with _phase("sparse_tiles_sharded", stats):
                verts, per_tile = psparse.mesh_sparse_tiles_sharded(
                    sdf_c, X, Y, Z, skip, s, mesh, dtype,
                    return_indexed=True, variant=mc_variant,
                )
        else:
            from ..parallel import grid as pgrid

            backend = jax.default_backend()
            want_pallas = use_pallas
            if want_pallas is None:
                want_pallas = "auto" if backend == "tpu" else False
            key = _pallas_key(sdf_c, dtype, (len(X), len(Y)))
            with _phase("mesh_and_march", stats):
                if want_pallas and (
                    use_pallas is True or key not in _PALLAS_BROKEN
                ):
                    try:
                        verts, per_tile = pgrid.mesh_and_march(
                            sdf_c, X, Y, Z, skip, s, mesh, dtype,
                            use_pallas=True, interpret=(backend != "tpu"),
                            return_indexed=True, variant=mc_variant,
                        )
                    except Exception:
                        # use_pallas=True means REQUIRED: surface failures.
                        if use_pallas is True:
                            raise
                        if len(_PALLAS_BROKEN) > 256:
                            _PALLAS_BROKEN.clear()
                        _PALLAS_BROKEN.add(key)
                        verts, per_tile = pgrid.mesh_and_march(
                            sdf_c, X, Y, Z, skip, s, mesh, dtype,
                            return_indexed=True, variant=mc_variant,
                        )
                else:
                    verts, per_tile = pgrid.mesh_and_march(
                        sdf_c, X, Y, Z, skip, s, mesh, dtype,
                        return_indexed=True, variant=mc_variant,
                    )
        indexed = verts
        bar.update(num_batches * 0.8)
    elif sparse == "tiles":
        indexed, per_tile = _tiles_path(skip)
        bar.update(num_batches * 0.8)
    else:
        if speculate:
            with _phase("skip_dispatch", stats):
                skip_dev, skip_tshape = _skip_mask_device(
                    sdf_c, X, Y, Z, s, dtype
                )
        backend = jax.default_backend()
        if use_pallas is None:
            use_pallas = "auto" if backend == "tpu" else False
        _t_dev0 = time.perf_counter()  # device-pipeline start (PROFILE)
        vol = case = None
        if use_pallas:
            from . import pallas_eval

            # Successful compiles are cached by jit, but FAILED compiles
            # are retried on every call (each costing a full compile
            # round trip); remember failures per expression *structure*
            # (closure statics included), dtype and xy extent -- stable
            # across rebuilds of the same model.  The z extent is in the
            # RACE key (below) because the measured kernel-vs-XLA winner
            # is scale-dependent.
            key = _pallas_key(sdf_c, dtype, (len(X), len(Y)))
            rkey = (key, len(Z))
            lost_race = use_pallas is not True and _DENSE_RACE.get(rkey) is False
            if (use_pallas is True or key not in _PALLAS_BROKEN) and (
                not lost_race
            ):
                try:
                    with _phase("pallas_eval", stats):
                        vol, case = pallas_eval.eval_and_classify(
                            sdf_c, X, Y, Z, dtype, interpret=(backend != "tpu")
                        )
                except Exception:
                    # Expression not Mosaic-vectorizable (gathers etc.):
                    # fall back to the XLA path unless Pallas was required.
                    if use_pallas is True:
                        raise
                    if len(_PALLAS_BROKEN) > 256:
                        _PALLAS_BROKEN.clear()
                    _PALLAS_BROKEN.add(key)
                    vol = case = None
            if (
                vol is not None
                and use_pallas is not True
                and backend == "tpu"
                and rkey not in _DENSE_RACE
            ):
                # First use at this scale: race the fused kernel against
                # XLA eval + classify, interleaved (the only stable A/B
                # protocol on a drifting runtime -- see PERF.md round 4;
                # measured: the fused kernel ties XLA at 2^22 and LOSES
                # ~1.2x on wide trees at 2^26).  Costs a few extra
                # volume evals once per (expression, dtype, grid).
                from . import sparse as sparse_mod

                def _pal():
                    return pallas_eval.eval_and_classify(
                        sdf_c, X, Y, Z, dtype
                    )[0]

                def _xla():
                    # _cell_cases is itself jitted (re-wrapping would
                    # compile a second executable per race).
                    return mc._cell_cases(
                        _eval_volume(sdf_c, X, Y, Z, dtype)
                    )

                try:
                    jax.block_until_ready(_xla())
                    t = sparse_mod._race(
                        [("pallas", _pal), ("xla", _xla)]
                    )
                    won = t["pallas"] <= t["xla"]
                except Exception:
                    won = True  # measurement failed: keep the kernel
                if len(_DENSE_RACE) > 256:
                    _DENSE_RACE.clear()
                _DENSE_RACE[rkey] = won
                if not won:
                    # The discarded kernel's phase time would otherwise
                    # double-count evaluation next to eval_volume in
                    # LAST_STATS on this one deciding run; and the
                    # reused race eval must still appear as an
                    # eval_volume phase (its dispatch was re-issued by
                    # the race loop -- record a fresh dispatch so the
                    # stats shape matches every later run).
                    if "pallas_eval" in stats:
                        stats["pallas_eval_lost_race"] = stats.pop(
                            "pallas_eval"
                        )
                    with _phase("eval_volume", stats):
                        vol = _eval_volume(sdf_c, X, Y, Z, dtype)
                    case = None
        if vol is None:
            with _phase("eval_volume", stats):
                vol = _eval_volume(sdf_c, X, Y, Z, dtype)
        bar.update(num_batches * 0.6)

        cshape = (len(X) - 1, len(Y) - 1, len(Z) - 1)
        skip3d = (
            skip_dev.reshape(skip_tshape) if speculate else jnp.asarray(skip)
        )
        keep = _expand_tile_mask(~skip3d, s, cshape)

        # Two dispatches, ONE tiny host sync (a scalar round trip costs
        # ~40 ms through a tunneled runtime): count everything (cells,
        # triangles, edges, per-tile stats) in one program, fetch the
        # four counts together -- plus the speculative skip mask, riding
        # the same round trip -- then compact + emit in a second program
        # whose output sizes are already known; the emitted triangle
        # count equals the fetched total, so the d2h slice needs no
        # further sync.
        tshape = tuple(-(-c // s) for c in cshape)
        pallas_evaled = case is not None
        if pallas_evaled and mc_variant != "default":
            # Extend the fused kernel's 8-bit codes with the variant's
            # saddle/interior bits (reusing them instead of re-deriving
            # corner signs from the volume).
            from . import mc33

            case = mc33.classify_ext(vol, base_case=case)
            pallas_evaled = "vol"
        with _phase("mc_count", stats):
            if case is None:
                case = mc.get_tables(mc_variant).classify(vol)
            ncells_dev, total, n_edges, per_tile, active, emask = (
                mc.count_indexed(vol, case, keep, s, tshape, mc_variant)
            )
        confl_dev = None
        if mc_variant == "lewiner":
            # Observability for the majority-voted table entries: count
            # kept cells whose ext code has conflict_rate > 0 (one table
            # gather, fetched on the counts round trip below).
            from . import mc33

            confl_dev = mc33.count_conflicted(case, keep)
        # Counts are DETERMINISTIC in (expression, grid, dtype, cull
        # mode): a repeat generate() of an unchanged model reuses the
        # memoized counts, dispatches emit immediately, and lets the
        # stats (skip mask, per-tile counters) arrive asynchronously
        # during the mesh transfer -- removing the last pre-transfer
        # sync round trip (~40 ms on a tunneled runtime).
        from ..utils import checkpoint as ckpt_mod

        try:
            # The UNCAST expression: its leaves live on the host, so
            # hashing needs no device transfers (the dtype is in the
            # extras tuple, which is all cast() changes).  The cull mask
            # must be part of the key: sparse=False and sparse=True
            # produce different keep masks (and therefore counts) for
            # inexact SDFs, and both can reach here with speculate=False
            # (e.g. via a single-device mesh=).  Speculative runs derive
            # the mask deterministically from the expression, which the
            # fingerprint already covers.
            skip_tag = (
                None
                if speculate
                else hashlib.sha256(
                    np.ascontiguousarray(skip).tobytes()
                ).hexdigest()
            )
            # Mosaic and XLA can differ by 1 ulp on values near zero,
            # flipping cell cases and counts, so the eval path (fused
            # Pallas kernel vs XLA) is part of the key (the tiles memo
            # does the same).
            ckey = ckpt_mod.fingerprint(
                sdf, X, Y, Z,
                ("counts", jnp.dtype(dtype).str, s, bool(speculate),
                 skip_tag, pallas_evaled)
                + ((mc_variant,) if mc_variant != "default" else ()),
            )
        except Exception:
            ckey = None
        cached = _COUNTS_MEMO.get(ckey) if ckey is not None else None
        routed = False
        if cached is not None:
            # The not-yet-fetched stats (skip mask, per-tile counters)
            # ride the mesh transfer below in the same device_get --
            # copy_to_host_async is NOT used (it wedges the axon
            # runtime's transfer path for minutes).
            n_cells, n, ne, confl = cached
        else:
            extra = () if confl_dev is None else (confl_dev,)
            if speculate:
                got = jax.device_get(
                    (skip3d, ncells_dev, total, n_edges, per_tile) + extra
                )
                skip, n_cells, n, ne, per_tile = got[:5]
            else:
                got = jax.device_get(
                    (ncells_dev, total, n_edges, per_tile) + extra
                )
                n_cells, n, ne, per_tile = got[:4]
            confl = int(got[-1]) if extra else None
            n_cells, n, ne = int(n_cells), int(n), int(ne)
            routed = speculate and skip.mean() >= AUTO_TILES_THRESHOLD
            if not routed and ckey is not None:
                if len(_COUNTS_MEMO) > 256:
                    _COUNTS_MEMO.clear()
                _COUNTS_MEMO[ckey] = (n_cells, n, ne, confl)
        bar.update(num_batches * 0.8)

        if routed:
            # The cull removed most of the volume: discard the dense
            # eval (a few ms of device time) and run the tiled path.
            sparse = "tiles"
            stats["auto_tiles"] = round(float(skip.mean()), 4)
            indexed, per_tile = _tiles_path(skip)
        elif n_cells == 0:
            if skip is None:  # memoized-counts speculative run
                skip = np.asarray(skip3d)
            indexed = (
                np.zeros((0, 3), dtype=np.float64),
                np.zeros((0, 3), dtype=np.int32),
            )
            per_tile = np.zeros(skip.shape, dtype=np.int64)
        else:
            # Indexed emit: the device produces one vertex per unique
            # crossing EDGE plus int32 faces, halving the device-to-host
            # bytes vs the triangle soup (12 B/vertex + 12 B/tri vs
            # 36 B/tri at ~2 triangles per vertex); the soup the caller
            # sees is reconstructed below, bit-identical (see
            # mc.emit_indexed).
            cell_capacity = mc.round_capacity(n_cells)
            capacity = mc.round_capacity(n)
            edge_capacity = mc.round_capacity(ne)
            # Packed wire format (8 B/vertex + 8 B/triangle instead of
            # 12 + 12; see mc.emit_indexed_packed) whenever the volume
            # is float32; decode on the host is bit-identical.
            packed = False
            if jnp.dtype(dtype) == jnp.float32:
                packed = True if ne < (1 << mc.FACE_PACK_BITS) else "wide"
            with _phase("mc_emit", stats):
                everts, faces = mc.gather_emit_indexed(
                    vol, case, active, emask, edge_capacity, capacity,
                    cell_capacity, packed=packed, variant=mc_variant,
                )
            if PROFILE:
                # Tiny fenced read so the d2h phase below measures
                # TRANSFER, not residual device work (block_until_ready
                # does not reliably fence through a tunneled runtime).
                np.asarray(faces[:1, :1])
                stats["device"] = round(time.perf_counter() - _t_dev0, 4)
            with _phase("d2h", stats):
                if cached is not None:
                    # One RPC for the mesh AND the pending stats.
                    parts = [everts[:, :ne], faces[:, :n], per_tile]
                    if skip is None:
                        parts.append(skip3d)
                    got = jax.device_get(tuple(parts))
                    eh, fh, per_tile = got[0], got[1], got[2]
                    if skip is None:
                        skip = got[3]
                else:
                    # One batched RPC (a separate np.asarray per array
                    # costs a ~40 ms round trip each on a tunnel).
                    eh, fh = jax.device_get(
                        (everts[:, :ne], faces[:, :n])
                    )
                if PROFILE:
                    stats["d2h_bytes"] = int(eh.nbytes + fh.nbytes)
            with _phase("decode", stats):
                # host-side wire-format decode; bench.py pins its cost
                # (it bounds what any transfer optimization can earn)
                if packed is not False:
                    indexed = mc.unpack_indexed(eh, fh, vol.shape)
                else:
                    vh = eh.astype(np.float64).T  # (ne, 3)
                    indexed = (vh, fh.T)

    scale = np.array([dx, dy, dz])
    offset = np.array([X[0], Y[0], Z[0]])
    # Scale the (small) unique-vertex table once, THEN reconstruct the
    # soup if asked for: the same float ops per element as scaling the
    # soup, so bit-identical output at ~1/6 the host arithmetic.
    mverts = indexed[0] * scale + offset
    mfaces = indexed[1]
    points = None if want_indexed else mverts[mfaces.reshape(-1)]
    bar.done()

    if checkpoint is not None:
        from ..utils import checkpoint as ckpt

        ckpt.save(checkpoint, fp, points)

    # per_tile is sized on cell tiles, which can be one short of the
    # sample-tile grid when an axis has a degenerate 1-sample last tile.
    pt = np.zeros(skip.shape, dtype=np.int64)
    a, b, c = np.asarray(per_tile).shape
    pt[:a, :b, :c] = np.asarray(per_tile)[
        : skip.shape[0], : skip.shape[1], : skip.shape[2]
    ]
    skipped = int(skip.sum())
    nonempty = int(((pt > 0) & ~skip).sum())
    empty = num_batches - skipped - nonempty

    if debug:
        flagged = np.argwhere(skip | (pt == 0))
        points = np.concatenate(
            [points, _debug_triangles(X, Y, Z, flagged, s)], axis=0
        )
    triangles = len(mfaces) if points is None else len(points) // 3
    seconds = time.time() - start
    stats.update(
        batches=num_batches,
        samples=num_samples,
        skipped=skipped,
        empty=empty,
        nonempty=nonempty,
        triangles=triangles,
        total=round(seconds, 4),
    )
    if confl is not None:
        stats["mc33_conflicted_cells"] = confl
    LAST_STATS.clear()
    LAST_STATS.update(stats)
    if verbose:
        print("%d skipped, %d empty, %d nonempty" % (skipped, empty, nonempty))
        if confl:
            print(
                "%d cells hit majority-voted MC33 table entries "
                "(docs/TOPOLOGY.md section 4.2)" % confl
            )
        print("%d triangles in %g seconds" % (triangles, seconds))

    if output == "mesh":
        if points is not None:  # debug boxes are soup-only: dedup on host
            from ..io import meshfmt

            return meshfmt.dedup(points)
        return mverts, mfaces
    return points


def generate_mesh(sdf, *args, **kwargs):
    """``generate`` returning an indexed mesh: ``(verts (V, 3) float64
    world-space, faces (T, 3) int32)``.

    The device's own indexed output on every path (one vertex per unique
    crossing edge, every vertex referenced, no host dedup -- at a 2^26
    grid that skips an np.unique over tens of millions of soup rows);
    shard/tile boundary vertices are duplicated once per side.  The
    equivalent soup is ``verts[faces.reshape(-1)]``.
    """
    return generate(sdf, *args, output="mesh", **kwargs)


def save(path, sdf, *args, **kwargs):
    points = generate(sdf, *args, **kwargs)
    if path.lower().endswith(".stl"):
        stl.write_binary_stl(path, points)
    else:
        from ..io import meshfmt

        meshfmt.write_mesh(path, points)
    return points


@jax.jit
def _slice_eval(sdf, coords):
    # One fused SoA evaluation over the (w, 1) x (1, h) broadcast plane;
    # no (N, 3) point array is ever materialized.
    return jnp.broadcast_to(
        sdf(Points(*coords)), jnp.broadcast_shapes(*[c.shape for c in coords])
    )


def sample_slice(sdf, w=1024, h=1024, x=None, y=None, z=None, bounds=None, dtype=None):
    """Sample one axis-aligned plane of the field for debugging.

    Exactly one of x/y/z fixes the plane; the two free axes carry w and h
    samples (ascending axis order).  Returns ``(a, extent, axes)`` with
    ``a[i, j]`` the distance at (first_free[i], second_free[j]),
    ``extent``/``axes`` ready for ``imshow`` -- the same contract as the
    reference's slice sampler (ref sdf/core.py:202-232), evaluated here
    as a single fused device pass instead of a cartesian-product batch.
    """
    dtype = dtype or jnp.float32
    if bounds is None:
        bounds = _estimate_bounds(sdf, dtype)
    lo, hi = bounds

    fixed = {0: x, 1: y, 2: z}
    chosen = [a for a, v in fixed.items() if v is not None]
    if len(chosen) != 1:
        raise Exception("x, y, or z position must be specified")
    axis = chosen[0]
    free = [a for a in range(3) if a != axis]

    spans = {
        a: np.linspace(lo[a], hi[a], n) for a, n in zip(free, (w, h))
    }
    coords = [None] * 3
    coords[axis] = jnp.asarray(fixed[axis], dtype=dtype).reshape(1, 1)
    coords[free[0]] = jnp.asarray(spans[free[0]], dtype=dtype)[:, None]
    coords[free[1]] = jnp.asarray(spans[free[1]], dtype=dtype)[None, :]

    a = np.asarray(_slice_eval(cast(sdf, dtype), tuple(coords)), dtype=np.float64)
    s1, s2 = spans[free[0]], spans[free[1]]
    extent = (s2[0], s2[-1], s1[0], s1[-1])
    axes = "XYZ"[free[1]] + "XYZ"[free[0]]
    return a, extent, axes


def show_slice(*args, **kwargs):
    """Plot a slice via matplotlib (lazy import, ref sdf/core.py:234-244)."""
    import matplotlib.pyplot as plt

    show_abs = kwargs.pop("abs", False)
    a, extent, axes = sample_slice(*args, **kwargs)
    im = plt.imshow(
        np.abs(a) if show_abs else a, extent=extent, origin="lower"
    )
    plt.xlabel(axes[0])
    plt.ylabel(axes[1])
    plt.colorbar(im)
    plt.show()
