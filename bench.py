"""Headline benchmark: eval throughput + per-phase dense-pipeline times.

Headline metric (vs BASELINE.md): SDF grid-evaluation throughput on the
reference's examples/example.py model at samples=2**22 (the reference CPU
measures 4.7 M pts/s, 1 vCPU float64 numpy, sdf/core.py:45-60).

The single JSON line additionally reports the full warm dense pipeline,
each phase fenced with a tiny device-to-host read (block_until_ready does
not reliably fence through a tunneled TPU runtime, and per-call timings
otherwise measure dispatch):

  eval_ms / classify / count / gather_emit  -- device-side phases, for
                                               BOTH mc variants (the
                                               default "lewiner" adds
                                               the classify phase; the
                                               "fast" opt-in skips it)
  d2h_ms, d2h_mb                            -- indexed-mesh readback
                                               (unique verts + faces),
                                               reported separately
                                               (tunnel-bound here, PCIe
                                               on real hosts)
  e2e_ms                                    -- warm generate() wall time
                                               (the lewiner default)

Timing method: warm up (compile), then K back-to-back dispatches with one
tiny-slice sync at the end of each phase batch.  Every phase reports BOTH
the min and the median across rep batches.  ``dispatch_floor_ms`` is the
measured per-dispatch overhead of this runtime (~1.8-4 ms through the
tunnel, ~0.1 ms on a normal host); raw phase numbers INCLUDE it, the
``*_corrected`` eval fields subtract it to report device compute
(tools/roofline.py is the full accounting).

Weather normalization (round 5): raw wall-clock through the tunneled
runtime drifts 2-4x between driver sessions on identical code, so every
invocation also runs the session weather probes
(sdf_tpu/utils/weather.py: achievable mul-add GFLOP/s, sqrt Gop/s, HBM
copy GB/s) and reports NORMALIZED metrics -- ``eval_util_2p26``
(achieved GFLOP/s over the same-session mul-add rate) and
``emit_2p26_gbeq`` (phase time x same-session copy bandwidth).  Those
carry the hard regression bands in docs/PERF_QUOTES.json; raw
throughputs are informational, gated only against the absolute
BASELINE.md north star (tools/check_docs_perf.py enforces all of it
against the committed BENCH_r*.json artifacts).

The line also carries the north-star topology witness: the canonicalized
triangle-soup sha256 of examples/example.py at samples=2**24 for both
variants as computed BY THIS RUN (f32 on the bench device).  The
bit-exact committed pin lives in tests/test_topology_2p24.py (float64,
CPU, deterministic); the hash here witnesses that the driver artifact
exercised the north-star config end-to-end.

``python bench.py --mesh`` instead runs the multi-device weak-scaling
harness (SURVEY.md section 2.3, BASELINE.md >=85% target): for each mesh
size 1, 2, 4, ..., ndev it runs the sharded dense and sparse-tiles paths
with samples scaled proportionally to the device count (constant
per-device work) and reports per-size warm times plus weak-scaling
efficiency t1/tk.  With one visible chip it degrades to the 1-device
row and says so -- run it on a real multi-chip host to measure the
north-star.  (CI runs it on the 8-virtual-CPU-device topology to pin
the plumbing: tests/test_parallel.py::test_bench_mesh_harness.)
"""

import hashlib
import json
import statistics
import sys
import time

BASELINE_PTS_PER_S = 4.7e6  # BASELINE.md: reference CPU, example model, 2^22


def _fence(x):
    import numpy as np

    return np.asarray(x.ravel()[:1]) if hasattr(x, "ravel") else x


def _timed(f, *args, K=5, reps=3):
    """(min, median) seconds over ``reps`` batches of K amortized
    dispatches.

    The tunneled runtime's dispatch/transfer latency drifts 2-3x between
    sessions and within them; the minimum is the least contaminated
    estimate of device time, the median shows what a typical dispatch
    saw this session.
    """
    import jax

    r = f(*args)
    jax.block_until_ready(r)
    _fence(jax.tree_util.tree_leaves(r)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(K):
            r = f(*args)
        jax.block_until_ready(r)
        _fence(jax.tree_util.tree_leaves(r)[0])
        ts.append((time.perf_counter() - t0) / K)
    return min(ts), statistics.median(ts), r


def _soup_hash(pts):
    """sha256 of the canonicalized (rounded, lexsorted) triangle soup --
    same canonicalization as the committed topology pins."""
    import numpy as np

    tris = np.asarray(pts, np.float64).round(9).reshape(-1, 9)
    return hashlib.sha256(tris[np.lexsort(tris.T[::-1])].tobytes()).hexdigest()


def _example_grid(samples, dtype):
    import numpy as np

    from sdf_tpu.core import engine
    from sdf_tpu.models import example

    f = example()
    bounds = engine._estimate_bounds(f, dtype)
    (x0, y0, z0), (x1, y1, z1) = bounds
    volume = (x1 - x0) * (y1 - y0) * (z1 - z0)
    step = (volume / samples) ** (1 / 3)
    X = np.arange(x0, x1, step)
    Y = np.arange(y0, y1, step)
    Z = np.arange(z0, z1, step)
    return f, X, Y, Z, volume, bounds


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdf_tpu.core import engine, mc, mc33
    from sdf_tpu.core.node import cast
    from sdf_tpu.utils import weather

    dtype = jnp.float32
    f, X, Y, Z, volume, bounds = _example_grid(2**22, dtype)
    (x0, y0, z0), (x1, y1, z1) = bounds
    sdf_c = cast(f, dtype)
    n_points = len(X) * len(Y) * len(Z)
    s = engine.BATCH_SIZE

    # --- dispatch floor: a tiny jitted copy, amortized -------------------
    # Through the tunneled runtime every dispatch costs ~1.8-4 ms even
    # back-to-back (the dispatch stream feed rate), independent of data
    # size (tools/roofline.py).  Raw phase times below INCLUDE that
    # floor (conservative; what a user of this runtime actually sees);
    # the *_corrected fields subtract it to report device compute.
    t_floor = weather.dispatch_floor()

    # --- headline: eval throughput (amortized, one final fence) ----------
    t_eval, t_eval_med, vol = _timed(
        engine._eval_volume, sdf_c, X, Y, Z, dtype, K=40
    )
    pts_per_s = n_points / t_eval

    # --- per-phase dense pipeline (each fenced), BOTH variants -----------
    # Phases mirror generate()'s dense path: one counts dispatch (all
    # static buffer sizes in one scalar round trip), one fused
    # gather+emit dispatch producing the indexed mesh (unique per-edge
    # vertices + int32 faces; see mc.count_indexed / gather_emit_indexed).
    cshape = (len(X) - 1, len(Y) - 1, len(Z) - 1)
    keep = jnp.ones(cshape, dtype=bool)
    tshape = tuple(-(-c // s) for c in cshape)
    case8 = jax.block_until_ready(jax.jit(mc._cell_cases)(vol))
    # the lewiner default's extra step: extend 8-bit codes with the
    # face-saddle + interior bits (one fused XLA pass over the volume)
    t_cls, t_cls_med, ext = _timed(
        lambda v, c: mc33.classify_ext(v, base_case=c), vol, case8, K=40
    )
    phases = {}
    for name, case, variant in (("lew", ext, "lewiner"), ("fast", case8, "default")):
        t_cnt, t_cnt_med, (ncells_dev, total, n_edges, per_tile, active, emask) = _timed(
            lambda v, c, k, _var=variant: mc.count_indexed(
                v, c, k, s, tshape, _var
            ),
            vol, case, keep, K=40,
        )
        n_cells, n, ne = (int(v) for v in (ncells_dev, total, n_edges))
        ccap = mc.round_capacity(n_cells)
        cap = mc.round_capacity(n)
        ecap = mc.round_capacity(ne)
        packed = True if ne < (1 << mc.FACE_PACK_BITS) else "wide"
        t_emit, t_emit_med, (everts, faces) = _timed(
            lambda v, c, a, m, _var=variant: mc.gather_emit_indexed(
                v, c, a, m, ecap, cap, ccap, packed=packed, variant=_var
            ),
            vol, case, active, emask, K=40,
        )
        phases[name] = dict(
            cnt=t_cnt, cnt_med=t_cnt_med, emit=t_emit, emit_med=t_emit_med,
            n=n, ne=ne, everts=everts, faces=faces,
        )

    # --- mesh readback (packed wire format, best of 3) -------------------
    ph = phases["lew"]
    n, ne = ph["n"], ph["ne"]
    t_d2h = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        eh = np.asarray(ph["everts"][:, :ne])
        fh = np.asarray(ph["faces"][:, :n])
        t_d2h = min(t_d2h, time.perf_counter() - t0)
    mb = (eh.nbytes + fh.nbytes) / 1e6

    # --- warm end-to-end generate() (the lewiner default; best of 3) -----
    f.generate(samples=2**22, verbose=False)  # warm
    t_e2e = float("inf")
    e2es = []
    for _ in range(3):
        t0 = time.perf_counter()
        pts = f.generate(samples=2**22, verbose=False)
        e2es.append(time.perf_counter() - t0)
    t_e2e = min(e2es)
    # device-deterministic observability from the dense default path:
    # conflicted-table-cell count (docs/TOPOLOGY.md section 4.2) and the
    # host-side wire decode cost (round-4 verdict items 5 and 8).
    confl22 = engine.LAST_STATS.get("mc33_conflicted_cells")
    decode22_ms = round(engine.LAST_STATS.get("decode", 0.0) * 1e3, 2)

    # --- north-star topology witness: example @ 2^24, both variants ------
    soup24 = {}
    tris24 = {}
    confl24 = None
    for variant in ("lewiner", "fast"):
        p24 = f.generate(samples=2**24, verbose=False, mc_variant=variant)
        soup24[variant] = _soup_hash(p24)
        tris24[variant] = len(p24) // 3
        if variant == "lewiner":
            confl24 = engine.LAST_STATS.get("mc33_conflicted_cells")

    # --- ambiguity-rich certificate: the saddle (gyroid) model ----------
    # Every other at-scale witness (the 2^24 pins above, the example
    # goldens) is on a model where lewiner and fast produce bit-identical
    # soups, so a regression that silently collapsed the lewiner default
    # into the fast tables would pass them all.  The gyroid model has
    # thousands of ambiguous cells where the two variants make DIFFERENT
    # topology decisions; its per-variant triangle counts and soup hashes
    # are pinned (and pinned DISTINCT) in docs/PERF_QUOTES.json
    # (round-4 verdict item 3).
    from sdf_tpu.models.zoo import saddle

    sad = saddle()
    sad_soup = {}
    sad_tris = {}
    sad_confl = None
    for variant in ("lewiner", "fast"):
        sp = sad.generate(samples=2**22, verbose=False, mc_variant=variant)
        sad_soup[variant] = _soup_hash(sp)
        sad_tris[variant] = len(sp) // 3
        if variant == "lewiner":
            sad_confl = engine.LAST_STATS.get("mc33_conflicted_cells")

    # --- flagship scale: 2^26 (the docs' headline claims, regression-
    # guarded here so BENCH_r* carries every number PERF.md quotes) ------
    # (a) raw eval throughput on the example model at 2^26.
    step26 = (volume / 2**26) ** (1 / 3)
    X26 = np.arange(x0, x1, step26)
    Y26 = np.arange(y0, y1, step26)
    Z26 = np.arange(z0, z1, step26)
    n26 = len(X26) * len(Y26) * len(Z26)
    t_eval26, t_eval26_med, vol26 = _timed(
        engine._eval_volume, sdf_c, X26, Y26, Z26, dtype, K=8, reps=3
    )
    pts26_per_s = n26 / t_eval26

    # --- session weather index + the weather-NORMALIZED headline ---------
    # Raw throughput through this tunnel drifts 2-4x between driver
    # sessions (round-4: 0.32 G vs 0.76 G on identical code within the
    # hour), so the gated compute metric is utilization: achieved
    # GFLOP/s over the SAME-SESSION mul-add probe rate.  A genuine
    # kernel regression moves it; tunnel weather moves numerator and
    # denominator together.  Raw pts/s stays in the artifact as an
    # informational field gated only against the absolute BASELINE.md
    # north star (>10x the 4.7 M pts/s CPU reference).
    rates = weather.probe_rates(X26, Y26, Z26, floor=t_floor)
    t_eval26_c = max(t_eval26 - t_floor, 1e-9)
    eval_util26, tm_ratio26 = weather.eval_utilization(
        n26, t_eval26_c, rates
    )

    # --- 2^26 device pipeline phases (lewiner default) -------------------
    # The emit phase dominates device cost at scale (round-4: 191 ms vs
    # 11 ms eval); measure classify/count/emit at 2^26 every run so the
    # phase has a committed regression guard at the scale where it binds.
    case8_26 = jax.block_until_ready(jax.jit(mc._cell_cases)(vol26))
    t_cls26, _, ext26 = _timed(
        lambda v, c: mc33.classify_ext(v, base_case=c), vol26, case8_26,
        K=8, reps=3,
    )
    cshape26 = tuple(len(a) - 1 for a in (X26, Y26, Z26))
    keep26 = jnp.ones(cshape26, dtype=bool)
    tshape26 = tuple(-(-c // s) for c in cshape26)
    t_cnt26, _, (nc26, tot26, ned26, _pt26, act26, em26) = _timed(
        lambda v, c, k: mc.count_indexed(v, c, k, s, tshape26, "lewiner"),
        vol26, ext26, keep26, K=8, reps=3,
    )
    ncl26, ntr26, ne26 = (int(v) for v in (nc26, tot26, ned26))
    packed26 = True if ne26 < (1 << mc.FACE_PACK_BITS) else "wide"
    t_emit26, _, _out26 = _timed(
        lambda v, c, a, m: mc.gather_emit_indexed(
            v, c, a, m, mc.round_capacity(ne26), mc.round_capacity(ntr26),
            mc.round_capacity(ncl26), packed=packed26, variant="lewiner",
        ),
        vol26, ext26, act26, em26, K=8, reps=3,
    )
    del _out26, ext26, act26, em26, case8_26, vol26, keep26, _pt26

    # (b) warm end-to-end knurling at 2^26 (the workload suite's flagship
    # sparse-tiles config; exercises cull + tiled eval + indexed emit),
    # DECOMPOSED into device / d2h / decode so tunnel transfer weather
    # cannot masquerade as a device regression (round-4 verdict item 6).
    from sdf_tpu.core import sparse as sparse_mod
    from sdf_tpu.models.zoo import knurling

    k26 = knurling()
    k26.generate(samples=2**26, verbose=False)  # warm (compile + memos)
    t_knurl = float("inf")
    knurl_phases = {}
    sparse_mod.PROFILE = engine.PROFILE = True
    try:
        for _ in range(2):
            t0 = time.perf_counter()
            kpts = k26.generate(samples=2**26, verbose=False)
            el = time.perf_counter() - t0
            if el < t_knurl:
                t_knurl = el
                st = engine.LAST_STATS
                # generate() routes knurling dense (39% cull < the tiles
                # threshold) but the keys cover either route.
                knurl_phases = {
                    "device": st.get("device", st.get("tiles_device")),
                    "d2h": st.get("tiles_d2h", st.get("d2h")),
                    "d2h_bytes": st.get(
                        "tiles_d2h_bytes", st.get("d2h_bytes")
                    ),
                    "decode": st.get("tiles_decode", st.get("decode")),
                }
    finally:
        sparse_mod.PROFILE = engine.PROFILE = False
    kn_d2h_mb = (knurl_phases.get("d2h_bytes") or 0) / 1e6
    kn_d2h_s = knurl_phases.get("d2h") or float("nan")

    # --- headline eval, second window -----------------------------------
    # The first eval measurement runs minutes earlier, right after the
    # cold compiles; the tunnel's dispatch stream sometimes sits in a
    # congested state for one such window (observed: 16 ms/dispatch for
    # a phase that re-measured at 4.2 ms moments later).  Re-measure at
    # the end of the run and keep the better window so one transient
    # hole cannot set the session's headline.
    t_eval_b, t_eval_med_b, _ = _timed(
        engine._eval_volume, sdf_c, X, Y, Z, dtype, K=40
    )
    t_eval = min(t_eval, t_eval_b)
    t_eval_med = min(t_eval_med, t_eval_med_b)
    pts_per_s = n_points / t_eval

    lew, fast = phases["lew"], phases["fast"]
    print(
        json.dumps(
            {
                "metric": "sdf_eval_points_per_s_example_2p22",
                "value": pts_per_s,
                "unit": "points/s",
                "vs_baseline": pts_per_s / BASELINE_PTS_PER_S,
                "pts_per_s_median": round(n_points / t_eval_med),
                "eval_ms": round(t_eval * 1e3, 2),
                "eval_ms_med": round(t_eval_med * 1e3, 2),
                "lewiner_classify_ms": round(t_cls * 1e3, 2),
                "lewiner_classify_ms_med": round(t_cls_med * 1e3, 2),
                "count_ms": round(lew["cnt"] * 1e3, 2),
                "gather_emit_ms": round(lew["emit"] * 1e3, 2),
                "device_pipeline_ms": round(
                    (t_eval + t_cls + lew["cnt"] + lew["emit"]) * 1e3, 2
                ),
                "device_pipeline_ms_med": round(
                    (t_eval_med + t_cls_med + lew["cnt_med"] + lew["emit_med"])
                    * 1e3, 2
                ),
                "fast_count_ms": round(fast["cnt"] * 1e3, 2),
                "fast_gather_emit_ms": round(fast["emit"] * 1e3, 2),
                "fast_device_pipeline_ms": round(
                    (t_eval + fast["cnt"] + fast["emit"]) * 1e3, 2
                ),
                "d2h_ms": round(t_d2h * 1e3, 2),
                "d2h_mb": round(mb, 2),
                "e2e_ms": round(t_e2e * 1e3, 2),
                "e2e_ms_med": round(statistics.median(e2es) * 1e3, 2),
                "triangles": len(pts) // 3,
                "soup_sha256_2p24_lewiner": soup24["lewiner"],
                "soup_sha256_2p24_fast": soup24["fast"],
                "triangles_2p24": tris24["lewiner"],
                "triangles_2p24_fast": tris24["fast"],
                "dispatch_floor_ms": round(t_floor * 1e3, 2),
                "eval_pts_per_s_corrected": round(
                    n_points / max(t_eval - t_floor, 1e-9)
                ),
                "eval_2p26_pts_per_s": round(pts26_per_s),
                "eval_2p26_pts_per_s_med": round(n26 / t_eval26_med),
                "eval_2p26_pts_per_s_corrected": round(n26 / t_eval26_c),
                # session weather index (same-session probe rates; see
                # sdf_tpu/utils/weather.py + tools/roofline.py)
                "probe_muladd_gflops": round(rates["muladd_gflops"], 1),
                "probe_sqrt_gops": round(rates["sqrt_gops"], 2),
                "probe_copy_gbs": round(rates["copy_gbs"], 1),
                # weather-normalized compute headline: achieved GFLOP/s /
                # same-session mul-add probe rate (the gated metric)
                "eval_util_2p26": round(eval_util26, 3),
                "time_model_ratio_2p26": round(tm_ratio26, 3),
                # 2^26 device pipeline phases, lewiner default
                "lewiner_classify_2p26_ms": round(t_cls26 * 1e3, 2),
                "count_2p26_ms": round(t_cnt26 * 1e3, 2),
                "gather_emit_2p26_ms": round(t_emit26 * 1e3, 2),
                # weather-normalized emit guard: phase time x same-session
                # copy bandwidth = the "effective GB" the gather-bound
                # phase costs -- stable across sessions whose raw clocks
                # drift together (the gate bands this, not the raw ms)
                "emit_2p26_gbeq": round(t_emit26 * rates["copy_gbs"], 1),
                "triangles_2p26": ntr26,
                # flagship e2e, decomposed (device vs tunnel vs host)
                "knurling_2p26_e2e_s": round(t_knurl, 3),
                "knurling_2p26_device_s": knurl_phases.get("device"),
                "knurling_2p26_d2h_mb": round(kn_d2h_mb, 2),
                "knurling_2p26_d2h_mbs": round(kn_d2h_mb / kn_d2h_s, 1)
                if kn_d2h_s else None,
                "knurling_2p26_decode_ms": round(
                    (knurl_phases.get("decode") or 0) * 1e3, 1
                ),
                "knurling_2p26_triangles": len(kpts) // 3,
                # host wire-format decode @2^22 (bounds any transfer win)
                "decode_ms": decode22_ms,
                # majority-voted MC33 table-entry hits on the headline
                # models (docs/TOPOLOGY.md section 4.2; dense path only)
                "mc33_conflicted_cells_2p22": confl22,
                "mc33_conflicted_cells_2p24": confl24,
                # ambiguity-rich certificate (pinned DISTINCT per variant)
                "saddle_tris_2p22_lewiner": sad_tris["lewiner"],
                "saddle_tris_2p22_fast": sad_tris["fast"],
                "saddle_soup_2p22_lewiner": sad_soup["lewiner"],
                "saddle_soup_2p22_fast": sad_soup["fast"],
                "saddle_mc33_conflicted_cells": sad_confl,
            }
        )
    )


def mesh_main(base_samples=2**20, out=print):
    """Multi-device weak-scaling harness (``bench.py --mesh``).

    For each mesh size k in 1, 2, 4, ..., ndev: warm sharded dense and
    sparse-tiles runs of the example model at ``samples = base_samples *
    k`` (constant per-device work), reporting warm wall times and
    weak-scaling efficiency ``t1 / tk`` per path.  The >=85% BASELINE.md
    target applies to the efficiency columns when ndev > 1 on real
    chips; at 1 visible device this degrades to the k=1 row (noted in
    the output) so the command is ALWAYS runnable -- point it at a
    multi-chip host to measure the north star.
    """
    import jax
    import jax.numpy as jnp

    from sdf_tpu.models import example
    from sdf_tpu.parallel import grid as pgrid

    devs = jax.devices()
    sizes = [1]
    while sizes[-1] * 2 <= len(devs):
        sizes.append(sizes[-1] * 2)
    f = example()
    rows = []
    for k in sizes:
        mesh = pgrid.make_mesh(devs[:k])
        samples = base_samples * k
        row = {"devices": k, "samples": samples}
        for path, kw in (
            ("dense", dict(sparse=False)),
            ("tiles", dict(sparse="tiles")),
        ):
            kw = dict(
                samples=samples, verbose=False, mesh=mesh,
                dtype=jnp.float32, **kw
            )
            f.generate(**kw)  # warm (compile + memos)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                pts = f.generate(**kw)
                best = min(best, time.perf_counter() - t0)
            row[f"{path}_s"] = round(best, 4)
            row[f"{path}_triangles"] = len(pts) // 3
        rows.append(row)
    for row in rows:
        for path in ("dense", "tiles"):
            row[f"{path}_weak_eff"] = round(
                rows[0][f"{path}_s"] / row[f"{path}_s"], 4
            )
    # Session weather index (same probes as the headline bench) so the
    # efficiency columns can be read against this session's achievable
    # rates -- a slow-tunnel session shows up here, not as a phantom
    # scaling regression.
    import numpy as np

    from sdf_tpu.utils import weather

    ax = np.linspace(-1.0, 1.0, 128, dtype=np.float32)
    rates = weather.probe_rates(ax, ax, ax)
    result = {
        "metric": "mesh_weak_scaling",
        "unit": "efficiency (t1/tk, weak scaling)",
        "value": rows[-1]["dense_weak_eff"],
        "vs_baseline": rows[-1]["dense_weak_eff"] / 0.85,  # >=1 meets target
        "visible_devices": len(devs),
        "platform": jax.default_backend(),
        "weather": {k: round(float(v), 4) for k, v in rates.items()},
        "rows": rows,
    }
    if len(devs) == 1:
        result["note"] = (
            "single visible device: efficiency is trivially 1.0; run on a "
            "multi-chip host to measure the >=85% north-star"
        )
    elif jax.default_backend() == "cpu":
        result["note"] = (
            "virtual CPU devices share one physical CPU: weak-scaling "
            "efficiency is NOT meaningful here (total work grows with k on "
            "fixed silicon); this artifact certifies harness plumbing + "
            "cross-k triangle counts only.  Run on a multi-chip TPU host "
            "for the >=85% north-star."
        )
    out(json.dumps(result))
    return result


if __name__ == "__main__":
    if "--cpu8" in sys.argv[1:]:
        # Correctness-plumbing-only topology: 8 virtual CPU devices.  The
        # axon TPU plugin wins over JAX_PLATFORMS alone; the config update
        # is what sticks (same recipe as tests/conftest.py).
        import os

        _flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in _flags:
            os.environ["XLA_FLAGS"] = (
                _flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    if "--mesh" in sys.argv[1:]:
        # The virtual-CPU topology is for plumbing only; keep per-device
        # work small enough that all mesh sizes finish in minutes.
        mesh_main(base_samples=2**17 if "--cpu8" in sys.argv[1:] else 2**20)
    else:
        main()
