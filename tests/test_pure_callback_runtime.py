"""Prove (or gate) the tier-3 legacy-closure claim on the DEFAULT backend.

``core/node.py`` tier 3 adapts verbatim reference closures (bare numpy
``f(points) -> distances`` functions, ref README.md:258-285) through
``jax.pure_callback``.  STATUS.md documents that this works on standard
runtimes but cannot run on the tunneled axon TPU runtime (axon_pjrt lacks
host callbacks).  The rest of the suite forces CPU (conftest), so this
spawns a subprocess WITHOUT the CPU forcing and asserts the documented
behavior on whatever the machine's default backend is:

  * standard runtime (cpu, regular tpu/gpu): tier 3 must WORK;
  * axon (tunneled TPU): either it works (claim obsolete -> fail loudly so
    the doc gets updated) or it fails -- the documented limitation.
"""

import os
import subprocess
import sys

import pytest

WORKER = r'''
import os, sys
sys.path.insert(0, os.getcwd())  # Popen cwd = repo root
import numpy as np
import jax
backend = jax.default_backend()
try:
    # The axon (tunneled-TPU) plugin reports default_backend() == "tpu";
    # its platform_version identifies it.
    from jax._src import xla_bridge
    if "axon" in getattr(xla_bridge.get_backend(), "platform_version", ""):
        backend = "axon"
except Exception:
    pass

def legacy(p):
    # verbatim reference-style closure: pure numpy over an (N, 3) array;
    # np.asarray forces the host tier (tracers cannot materialize).
    a = np.asarray(p, dtype=np.float64)
    return np.linalg.norm(a, axis=1) - 1.0

import sdf_tpu
f = sdf_tpu.sdf3(lambda: legacy)()
try:
    pts = sdf_tpu.generate(
        f, samples=2**12, verbose=False, bounds=((-1.2,) * 3, (1.2,) * 3)
    )
    pts = np.asarray(pts)
    assert pts.shape[0] > 0 and pts.shape[0] % 3 == 0
    r = np.linalg.norm(pts, axis=1)
    assert abs(r.max() - 1.0) < 0.1, r.max()
    print(f"RESULT OK {backend}")
except Exception as e:
    print(f"RESULT FAIL {backend} {type(e).__name__}")
'''


def test_tier3_closure_on_default_backend(tmp_path):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the default backend register
    env.pop("XLA_FLAGS", None)
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    try:
        out = subprocess.run(
            [sys.executable, str(worker)],
            capture_output=True, text=True, timeout=600,
            cwd=os.path.join(os.path.dirname(__file__), ".."), env=env,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("default-backend subprocess timed out (tunnel stall)")
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    assert lines, f"no RESULT line\nstdout:{out.stdout}\nstderr:{out.stderr[-2000:]}"
    _, status, backend = lines[0].split()[:3]
    if backend == "axon":
        # The tunneled runtime: the documented limitation is that host
        # callbacks cannot run.  If this ever starts passing, the claim in
        # STATUS.md / node.py is stale -- surface that.
        assert status == "FAIL", (
            "tier-3 pure_callback now WORKS on axon; update STATUS.md "
            "and core/node.py docs"
        )
    else:
        assert status == "OK", (
            f"tier-3 legacy closure failed on standard backend {backend}:\n"
            f"{out.stdout}\n{out.stderr[-2000:]}"
        )
