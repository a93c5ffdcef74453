"""REAL multi-host test: two jax.distributed processes on CPU.

The TPU analog of "multi-node without a cluster" (SURVEY.md section 4):
two subprocesses bring up jax.distributed over a local coordinator, each
with 4 virtual CPU devices, build one global 8-device mesh, run the
sharded generate (each host computes + reads back only its addressable
z-slabs), all-gather the triangle soups bit-exactly, and process 0
writes the STL.  The parent asserts the result matches a single-process
run.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import sdf_tpu
from sdf_tpu.io import stl

WORKER = r'''
import os, sys
proc_id = int(sys.argv[1])
out_path = sys.argv[2]
port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # match conftest: real f64 math
sys.path.insert(0, os.getcwd())  # Popen cwd = repo root
from sdf_tpu import parallel
idx, cnt = parallel.initialize(
    coordinator_address="localhost:" + port, num_processes=2,
    process_id=proc_id,
)
assert cnt == 2 and len(jax.devices()) == 8 and len(jax.local_devices()) == 4
import jax.numpy as jnp
import sdf_tpu
from sdf_tpu.parallel import grid as pgrid
f = sdf_tpu.sphere(1)
pts_local = sdf_tpu.generate(
    f, samples=2**14, verbose=False, mesh=pgrid.make_mesh(),
    dtype=jnp.float64, bounds=((-1.1,) * 3, (1.1,) * 3),
)
full = parallel.gather_triangles(pts_local)
if proc_id == 0:
    import numpy as np
    np.save(out_path + ".npy", full)  # raw f64 soup for bit-exact compare
parallel.write_on_process0(out_path, full)
'''


@pytest.mark.skipif(
    os.environ.get("SDF_TPU_SKIP_MULTIHOST") == "1",
    reason="multihost test disabled",
)
def test_two_process_distributed_generate(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    out = str(tmp_path / "mh.stl")
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), out, "9741"],
            env=env,
            cwd=os.path.join(os.path.dirname(__file__), ".."),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    import jax
    import jax.numpy as jnp
    from sdf_tpu.parallel import grid as pgrid

    # Same 8-device partitioning as the two workers' global mesh, so the
    # float64 math is identical and the comparison can be BIT-exact --
    # proving the uint32-bit-pattern all-gather loses nothing.
    expect = sdf_tpu.generate(
        sdf_tpu.sphere(1), samples=2**14, verbose=False,
        dtype=jnp.float64, bounds=((-1.1,) * 3, (1.1,) * 3),
        mesh=pgrid.make_mesh(jax.devices()),
    )
    got = np.load(out + ".npy")
    assert got.dtype == np.float64 and got.shape == expect.shape

    def soup(points):  # canonicalize: sort triangles, NO rounding
        tris = np.asarray(points).reshape(-1, 9)
        return tris[np.lexsort(tris.T[::-1])]

    assert np.array_equal(soup(got), soup(expect))  # bit-exact
    v, tris = stl.read_binary_stl(out)
    assert len(tris) == len(expect) // 3
