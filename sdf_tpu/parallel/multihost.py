"""Multi-host runtime: process bring-up and cross-host triangle assembly.

The reference's only "backend" is a single-process ThreadPool
(ref sdf/core.py:2,131).  On a TPU pod slice, each host drives its local
devices; this module wraps the jax.distributed runtime so a multi-host
``generate`` run works like the single-host one:

  * ``initialize()`` -- one call per process, BEFORE any other jax use
    (reads cluster env when launched under a standard TPU runtime).
  * z-slabs are assigned per *global* device by sdf_tpu.parallel.grid;
    each host computes only its local slabs and reads back only its
    addressable shards; collectives ride ICI within a slice and DCN
    across slices, inserted by XLA from the shard_map specs.
  * ``gather_triangles(local)`` -- variable-length, bit-exact all-gather
    of each host's compacted float64 triangle soup, so process 0 can
    write the mesh (``write_on_process0``).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def initialize(**kwargs):
    """Bring up the jax.distributed runtime (call before other jax use).

    jax.distributed.initialize must run before the XLA backend is
    created; importing sdf_tpu does not touch the backend, but any
    jax.devices()/jit call does.  Raises instead of silently proceeding
    single-process when bring-up cannot happen.
    """
    import jax._src.xla_bridge as xb

    # NB: xb.backends() would itself initialize the backend; peek at the
    # private already-initialized dict instead.
    already = getattr(xb, "_backends", {})
    if kwargs:
        if already:
            raise RuntimeError(
                "sdf_tpu.parallel.initialize(...) must be called before the "
                "JAX backend initializes (before any jax.devices()/jit use)"
            )
        jax.distributed.initialize(**kwargs)
    else:
        # Env-driven bring-up (TPU pod runtimes set the cluster env).
        # Only the "no cluster environment detected" outcome (jax's
        # coordinator_address ValueError before any connection attempt)
        # is a harmless single-process no-op; every other failure --
        # connection refused / timeout on a misconfigured pod -- must
        # raise rather than silently proceeding single-host.
        if already:
            # Too late for env-driven bring-up (jax raises uncondition-
            # ally).  Harmless single-process no-op UNLESS a coordinator
            # is explicitly configured, which means the caller expected
            # a multi-process run.
            if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
                "COORDINATOR_ADDRESS"
            ):
                raise RuntimeError(
                    "a cluster coordinator is configured in the "
                    "environment but the JAX backend already initialized; "
                    "call sdf_tpu.parallel.initialize() before any other "
                    "jax use"
                )
        else:
            try:
                jax.distributed.initialize()
            except ValueError as e:
                if "coordinator_address" not in str(e):
                    raise
    return jax.process_index(), jax.process_count()


def gather_triangles(local_points):
    """All-gather per-host triangle soups -> full (3T, 3) float64 array.

    local_points: this host's (3t_i, 3) float64 vertex soup.  Hosts may
    hold different counts; rows are padded to the max count for the
    fixed-shape collective and trimmed after.  Vertices travel as raw
    float64 bit patterns (viewed as uint32 pairs -- TPU arrays cannot
    hold float64), so the gathered soup is bit-exact.
    """
    from jax.experimental import multihost_utils

    local_points = np.ascontiguousarray(local_points, dtype=np.float64)
    if jax.process_count() == 1:
        return local_points

    counts = multihost_utils.process_allgather(
        np.asarray([local_points.shape[0]], dtype=np.int64)
    ).reshape(-1)
    cap = int(counts.max())
    bits = np.zeros((cap, 6), dtype=np.uint32)
    if local_points.size:
        bits[: local_points.shape[0]] = local_points.view(np.uint32).reshape(
            -1, 6
        )
    gathered = multihost_utils.process_allgather(bits)  # (nproc, cap, 6)
    parts = [
        gathered[i, : counts[i]].view(np.float64).reshape(-1, 3)
        for i in range(gathered.shape[0])
    ]
    return np.concatenate(parts, axis=0)


def write_on_process0(path, points):
    """Write the gathered mesh from process 0 only; barrier afterwards."""
    from jax.experimental import multihost_utils

    if jax.process_index() == 0:
        from ..io import stl
        from ..io import meshfmt

        if path.lower().endswith(".stl"):
            stl.write_binary_stl(path, points)
        else:
            meshfmt.write_mesh(path, points)
    if jax.process_count() > 1:
        multihost_utils.sync_global_devices("sdf_tpu_write_mesh")
