"""Multi-host runtime: process bring-up and cross-host triangle assembly.

The reference's only "backend" is a single-process ThreadPool
(ref sdf/core.py:2,131).  On a TPU pod slice, each host drives its local
devices; this module wraps the jax.distributed runtime so a multi-host
``generate`` run works like the single-host one:

  * ``initialize()`` -- one call per process (reads cluster env when
    launched under a standard TPU runtime).
  * z-slabs are assigned per *global* device by sdf_tpu.parallel.grid, so
    each host computes only its local slabs; collectives ride ICI within
    a slice and DCN across slices, inserted by XLA from the shard_map
    specs.
  * ``gather_triangles(local)`` -- variable-length all-gather of each
    host's compacted triangle soup (counts via process_allgather, then a
    padded gather), so process 0 can write the STL
    (``write_on_process0``).
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(**kwargs):
    """Bring up the jax.distributed runtime (no-op if single process)."""
    if jax.process_count() > 1 or kwargs:
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError:
            pass  # already initialized
    return jax.process_index(), jax.process_count()


def gather_triangles(local_points):
    """All-gather per-host triangle soups -> full (3T, 3) float64 array.

    local_points: this host's (3t_i, 3) vertex soup.  Hosts may hold
    different counts; rows are padded to the max count for the fixed-shape
    collective and trimmed after.
    """
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return np.asarray(local_points, dtype=np.float64)

    local_points = np.asarray(local_points, dtype=np.float32)
    counts = multihost_utils.process_allgather(
        np.asarray([local_points.shape[0]], dtype=np.int64)
    ).reshape(-1)
    cap = int(counts.max())
    padded = np.zeros((cap, 3), dtype=np.float32)
    padded[: local_points.shape[0]] = local_points
    gathered = multihost_utils.process_allgather(padded)  # (nproc, cap, 3)
    parts = [gathered[i, : counts[i]] for i in range(gathered.shape[0])]
    return np.concatenate(parts, axis=0).astype(np.float64)


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
