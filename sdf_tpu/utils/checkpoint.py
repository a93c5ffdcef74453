"""Checkpoint / resume for grid generation.

The reference is all-or-nothing: output is written only at the end
(ref sdf/core.py:152-158) and an interrupted run loses everything.  Here
``generate(..., checkpoint=path)`` persists the triangle soup together
with a fingerprint of the run configuration (grid + expression
parameters); a re-run with an identical configuration loads the result
instead of recomputing, and multi-host launches can point each process at
its own shard file and assemble afterwards with ``merge``.
"""

from __future__ import annotations

import hashlib
import os
import re

import jax
import numpy as np


def fingerprint(sdf, X, Y, Z, sparse):
    """Stable hash of the run configuration: grid + expression pytree."""
    h = hashlib.sha256()

    def feed(a):
        a = np.ascontiguousarray(np.asarray(a))
        # Shape/dtype prefix: raw byte concatenation is boundary-blind
        # (X=[0,1,2],Y=[3,4] would collide with X=[0,1],Y=[2,3,4]).
        h.update(repr((a.shape, a.dtype.str)).encode())
        h.update(a.tobytes())

    for a in (X, Y, Z):
        feed(a)
    h.update(repr(sparse).encode())  # True/False/"tiles" differ (order!)
    leaves, treedef = jax.tree_util.tree_flatten(sdf)
    # repr(treedef) embeds closure memory addresses ("... at 0x7f...")
    # which change every process -- strip them so checkpoints survive
    # restarts (function qualnames remain and identify the structure).
    h.update(re.sub(r"0x[0-9a-f]+", "", repr(treedef)).encode())
    for leaf in leaves:
        feed(leaf)
    return h.hexdigest()


def load(path, fp):
    """Return the checkpointed points if ``path`` matches fingerprint ``fp``."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            if str(z["fingerprint"]) != fp:
                return None
            return z["points"]
    except Exception:
        return None


def save(path, fp, points):
    # numpy appends .npz unless the name already ends with it
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, fingerprint=fp, points=points)
    os.replace(tmp, path)


def merge(paths):
    """Concatenate per-shard checkpoint files into one triangle soup."""
    parts = []
    for p in paths:
        with np.load(p) as z:
            parts.append(z["points"])
    return np.concatenate(parts, axis=0)
