"""Host-side assembly of per-device indexed meshes.

Both sharded pipelines (z-slab ``parallel.grid`` and active-tile
``parallel.sparse``) emit the same per-device layout -- ``everts
(ndev, 3, edge_capacity)`` unique per-edge vertices, ``faces (ndev, 3,
capacity)`` shard-local int32 vertex indices, plus per-device valid
counts -- and read back only this host's ADDRESSABLE shards (on a pod
slice the other hosts' slabs are not locally fetchable; assemble across
hosts with ``parallel.gather_triangles``).  Each shard transfers the
indexed mesh (a fraction of the soup bytes); its soup is reconstructed
here bit-identically to the single-device emit.
"""

from __future__ import annotations

import numpy as np


def _shard_scalar(arr):
    """Per-device scalars keyed by shard start index (addressable only)."""
    out = {}
    for s in arr.addressable_shards:
        out[s.index[0].start or 0] = int(np.asarray(s.data)[0])
    return out


def assemble_indexed(everts, faces, counts, nedges, return_indexed):
    """Trim + concatenate this host's shards of an indexed emit.

    Returns ``(verts (V, 3) float64, faces (T, 3) int32)`` with
    shard-local vertex indices rebased onto the concatenation when
    ``return_indexed``; otherwise the reconstructed ``(3T, 3)`` float64
    triangle soup, shard-major in device order.
    """
    cnt = _shard_scalar(counts)
    nedge = _shard_scalar(nedges)
    vparts = {}
    for s in everts.addressable_shards:
        i = s.index[0].start or 0
        v = np.asarray(s.data, dtype=np.float64)[0]  # (3, edge_capacity)
        vparts[i] = v[:, : nedge[i]].T  # (ne_i, 3)
    order = sorted(
        faces.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    fparts = {}
    for s in order:
        i = s.index[0].start or 0
        fparts[i] = np.asarray(s.data)[0][:, : cnt[i]].T  # (n_i, 3) int32
    keys = [s.index[0].start or 0 for s in order]
    if return_indexed:
        offs = np.cumsum([0] + [len(vparts[i]) for i in keys[:-1]])
        everts_h = (
            np.concatenate([vparts[i] for i in keys], axis=0)
            if keys else np.zeros((0, 3), np.float64)
        )
        faces_h = (
            np.concatenate(
                [fparts[i] + o for i, o in zip(keys, offs)], axis=0
            ).astype(np.int32)
            if keys else np.zeros((0, 3), np.int32)
        )
        return everts_h, faces_h
    parts = [vparts[i][fparts[i].reshape(-1)] for i in keys]
    return (
        np.concatenate(parts, axis=0)
        if parts
        else np.zeros((0, 3), dtype=np.float64)
    )
