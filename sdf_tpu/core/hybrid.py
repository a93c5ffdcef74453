"""Hybrid XLA-gather / Pallas-math split for the fused kernel.

Mosaic (Pallas TPU) cannot lower the gather-shaped ops some SDF nodes
need -- texture bilinear fetches (ops/textures.py), mesh-grid trilinear
fetches (ops/meshsdf.py), polygon's rolled edge loop (dynamic_slice), and
host-callback legacy closures (core/node._wrap_legacy).  Rather than
falling the WHOLE expression back to XLA (round 1 behavior), the
expression tree is split:

  1. ``to_recording_tree``: every maximal gather-bearing subtree is
     wrapped so that evaluating the full tree under XLA *records* the
     subtree's output field.  Because the recording happens in place in
     the original tree, each occurrence is evaluated at its true,
     ancestor-transformed query points (a texture under ``twist`` sees
     twisted coordinates).  XLA dead-code-eliminates all the non-gather
     math above the recorded nodes, so the pre-pass costs only the
     gather subtrees plus the point-transform path that feeds them.
  2. ``to_pallas_tree``: the same subtrees are replaced by placeholders
     that, inside the Pallas kernel, pop the pre-computed block of their
     field from a kernel-scoped queue.  Everything else (the closed-form
     CSG majority of a typical model) evaluates fused in VMEM exactly as
     before, including the marching-cubes classification.

Correspondence between recorded fields and placeholder pops relies on
both traces executing the identical tree structure with identical
non-gather code, so child calls happen in the same deterministic order;
a queue (not slot ids) therefore pairs them, which also handles parents
that evaluate one child several times (e.g. circular_array's two copies:
two recordings, two pops).  A gather node under a ``lax`` loop ancestor
would leak tracers out of the loop scope during recording; that raises
at trace time and the engine falls back to the plain XLA path, as in
round 1.

Reference behavior being covered: sdf/text.py:132-153 (bilinear fetch),
sdf/mesh.py:96-105 (trilinear fetch), sdf/d2.py polygon, README.md
custom-closure SDFs -- all previously XLA-only.
"""

from __future__ import annotations

import contextvars
from collections import deque
from functools import partial

import jax
import jax.numpy as jnp

from .node import Points, _Node

# Trace-time side channels.  _TAPE collects recorded gather fields while
# XLA traces the recording tree; _KVOLS holds the queue of pre-computed
# blocks while the Pallas kernel body traces the placeholder tree.
_TAPE = contextvars.ContextVar("sdf_tpu_gather_tape", default=None)
_KVOLS = contextvars.ContextVar("sdf_tpu_kernel_vols", default=None)


def mark_gather(fn):
    """Tag an SDF eval fn as needing gathers Mosaic cannot lower."""
    fn.pallas_needs_gather = True
    return fn


def needs_gather(fn):
    return getattr(fn, "pallas_needs_gather", False)


def count_gathers(node):
    """Number of gather-bearing subtree occurrences in an expression."""
    if not isinstance(node, _Node):
        return 0
    if needs_gather(node.fn):
        return 1
    total = 0
    for leaf in jax.tree_util.tree_leaves(
        node.params, is_leaf=lambda x: isinstance(x, _Node)
    ):
        if isinstance(leaf, _Node):
            total += count_gathers(leaf)
    return total


def _map_children(node, f):
    new_params = jax.tree_util.tree_map(
        lambda x: f(x) if isinstance(x, _Node) else x,
        node.params,
        is_leaf=lambda x: isinstance(x, _Node),
    )
    out = type(node)(node.fn, new_params)
    out._k = node._k
    return out


def _placeholder_fn(q, p):
    vols = _KVOLS.get()
    if vols is None:
        raise RuntimeError(
            "gather placeholder evaluated outside a hybrid Pallas kernel"
        )
    return vols.popleft()


def to_pallas_tree(node):
    """Copy of the expression with gather subtrees replaced by pops."""
    if not isinstance(node, _Node):
        return node
    if needs_gather(node.fn):
        ph = type(node)(_placeholder_fn, ())
        ph._k = node._k
        return ph
    return _map_children(node, to_pallas_tree)


# Wrapper identity must be stable across calls so jit treedef caching
# works (treedefs compare fns by identity).
_REC_WRAP = {}


def _rec_wrapper(fn):
    if fn not in _REC_WRAP:
        # Capped like the engine memos: every model construction makes
        # fresh fn closures, so an unbounded map would pin one wrapper
        # (and the texture/mesh data its closure reaches) per rebuild
        # in a long-lived process.  Clearing only costs a retrace.
        if len(_REC_WRAP) > 256:
            _REC_WRAP.clear()

        def rec(q, p, _fn=fn):
            d = _fn(q, p)
            _TAPE.get().append(d)
            return d

        _REC_WRAP[fn] = rec
    return _REC_WRAP[fn]


def to_recording_tree(node):
    """Copy of the expression whose gather subtrees record their output."""
    if not isinstance(node, _Node):
        return node
    if needs_gather(node.fn):
        rw = type(node)(_rec_wrapper(node.fn), node.params)
        rw._k = node._k
        return rw
    return _map_children(node, to_recording_tree)


@partial(jax.jit, static_argnames=("shape",))
def _record_eval(rec_tree, px, py, pz, shape):
    """Evaluate the recording tree; return the recorded gather fields.

    ``px/py/pz`` are broadcastable coordinate arrays (any rank); every
    recorded field is broadcast to ``shape``.  The root distance is
    discarded -- XLA prunes the non-gather math above the recordings.
    """
    tok = _TAPE.set([])
    try:
        rec_tree(Points(px, py, pz))
        return tuple(
            jnp.broadcast_to(v, shape) for v in _TAPE.get()
        )
    finally:
        _TAPE.reset(tok)


def record_dense_windows(rec_tree, X, Y, Zwin):
    """Gather fields for the dense kernel, pre-windowed per z block.

    Zwin: (nchunks, bz+1) overlapping z-coordinate windows (the same
    host-sliced windows the kernel's SMEM z vector is built from).
    Returns a tuple of (nchunks, bz+1, nx, ny) arrays; the one-row
    overlap is *recomputed* per block, the same recompute-over-copy
    choice as the kernel halo itself.
    """
    shape = (Zwin.shape[0], Zwin.shape[1], X.shape[0], Y.shape[0])
    return _record_eval(
        rec_tree,
        X[None, None, :, None],
        Y[None, None, None, :],
        Zwin[:, :, None, None],
        shape,
    )


def record_tile_windows(rec_tree, Xw, Yw, Zw):
    """Gather fields for the sparse-tiles kernel, one window per tile.

    Xw/Yw/Zw: (ntc, TS) per-tile coordinate windows.  Returns a tuple of
    (ntc, TS, TS, TS) arrays -- evaluation work scales with the active
    tile count, preserving the sparse path's surface-area scaling.
    """
    ntc, TS = Xw.shape
    return _record_eval(
        rec_tree,
        Xw[:, :, None, None],
        Yw[:, None, :, None],
        Zw[:, None, None, :],
        (ntc, TS, TS, TS),
    )


class kernel_vols:
    """Context manager exposing pre-computed blocks to placeholder pops."""

    def __init__(self, blocks):
        self._blocks = blocks
        self._tok = None

    def __enter__(self):
        self._tok = _KVOLS.set(deque(self._blocks))
        self._ktok = _IN_KERNEL.set(True)
        return self

    def __exit__(self, *exc):
        _KVOLS.reset(self._tok)
        _IN_KERNEL.reset(self._ktok)
        return False


_IN_KERNEL = contextvars.ContextVar("sdf_tpu_in_kernel", default=False)


class in_kernel:
    """Marks expression tracing as happening inside a Pallas kernel body,
    so ops pick Mosaic-lowerable formulations (vecmath.arctan2)."""

    def __enter__(self):
        self._tok = _IN_KERNEL.set(True)
        return self

    def __exit__(self, *exc):
        _IN_KERNEL.reset(self._tok)
        return False


def in_kernel_trace():
    return _IN_KERNEL.get()
