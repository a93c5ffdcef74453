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
import types

import jax
import numpy as np


def _feed_array(h, a):
    a = np.ascontiguousarray(np.asarray(a))
    # Shape/dtype prefix: raw byte concatenation is boundary-blind
    # (X=[0,1,2],Y=[3,4] would collide with X=[0,1],Y=[2,3,4]).
    h.update(repr((a.shape, a.dtype.str)).encode())
    h.update(a.tobytes())


def _feed_static(h, obj, seen):
    """Hash a *static* Python object reachable from an expression.

    Statics live outside the pytree: values captured in op closures
    (circular_array's angle step, repeat's padding stencil, an easing
    function passed as a shape argument).  Two expressions that differ
    only in such a capture produce different fingerprints.  Cycles and
    shared objects are broken with an id-memo; the memo marker itself is
    fed so aliasing structure stays part of the hash.
    """
    i = id(obj)
    if i in seen:
        # Positional marker: WHICH previously-seen object this aliases
        # matters (two models may share different objects at the same
        # spot; interned small ints make bare "<cyc>" collide).
        h.update(b"<cyc:%d>" % seen[i])
        return
    if isinstance(obj, types.FunctionType):
        seen[i] = len(seen)
        code = obj.__code__
        h.update(code.co_code)
        # co_names carries referenced globals/attributes: `abs(p.x)-1`
        # and `abs(p.y)-1` compile to identical co_code and differ only
        # here, so omitting it collides their fingerprints.
        h.update(repr(code.co_names).encode())
        for const in code.co_consts:
            _feed_static(h, const, seen)
        for cell in obj.__closure__ or ():
            try:
                _feed_static(h, cell.cell_contents, seen)
            except ValueError:  # empty cell
                h.update(b"<empty>")
        for v in (obj.__defaults__ or ()):
            _feed_static(h, v, seen)
        return
    if isinstance(obj, types.CodeType):  # nested lambdas in co_consts
        seen[i] = len(seen)
        h.update(obj.co_code)
        h.update(repr(obj.co_names).encode())
        for const in obj.co_consts:
            _feed_static(h, const, seen)
        return
    if isinstance(obj, (np.ndarray, np.generic)) or hasattr(obj, "__jax_array__") or type(obj).__module__.startswith("jax"):
        try:
            _feed_array(h, obj)
            return
        except Exception:
            pass
    if isinstance(obj, (int, float, complex, bool, str, bytes, type(None))):
        h.update(repr(obj).encode())
        return
    if isinstance(obj, (tuple, list)):
        seen[i] = len(seen)
        h.update(b"<seq>")
        for v in obj:
            _feed_static(h, v, seen)
        return
    if isinstance(obj, dict):
        seen[i] = len(seen)
        h.update(b"<map>")
        for k in obj:
            h.update(repr(k).encode())
            _feed_static(h, obj[k], seen)
        return
    # SDF nodes captured inside closures (legacy bare-closure style): their
    # leaves are invisible to the pytree flatten, so hash them here.
    fn = getattr(obj, "fn", None)
    params = getattr(obj, "params", None)
    if callable(fn) and params is not None:
        seen[i] = len(seen)
        h.update(type(obj).__name__.encode())
        _feed_static(h, fn, seen)
        # params covers every leaf reachable from this node; a separate
        # tree_leaves() pass would hash the same bytes twice.
        _feed_static(h, params, seen)
        return
    # Fallback: repr with memory addresses stripped (stable across runs).
    seen[i] = len(seen)
    h.update(re.sub(r"0x[0-9a-f]+", "", repr(obj)).encode())


def fingerprint(sdf, X, Y, Z, sparse):
    """Stable hash of the run configuration: grid + full expression.

    Covers the grid coordinates, the expression pytree (structure +
    parameter leaves) AND all closure-captured statics of every node's
    eval function -- a model that differs only in a static (e.g.
    circular_array(4) vs circular_array(12)) must never hit the same
    checkpoint entry.
    """
    h = hashlib.sha256()
    for a in (X, Y, Z):
        _feed_array(h, a)
    h.update(repr(sparse).encode())  # True/False/"tiles" differ (order!)
    leaves, treedef = jax.tree_util.tree_flatten(sdf)
    # repr(treedef) embeds closure memory addresses ("... at 0x7f...")
    # which change every process -- strip them so checkpoints survive
    # restarts (function qualnames remain and identify the structure).
    h.update(re.sub(r"0x[0-9a-f]+", "", repr(treedef)).encode())
    # ONE batched transfer for device-resident leaves: np.asarray per
    # leaf costs a round trip each (~10 ms through a tunneled runtime,
    # 300+ ms for a typical expression); host leaves pass through.
    orig_leaves = leaves
    leaves = jax.device_get(leaves)
    for leaf in leaves:
        _feed_array(h, leaf)
    # Statics: every eval fn in the tree, including closure captures.
    # The pytree leaves are already hashed above (in treedef order), so
    # pre-mark them visited: the static walk then neither re-hashes
    # multi-MB parameter arrays nor pays a per-leaf device round trip.
    seen = {id(leaf): idx for idx, leaf in enumerate(orig_leaves)}
    _feed_static(h, sdf, seen)
    return h.hexdigest()


def structure_key(sdf, *extra):
    """Fingerprint of an expression's *structure* (statics + treedef, no
    leaf values).  Rebuilding the same model yields fresh fn identities,
    so treedef identity is useless as a cache key; this hash is stable
    across rebuilds and processes.  Used by the engine to remember which
    expression structures failed Pallas lowering."""
    h = hashlib.sha256()
    _, treedef = jax.tree_util.tree_flatten(sdf)
    h.update(re.sub(r"0x[0-9a-f]+", "", repr(treedef)).encode())
    # Replace leaf values with (shape, dtype) skeletons: lowering success
    # depends on the program, not on parameter values.
    skeleton = jax.tree_util.tree_map(
        lambda x: (
            jax.numpy.shape(x),
            str(getattr(x, "dtype", None) or np.asarray(x).dtype),
        ),
        sdf,
    )
    _feed_static(h, skeleton, {})
    for e in extra:
        h.update(repr(e).encode())
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
