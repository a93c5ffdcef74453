"""Expression-tree core: SDF nodes as JAX pytrees.

The reference (fogleman/sdf) wraps opaque Python closures that numpy
re-evaluates batch by batch (ref sdf/d3.py:21-46, README.md:270-274).  This
framework inverts that design for TPU: every SDF node is a *registered JAX
pytree* carrying

  * ``fn``     -- a static, pure evaluation function ``fn(params, p) -> d``
  * ``params`` -- a pytree of numeric parameters, which may contain child
                  SDF nodes (the CSG tree *is* the pytree)
  * ``_k``     -- the optional smooth-blend radius tag (ref sdf/d3.py:38-40)

Because the node is a pytree, an entire CSG expression can be passed straight
through ``jax.jit`` / ``jax.grad`` / ``jax.vmap`` / ``shard_map``: XLA traces
the whole tree once and fuses it into a single TPU program, parameters are
differentiable leaves, and re-evaluations with new parameter values reuse the
compiled executable.

Semantics preserved from the reference (see SURVEY.md section 2.4):

  * call contract: ``(N, dim)`` points -> ``(N, 1)`` distances
    (ref sdf/d3.py:24-25)
  * ``.k()`` mutates in place and returns self; the tag is read *lazily* by
    CSG consumers at evaluation (here: trace) time, so tagging a node affects
    expressions that already captured it (ref sdf/d3.py:38-40, sdf/dn.py:12).
    Presence of ``_k`` is part of the pytree structure, so changing it
    triggers a retrace automatically while its *value* stays a traced,
    differentiable leaf.
  * operator overloading ``| & -`` -> union / intersection / difference
    (ref sdf/d3.py:32-37)
  * method dispatch through a registry via ``__getattr__``
    (ref sdf/d3.py:26-31); SDF3 additionally falls through to attributes of
    the eval function (used by mesh SDFs to expose their grids,
    ref sdf/mesh.py:107-111) while SDF2 raises (ref sdf/d2.py:25-29).
"""

from __future__ import annotations

import functools

import jax
import numpy as np


def as_param(value, dtype=np.float64):
    """Convert a user-supplied numeric parameter into a pytree leaf.

    Parameters are stored as float64 numpy arrays so construction-time math
    is exact; the engine casts the whole expression pytree to the compute
    dtype (float32 on TPU) right before tracing (see ``cast``).
    """
    return np.asarray(value, dtype=dtype)


def cast(node, dtype):
    """Return a copy of an SDF expression with every numeric leaf cast."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype=dtype), node)


class _Node:
    """Shared machinery for SDF2/SDF3 pytree nodes."""

    _registry: dict = {}  # overridden per subclass

    def __init__(self, fn, params):
        self.fn = fn
        self.params = params
        self._k = None

    # --- evaluation ------------------------------------------------------
    def __call__(self, p):
        # (N, dim) -> (N, 1), matching ref sdf/d3.py:24-25 / sdf/d2.py:23-24.
        return self.fn(self.params, p).reshape((-1, 1))

    # --- smooth-k tag (ref sdf/d3.py:38-40) ------------------------------
    def k(self, k=None):
        self._k = k
        return self

    # --- method registry dispatch (ref sdf/d3.py:26-31) ------------------
    def __getattr__(self, name):
        ops = type(self)._registry
        if name in ops:
            return functools.partial(ops[name], self)
        return self._getattr_fallthrough(name)

    def _getattr_fallthrough(self, name):
        raise AttributeError(name)

    # --- CSG operators (ref sdf/d3.py:32-37) ------------------------------
    def __or__(self, other):
        return type(self)._registry["union"](self, other)

    def __and__(self, other):
        return type(self)._registry["intersection"](self, other)

    def __sub__(self, other):
        return type(self)._registry["difference"](self, other)


class SDF3(_Node):
    """A 3D signed distance field: points ``(N, 3)`` -> distances ``(N, 1)``."""

    _registry = {}

    def _getattr_fallthrough(self, name):
        # Fall through to attributes of the eval function; mesh SDFs attach
        # their sampled grid etc. there (ref sdf/d3.py:30, sdf/mesh.py:107-111).
        return getattr(self.fn, name)

    def generate(self, *args, **kwargs):
        from . import engine

        return engine.generate(self, *args, **kwargs)

    def save(self, path, *args, **kwargs):
        from . import engine

        return engine.save(path, self, *args, **kwargs)

    def show_slice(self, *args, **kwargs):
        from . import engine

        return engine.show_slice(self, *args, **kwargs)


class SDF2(_Node):
    """A 2D signed distance field: points ``(N, 2)`` -> distances ``(N, 1)``."""

    _registry = {}


def _flatten(node):
    if node._k is None:
        return (node.params,), (type(node), node.fn, False)
    return (node.params, node._k), (type(node), node.fn, True)


def _unflatten(aux, children):
    cls, fn, has_k = aux
    obj = object.__new__(cls)
    obj.fn = fn
    obj.params = children[0]
    obj._k = children[1] if has_k else None
    return obj


for _cls in (SDF3, SDF2):
    jax.tree_util.register_pytree_node(_cls, _flatten, functools.partial(_unflatten))


def node_k(node):
    """Trace-time read of a node's smooth-k tag (ref sdf/dn.py:12 pattern).

    Returns the traced ``_k`` leaf if the node was tagged, else ``None``.
    Non-node callables (bare functions) have no tag.
    """
    return getattr(node, "_k", None) if isinstance(node, _Node) else None


# --- constructor decorators (ref sdf/d3.py:48-63, sdf/d2.py:40-55) ---------

def _make_ctor(cls, builder):
    @functools.wraps(builder)
    def wrapper(*args, **kwargs):
        out = builder(*args, **kwargs)
        if isinstance(out, _Node):
            # Builders may delegate to other constructors (e.g. slab ->
            # intersection of planes, rotate_to -> rotate); pass the node
            # through unchanged.
            return out
        fn, params = out
        return cls(fn, params)

    return wrapper


def sdf3(builder):
    """Wrap a builder returning ``(fn, params)`` into an SDF3 constructor."""
    return _make_ctor(SDF3, builder)


def sdf2(builder):
    return _make_ctor(SDF2, builder)


def op3(builder):
    """Like ``sdf3`` but also registers the op as an SDF3 method."""
    wrapper = _make_ctor(SDF3, builder)
    SDF3._registry[builder.__name__] = wrapper
    return wrapper


def op2(builder):
    wrapper = _make_ctor(SDF2, builder)
    SDF2._registry[builder.__name__] = wrapper
    return wrapper


def op32(builder):
    """A 3D -> 2D operation: registered on SDF3, returns SDF2 (ref d3.py:59-63)."""
    wrapper = _make_ctor(SDF2, builder)
    SDF3._registry[builder.__name__] = wrapper
    return wrapper


def op23(builder):
    """A 2D -> 3D operation: registered on SDF2, returns SDF3 (ref d2.py:51-55)."""
    wrapper = _make_ctor(SDF3, builder)
    SDF2._registry[builder.__name__] = wrapper
    return wrapper
