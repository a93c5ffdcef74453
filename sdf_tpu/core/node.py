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
import jax.numpy as jnp
import numpy as np


class Points:
    """Structure-of-arrays point batch: one array per coordinate component.

    TPU arrays tile their minor dimension onto 128 vector lanes, so a
    materialized ``(N, 3)`` point array pads 3 -> 128 lanes: ~40x wasted
    HBM traffic and VPU work for every intermediate (measured ~30x memory
    amplification on the example model).  All internal SDF evaluation
    therefore flows component-wise: a ``Points`` holds ``dim`` separately
    shaped, mutually *broadcastable* arrays (e.g. the grid engine passes
    ``(nx,1,1), (1,ny,1), (1,1,nz)`` views and XLA fuses the whole
    expression without materializing coordinates at all).  The public
    ``(N, dim) -> (N, 1)`` call contract of the reference is preserved at
    the ``_Node.__call__`` boundary, which converts arrays to ``Points``
    on the way in and broadcasts/reshapes the distance on the way out.
    """

    __slots__ = ("c",)

    # Make numpy/jax arrays defer binary ops to Points (so ``vec - points``
    # hits __rsub__ instead of ndarray's elementwise object broadcast).
    __array_ufunc__ = None
    __array_priority__ = 1000

    def __init__(self, *c):
        self.c = tuple(c)

    @property
    def dim(self):
        return len(self.c)

    @property
    def bshape(self):
        return jnp.broadcast_shapes(*[jnp.shape(x) for x in self.c])

    @classmethod
    def from_array(cls, p):
        return cls(*[p[..., i] for i in range(p.shape[-1])])

    # --- component access: supports p[i], p[:, i] and p[:, :k] styles ----
    def __getitem__(self, key):
        if isinstance(key, tuple) and len(key) == 2:
            key = key[1]
        if isinstance(key, slice):
            return Points(*self.c[key])
        return self.c[key]

    def __iter__(self):
        return iter(self.c)

    # --- elementwise arithmetic -----------------------------------------
    def _coerce(self, other):
        """Other as a per-component sequence: Points, (dim,) vector, scalar.

        A 1-D array of length ``dim`` is always read as a parameter
        vector (one entry per component).  A *field* array (one value
        per point) of the same shape would be misread, which is only
        possible when N == dim; the public ``_Node.__call__`` boundary
        pads that case away, and the grid engine's broadcast views are
        never 1-D, so library paths cannot hit it.  Custom code driving
        ``Points`` directly on exactly ``dim`` points should broadcast
        explicitly (e.g. ``Points(f, f, f)``).
        """
        if isinstance(other, Points):
            return other.c
        shape = jnp.shape(other)
        if len(shape) == 1 and shape[0] == self.dim:
            # A (dim,) parameter vector: one entry per component.
            return tuple(other[i] for i in range(self.dim))
        # Scalar or field array: broadcast the same value into every
        # component (the AoS analog is an (N, 1) column against (N, dim)).
        return (other,) * self.dim

    def _bin(self, other, op):
        oc = self._coerce(other)
        return Points(*[op(a, b) for a, b in zip(self.c, oc)])

    def __add__(self, o):
        return self._bin(o, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, o):
        return self._bin(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._bin(o, lambda a, b: b - a)

    def __mul__(self, o):
        return self._bin(o, lambda a, b: a * b)

    __rmul__ = __mul__

    def __truediv__(self, o):
        return self._bin(o, lambda a, b: a / b)

    def __neg__(self):
        return Points(*[-a for a in self.c])

    def __abs__(self):
        return Points(*[jnp.abs(a) for a in self.c])

    # --- reductions across components -----------------------------------
    def hmax(self):
        """Max across components (the ``amax(axis=1)`` of AoS code)."""
        return functools.reduce(jnp.maximum, self.c)

    def hmin(self):
        return functools.reduce(jnp.minimum, self.c)

    def hsum(self):
        return functools.reduce(lambda a, b: a + b, self.c)


def pointwise(fn):
    """Lift a jnp elementwise function over Points (or pass arrays through)."""

    def apply(x, *args, **kwargs):
        if isinstance(x, Points):
            return Points(*[fn(c, *args, **kwargs) for c in x.c])
        return fn(x, *args, **kwargs)

    return apply


def as_param(value, dtype=np.float64):
    """Convert a user-supplied numeric parameter into a pytree leaf.

    Parameters are stored as float64 numpy arrays so construction-time math
    is exact; the engine casts the whole expression pytree to the compute
    dtype (float32 on TPU) right before tracing (see ``cast``).
    """
    return np.asarray(value, dtype=dtype)


def cast(node, dtype):
    """Return a copy of an SDF expression with every numeric leaf cast."""
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
        # Internal SoA path: Points in -> raw broadcast-shaped distances out
        # (no reshapes; the whole tree stays fused component-wise).
        if isinstance(p, Points):
            return self.fn(self.params, p)
        # Public contract: (N, dim) -> (N, 1), matching ref sdf/d3.py:24-25.
        p = jnp.asarray(p)
        n = p.shape[0] if p.ndim == 2 else None
        if p.ndim == 2 and p.shape[0] == p.shape[1]:
            # N == dim is the one ambiguous SoA case: a (dim,) field array
            # inside an op is indistinguishable from a (dim,) parameter
            # vector in Points._coerce.  Pad one duplicate row so field
            # arrays are (dim+1,) and can never match the vector test.
            p = jnp.concatenate([p, p[:1]], axis=0)
        pts = Points.from_array(p)
        d = self.fn(self.params, pts)
        d = jnp.broadcast_to(d, pts.bshape).reshape((-1, 1))
        return d if n is None or d.shape[0] == n else d[:n]

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

    def generate_mesh(self, *args, **kwargs):
        """Indexed-mesh variant of generate(): (verts (V, 3), faces (T, 3))."""
        from . import engine

        return engine.generate_mesh(self, *args, **kwargs)

    def save(self, path, *args, **kwargs):
        from . import engine

        return engine.save(path, self, *args, **kwargs)

    def show_slice(self, *args, **kwargs):
        from . import engine

        return engine.show_slice(self, *args, **kwargs)

    def gradient(self, p, dtype=None):
        """Spatial gradient of the field at (N, 3) points, via jax.grad.

        Not possible in the reference (opaque numpy closures); here the
        whole CSG tree differentiates in one reverse pass.
        """
        dtype = dtype or jnp.float32
        node = cast(self, dtype)
        p = jnp.asarray(p, dtype=dtype)

        def d(q):
            return node(q[None, :])[0, 0]

        return jax.vmap(jax.grad(d))(p)

    def normal(self, p, dtype=None):
        """Unit surface normal (normalized gradient) at (N, 3) points."""
        g = self.gradient(p, dtype)
        n = jnp.linalg.norm(g, axis=1, keepdims=True)
        return g / jnp.where(n == 0, 1.0, n)


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
    jax.tree_util.register_pytree_node(_cls, _flatten, _unflatten)


def node_k(node):
    """Trace-time read of a node's smooth-k tag (ref sdf/dn.py:12 pattern).

    Returns the traced ``_k`` leaf if the node was tagged, else ``None``.
    Non-node callables (bare functions) have no tag.
    """
    return getattr(node, "_k", None) if isinstance(node, _Node) else None


# --- constructor decorators (ref sdf/d3.py:48-63, sdf/d2.py:40-55) ---------

# Exceptions that signal "this closure is incompatible with this calling
# convention", as opposed to genuine bugs in the closure (NameError etc.),
# which must propagate with their original traceback.
_TIER_ERRORS = (TypeError, ValueError, AttributeError, IndexError)


def _wrap_legacy(f, dim):
    """Adapt a reference-style closure ``f(points_array) -> distances``.

    The reference documents custom SDFs as bare closures over (N, dim)
    numpy arrays (ref README.md:258-285).  Three tiers, selected on first
    trace and memoized on the wrapper:

      1. call with the SoA ``Points`` directly (works when the closure
         sticks to arithmetic / indexing that Points supports),
      2. materialize an (N, dim) jnp array and call with that (works for
         jnp-based closures; pays the AoS layout cost),
      3. ``jax.pure_callback`` to run the closure host-side in float64
         numpy (full compatibility with verbatim reference closures, at
         host speed).

    Because legacy closures capture their parameters invisibly (no pytree
    leaves), ``cast()`` cannot reach them; the output is cast to the
    incoming coordinate dtype so captured float64 numpy constants do not
    promote the surrounding fused expression.
    """
    state = {"tier": None}

    def _tier3(arr, shape):
        def host(a):
            d = np.asarray(f(np.asarray(a, dtype=np.float64)))
            return d.reshape(-1).astype(a.dtype)

        res = jax.pure_callback(
            host,
            jax.ShapeDtypeStruct((arr.shape[0],), arr.dtype),
            arr,
            vmap_method="sequential",
        )
        return res.reshape(shape)

    def fn(q, p):
        if not isinstance(p, Points):
            return f(p)
        out_dtype = jnp.result_type(*[jnp.asarray(c).dtype for c in p.c])

        def finish(d):
            return jnp.asarray(d).astype(out_dtype)

        if state["tier"] in (None, 0):
            try:
                out = finish(f(p))
                state["tier"] = 0
                return out
            except _TIER_ERRORS:
                # A tier-0 closure can fail in a new shape context (e.g.
                # broadcast SoA components after flat ones): retry the
                # materialized tier rather than trusting the memo.
                state["tier"] = None
        shape = p.bshape
        arr = jnp.stack(
            [jnp.broadcast_to(c, shape).reshape(-1) for c in p.c], axis=-1
        )
        if state["tier"] in (None, 1):
            try:
                out = finish(f(arr).reshape(shape))
                state["tier"] = 1
                return out
            except _TIER_ERRORS + (jax.errors.TracerArrayConversionError,):
                pass
            # Surface genuine closure bugs eagerly with a clear traceback
            # before committing to the host-callback tier.
            f(np.zeros((2, dim)))
            state["tier"] = 2
        return finish(_tier3(arr, shape))

    # Legacy closures may resolve to the pure_callback tier, which can
    # never trace into a Pallas kernel; route them through the hybrid
    # XLA pre-pass unconditionally (core/hybrid.py).
    fn.pallas_needs_gather = True
    return fn


def _make_ctor(cls, builder):
    @functools.wraps(builder)
    def wrapper(*args, **kwargs):
        out = builder(*args, **kwargs)
        if isinstance(out, _Node):
            # Builders may delegate to other constructors (e.g. slab ->
            # intersection of planes, rotate_to -> rotate); pass the node
            # through unchanged.
            return out
        if callable(out):
            # Reference-style builder returning a bare closure
            # (ref README.md:258-285): no pytree params, closure captures.
            dim = 2 if cls is SDF2 else 3
            return cls(_wrap_legacy(out, dim), {})
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
