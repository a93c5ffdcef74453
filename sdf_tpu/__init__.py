"""sdf-tpu: a TPU-native signed-distance-function modeling + meshing framework.

Drop-in capable API surface of fogleman/sdf (``from sdf_tpu import *`` runs
the reference's example scripts unmodified), rebuilt TPU-first: SDF
expressions are JAX pytrees fused by XLA into single device programs,
sampling + marching cubes run on device, and grids shard over
``jax.sharding`` meshes.
"""

import os as _os

import numpy as np  # the reference's star-export leaks np; scripts rely on it

# Persistent XLA compilation cache: TPU compiles of large fused expression
# trees are expensive (minutes through a tunneled runtime); caching them on
# disk makes every later process start warm.  Opt out with
# SDF_TPU_NO_COMPILE_CACHE=1 or override the location via
# JAX_COMPILATION_CACHE_DIR (which takes precedence automatically).
def enable_compile_cache(path=None):
    """Point JAX's persistent compilation cache at ``path`` (explicit opt-in
    to mutating process-global JAX config from library code)."""
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        path or _os.path.expanduser("~/.cache/sdf_tpu/xla"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


if not _os.environ.get("SDF_TPU_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        # Defer to any user-configured cache (env var or prior
        # jax.config.update); only fill in a default when none is set.
        if (
            _os.environ.get("JAX_COMPILATION_CACHE_DIR") is None
            and _jax.config.jax_compilation_cache_dir is None
        ):
            enable_compile_cache()
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .utils.util import pi, degrees, radians

from .ops import easing as ease
from .ops import shapes2 as d2
from .ops import shapes3 as d3

from .ops.shapes3 import (
    ORIGIN,
    UP,
    X,
    Y,
    Z,
    SDF3,
    sphere,
    plane,
    slab,
    box,
    rounded_box,
    wireframe_box,
    torus,
    capsule,
    cylinder,
    capped_cylinder,
    rounded_cylinder,
    capped_cone,
    rounded_cone,
    ellipsoid,
    pyramid,
    tetrahedron,
    octahedron,
    dodecahedron,
    icosahedron,
    translate,
    scale,
    rotate,
    rotate_to,
    orient,
    circular_array,
    elongate,
    twist,
    bend,
    bend_linear,
    bend_radial,
    transition_linear,
    transition_radial,
    wrap_around,
    slice,
    union,
    difference,
    intersection,
    blend,
    negate,
    dilate,
    erode,
    shell,
    repeat,
)

from .ops.shapes2 import (
    SDF2,
    circle,
    line,
    rectangle,
    rounded_rectangle,
    equilateral_triangle,
    hexagon,
    rounded_x,
    polygon,
    vesica,
    extrude,
    extrude_to,
    revolve,
)

from .ops.meshsdf import Mesh

# Custom-SDF decorators (ref README.md:258-285) + module aliases matching
# the names the reference's star-imports leak (ref sdf/__init__.py:1-27).
from .core.node import sdf2, sdf3, op2, op3, op23, op32
from .ops import csg as dn
from .ops import meshsdf as mesh
from .io import stl
from .utils import progress, util

from .ops.textures import (
    measure_image,
    measure_text,
    image,
    text,
)

from .core.engine import (
    generate,
    generate_mesh,
    save,
    sample_slice,
    show_slice,
)

from .io.stl import write_binary_stl
