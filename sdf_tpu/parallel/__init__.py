"""Multi-device sharding: grid-slab data parallelism over a jax Mesh."""

from .grid import make_mesh, mesh_and_march
from .multihost import gather_triangles, initialize, write_on_process0

__all__ = [
    "make_mesh",
    "mesh_and_march",
    "initialize",
    "gather_triangles",
    "write_on_process0",
]
