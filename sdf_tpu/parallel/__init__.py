"""Multi-device sharding: grid-slab data parallelism over a jax Mesh."""

from .grid import make_mesh, mesh_and_march

__all__ = ["make_mesh", "mesh_and_march"]
