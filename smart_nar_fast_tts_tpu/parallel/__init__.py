"""Device-mesh parallelism utilities (SPMD over ``jax.sharding``)."""

from .mesh import make_mesh, batch_sharding, replicated

__all__ = ["make_mesh", "batch_sharding", "replicated"]
