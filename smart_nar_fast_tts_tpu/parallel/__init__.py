"""Device-mesh parallelism utilities (SPMD over ``jax.sharding``)."""

from .mesh import make_mesh, batch_sharding, replicated
from .sequence import (ring_self_attention,
                       sequence_parallel_self_attention)

__all__ = ["make_mesh", "batch_sharding", "replicated",
           "ring_self_attention", "sequence_parallel_self_attention"]
