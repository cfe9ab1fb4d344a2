"""Device mesh construction and common shardings.

The TPU-native replacement for the reference's single-process
``nn.DataParallel`` (``train.py:42``, SURVEY.md §2.7/§5.8): one global mesh
with ``(data, model)`` axes; the batch dim is sharded over ``data``, model
weights are replicated (41M params ≪ chip HBM) with the ``model`` axis
reserved for tensor-parallel vocoder sharding.  Gradient reduction is
whatever XLA inserts for the jit-sharded program — ``psum`` over ICI within
a slice, DCN across slices — never hand-written collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (-1, 1),
              axis_names: Sequence[str] = ("data", "model"),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh over all (or given) devices; a single ``-1`` dim absorbs the
    remaining device count (like a reshape wildcard)."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = len(devices) // known
    grid = np.asarray(devices).reshape(shape)
    return Mesh(grid, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding for input pytrees."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
