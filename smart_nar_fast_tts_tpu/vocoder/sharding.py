"""Tensor-parallel (channel-sharded) HiFi-GAN inference.

The reference has no model parallelism at all (SURVEY.md §2.7 — its only
axis is single-process DataParallel).  Here the vocoder — the one component
whose activation footprint grows past a single chip (waveform-rate
activations: B × T·256 × C) — gets a channel-dimension TP layout: every conv
kernel's output-channel axis is sharded over the mesh ``model`` axis and the
XLA SPMD partitioner inserts the (all-gather) collectives over ICI.  The
final ``conv_post`` projects to 1 channel and stays replicated.

Idiomatic-JAX note: there is no hand-written halo exchange or NCCL-style
scatter/gather anywhere — sharding is declared on params/inputs via
``NamedSharding`` and the partitioner does the rest.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .hifigan import HiFiGANGenerator


def hifigan_pspecs(params, axis: str = "model") -> dict:
    """PartitionSpec tree for a HiFiGANGenerator param tree: shard each
    conv kernel/bias along its output-channel axis, except ``conv_post``
    (1 output channel → replicated)."""

    def spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "conv_post" in names:
            return P()
        if leaf.ndim == 3:        # (k, in, out) conv / conv-transpose kernel
            return P(None, None, axis)
        if leaf.ndim == 1:        # bias (out,)
            return P(axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_hifigan(generator: HiFiGANGenerator, variables, mesh: Mesh,
                  data_axis: str = "data", model_axis: str = "model"):
    """Place params in the TP layout and return a jitted ``(mels) -> wavs``
    forward with batch sharded over ``data_axis`` and channels over
    ``model_axis``."""
    pspecs = {"params": hifigan_pspecs(variables["params"], model_axis)}
    sharded_vars = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        variables, pspecs)
    mel_sharding = NamedSharding(mesh, P(data_axis, None, None))
    out_sharding = NamedSharding(mesh, P(data_axis, None))

    @jax.jit
    def forward(mels):
        mels = jax.lax.with_sharding_constraint(mels, mel_sharding)
        wav = generator.apply(sharded_vars, mels)
        return jax.lax.with_sharding_constraint(wav, out_sharding)

    return forward
