"""Sequence parallelism: ring attention over the mel/time axis.

The reference *caps* sequence length at 1000 frames and runs full O(T²)
attention (``transformer/Models.py:159,227``; SURVEY.md §5.7).  Here long
utterances instead shard the time axis across a mesh axis:

- ``ring_self_attention``: decoder self-attention where q, k, v are all
  time-sharded; key/value blocks rotate around the ring via
  ``jax.lax.ppermute`` while each device folds them into an online-softmax
  accumulator (blockwise attention; the collective rides ICI neighbors).
  N−1 hops, O(T²/N) compute and O(T/N) memory per device.
- ``shard_map``-ready: call inside ``shard_map`` with the time axis mapped
  to a mesh axis, or use ``sequence_parallel_self_attention`` which wraps
  the mesh plumbing.

The alignment **cross**-attention (mel queries × text keys) needs no ring:
text is short and replicated, so time-sharding the queries already
parallelizes it — that path is plain ``pjit`` sharding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

NEG_INF = -1e30


def _fold(carry, s, v_blk, key_mask):
    """Online-softmax fold of one score block.

    carry: (acc (..., Tq, D), m (..., Tq), l (..., Tq)); s (..., Tq, Tk);
    v_blk (..., Tk, D); key_mask (..., Tk) broadcastable into s.
    """
    acc, m, l = carry
    s = jnp.where(key_mask, s, NEG_INF)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new[..., None]) * key_mask
    l_new = l * alpha + jnp.sum(p, axis=-1)
    acc_new = (acc * alpha[..., None]
               + jnp.einsum("...qk,...kd->...qd", p, v_blk,
                            preferred_element_type=jnp.float32))
    return acc_new, m_new, l_new


def ring_self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        key_valid: jnp.ndarray, axis_name: str
                        ) -> jnp.ndarray:
    """Blockwise masked attention with k/v rotating around ``axis_name``.

    Must run inside ``shard_map``/``pmap`` with time-sharded operands:
    q, k, v (B, H, T_local, D); key_valid (B, T_local) bool for the local
    key shard.  Returns (B, H, T_local, D) = softmax(QKᵀ/√D)V over the
    *global* key axis, matching ``masked_softmax`` semantics (zero rows
    when no key anywhere is valid).
    """
    n = jax.lax.psum(1, axis_name)
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    qf = q.astype(jnp.float32) * scale

    # derive the init from qf so the carry carries shard_map's "varying
    # over axis_name" type (plain zeros are unvarying → scan type error)
    acc = jnp.zeros_like(qf)
    m = jnp.max(qf * 0.0, axis=-1) + NEG_INF
    l = jnp.sum(qf * 0.0, axis=-1)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(carry, _):
        acc_m_l, k_blk, v_blk, mask_blk = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_blk.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        acc_m_l = _fold(acc_m_l, s, v_blk.astype(jnp.float32),
                        mask_blk[:, None, None, :])
        # rotate key/value/mask shard to the next ring neighbor
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)
        return (acc_m_l, k_blk, v_blk, mask_blk), None

    # lax.scan (not fori_loop/while_loop) so the ring is reverse-mode
    # differentiable — the SP TRAIN step (training/step.py sp_mesh) back-
    # propagates through it; ppermute's transpose is the inverted ring
    ((acc, m, l), _, _, _), _ = jax.lax.scan(
        body, ((acc, m, l), k, v, key_valid), None, length=n)
    out = acc / jnp.maximum(l, 1e-37)[..., None]
    return out.astype(q.dtype)


def sequence_parallel_self_attention(mesh: Mesh, q: jnp.ndarray,
                                     k: jnp.ndarray, v: jnp.ndarray,
                                     key_valid: jnp.ndarray,
                                     seq_axis: str = "data") -> jnp.ndarray:
    """Full-sequence attention with the time axis sharded over ``seq_axis``.

    Global shapes: q, k, v (B, H, T, D), key_valid (B, T); T must divide
    evenly by the mesh axis size.  Data flows ppermute-ring over ICI.

    Hybrid DP×SP (VERDICT r4 Next #5): on a 2-D mesh (e.g. axes
    ``("data", "seq")``) every *other* non-trivial mesh axis shards the
    batch dimension, so the same call serves pure-SP 1-D meshes and
    data-parallel training with time-sharded attention — the batch rides
    the ``data`` axis, k/v blocks ring over ``seq`` ICI neighbors only.
    """
    other = tuple(a for a in mesh.axis_names
                  if a != seq_axis and mesh.shape[a] > 1)
    batch_axes = other if other else None
    spec_qkv = P(batch_axes, None, seq_axis, None)
    spec_mask = P(batch_axes, seq_axis)

    fn = shard_map(
        functools.partial(ring_self_attention, axis_name=seq_axis),
        mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_mask),
        out_specs=spec_qkv)
    args = (q, k, v, key_valid)
    shardings = (NamedSharding(mesh, spec_qkv),) * 3 + (
        NamedSharding(mesh, spec_mask),)
    args = tuple(jax.device_put(a, s) for a, s in zip(args, shardings))
    return fn(*args)
