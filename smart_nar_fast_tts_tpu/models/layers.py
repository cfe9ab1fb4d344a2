"""Transformer building blocks: multi-head attention, conv FFN, FFT blocks,
Prenet, PostNet.

Math matches the reference's post-LN FFT blocks
(``transformer/SubLayers.py:8-95``, ``transformer/Layers.py:29-70``) but the
implementation is batched head-major einsum attention (MXU-shaped) instead of
the reference's ``(n_head*B, L, d_k)`` bmm layout, and the masked softmax is
NaN-safe: fully-padded query rows produce zeros rather than NaN (the
reference relies on downstream ``masked_fill`` to hide the NaNs,
``transformer/Layers.py:43-46``).  Numerics on valid positions are identical.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch nn.LayerNorm eps (parity with reference post-LN blocks)
LN_EPS = 1e-5


def masked_softmax(scores: jnp.ndarray, key_valid: jnp.ndarray
                   ) -> jnp.ndarray:
    """Softmax over the last axis with invalid keys excluded.

    scores: (..., Lk); key_valid: broadcastable bool (..., Lk).
    Valid entries match ``softmax(masked_fill(scores, -inf))``
    (reference ``transformer/Modules.py:19-21``); rows with no valid key
    return all zeros instead of NaN.
    """
    neg = jnp.finfo(scores.dtype).min
    masked = jnp.where(key_valid, scores, neg)
    m = jnp.max(masked, axis=-1, keepdims=True)
    p = jnp.exp(masked - m) * key_valid
    denom = jnp.sum(p, axis=-1, keepdims=True)
    return p / jnp.maximum(denom, jnp.finfo(scores.dtype).tiny)


class MultiHeadAttention(nn.Module):
    """Post-LN multi-head attention returning per-head attention maps.

    Parity target: reference ``transformer/SubLayers.py:8-59`` (projection →
    SDPA with temperature √d_k → head concat → out-proj → dropout →
    LayerNorm(out + residual)).
    """

    d_model: int
    n_head: int
    dropout: float
    # The Pallas flash path never materializes (Lq, Lk) scores, so it
    # cannot return per-head attention (MelEncoder alignment needs them);
    # it dispatches only when the caller discards the maps AND a TPU
    # backend is live.
    need_attn: bool = True
    dtype: jnp.dtype = jnp.float32       # activation/compute dtype
    # alignment mode: per-head attention maps are consumed only through
    # their reductions (guided-attn numerator, per-frame argmax) — on TPU
    # the fused kernel returns exactly those and the (Lq, Lk) probs never
    # reach HBM; ``attn`` is then a dict {"argmax", "guided_num"}
    alignment_extras: bool = False
    guided_sigma: float = 0.2

    @nn.compact
    def __call__(self, q_in: jnp.ndarray, kv_in: jnp.ndarray,
                 key_valid: jnp.ndarray, deterministic: bool = True,
                 src_lens: Optional[jnp.ndarray] = None,
                 mel_lens: Optional[jnp.ndarray] = None,
                 sp_mesh=None, sp_axis: str = "data"
                 ) -> tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        from ..ops.pallas import flash_attention, pallas_interpret, use_pallas
        from ..ops.pallas.alignment import alignment_attention

        d_k = self.d_model // self.n_head
        B, Lq, _ = q_in.shape
        Lk = kv_in.shape[1]

        def proj(x, name, L):
            y = nn.Dense(self.n_head * d_k, dtype=self.dtype, name=name)(x)
            return y.reshape(B, L, self.n_head, d_k).transpose(0, 2, 1, 3)

        q = proj(q_in, "w_q", Lq)
        k = proj(kv_in, "w_k", Lk)
        v = proj(kv_in, "w_v", Lk)

        if (self.alignment_extras and use_pallas()
                and src_lens is not None and mel_lens is not None):
            # positional: custom_vjp functions reject keyword arguments
            out, idx, gnum = alignment_attention(
                q, k, v, key_valid, src_lens, mel_lens,
                self.guided_sigma, 256, pallas_interpret())
            attn = {"argmax": idx, "guided_num": gnum}
        elif sp_mesh is not None and not self.need_attn:
            # sequence parallelism: ring attention with the time axis
            # sharded over the mesh (ModelConfig.sequence_parallel).  Only
            # the O(T²) self-attention is distributed; the surrounding
            # linear/conv ops stay on the jit-sharded path.
            from ..parallel.sequence import (
                sequence_parallel_self_attention)
            attn = None
            # ring_self_attention applies the 1/sqrt(d_k) temperature itself
            out = sequence_parallel_self_attention(
                sp_mesh, q, k, v, key_valid, seq_axis=sp_axis)
        elif (not self.need_attn and use_pallas()
              and max(Lq, Lk) > 2048):
            # Flash only pays past ~2k frames: measured on v5e
            # (benchmarks/flash_probe.py, round 4) XLA einsum attention
            # runs at ~180 TFLOP/s vs the Pallas kernel's ~45 at T=1000
            # (the kernel is grid-overhead-bound at small blocks), while at
            # T=4096 the materialized (B,H,T,T) scores turn einsum
            # memory-bound (28 TFLOP/s) and flash wins 2x.  Shapes are
            # static, so this is a trace-time dispatch.
            attn = None
            out = flash_attention(q, k, v, key_valid, 256, 256,
                                  pallas_interpret())
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(jnp.asarray(d_k, scores.dtype))
            attn = masked_softmax(scores, key_valid[:, None, None, :])
            out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.n_head * d_k)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="fc")(
            out.astype(self.dtype))
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                           name="layer_norm")(out + q_in.astype(self.dtype))
        return out, attn


class ConvFFN(nn.Module):
    """Position-wise conv feed-forward, post-LN
    (reference ``transformer/SubLayers.py:62-95``).

    ``cap_valid`` is the batch-level sequence-capacity mask
    (``pos < max(lengths)``): the reference's tensors physically end at the
    batch max length, so its convs see zero padding there; with static
    bucket shapes the same boundary is reproduced by zeroing intermediate
    activations beyond the capacity.  Positions between an item's own length
    and the batch max keep their values — bit-compatible with the
    reference's padded compute.
    """

    d_model: int
    d_inner: int
    kernel_sizes: tuple[int, int]
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 cap_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = nn.Conv(self.d_inner, (self.kernel_sizes[0],), padding="SAME",
                    dtype=self.dtype, name="w_1")(x)
        h = nn.relu(h)
        if cap_valid is not None and self.kernel_sizes[1] > 1:
            h = jnp.where(cap_valid[None, :, None], h, 0.0)
        h = nn.Conv(self.d_model, (self.kernel_sizes[1],), padding="SAME",
                    dtype=self.dtype, name="w_2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                            name="layer_norm")(h + x)


class FFTBlock(nn.Module):
    """Attention + conv-FFN block with padded positions zeroed after each
    sublayer (reference ``transformer/Layers.py:29-70``).  Self-attention
    when ``kv is None``; cross-attention otherwise (FFTBlock2)."""

    d_model: int
    n_head: int
    d_inner: int
    kernel_sizes: tuple[int, int]
    dropout: float
    need_attn: bool = True
    dtype: jnp.dtype = jnp.float32
    alignment_extras: bool = False
    guided_sigma: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, q_valid: jnp.ndarray,
                 kv: Optional[jnp.ndarray] = None,
                 kv_valid: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 cap_valid: Optional[jnp.ndarray] = None,
                 src_lens: Optional[jnp.ndarray] = None,
                 mel_lens: Optional[jnp.ndarray] = None,
                 sp_mesh=None, sp_axis: str = "data"
                 ) -> tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        key_input = x if kv is None else kv
        key_valid = q_valid if kv_valid is None else kv_valid
        out, attn = MultiHeadAttention(
            self.d_model, self.n_head, self.dropout,
            need_attn=self.need_attn, dtype=self.dtype,
            alignment_extras=self.alignment_extras,
            guided_sigma=self.guided_sigma, name="attn")(
                x, key_input, key_valid, deterministic,
                src_lens=src_lens, mel_lens=mel_lens,
                sp_mesh=sp_mesh if kv is None else None, sp_axis=sp_axis)
        out = jnp.where(q_valid[:, :, None], out, 0.0)
        out = ConvFFN(self.d_model, self.d_inner, self.kernel_sizes,
                      self.dropout, dtype=self.dtype,
                      name="pos_ffn")(out, deterministic, cap_valid)
        out = jnp.where(q_valid[:, :, None], out, 0.0)
        return out, attn


class Prenet(nn.Module):
    """Mel prenet 80→256→256, ReLU×2, dropout 0.2
    (reference ``transformer/Layers.py:11-26``)."""

    d_out: int = 256
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.d_out, name="w_1")(x))
        h = nn.relu(nn.Dense(self.d_out, name="w_2")(h))
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over (batch, time) per channel with a capacity mask.

    Positions beyond the batch-level capacity are excluded from batch
    statistics, which makes training numerics independent of static bucket
    padding and identical to torch ``nn.BatchNorm1d`` on tensors trimmed to
    the batch max length (reference PostNet,
    ``transformer/Layers.py:125-166``).  torch semantics: biased variance
    for normalization, unbiased for the running estimate, running update
    ``r ← (1-m)·r + m·batch`` with m=0.1.  ``axis_name`` enables
    cross-replica stat sync under data parallelism (the reference's
    DataParallel uses per-replica stats, so None matches it).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool,
                 cap_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        feats = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feats,))
        bias = self.param("bias", nn.initializers.zeros, (feats,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(feats))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(feats))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if cap_valid is None:
                m = jnp.ones(x.shape[:2], x.dtype)[:, :, None]
            else:
                m = jnp.broadcast_to(cap_valid[None, :, None].astype(x.dtype),
                                     (x.shape[0], x.shape[1], 1))
            n = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=(0, 1)) / n
            var = jnp.sum((x - mean) ** 2 * m, axis=(0, 1)) / n
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                var = jax.lax.pmean(var, self.axis_name)
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class PostNet(nn.Module):
    """Five conv1d(k=5) + BatchNorm refinement stack over mels, tanh on all
    but the last, dropout 0.5 throughout
    (reference ``transformer/Layers.py:107-177``).  Residual is added by the
    caller.  ``cap_valid`` reproduces the reference's batch-max sequence
    boundary under static shapes (see ConvFFN docstring)."""

    n_mels: int = 80
    d_hidden: int = 512
    kernel_size: int = 5
    n_convs: int = 5
    dropout: float = 0.5
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 cap_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = x
        for i in range(self.n_convs):
            is_last = i == self.n_convs - 1
            feats = self.n_mels if is_last else self.d_hidden
            if cap_valid is not None:
                h = jnp.where(cap_valid[None, :, None], h, 0.0)
            h = nn.Conv(feats, (self.kernel_size,), padding="SAME",
                        name=f"conv_{i}")(h)
            h = MaskedBatchNorm(axis_name=self.bn_axis_name,
                                name=f"bn_{i}")(
                h, use_running_average=deterministic, cap_valid=cap_valid)
            if not is_last:
                h = jnp.tanh(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return h
