"""Flash-style fused attention for the FFT blocks.

Replaces the XLA einsum attention in ``models/layers.py`` on TPU: one Pallas
kernel computes ``softmax(QKᵀ/√d_k)·V`` with online (streaming) softmax over
key blocks, never materializing the (Lq, Lk) score matrix in HBM — the
quadratic object called out in SURVEY.md §5.7 for long utterances
(decoder self-attention T'², alignment cross-attention T_mel×L_txt).

Masking follows the framework's NaN-safe semantics (``masked_softmax``,
``models/layers.py:25-39``): invalid keys contribute zero probability and
fully-masked query rows yield zero outputs (the reference's -inf fill,
``transformer/Modules.py:19-20``, NaNs on those rows instead).

Differentiability: ``flash_attention`` carries a ``jax.custom_vjp`` whose
backward recomputes the straightforward attention and differentiates it with
XLA.  Training uses small/medium sequences where the naive backward is
MXU-bound anyway; the Pallas forward is what serving (bench RTF) hits.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attention_reference(q, k, v, key_valid):
    """Oracle: the exact math of ``models.layers.masked_softmax`` attention.

    q: (B, H, Lq, D), k/v: (B, H, Lk, D), key_valid: (B, Lk) bool.
    """
    d_k = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(d_k, scores.dtype))
    valid = key_valid[:, None, None, :]
    masked = jnp.where(valid, scores, jnp.finfo(scores.dtype).min)
    m = jnp.max(masked, axis=-1, keepdims=True)
    p = jnp.exp(masked - m) * valid
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(denom, jnp.finfo(scores.dtype).tiny)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int,
                  scale: float):
    """One (batch·head, q-block) program: stream key blocks with online
    softmax.  Refs: q (Bq, D), k/v (Lk, D), mask (1, Lk) float{0,1}."""
    # MXU dtype: f32 dot_generals inside Mosaic run multi-pass (~31 TFLOP/s
    # on v5e vs ~190 one-pass bf16 — measured, benchmarks/bf16_probe.py).
    # XLA's own default-precision einsum attention truncates f32 operands
    # to bf16 with f32 accumulation; doing the same here matches both its
    # numerics and its speed.  Softmax statistics stay f32.
    q = (q_ref[0].astype(jnp.float32) * scale).astype(jnp.bfloat16)
    n_kb = k_ref.shape[1] // block_k

    bq = q.shape[0]
    acc = jnp.zeros((bq, q_ref.shape[-1]), jnp.float32)
    m_i = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((bq, 1), jnp.float32)

    def body(kb, carry):
        acc, m_i, l_i = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(
            jnp.bfloat16)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(
            jnp.bfloat16)
        mask = mask_ref[0, 0, pl.ds(kb * block_k, block_k)].astype(
            jnp.float32)

        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (Bq, block_k) f32
        s = jnp.where(mask[None, :] > 0, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new) * mask[None, :]
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc, m_i, l_i = jax.lax.fori_loop(0, n_kb, body, (acc, m_i, l_i))
    # fully-masked rows: l == 0 → output 0 (NaN-safe semantics)
    o_ref[0] = (acc / jnp.maximum(l_i, 1e-37)).astype(o_ref.dtype)


def _flash_forward(q, k, v, key_valid, *, block_q: int, block_k: int,
                   interpret: bool) -> jnp.ndarray:
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    scale = 1.0 / math.sqrt(D)

    # pad sequence axes to block multiples (padded keys are masked off)
    Lq_p = -(-Lq // block_q) * block_q
    Lk_p = -(-Lk // block_k) * block_k
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Lq_p - Lq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Lk_p - Lk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Lk_p - Lk), (0, 0)))
    maskp = jnp.pad(key_valid.astype(jnp.float32),
                    ((0, 0), (0, Lk_p - Lk)))         # (B, Lk_p)

    qp = qp.reshape(B * H, Lq_p, D)
    kp = kp.reshape(B * H, Lk_p, D)
    vp = vp.reshape(B * H, Lk_p, D)
    maskp = jnp.repeat(maskp, H, axis=0)[:, None, :]  # (B·H, 1, Lk_p)

    grid = (B * H, Lq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq_p, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Lk_p, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Lk_p, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, Lk_p), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(qp, kp, vp, maskp)
    return out.reshape(B, H, Lq_p, D)[:, :, :Lq, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    key_valid: jnp.ndarray, block_q: int = 256,
                    block_k: int = 256, interpret: bool = False
                    ) -> jnp.ndarray:
    """Fused masked attention ``softmax(QKᵀ/√D)V``.

    Args:
        q: (B, H, Lq, D); k, v: (B, H, Lk, D); key_valid: (B, Lk) bool.
        block_q/block_k: VMEM tile sizes along the sequence axes.
        interpret: run the kernel in interpreter mode (CPU testing).

    Returns (B, H, Lq, D) with zero rows where no key is valid.

    Numerics: the kernel truncates q/k/v and the probability tile to
    bfloat16 and accumulates the two matmuls in float32 — the same
    bf16-operand / f32-accumulation contract as XLA's default TPU matmul
    precision — so the output matches ``masked_softmax`` attention to
    ~1e-2 relative (bf16 mantissa), not fp32-exact.  The backward pass is
    the *f32 reference VJP* (recomputed dense attention), so gradients
    correspond to the f32 function, which differs from the bf16 forward
    by the same truncation error; for training at these tolerances this
    is the standard mixed-precision approximation.
    """
    return _flash_forward(q, k, v, key_valid, block_q=block_q,
                          block_k=block_k, interpret=interpret)


def _fwd(q, k, v, key_valid, block_q, block_k, interpret):
    out = _flash_forward(q, k, v, key_valid, block_q=block_q,
                         block_k=block_k, interpret=interpret)
    return out, (q, k, v, key_valid)


def _bwd(block_q, block_k, interpret, res, g):
    q, k, v, key_valid = res
    _, vjp = jax.vjp(lambda q, k, v: _attention_reference(q, k, v, key_valid),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
