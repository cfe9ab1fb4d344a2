"""Fused alignment cross-attention with in-kernel loss reductions.

SURVEY.md §7.4.3: the MelEncoder's alignment attention cannot use stock
flash attention because downstream consumers need the **probability
matrix** — head 0 of every layer feeds the guided-attention loss
(``model/loss.py:233-236``) and the last layer's argmax feeds duration
extraction (§2.4.1).  Those consumers only need *reductions* of the probs,
so this kernel computes, in one pass per (batch, head, frame-block):

- the attended output ``softmax(QKᵀ/√D)·V`` (feeds the next FFT layer),
- the per-frame argmax over the text axis (duration counting),
- the guided-attention numerator ``Σ_{t,n valid} W[t,n]·p[t,n]`` with the
  soft-diagonal weight ``W`` generated in-kernel from (src_len, mel_len),

and the (B, H, T, L) probability tensor never reaches HBM.  Text length L
is small (≤ a few hundred phonemes), so the softmax is single-block over L —
no online rescaling needed.

Backward recomputes the probabilities with XLA (standard flash practice)
and differentiates output + guided numerator; the argmax is non-diff (the
reference detaches it, ``fastspeech2_align.py:58``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _alignment_reference(q, k, v, key_valid, src_lens, mel_lens,
                         sigma: float):
    """Pure-JAX oracle: (out, argmax_idx head0, guided_num head0)."""
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(d, jnp.float32))
    valid = key_valid[:, None, None, :]
    masked = jnp.where(valid, scores, NEG_INF)
    m = jnp.max(masked, axis=-1, keepdims=True)
    p = jnp.exp(masked - m) * valid
    p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-37)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)

    idx = jnp.argmax(masked[:, 0], axis=-1).astype(jnp.int32)   # (B, T)

    T, L = q.shape[2], k.shape[2]
    t_pos = jnp.arange(T, dtype=jnp.float32)
    n_pos = jnp.arange(L, dtype=jnp.float32)
    olens = mel_lens.astype(jnp.float32)[:, None, None]
    ilens = src_lens.astype(jnp.float32)[:, None, None]
    w = 1.0 - jnp.exp(-((n_pos[None, None, :] / ilens
                         - t_pos[None, :, None] / olens) ** 2)
                      / (2.0 * sigma ** 2))
    pair_valid = ((t_pos[None, :, None] < olens)
                  & (n_pos[None, None, :] < ilens))
    guided_num = jnp.sum(w * p[:, 0] * pair_valid, axis=(1, 2))  # (B,)
    return out, idx, guided_num


def _kernel(ilen_ref, olen_ref, q_ref, k_ref, v_ref, mask_ref,
            o_ref, idx_ref, gnum_ref, *, block_t: int, scale: float,
            inv_two_sigma2: float):
    b = pl.program_id(0)
    tb = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32) * scale        # (bt, D)
    k = k_ref[0, 0].astype(jnp.float32)                # (L, D)
    v = v_ref[0, 0].astype(jnp.float32)
    mask = mask_ref[0, 0].astype(jnp.float32)          # (1, L)
    L = k.shape[0]

    # HIGHEST: bf16x3 passes ≈ fp32 scores — the argmax feeds duration
    # targets and near-ties must resolve as in the f32 oracle
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)  # (bt, L)
    s = jnp.where(mask > 0, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m) * mask
    p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-37)

    o_ref[0, 0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)

    # per-frame argmax over the text axis (masked scores)
    idx_ref[0, 0] = jnp.argmax(s, axis=-1, keepdims=True).astype(jnp.int32)

    # guided-attention numerator for this frame block
    ilen = ilen_ref[b].astype(jnp.float32)
    olen = olen_ref[b].astype(jnp.float32)
    t0 = (tb * block_t).astype(jnp.float32)
    # Mosaic iota must be integer-typed; cast after
    t_pos = t0 + jax.lax.broadcasted_iota(
        jnp.int32, (p.shape[0], L), 0).astype(jnp.float32)
    n_pos = jax.lax.broadcasted_iota(
        jnp.int32, (p.shape[0], L), 1).astype(jnp.float32)
    w = 1.0 - jnp.exp(-((n_pos / ilen - t_pos / olen) ** 2)
                      * inv_two_sigma2)
    pair_valid = ((t_pos < olen) & (n_pos < ilen)).astype(jnp.float32)
    partial = jnp.sum(w * p * pair_valid)

    @pl.when(tb == 0)
    def _():
        gnum_ref[0, 0] = jnp.zeros((1, 1), jnp.float32)

    gnum_ref[0, 0] = gnum_ref[0, 0] + partial


def _forward(q, k, v, key_valid, src_lens, mel_lens, sigma: float,
             block_t: int, interpret: bool):
    B, H, T, D = q.shape
    L = k.shape[2]
    T_p = -(-T // block_t) * block_t
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, T_p - T), (0, 0)))
    maskp = key_valid.astype(jnp.float32)[:, None, None, :]  # (B,1,1,L)
    maskp = jnp.broadcast_to(maskp, (B, H, 1, L))

    grid = (B, H, T_p // block_t)
    out, idx, gnum = pl.pallas_call(
        functools.partial(_kernel, block_t=block_t,
                          scale=1.0 / float(D) ** 0.5,
                          inv_two_sigma2=1.0 / (2.0 * float(sigma) ** 2)),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, T_p, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, T_p, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, H, 1, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # ilen
            pl.BlockSpec(memory_space=pltpu.SMEM),               # olen
            pl.BlockSpec((1, 1, block_t, D), lambda b, h, t: (b, h, t, 0)),
            pl.BlockSpec((1, 1, L, D), lambda b, h, t: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, L, D), lambda b, h, t: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, L), lambda b, h, t: (b, h, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_t, D), lambda b, h, t: (b, h, t, 0)),
            pl.BlockSpec((1, 1, block_t, 1), lambda b, h, t: (b, h, t, 0)),
            pl.BlockSpec((1, 1, 1, 1), lambda b, h, t: (b, h, 0, 0)),
        ),
        interpret=interpret,
    )(src_lens.astype(jnp.int32), mel_lens.astype(jnp.int32),
      qp, jnp.broadcast_to(k, (B, H, L, D)),
      jnp.broadcast_to(v, (B, H, L, D)), maskp)

    return (out[:, :, :T, :], idx[:, 0, :T, 0], gnum[:, 0, 0, 0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def alignment_attention(q, k, v, key_valid, src_lens, mel_lens,
                        sigma: float = 0.2, block_t: int = 256,
                        interpret: bool = False):
    """Fused alignment attention.

    q: (B, H, T, D) mel-frame queries; k, v: (B, H, L, D) text keys/values;
    key_valid: (B, L); src_lens/mel_lens: (B,).

    Returns (out (B, H, T, D), argmax_idx (B, T) int32 [head 0],
    guided_num (B,) [head 0]) where guided_num is the masked sum
    ``Σ W·p`` of the guided-attention loss numerator
    (``models/loss.py:guided_attention_loss`` divides by the pair count).
    """
    return _forward(q, k, v, key_valid, src_lens, mel_lens, sigma,
                    block_t, interpret)


def _fwd(q, k, v, key_valid, src_lens, mel_lens, sigma, block_t, interpret):
    res = _forward(q, k, v, key_valid, src_lens, mel_lens, sigma,
                   block_t, interpret)
    return res, (q, k, v, key_valid, src_lens, mel_lens)


def _bwd(sigma, block_t, interpret, saved, cts):
    q, k, v, key_valid, src_lens, mel_lens = saved
    d_out, _, d_gnum = cts                       # argmax is non-diff

    def f(q, k, v):
        out, _, gnum = _alignment_reference(q, k, v, key_valid, src_lens,
                                            mel_lens, sigma)
        return out, gnum

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp((d_out, d_gnum))
    return dq, dk, dv, None, None, None


alignment_attention.defvjp(_fwd, _bwd)
