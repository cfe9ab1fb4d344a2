"""Training losses: mel L1 (pre/post PostNet), MSE on log-duration, pitch,
energy, and the guided-attention diagonal prior.

Parity target: reference ``model/loss.py`` — ``FastSpeech2Loss`` (``:149-250``)
and ``GuidedAttentionLoss`` (``:5-146``, espnet-derived, σ=0.2, α=10, applied
to head 0 of each of the 4 MelEncoder layers and summed, ``:233-236``).
All reductions are mask-weighted means over static shapes, numerically equal
to the reference's ``masked_select(...).mean()`` on valid entries; the
guided-attention weight/validity masks are built in-graph (the reference
builds them on host CPU per step, ``model/loss.py:52-58``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import PreprocessConfig
from ..ops.masks import masked_mean
from .fastspeech2_align import ModelOutput


class LossBreakdown(NamedTuple):
    total: jnp.ndarray
    mel: jnp.ndarray
    postnet_mel: jnp.ndarray
    pitch: jnp.ndarray
    energy: jnp.ndarray
    duration: jnp.ndarray
    attention: jnp.ndarray


def guided_attention_loss(attn: jnp.ndarray, src_lens: jnp.ndarray,
                          mel_lens: jnp.ndarray, sigma: float = 0.2,
                          alpha: float = 10.0) -> jnp.ndarray:
    """Soft-diagonal attention penalty.

    attn: (B, T_out, L_in) — one head of one layer.
    W[b,t,n] = 1 - exp(-(n/ilen - t/olen)^2 / (2 sigma^2)), averaged over
    valid (t, n) pairs (reference ``model/loss.py:107-146``).
    """
    B, T, L = attn.shape
    t_pos = jnp.arange(T, dtype=jnp.float32)
    n_pos = jnp.arange(L, dtype=jnp.float32)
    olens = mel_lens.astype(jnp.float32)[:, None, None]
    ilens = src_lens.astype(jnp.float32)[:, None, None]
    # grid divisors clamped ≥1 so fully-masked padding items (len-0 slots
    # from the eval batcher's pad_short="mask") produce finite grids
    # (inf−inf = NaN would poison the masked mean); the validity mask uses
    # the raw lengths, so those items contribute to neither numerator nor
    # denominator — parity- and partition-neutral
    grid_t = t_pos[None, :, None] / jnp.maximum(olens, 1.0)
    grid_n = n_pos[None, None, :] / jnp.maximum(ilens, 1.0)
    w = 1.0 - jnp.exp(-((grid_n - grid_t) ** 2) / (2.0 * sigma ** 2))
    valid = ((t_pos[None, :, None] < olens)
             & (n_pos[None, None, :] < ilens))
    return alpha * masked_mean(w * attn, valid)


class FastSpeech2Loss:
    """Callable loss bundle (reference ``model/loss.py:149-250``)."""

    def __init__(self, preprocess_cfg: PreprocessConfig,
                 guided_sigma: float = 0.2, guided_alpha: float = 10.0):
        self.pitch_level = preprocess_cfg.pitch_feature
        self.energy_level = preprocess_cfg.energy_feature
        self.sigma = guided_sigma
        self.alpha = guided_alpha

    def __call__(self, output: ModelOutput, mel_targets: jnp.ndarray,
                 pitch_targets: jnp.ndarray, energy_targets: jnp.ndarray
                 ) -> LossBreakdown:
        src_valid = output.src_valid
        mel_valid = output.mel_valid

        # targets carry no gradient (reference model/loss.py:193-197)
        log_d_targets = jnp.log(
            output.duration_targets.astype(jnp.float32) + 1.0)

        pv = src_valid if self.pitch_level == "phoneme_level" else mel_valid
        ev = src_valid if self.energy_level == "phoneme_level" else mel_valid
        pitch_loss = masked_mean(
            (output.pitch_prediction - pitch_targets) ** 2, pv)
        energy_loss = masked_mean(
            (output.energy_prediction - energy_targets) ** 2, ev)
        duration_loss = masked_mean(
            (output.log_duration_prediction - log_d_targets) ** 2, src_valid)

        mel_loss = masked_mean(
            jnp.abs(output.mel - mel_targets), mel_valid[:, :, None])
        postnet_mel_loss = masked_mean(
            jnp.abs(output.postnet_mel - mel_targets), mel_valid[:, :, None])

        # head 0 of every MelEncoder layer (reference model/loss.py:233-236)
        attn_loss = jnp.asarray(0.0, jnp.float32)
        if output.alignments is not None:
            for layer in range(output.alignments.shape[0]):
                attn_loss = attn_loss + guided_attention_loss(
                    output.alignments[layer][:, 0], output.src_lens,
                    output.mel_lens, self.sigma, self.alpha)
        elif output.guided_numerators is not None:
            # fused-alignment path: the Pallas kernel already reduced
            # Σ W·p per (layer, item); each layer's loss is that sum over
            # the batch divided by the batch's valid-pair count — summing
            # layers first is algebraically identical
            pairs = jnp.sum(output.src_lens.astype(jnp.float32)
                            * output.mel_lens.astype(jnp.float32))
            attn_loss = (self.alpha * jnp.sum(output.guided_numerators)
                         / jnp.maximum(pairs, 1.0))

        total = (mel_loss + postnet_mel_loss + duration_loss + pitch_loss
                 + energy_loss + attn_loss)
        return LossBreakdown(
            total=total, mel=mel_loss, postnet_mel=postnet_mel_loss,
            pitch=pitch_loss, energy=energy_loss, duration=duration_loss,
            attention=attn_loss)
