"""HiFi-GAN training objectives (LSGAN + feature matching + mel L1).

Standard HiFi-GAN loss set, absent from the reference (which never trains
its vocoder): least-squares adversarial terms, ×2-weighted feature-matching
L1 over every discriminator feature map, and ×45-weighted log-mel L1
between real and generated waveforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..audio.stft import MelSpectrogramConfig, mel_spectrogram
from .discriminators import DiscOutput

FM_WEIGHT = 2.0
MEL_WEIGHT = 45.0


def discriminator_loss(real: DiscOutput, fake: DiscOutput) -> jnp.ndarray:
    """Σ_k mean((1 − D_k(y))²) + mean(D_k(ŷ)²)."""
    loss = 0.0
    for (r, _), (f, _) in zip(real, fake):
        loss += jnp.mean((1.0 - r) ** 2) + jnp.mean(f ** 2)
    return loss


def generator_adversarial_loss(fake: DiscOutput) -> jnp.ndarray:
    """Σ_k mean((1 − D_k(ŷ))²)."""
    loss = 0.0
    for f, _ in fake:
        loss += jnp.mean((1.0 - f) ** 2)
    return loss


def feature_matching_loss(real: DiscOutput, fake: DiscOutput) -> jnp.ndarray:
    """Σ_k Σ_l mean(|feat_real − feat_fake|) (×2 applied by caller weight)."""
    loss = 0.0
    for (_, rf), (_, ff) in zip(real, fake):
        for r, f in zip(rf, ff):
            loss += jnp.mean(jnp.abs(r - f))
    return loss


def mel_l1_loss(wav_fake: jnp.ndarray, wav_real: jnp.ndarray,
                cfg: MelSpectrogramConfig) -> jnp.ndarray:
    """L1 between log-mels of generated and real waveforms, computed
    on-device.  The real-waveform branch (no gradient) uses the fused
    Pallas STFT kernel on TPU; the generated branch stays on the JAX STFT
    so XLA differentiates it."""
    from ..ops.pallas import fused_log_mel, pallas_interpret, use_pallas
    mel_f, _ = mel_spectrogram(wav_fake, cfg)
    if use_pallas():
        mel_r, _ = fused_log_mel(jax.lax.stop_gradient(wav_real), cfg,
                                 interpret=pallas_interpret())
    else:
        mel_r, _ = mel_spectrogram(wav_real, cfg)
    return jnp.mean(jnp.abs(mel_f - mel_r))
