"""Vocoder (HiFi-GAN) GAN training runtime — BASELINE config 5.

The reference never trains its vocoder (it downloads checkpoints,
``utils/model.py:38-67``); this module provides the fine-tune/training path:
a jitted two-optimizer GAN step (discriminator update, then generator update
with adversarial + feature-matching + mel losses), data-parallel over the
mesh ``data`` axis, with mel extraction running **in-graph** (the JAX STFT)
so the host pipeline only ships raw waveform segments.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..audio.stft import MelSpectrogramConfig
from ..vocoder.discriminators import HiFiGANDiscriminator
from ..vocoder.hifigan import HiFiGANGenerator
from ..vocoder.losses import (FM_WEIGHT, MEL_WEIGHT, discriminator_loss,
                              feature_matching_loss,
                              generator_adversarial_loss, mel_l1_loss)


@flax.struct.dataclass
class VocoderState:
    step: jnp.ndarray
    gen_params: dict
    gen_opt: optax.OptState
    disc_params: dict
    disc_stats: dict           # spectral-norm power-iteration state
    disc_opt: optax.OptState


@flax.struct.dataclass
class VocoderMetrics:
    disc: jnp.ndarray
    gen_adv: jnp.ndarray
    feature: jnp.ndarray
    mel: jnp.ndarray
    gen_total: jnp.ndarray


def make_vocoder_optimizer(learning_rate: float = 2e-4,
                           betas=(0.8, 0.99),
                           lr_decay: float = 0.999,
                           decay_every: int = 1000) -> optax.GradientTransformation:
    """AdamW with the HiFi-GAN exponential decay schedule (per-"epoch"
    decay mapped onto a fixed step interval)."""
    schedule = optax.exponential_decay(
        learning_rate, transition_steps=decay_every, decay_rate=lr_decay)
    return optax.adamw(schedule, b1=betas[0], b2=betas[1])


def create_vocoder_state(generator: HiFiGANGenerator,
                         discriminator: HiFiGANDiscriminator,
                         gen_tx: optax.GradientTransformation,
                         disc_tx: optax.GradientTransformation,
                         segment_size: int, seed: int = 0,
                         gen_params: Optional[dict] = None) -> VocoderState:
    """Initialize both models (optionally warm-starting the generator from
    imported checkpoint params) on a dummy segment."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    hop = generator.config.hop_length
    mel = jnp.zeros((1, segment_size // hop, generator.config.n_mels))
    if gen_params is None:
        gen_params = generator.init(k1, mel)["params"]
    wav = jnp.zeros((1, segment_size))
    disc_vars = discriminator.init(k2, wav, update_stats=True)
    return VocoderState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        gen_opt=gen_tx.init(gen_params),
        disc_params=disc_vars["params"],
        disc_stats=disc_vars.get("batch_stats", {}),
        disc_opt=disc_tx.init(disc_vars["params"]))


def make_vocoder_train_step(generator: HiFiGANGenerator,
                            discriminator: HiFiGANDiscriminator,
                            mel_cfg: MelSpectrogramConfig,
                            gen_tx: optax.GradientTransformation,
                            disc_tx: optax.GradientTransformation,
                            mesh: Optional[Mesh] = None,
                            steps_per_dispatch: int = 1):
    """Jitted (state, wav_segments (B, S)) → (state, VocoderMetrics).

    Mel inputs and mel-loss targets are computed in-graph from the real
    waveform (GT-mel training; pass acoustic-model mels for teacher-forced
    fine-tune via the optional ``mels`` argument — single-step mode only).
    With ``steps_per_dispatch=K > 1`` the returned function takes
    ``(K, B, S)`` and runs K GAN steps in one scanned program.
    """

    def step(state: VocoderState, wavs: jnp.ndarray,
             mels: Optional[jnp.ndarray] = None):
        from ..audio.stft import mel_spectrogram
        from ..ops.pallas import fused_log_mel, pallas_interpret, use_pallas
        if mels is None:
            if use_pallas():
                mel_in, _ = fused_log_mel(wavs, mel_cfg,
                                          interpret=pallas_interpret())
            else:
                mel_in, _ = mel_spectrogram(wavs, mel_cfg)  # (B, n_mels, F)
            mel_in = jnp.swapaxes(mel_in, 1, 2)             # (B, F, n_mels)
        else:
            mel_in = mels

        # --- discriminator update (generator frozen) ---------------------
        fake = generator.apply({"params": state.gen_params}, mel_in)
        fake = jax.lax.stop_gradient(fake)
        # centered STFT yields one extra frame, so F·hop can exceed the
        # segment length — trim both sides to the common static length
        n = min(fake.shape[1], wavs.shape[1])
        fake = fake[:, :n]
        real = wavs[:, :n]

        def d_loss_fn(disc_params, stats):
            (mpd_r, msd_r), new_stats = discriminator.apply(
                {"params": disc_params, "batch_stats": stats}, real,
                update_stats=True, mutable=["batch_stats"])
            mpd_f, msd_f = discriminator.apply(
                {"params": disc_params,
                 "batch_stats": new_stats["batch_stats"]}, fake,
                update_stats=False)
            loss = (discriminator_loss(mpd_r, mpd_f)
                    + discriminator_loss(msd_r, msd_f))
            return loss, new_stats["batch_stats"]

        (d_loss, new_stats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.disc_params, state.disc_stats)
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt,
                                             state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        # --- generator update (discriminator frozen) ---------------------
        def g_loss_fn(gen_params):
            wav_hat = generator.apply({"params": gen_params}, mel_in)[:, :n]
            mpd_r, msd_r = discriminator.apply(
                {"params": disc_params, "batch_stats": new_stats}, real,
                update_stats=False)
            mpd_f, msd_f = discriminator.apply(
                {"params": disc_params, "batch_stats": new_stats}, wav_hat,
                update_stats=False)
            adv = (generator_adversarial_loss(mpd_f)
                   + generator_adversarial_loss(msd_f))
            fm = FM_WEIGHT * (feature_matching_loss(mpd_r, mpd_f)
                              + feature_matching_loss(msd_r, msd_f))
            mel = MEL_WEIGHT * mel_l1_loss(wav_hat, real, mel_cfg)
            total = adv + fm + mel
            return total, (adv, fm, mel)

        (g_total, (adv, fm, mel)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.gen_params)
        g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt,
                                           state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = VocoderState(
            step=state.step + 1, gen_params=gen_params, gen_opt=gen_opt,
            disc_params=disc_params, disc_stats=new_stats,
            disc_opt=disc_opt)
        metrics = VocoderMetrics(disc=d_loss, gen_adv=adv, feature=fm,
                                 mel=mel, gen_total=g_total)
        return new_state, metrics

    if steps_per_dispatch > 1:
        # lax.scan over K steps per dispatch: on a remote-attached chip the
        # per-dispatch RTT (~26 ms through the tunnel) would otherwise
        # dominate these sub-50ms GAN steps (same rationale as
        # training/step.py's scanned multi-step).  Takes (K, B, S) wavs and
        # reports the LAST step's metrics.
        def multi(state: VocoderState, wavs_k: jnp.ndarray):
            new_state, ms = jax.lax.scan(
                lambda st, w: step(st, w), state, wavs_k)
            return new_state, jax.tree_util.tree_map(lambda x: x[-1], ms)
        fn, data_spec = multi, P(None, "data")
    else:
        fn, data_spec = step, P("data")

    from .step import _trivial_mesh
    if _trivial_mesh(mesh):
        # 1-device meshes compile the same program under plain jit, without
        # the committed-NamedSharding dispatch overhead (see step.py)
        return jax.jit(fn, donate_argnums=0)
    data = NamedSharding(mesh, data_spec)
    repl = NamedSharding(mesh, P())
    return jax.jit(fn, donate_argnums=0,
                   in_shardings=(repl, data),
                   out_shardings=(repl, repl))


def sample_segments(wavs: list[np.ndarray], batch_size: int,
                    segment_size: int, rng: np.random.Generator
                    ) -> np.ndarray:
    """Host-side random fixed-size segment batch (static shapes for XLA);
    short clips are zero-padded."""
    out = np.zeros((batch_size, segment_size), np.float32)
    idx = rng.integers(0, len(wavs), size=batch_size)
    for j, i in enumerate(idx):
        w = wavs[i]
        if len(w) > segment_size:
            s = rng.integers(0, len(w) - segment_size)
            out[j] = w[s: s + segment_size]
        else:
            out[j, : len(w)] = w
    return out
