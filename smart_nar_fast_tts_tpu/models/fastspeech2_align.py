"""FastSpeech2Align: the composite non-autoregressive acoustic model with
learned (attention-based) alignment.

Parity target: reference ``model/fastspeech2_align.py:13-100``.

Train path (ground-truth mels given):
    TxtEncoder → MelEncoder cross-attention → duration extraction from the
    last layer's detached attention → VarianceAdaptor (GT pitch/energy
    targets, extracted durations) → MelDecoder → mel linear → PostNet
    residual.
Inference path (no mels): predicted durations drive length regulation;
    pitch/energy come from own scaled predictions.

Differences by design (all SURVEY.md §7.1):
- returns a typed ``ModelOutput`` instead of a 12-tuple;
- duration extraction is vectorized with intended 2-D semantics by default
  (``cfg.duration_extraction='buggy'`` restores bit-compat, SURVEY §2.4.1);
- optional speaker embedding when ``cfg.multi_speaker`` (the reference
  accepts a ``speakers`` argument and ignores it, ``fastspeech2_align.py:31``
  despite the ``multi_speaker`` config key);
- static frame capacity ``max_mel_len`` with validity masks instead of
  data-dependent output shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import FeatureStats, ModelConfig, PreprocessConfig
from ..ops.duration import durations_from_argmax, durations_from_attention
from ..ops.masks import length_to_valid
from .encoders import MelDecoder, MelEncoder, TxtEncoder
from .layers import PostNet
from .variance import VarianceAdaptor


class ModelOutput(NamedTuple):
    mel: jnp.ndarray                     # (B, T, n_mels) pre-postnet
    postnet_mel: jnp.ndarray             # (B, T, n_mels)
    pitch_prediction: jnp.ndarray
    energy_prediction: jnp.ndarray
    log_duration_prediction: jnp.ndarray  # (B, L)
    duration_rounded: jnp.ndarray         # (B, L)
    src_valid: jnp.ndarray                # (B, L) True=real
    mel_valid: jnp.ndarray                # (B, T)
    src_lens: jnp.ndarray                 # (B,)
    mel_lens: jnp.ndarray                 # (B,)
    alignments: Optional[jnp.ndarray]     # (n_layers, B, H, T, L) train only
    duration_targets: Optional[jnp.ndarray]   # (B, L) train only
    # fused-alignment path (TPU): per-layer guided-attention numerators
    # Σ W·p over valid pairs, head 0 (n_layers, B); alignments is None then
    guided_numerators: Optional[jnp.ndarray] = None


class FastSpeech2Align(nn.Module):
    cfg: ModelConfig
    preprocess_cfg: PreprocessConfig

    @property
    def stats(self) -> FeatureStats:
        return self.preprocess_cfg.stats or FeatureStats()

    @nn.compact
    def __call__(self,
                 texts: jnp.ndarray,            # (B, L) int32 symbol ids
                 src_lens: jnp.ndarray,         # (B,)
                 mels: Optional[jnp.ndarray] = None,    # (B, T, n_mels)
                 mel_lens: Optional[jnp.ndarray] = None,
                 max_mel_len: Optional[int] = None,
                 p_targets: Optional[jnp.ndarray] = None,
                 e_targets: Optional[jnp.ndarray] = None,
                 speakers: Optional[jnp.ndarray] = None,
                 p_control: float = 1.0,
                 e_control: float = 1.0,
                 d_control: float = 1.0,
                 deterministic: bool = True,
                 sp_mesh=None) -> ModelOutput:
        is_training = mels is not None and mel_lens is not None
        B, L = texts.shape
        src_valid = length_to_valid(src_lens, L)
        # batch-level capacity masks: the reference's tensors physically end
        # at the batch max length; with static bucket shapes the same conv
        # boundary is reproduced by masking beyond max(lengths)
        src_cap = jnp.arange(L) < jnp.max(src_lens)

        src_output = TxtEncoder(self.cfg, name="txt_encoder")(
            texts, src_valid, deterministic, src_cap)

        if self.cfg.multi_speaker and speakers is not None:
            spk = nn.Embed(self.cfg.n_speakers,
                           self.cfg.transformer.encoder_hidden,
                           name="speaker_emb")(speakers)
            src_output = src_output + spk[:, None, :]

        alignments = None
        guided_nums = None
        d_targets = None
        mel_cap = None
        if is_training:
            from ..ops.pallas import use_pallas
            T = mels.shape[1]
            mel_valid = length_to_valid(mel_lens, T)
            mel_cap = jnp.arange(T) < jnp.max(mel_lens)
            # the fused kernel implements exactly the 'intended'/head-0
            # semantics; other modes use the XLA path with full maps
            fused = (use_pallas()
                     and self.cfg.duration_extraction == "intended"
                     and self.cfg.duration_head_reduce == "first")
            _, attns = MelEncoder(self.cfg, name="mel_encoder")(
                src_output, mels, src_valid, mel_valid, deterministic,
                mel_cap, src_lens=src_lens, mel_lens=mel_lens, fused=fused)
            if fused:
                guided_nums = jnp.stack(
                    [a["guided_num"] for a in attns])       # (n_layers, B)
                d_targets = durations_from_argmax(
                    jax.lax.stop_gradient(attns[-1]["argmax"]),
                    src_lens, mel_lens, L)
            else:
                alignments = jnp.stack(attns)   # (n_layers, B, H, T, L)
                d_targets = durations_from_attention(
                    jax.lax.stop_gradient(alignments[-1]), src_lens,
                    mel_lens, mode=self.cfg.duration_extraction,
                    head_reduce=self.cfg.duration_head_reduce)
            max_len = T
        else:
            mel_valid = None
            max_len = max_mel_len if max_mel_len is not None \
                else self.cfg.max_seq_len

        va = VarianceAdaptor(
            self.cfg, self.stats,
            pitch_feature_level=self.preprocess_cfg.pitch_feature,
            energy_feature_level=self.preprocess_cfg.energy_feature,
            name="variance_adaptor")(
                src_output, src_valid, max_len,
                mel_valid=mel_valid,
                pitch_target=p_targets, energy_target=e_targets,
                duration_target=d_targets if is_training else None,
                p_control=p_control, e_control=e_control,
                d_control=d_control, deterministic=deterministic,
                src_cap=src_cap, mel_cap=mel_cap)

        x = MelDecoder(self.cfg, name="mel_decoder")(
            va.x, va.mel_valid, deterministic, va.mel_cap, sp_mesh=sp_mesh)
        mel = nn.Dense(self.cfg.n_mel_channels, name="mel_linear")(x)
        postnet_in = jnp.where(va.mel_cap[None, :, None], mel, 0.0)
        postnet_mel = PostNet(
            n_mels=self.cfg.n_mel_channels, name="postnet")(
                postnet_in, deterministic, va.mel_cap) + mel

        out_mel_lens = mel_lens if is_training else va.mel_len
        return ModelOutput(
            mel=mel, postnet_mel=postnet_mel,
            pitch_prediction=va.pitch_prediction,
            energy_prediction=va.energy_prediction,
            log_duration_prediction=va.log_duration_prediction,
            duration_rounded=va.duration_rounded,
            src_valid=src_valid, mel_valid=va.mel_valid,
            src_lens=src_lens, mel_lens=out_mel_lens,
            alignments=alignments, duration_targets=d_targets,
            guided_numerators=guided_nums)
