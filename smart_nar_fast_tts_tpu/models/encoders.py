"""Text encoder, mel (reference/alignment) encoder, and mel decoder.

Parity targets: ``transformer/Models.py:33-244`` (TxtEncoder / MelEncoder /
MelDecoder).  Differences by design:

- The sinusoid PE table is generated per traced length from the closed-form
  formula (``ops/positional.py``); since the stored-buffer rows in the
  reference equal the formula output, the reference's beyond-``max_seq_len``
  regeneration branch (``Models.py:82-87`` etc.) collapses into one code
  path with identical values.
- Sequence truncation to ``max_seq_len`` during training
  (``Models.py:159,227``) is enforced by the data pipeline's static length
  buckets, not by in-graph slicing.
- The first mel frame is zeroed ("go frame", ``Models.py:145-146``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.positional import sinusoid_table
from ..text.symbols import VOCAB_SIZE
from .layers import FFTBlock, Prenet


def _pe(length: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(sinusoid_table(length, dim), dtype=dtype)


def _dtype_of(cfg: ModelConfig) -> jnp.dtype:
    return (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
            else jnp.float32)


class TxtEncoder(nn.Module):
    """Phoneme embedding + PE + N self-attention FFT blocks
    (reference ``transformer/Models.py:33-100``)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, texts: jnp.ndarray, src_valid: jnp.ndarray,
                 deterministic: bool = True,
                 src_cap: jnp.ndarray | None = None) -> jnp.ndarray:
        t = self.cfg.transformer
        dtype = _dtype_of(self.cfg)
        emb = nn.Embed(VOCAB_SIZE, t.encoder_hidden, dtype=dtype,
                       name="src_word_emb")(texts)
        x = emb + _pe(texts.shape[1], t.encoder_hidden, emb.dtype)[None]
        for i in range(t.encoder_layer):
            x, _ = FFTBlock(
                t.encoder_hidden, t.encoder_head, t.conv_filter_size,
                t.conv_kernel_size, t.encoder_dropout, need_attn=False,
                dtype=dtype,
                name=f"layer_{i}")(x, src_valid,
                                   deterministic=deterministic,
                                   cap_valid=src_cap)
        # variance adaptor and duration extraction stay in f32
        return x.astype(jnp.float32)


class MelEncoder(nn.Module):
    """Reference encoder + linguistic↔acoustic alignment attention
    (reference ``transformer/Models.py:103-173``).

    Queries are prenet-projected ground-truth mels (first frame zeroed);
    keys/values are the text-encoder output.  Returns the final hidden state
    (discarded by the composite model, matching reference
    ``fastspeech2_align.py:56``) and the per-layer cross-attention maps
    ``(B, n_head, T_mel, L_txt)`` consumed by duration extraction and the
    guided-attention loss.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, src_output: jnp.ndarray, mels: jnp.ndarray,
                 src_valid: jnp.ndarray, mel_valid: jnp.ndarray,
                 deterministic: bool = True,
                 mel_cap: jnp.ndarray | None = None,
                 src_lens: jnp.ndarray | None = None,
                 mel_lens: jnp.ndarray | None = None,
                 fused: bool = False) -> tuple[jnp.ndarray, list]:
        t = self.cfg.transformer
        go_mels = mels.at[:, 0, :].set(0.0)
        x = Prenet(t.decoder_hidden, dropout=0.2, name="prenet")(
            go_mels, deterministic)
        x = x + _pe(mels.shape[1], t.decoder_hidden, x.dtype)[None]
        # alignment attention maps feed duration extraction + the guided
        # attention loss — keep this stack in f32 regardless of policy.
        # ``fused`` swaps in the Pallas kernel that returns only the loss
        # reductions (ops/pallas/alignment.py) instead of the full maps.
        attns = []
        for i in range(t.decoder_layer):
            x, attn = FFTBlock(
                t.decoder_hidden, t.decoder_head, t.conv_filter_size,
                t.conv_kernel_size, t.decoder_dropout,
                alignment_extras=fused,
                guided_sigma=self.cfg.guided_sigma,
                name=f"layer_{i}")(x, mel_valid, kv=src_output,
                                   kv_valid=src_valid,
                                   deterministic=deterministic,
                                   cap_valid=mel_cap,
                                   src_lens=src_lens, mel_lens=mel_lens)
            attns.append(attn)
        return x, attns


class MelDecoder(nn.Module):
    """PE + N self-attention FFT blocks over the upsampled sequence
    (reference ``transformer/Models.py:176-244``).

    When ``cfg.sequence_parallel`` and an ``sp_mesh`` is given, each block's
    self-attention runs as ring attention with the frame axis sharded over
    ``cfg.sp_axis`` (SURVEY.md §5.7 long-context story)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, mel_valid: jnp.ndarray,
                 deterministic: bool = True,
                 mel_cap: jnp.ndarray | None = None,
                 sp_mesh=None) -> jnp.ndarray:
        t = self.cfg.transformer
        dtype = _dtype_of(self.cfg)
        if self.cfg.sequence_parallel and sp_mesh is None:
            raise ValueError(
                "ModelConfig.sequence_parallel=True requires the mesh: "
                "pass sp_mesh= to the model call (a jax.sharding.Mesh with "
                f"axis {self.cfg.sp_axis!r}; the frame capacity "
                f"{x.shape[1]} must divide its size)")
        sp = sp_mesh if self.cfg.sequence_parallel else None
        x = x.astype(dtype) + _pe(x.shape[1], t.decoder_hidden,
                                  dtype)[None]
        for i in range(t.decoder_layer):
            x, _ = FFTBlock(
                t.decoder_hidden, t.decoder_head, t.conv_filter_size,
                t.conv_kernel_size, t.decoder_dropout, need_attn=False,
                dtype=dtype,
                name=f"layer_{i}")(x, mel_valid,
                                   deterministic=deterministic,
                                   cap_valid=mel_cap,
                                   sp_mesh=sp, sp_axis=self.cfg.sp_axis)
        return x.astype(jnp.float32)     # mel_linear/postnet stay f32
