"""On-the-fly duration-label extraction from alignment attention.

The reference computes per-item durations with a Python loop over phonemes
(``FastSpeech2Align._calculate_duration``, recovered from bytecode —
SURVEY.md §2.4.1): for every output frame take the argmax over the text axis
of the last MelEncoder layer's attention, then count frames per phoneme.

Both semantics are provided, fully vectorized (one-hot count = masked
argmax + segment-sum, no host sync):

- ``intended``: head-reduced 2-D attention, frames < olen, argmax over
  valid phonemes only; Σ durations = olen.
- ``buggy``: bit-compatible with the literal reference computation, whose
  3-D slicing counts argmaxes of *both heads* over the first ``ilen``
  (not olen) frames against the *unmasked* text axis, giving
  Σ ≈ n_head·ilen (SURVEY.md §2.4.1 shape quirk).
"""

from __future__ import annotations

import jax.numpy as jnp


def durations_from_attention(attn: jnp.ndarray, src_lens: jnp.ndarray,
                             mel_lens: jnp.ndarray,
                             mode: str = "intended",
                             head_reduce: str = "first") -> jnp.ndarray:
    """(B, H, T_mel, L_txt) attention → (B, L_txt) integer durations.

    The attention is detached by the caller (no gradient flows into the
    aligner from the duration loss, reference ``fastspeech2_align.py:58``).
    """
    B, H, T, L = attn.shape
    frame_pos = jnp.arange(T)[None, :]                  # (1, T)
    text_pos = jnp.arange(L)[None, :]                   # (1, L)
    text_valid = text_pos < src_lens[:, None]           # (B, L)

    if mode == "intended":
        if head_reduce == "mean":
            a = jnp.mean(attn, axis=1)                  # (B, T, L)
        else:
            a = attn[:, 0]
        # exclude padded phonemes from the argmax
        a = jnp.where(text_valid[:, None, :], a, -jnp.inf)
        idx = jnp.argmax(a, axis=-1)                    # (B, T)
        frame_valid = frame_pos < mel_lens[:, None]     # (B, T)
        onehot = (idx[:, :, None] == text_pos[:, None, :])
        counts = jnp.sum(onehot & frame_valid[:, :, None], axis=1)
        return counts.astype(jnp.int32)

    if mode == "soft":
        # Expected-count extraction (VERDICT r4 Next #4): instead of hard
        # frame ownership, each valid frame distributes its single vote
        # over phonemes proportionally to its (valid-phoneme-renormalized)
        # attention row: soft[i] = Σ_t p(i|t).  Rounded sum-preservingly
        # via cumulative rounding — cum = cumsum(soft) is nondecreasing,
        # so diff(round(cum)) is a nonnegative integer vector with the
        # exact total Σ = olen (each row sums to 1).
        if head_reduce == "mean":
            a = jnp.mean(attn, axis=1)                  # (B, T, L)
        else:
            a = attn[:, 0]
        a = jnp.where(text_valid[:, None, :], a, 0.0)
        a = a / jnp.maximum(jnp.sum(a, axis=-1, keepdims=True), 1e-9)
        frame_valid = frame_pos < mel_lens[:, None]     # (B, T)
        soft = jnp.sum(a * frame_valid[:, :, None], axis=1)   # (B, L)
        cum = jnp.cumsum(soft, axis=-1)
        r = jnp.round(cum)
        counts = jnp.diff(r, axis=-1, prepend=0.0)
        return counts.astype(jnp.int32)

    if mode == "buggy":
        # Literal reference math: slice [:olen] hits the HEAD axis (always
        # all heads since olen >= n_head), slice [:ilen] hits the FRAME
        # axis, argmax runs over the full unmasked text axis.
        idx = jnp.argmax(attn, axis=-1)                 # (B, H, T)
        frame_valid = frame_pos < src_lens[:, None]     # (B, T) — ilen!
        onehot = (idx[:, :, :, None] == text_pos[None, None, :])
        counts = jnp.sum(
            onehot & frame_valid[:, None, :, None], axis=(1, 2))
        counts = jnp.where(text_valid, counts, 0)       # F.pad zeros
        return counts.astype(jnp.int32)

    raise ValueError(f"unknown duration extraction mode: {mode}")


def durations_from_argmax(idx: jnp.ndarray, src_lens: jnp.ndarray,
                          mel_lens: jnp.ndarray, L: int) -> jnp.ndarray:
    """(B, T) per-frame argmax indices → (B, L) frame counts.

    Same 'intended' semantics as :func:`durations_from_attention` given the
    argmax indices directly (the fused alignment kernel emits these,
    ``ops/pallas/alignment.py``): only frames < mel_len count, and padded
    phonemes receive zero.
    """
    B, T = idx.shape
    frame_valid = jnp.arange(T)[None, :] < mel_lens[:, None]      # (B, T)
    text_pos = jnp.arange(L)[None, :]
    onehot = idx[:, :, None] == text_pos[:, None, :]              # (B, T, L)
    counts = jnp.sum(onehot & frame_valid[:, :, None], axis=1)
    counts = jnp.where(text_pos < src_lens[:, None], counts, 0)
    return counts.astype(jnp.int32)
