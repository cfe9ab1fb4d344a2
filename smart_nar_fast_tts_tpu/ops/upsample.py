"""Length regulation: phoneme-rate → frame-rate sequence mapping.

The reference's ``LengthRegulator`` (``model/modules.py:195-230``) is a
per-item Python double loop with ``.item()`` host syncs — the slowest hot-path
op in the reference (SURVEY.md §3.1).  Both implementations here are
batched, static-shape, and jit/vmap-clean:

- ``hard_upsample``: exact semantics of the reference regulator (phoneme i
  repeated ``d_i`` times) as a vectorized searchsorted+gather.
- ``gaussian_upsample``: the soft upsampler the reference defines but never
  wires (``model/modules.py:162-192``) — a dense (B, L, T) weight matmul,
  MXU-friendly, differentiable w.r.t. durations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hard_upsample(x: jnp.ndarray, durations: jnp.ndarray, max_len: int
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Repeat each phoneme vector ``d_i`` times along a new time axis.

    Args:
        x: (B, L, D) phoneme-rate features.
        durations: (B, L) non-negative frame counts (int or float; floats
            are truncated by the frame→phoneme assignment, matching the
            reference's integer expand counts after rounding).
        max_len: static output frame capacity T.

    Returns:
        (out (B, T, D) with frames ≥ Σd zeroed, mel_len (B,) = min(Σd, T)).

    Frame t belongs to phoneme i iff cumsum(d)_{i-1} <= t < cumsum(d)_i —
    identical ordering to reference ``LengthRegulator.expand``
    (``model/modules.py:217-226``).
    """
    cum = jnp.cumsum(durations.astype(jnp.float32), axis=1)       # (B, L)
    t = jnp.arange(max_len, dtype=jnp.float32)                     # (T,)
    # idx[b, t] = number of cum entries <= t  == phoneme owning frame t
    # compare_all: the default 'scan' binary search lowers to sequential
    # gather steps (~40x slower on TPU for these sizes, see
    # models/variance.py:bucketize); L=128 boundaries make the all-compare
    # reduction a cheap (T, L) VPU op
    idx = jax.vmap(
        lambda c: jnp.searchsorted(c, t, side="right",
                                   method="compare_all"))(cum)     # (B, T)
    total = cum[:, -1]
    valid = t[None, :] < total[:, None]                            # (B, T)
    gathered = jnp.take_along_axis(
        x, jnp.clip(idx, 0, x.shape[1] - 1)[:, :, None], axis=1)
    out = jnp.where(valid[:, :, None], gathered, 0.0)
    mel_len = jnp.minimum(total, max_len).astype(jnp.int32)
    return out, mel_len


def gaussian_upsample(x: jnp.ndarray, durations: jnp.ndarray, max_len: int,
                      phon_valid: jnp.ndarray, sigma: float = 10.0
                      ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Soft Gaussian upsampling (Non-Attentive Tacotron style).

    ``w[b, l, t] ∝ exp(-sigma^-2 (t - c_l)^2)`` with centers
    ``c_l = cumsum(d)_l - d_l/2``, normalized over valid phonemes
    (reference ``model/modules.py:162-192`` with sigma=10.0 hardcoded at
    ``:175``; unlike the reference, padded phonemes are masked out of the
    normalization instead of contributing spurious weight at the sequence
    tail).

    Returns (out (B, T, D), mel_len (B,), w (B, L, T)).
    """
    d = durations.astype(jnp.float32) * phon_valid
    e = jnp.cumsum(d, axis=1)
    c = e - 0.5 * d                                                # (B, L)
    t = jnp.arange(max_len, dtype=jnp.float32)                     # (T,)
    dist2 = (t[None, None, :] - c[:, :, None]) ** 2                # (B, L, T)
    w = jnp.exp(-(sigma ** -2) * dist2) * phon_valid[:, :, None]
    w = w / (jnp.sum(w, axis=1, keepdims=True) + 1e-20)
    total = e[:, -1]
    frame_valid = t[None, :] < total[:, None]
    w = w * frame_valid[:, None, :]
    out = jnp.einsum("blt,bld->btd", w, x,
                     preferred_element_type=jnp.float32)
    mel_len = jnp.minimum(total, max_len).astype(jnp.int32)
    return out.astype(x.dtype), mel_len, w
