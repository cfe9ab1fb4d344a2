"""Static-shape mask utilities.

Convention: this framework uses *validity* masks — ``True`` marks a real
(non-padded) position.  The reference uses the opposite polarity
(``utils/tools.py:91-99`` ``get_mask_from_lengths`` returns True at padding);
flip with ``~`` when comparing.
"""

from __future__ import annotations

import jax.numpy as jnp


def length_to_valid(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths → (B, max_len) bool, True where position < length.

    Equivalent (negated) to reference ``utils/tools.py:91-99``.
    """
    pos = jnp.arange(max_len, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def attn_pair_mask(q_valid: jnp.ndarray, k_valid: jnp.ndarray) -> jnp.ndarray:
    """(B, Lq) x (B, Lk) → (B, Lq, Lk) bool, True where both valid.

    Matches reference espnet-style ``model/loss.py:253-360`` non-pad pair
    masks used by the guided-attention loss.
    """
    return q_valid[:, :, None] & k_valid[:, None, :]


def masked_mean(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``x`` over positions where ``valid`` is True.

    Numerically identical to ``x.masked_select(valid).mean()`` in the
    reference loss (``model/loss.py:199-240``) for any broadcastable mask.
    """
    valid = jnp.broadcast_to(valid, x.shape)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, x, 0.0)) / denom
