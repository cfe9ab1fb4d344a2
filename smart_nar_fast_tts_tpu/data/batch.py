"""The padded, static-shape training batch type shared by the data layer
and the jitted train/eval steps (the reference's 11-tuple,
``dataset.py:88-118``, minus host-only id/raw-text fields)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class Batch(NamedTuple):
    texts: jnp.ndarray       # (B, L) int32
    src_lens: jnp.ndarray    # (B,)
    mels: jnp.ndarray        # (B, T, n_mels)
    mel_lens: jnp.ndarray    # (B,)
    pitch: jnp.ndarray       # (B, T) or (B, L) by feature level
    energy: jnp.ndarray      # (B, T) or (B, L)
    speakers: Optional[jnp.ndarray] = None   # (B,)
