"""Pallas TPU kernels for the hot ops (SURVEY.md §7.4.3).

Every kernel here has a pure-JAX oracle in ``smart_nar_fast_tts_tpu.ops`` /
``..audio``; kernels are validated against those oracles in interpret mode on
CPU and dispatched only on real TPU backends (``use_pallas()``), so the
framework is fully functional — just slower — anywhere Mosaic isn't
available.
"""

from __future__ import annotations

import os

import jax


def use_pallas() -> bool:
    """True when the default JAX backend can compile Mosaic TPU kernels
    (or ``SMART_TTS_PALLAS=interpret`` forces the interpreted kernels so CI
    exercises the dispatch path on CPU; ``SMART_TTS_PALLAS=off`` disables
    kernels everywhere)."""
    mode = os.environ.get("SMART_TTS_PALLAS", "auto")
    if mode == "off":
        return False
    if mode == "interpret":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing never raises today
        return False


def pallas_interpret() -> bool:
    """Whether kernels must run in interpreter mode (non-TPU backend)."""
    return os.environ.get("SMART_TTS_PALLAS", "auto") == "interpret"


from .attention import flash_attention  # noqa: E402
from .upsample import gaussian_upsample_banded  # noqa: E402
from .stft import fused_log_mel  # noqa: E402
from .alignment import alignment_attention  # noqa: E402

__all__ = ["use_pallas", "pallas_interpret", "flash_attention",
           "gaussian_upsample_banded", "fused_log_mel",
           "alignment_attention"]
