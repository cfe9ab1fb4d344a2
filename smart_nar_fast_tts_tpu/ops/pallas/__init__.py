"""Pallas TPU kernels for the hot ops (SURVEY.md §7.4.3).

Every kernel here has a pure-JAX oracle in ``smart_nar_fast_tts_tpu.ops`` /
``..audio``; kernels are validated against those oracles in interpret mode on
CPU and dispatched only on real TPU backends (``use_pallas()``), so the
framework is fully functional — just slower — anywhere Mosaic isn't
available.
"""

from __future__ import annotations

import jax


def use_pallas() -> bool:
    """True when the default JAX backend can compile Mosaic TPU kernels."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing never raises today
        return False


from .attention import flash_attention  # noqa: E402
from .upsample import gaussian_upsample_banded  # noqa: E402
from .stft import fused_log_mel  # noqa: E402

__all__ = ["use_pallas", "flash_attention", "gaussian_upsample_banded",
           "fused_log_mel"]
