"""Acoustic model family, losses, and vocoders (Flax/linen on JAX)."""

from .fastspeech2_align import FastSpeech2Align, ModelOutput
from .loss import FastSpeech2Loss, LossBreakdown

__all__ = ["FastSpeech2Align", "ModelOutput", "FastSpeech2Loss",
           "LossBreakdown"]
