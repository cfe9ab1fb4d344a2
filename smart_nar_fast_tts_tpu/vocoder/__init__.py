"""Neural vocoders (mel → waveform), TPU-native."""

from .hifigan import (HiFiGANConfig, HiFiGANGenerator, ResBlock1, ResBlock2,
                      hifigan_infer)
from .convert import fold_weight_norm, load_hifigan, torch_to_flax

__all__ = [
    "HiFiGANConfig", "HiFiGANGenerator", "ResBlock1", "ResBlock2",
    "hifigan_infer", "fold_weight_norm", "load_hifigan", "torch_to_flax",
]
