"""Neural vocoders (mel → waveform), TPU-native."""

from .hifigan import (HiFiGANConfig, HiFiGANGenerator, ResBlock1, ResBlock2,
                      hifigan_infer)
from .convert import fold_weight_norm, load_hifigan, torch_to_flax
from .discriminators import (HiFiGANDiscriminator, MultiPeriodDiscriminator,
                             MultiScaleDiscriminator)
from .losses import (discriminator_loss, feature_matching_loss,
                     generator_adversarial_loss, mel_l1_loss)
from .melgan import (MelGANConfig, MelGANGenerator, melgan_inverse,
                     melgan_torch_to_flax)
from .streaming import (StreamingVocoder, mel_receptive_halo,
                        melgan_receptive_halo, receptive_halo)
from .vocos import VocosConfig, VocosGenerator, vocos_infer

__all__ = [
    "HiFiGANConfig", "HiFiGANGenerator", "ResBlock1", "ResBlock2",
    "hifigan_infer", "fold_weight_norm", "load_hifigan", "torch_to_flax",
    "HiFiGANDiscriminator", "MultiPeriodDiscriminator",
    "MultiScaleDiscriminator", "discriminator_loss", "feature_matching_loss",
    "generator_adversarial_loss", "mel_l1_loss",
    "MelGANConfig", "MelGANGenerator", "melgan_inverse",
    "melgan_torch_to_flax",
    "StreamingVocoder", "mel_receptive_halo",
    "melgan_receptive_halo", "receptive_halo",
    "VocosConfig", "VocosGenerator", "vocos_infer",
]
