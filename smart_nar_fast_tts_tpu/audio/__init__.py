"""DSP layer: mel filterbank construction, STFT/mel feature extraction,
Griffin-Lim reconstruction — pure-function JAX with precomputed host
constants, matching the reference's TacotronSTFT feature definition
(``audio/stft.py:128-178``)."""

from .mel import mel_filterbank, hann_window
from .stft import MelSpectrogramConfig, mel_spectrogram, stft_magnitude

__all__ = [
    "mel_filterbank", "hann_window",
    "MelSpectrogramConfig", "mel_spectrogram", "stft_magnitude",
]
