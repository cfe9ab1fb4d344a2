"""Vocos-style iSTFT-head vocoder — the TPU-first answer to HiFi-GAN's tail.

The reference consumes vocoders only through the ``vocoder(mel) -> wav``
surface (``utils/model.py:53-88``); HiFi-GAN V1 fills that surface here with
bit-faithful checkpoint parity (``hifigan.py``).  But the measured roofline
(``benchmarks/results/vocoder_stages.json``, README "measured" table) shows
V1's *structure* caps its TPU efficiency: 90% of its FLOPs run at channel
widths 32-128 and sample-rate time resolution, underfilling the 128-lane MXU
and saturating HBM instead.

This module keeps the same external contract but inverts the topology the
TPU-first way (Vocos, Siuzdak 2023, arXiv:2306.00814):

- ALL compute stays at **mel frame rate** (256x fewer positions than the
  waveform) and **constant width** ``dim`` (default 512 = 4 full MXU lanes'
  worth), as a stack of ConvNeXt-1d blocks whose pointwise MLPs are dense
  (T, 512)x(512, 1536) matmuls — the exact shape the MXU is built for.
- The waveform is produced by an **inverse STFT head**: the final Dense
  predicts log-magnitude and phase per frame, and ``audio.stft.istft``
  (windowed overlap-add, the same machinery Griffin-Lim uses) renders
  ``hop`` samples per frame in one shot.  Upsampling is therefore a fixed
  O(n_fft log n_fft) transform, not 13M learned conv parameters at
  waveform resolution.

At the default size (~13.4M params, matching V1's 13.9M) the generator costs
~25 MFLOP per mel frame versus V1's ~616 — a ~24x FLOP reduction before any
MFU difference.  Trains under the identical GAN recipe
(``training/vocoder.py``: MPD+MSD discriminators, feature-matching + mel-L1)
because the train step is generic over any ``mel -> wav`` generator.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..audio.stft import MelSpectrogramConfig, istft_matmul

# Magnitude cap (linear scale) — keeps exp() finite during early GAN
# training when the head is near-random; generous vs. speech spectra.
_MAX_MAG = 1e2


@dataclass(frozen=True)
class VocosConfig:
    """Hashable generator config (same role as ``HiFiGANConfig``)."""

    n_mels: int = 80
    dim: int = 512                 # backbone width (4 x 128 MXU lanes)
    intermediate: int = 1536       # ConvNeXt MLP expansion (3x)
    n_layers: int = 8
    dw_kernel: int = 7             # depthwise mixing kernel (frames)
    n_fft: int = 1024
    hop: int = 256
    win_length: int = 1024
    sampling_rate: int = 22050
    # "bfloat16" runs the backbone matmuls at half HBM traffic; the head
    # projection + iSTFT stay float32 (they set output SNR).
    compute_dtype: str = "float32"

    @property
    def hop_length(self) -> int:
        """Samples per mel frame (interface parity with HiFiGANConfig)."""
        return self.hop

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1

    def stft_config(self) -> MelSpectrogramConfig:
        return MelSpectrogramConfig(
            sampling_rate=self.sampling_rate, n_fft=self.n_fft,
            hop_length=self.hop, win_length=self.win_length,
            n_mels=self.n_mels)

    def to_dict(self) -> dict:
        from dataclasses import asdict
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "VocosConfig":
        return cls(**d)


class _DepthwiseConv1d(nn.Module):
    """Depthwise k-tap conv as k shifted broadcast-multiply-adds.

    XLA's grouped-conv lowering (``feature_group_count=dim``) measured 2x
    slower than this pure vector form across an 8-block stack on v5e
    (1.44 vs 0.72 ms, benchmarks round 4): with one tap per group there is
    no contraction for the MXU, so the op belongs on the VPU as shifts and
    FMAs.  Params are named/shaped exactly like
    ``nn.Conv(dim, (k,), feature_group_count=dim, name=...)`` —
    ``kernel (k, 1, dim)``, ``bias (dim,)`` — so existing checkpoints
    (msgpack and npz alike) load unchanged.
    """

    dim: int
    kernel_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, 1, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        r = (self.kernel_size - 1) // 2
        xp = jnp.pad(x.astype(self.dtype),
                     ((0, 0), (r, self.kernel_size // 2), (0, 0)))
        w = kernel[:, 0, :].astype(self.dtype)
        return sum(xp[:, j:j + x.shape[1], :] * w[j]
                   for j in range(self.kernel_size)
                   ) + bias.astype(self.dtype)


class ConvNeXtBlock1d(nn.Module):
    """Depthwise k-tap frame mixing + pointwise MLP, layer-scaled residual."""

    dim: int
    intermediate: int
    kernel: int
    layer_scale_init: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = _DepthwiseConv1d(self.dim, self.kernel, dtype=self.dtype,
                             name="dwconv")(x)
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(h)
        h = nn.Dense(self.intermediate, dtype=self.dtype, name="pw1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pw2")(h)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init),
            (self.dim,))
        return x + gamma.astype(self.dtype) * h


class VocosGenerator(nn.Module):
    """log-mel (B, T, n_mels) → waveform (B, T·hop).

    Same length contract as ``HiFiGANGenerator`` (T frames → T·hop
    samples): the head's T spectral frames are edge-padded by one frame
    before overlap-add so the trailing half-window is covered.
    """

    config: VocosConfig = field(default_factory=VocosConfig)

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        dtype = (jnp.bfloat16 if c.compute_dtype == "bfloat16"
                 else jnp.float32)

        x = nn.Conv(c.dim, (7,), padding=[(3, 3)], dtype=dtype,
                    name="embed")(mel.astype(dtype))
        x = nn.LayerNorm(dtype=dtype, name="norm_in")(x)
        scale = 1.0 / c.n_layers
        for i in range(c.n_layers):
            x = ConvNeXtBlock1d(c.dim, c.intermediate, c.dw_kernel,
                                scale, dtype=dtype, name=f"block_{i}")(x)
        x = nn.LayerNorm(dtype=dtype, name="norm_out")(x)

        # head + iSTFT in float32: the last linear map sets output SNR
        head = nn.Dense(2 * c.n_bins, name="head")(x.astype(jnp.float32))
        logm, phase = jnp.split(head, 2, axis=-1)
        mag = jnp.exp(jnp.minimum(logm, float(np.log(_MAX_MAG))))
        # (B, T, bins) → (B, bins, T+1): replicate the last frame so the
        # istft (which renders hop·(F-1) samples) covers T·hop exactly.
        mag = jnp.swapaxes(jnp.pad(mag, ((0, 0), (0, 1), (0, 0)),
                                   mode="edge"), 1, 2)
        phase = jnp.swapaxes(jnp.pad(phase, ((0, 0), (0, 1), (0, 0)),
                                     mode="edge"), 1, 2)
        # matmul-iDFT synthesis: no complex FFT (absent on this TPU
        # runtime) and the transform itself rides the MXU
        return istft_matmul(mag, phase, c.stft_config())


@functools.lru_cache(maxsize=8)
def _cached_apply(generator: VocosGenerator):
    return jax.jit(generator.apply)


def vocos_infer(generator: VocosGenerator, variables, mels, mel_lens=None,
                max_wav_value: float = 32768.0):
    """Batched mel → waveform list (same surface as ``hifigan_infer``,
    reference ``utils/model.py:70-88``)."""
    mels = jnp.asarray(mels)
    wavs = np.asarray(_cached_apply(generator)(variables, mels))
    wavs = np.clip(wavs, -1.0, 1.0) * max_wav_value
    hop = generator.config.hop_length
    if mel_lens is None:
        return [w for w in wavs]
    return [w[:int(n) * hop] for w, n in zip(wavs, mel_lens)]
