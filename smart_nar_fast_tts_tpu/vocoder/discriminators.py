"""HiFi-GAN discriminators for vocoder (fine-)tuning.

The reference only *infers* through HiFi-GAN (``utils/model.py:70-88``); the
pod-scale fine-tune config (BASELINE config 5) additionally needs the GAN
side: the multi-period discriminator (MPD, periods 2/3/5/7/11 viewing the
waveform as a ``(T/p, p)`` image) and the multi-scale discriminator (MSD,
raw + ×2 + ×4 average-pooled scales) from the HiFi-GAN paper.

TPU-first notes: feature-last layouts; the MPD's period reshape is a free
relayout under XLA; grouped convs map directly to ``feature_group_count``;
weight/spectral norm use flax's built-in reparameterizations (spectral-norm
power-iteration state lives in the ``batch_stats`` collection).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

LRELU_SLOPE = 0.1

# score + per-layer feature maps, one entry per sub-discriminator
DiscOutput = list[tuple[jnp.ndarray, list[jnp.ndarray]]]


class PeriodDiscriminator(nn.Module):
    """One MPD branch: wav folded to (B, T/p, p, 1), 2-D convs with kernel
    (5, 1) and stride (3, 1) over the folded-time axis."""

    period: int
    channels: Sequence[int] = (32, 128, 512, 1024)

    @nn.compact
    def __call__(self, wav: jnp.ndarray, update_stats: bool = False):
        p = self.period
        B, T = wav.shape
        pad = (-T) % p
        x = jnp.pad(wav, ((0, 0), (0, pad)), mode="reflect")
        x = x.reshape(B, (T + pad) // p, p, 1)

        feats = []
        for i, ch in enumerate(self.channels):
            conv = nn.WeightNorm(nn.Conv(
                ch, (5, 1), strides=(3, 1), padding=((2, 2), (0, 0)),
                name=f"conv_{i}"))
            x = nn.leaky_relu(conv(x), LRELU_SLOPE)
            feats.append(x)
        conv = nn.WeightNorm(nn.Conv(
            1024, (5, 1), padding=((2, 2), (0, 0)), name="conv_4"))
        x = nn.leaky_relu(conv(x), LRELU_SLOPE)
        feats.append(x)
        x = nn.WeightNorm(nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)),
                                  name="conv_post"))(x)
        feats.append(x)
        return x.reshape(B, -1), feats


class ScaleDiscriminator(nn.Module):
    """One MSD branch: the paper's 1-D grouped-conv stack; spectral norm on
    the raw-scale branch, weight norm on the pooled scales."""

    use_spectral_norm: bool = False
    # (features, kernel, stride, groups) per layer — paper stack by default
    layers: Sequence[tuple] = (
        (128, 15, 1, 1),
        (128, 41, 2, 4),
        (256, 41, 2, 16),
        (512, 41, 4, 16),
        (1024, 41, 4, 16),
        (1024, 41, 1, 16),
        (1024, 5, 1, 1),
    )

    @nn.compact
    def __call__(self, wav: jnp.ndarray, update_stats: bool = False):
        layers = self.layers
        B = wav.shape[0]
        x = wav[..., None]                        # (B, T, 1)

        def norm(layer):
            if self.use_spectral_norm:
                return nn.SpectralNorm(layer)
            return nn.WeightNorm(layer)

        feats = []
        for i, (ch, k, s, g) in enumerate(layers):
            conv = norm(nn.Conv(ch, (k,), strides=(s,),
                                padding=[(k // 2, k // 2)],
                                feature_group_count=g, name=f"conv_{i}"))
            x = (conv(x, update_stats=update_stats)
                 if self.use_spectral_norm else conv(x))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            feats.append(x)
        post = norm(nn.Conv(1, (3,), padding=[(1, 1)], name="conv_post"))
        x = (post(x, update_stats=update_stats)
             if self.use_spectral_norm else post(x))
        feats.append(x)
        return x.reshape(B, -1), feats


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, wav: jnp.ndarray, update_stats: bool = False
                 ) -> DiscOutput:
        return [PeriodDiscriminator(p, name=f"period_{p}")(wav)
                for p in self.periods]


class MultiScaleDiscriminator(nn.Module):
    n_scales: int = 3
    layers: Sequence[tuple] = ScaleDiscriminator.layers

    @nn.compact
    def __call__(self, wav: jnp.ndarray, update_stats: bool = False
                 ) -> DiscOutput:
        out: DiscOutput = []
        x = wav
        for i in range(self.n_scales):
            if i > 0:
                # AvgPool1d(4, stride 2, pad 2) between scales
                x = nn.avg_pool(x[..., None], (4,), strides=(2,),
                                padding=[(2, 2)])[..., 0]
            out.append(ScaleDiscriminator(
                use_spectral_norm=(i == 0), layers=self.layers,
                name=f"scale_{i}")(x, update_stats=update_stats))
        return out


class HiFiGANDiscriminator(nn.Module):
    """MPD + MSD under one param tree, returning both output lists."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    period_channels: Sequence[int] = (32, 128, 512, 1024)
    n_scales: int = 3
    scale_layers: Sequence[tuple] = ScaleDiscriminator.layers

    @nn.compact
    def __call__(self, wav: jnp.ndarray, update_stats: bool = False
                 ) -> tuple[DiscOutput, DiscOutput]:
        mpd = [PeriodDiscriminator(p, self.period_channels,
                                   name=f"mpd_period_{p}")(wav)
               for p in self.periods]
        msd = MultiScaleDiscriminator(
            self.n_scales, self.scale_layers, name="msd")(wav, update_stats)
        return mpd, msd
