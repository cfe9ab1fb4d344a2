"""MelGAN generator, TPU-native — the reference's alternative vocoder.

The reference pulls MelGAN from torch.hub (``utils/model.py:42-52``,
descript/melgan-neurips) and runs ``vocoder.inverse(mel / log(10))``
(``utils/model.py:73-74``, MelGAN consumes log10 mels).  This module
re-implements the generator topology natively (ngf-32 stack: reflect-pad
conv7 → per-ratio [LReLU 0.2 → transposed conv k=2r → 3 dilated residual
blocks (dilation 3ʲ, shortcut 1×1)] → LReLU → reflect-pad conv7 → tanh) and
imports torch.hub checkpoints by folding weight norm.

Feature-last layout and lhs-dilated transposed convs as in ``hifigan.py``.
Even upsample ratios only (all published configs: 8,8,2,2 @22k / 8,8,4 @16k
use even ratios); odd ratios would need torch's output_padding asymmetry.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .convert import fold_weight_norm
from .hifigan import ConvTranspose1d

MELGAN_LRELU = 0.2


@dataclass(frozen=True)
class MelGANConfig:
    n_mels: int = 80
    ngf: int = 32
    n_residual_layers: int = 3
    ratios: Sequence[int] = (8, 8, 2, 2)
    sampling_rate: int = 22050

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.ratios:
            out *= r
        return out

    def to_dict(self) -> dict:
        from dataclasses import asdict
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "MelGANConfig":
        if "ratios" in d:
            d = {**d, "ratios": tuple(d["ratios"])}
        return cls(**d)


class ReflectConv1d(nn.Module):
    """Reflection-padded conv (torch ``ReflectionPad1d`` + ``Conv1d`` pair,
    the MelGAN padding style)."""

    features: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel_size - 1) * self.dilation // 2
        if pad:
            x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        return nn.Conv(self.features, (self.kernel_size,),
                       kernel_dilation=(self.dilation,), padding="VALID",
                       name="conv")(x)


class MelGANResnetBlock(nn.Module):
    """LReLU → reflect-pad dilated conv3 → LReLU → conv1, plus a 1×1
    shortcut (descript melgan ``ResnetBlock``)."""

    dim: int
    dilation: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.leaky_relu(x, MELGAN_LRELU)
        h = ReflectConv1d(self.dim, 3, self.dilation, name="block_conv1")(h)
        h = nn.leaky_relu(h, MELGAN_LRELU)
        h = ReflectConv1d(self.dim, 1, name="block_conv2")(h)
        s = ReflectConv1d(self.dim, 1, name="shortcut")(x)
        return s + h


class MelGANGenerator(nn.Module):
    """log10-mel (B, T, n_mels) → waveform (B, T·hop) in [-1, 1]."""

    config: MelGANConfig = field(default_factory=MelGANConfig)

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        mult = 2 ** len(c.ratios)
        x = ReflectConv1d(mult * c.ngf, 7, name="conv_pre")(mel)
        for i, r in enumerate(c.ratios):
            if r % 2:
                raise ValueError("MelGANGenerator supports even ratios only")
            ch = mult * c.ngf // (2 ** (i + 1))
            x = nn.leaky_relu(x, MELGAN_LRELU)
            x = ConvTranspose1d(ch, 2 * r, r, name=f"ups_{i}")(x)
            for j in range(c.n_residual_layers):
                x = MelGANResnetBlock(ch, 3 ** j,
                                      name=f"res_{i}_{j}")(x)
        x = nn.leaky_relu(x, MELGAN_LRELU)
        x = ReflectConv1d(1, 7, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


def melgan_inverse(generator: MelGANGenerator, variables, log_mels,
                   mel_lens=None, max_wav_value: float = 32768.0):
    """Reference MelGAN branch (``utils/model.py:73-88``): natural-log mels
    are rescaled to log10 (``mels / log(10)``), inverted, scaled, and
    trimmed per item to ``mel_lens·hop`` samples."""
    mels = jnp.asarray(log_mels) / float(np.log(10.0))
    wavs = jax.jit(generator.apply)(variables, mels)
    wavs = np.asarray(wavs) * max_wav_value
    if mel_lens is None:
        return list(wavs)
    hop = generator.config.hop_length
    return [w[: int(n) * hop] for w, n in zip(wavs, np.asarray(mel_lens))]


# ---------------------------------------------------------------------------
# torch.hub checkpoint import
# ---------------------------------------------------------------------------

def melgan_torch_to_flax(sd: Mapping[str, np.ndarray],
                         cfg: MelGANConfig | None = None) -> dict:
    """descript melgan-neurips generator state dict → flax params.

    The torch model is one ``nn.Sequential`` named ``model``; layer indices
    follow the construction order: [pad, conv7, (lrelu, convT, 3×res)·R,
    lrelu, pad, conv7, tanh].  Residual sub-blocks live at
    ``model.<idx>.block.{1,3}`` (convs) and ``model.<idx>.shortcut``.
    """
    cfg = cfg or MelGANConfig()
    sd = fold_weight_norm({k: np.asarray(v) for k, v in sd.items()})

    def conv(prefix):
        w = sd[prefix + ".weight"]               # (out, in, k)
        b = sd[prefix + ".bias"]
        return {"conv": {"kernel": w.transpose(2, 1, 0), "bias": b}}

    def convT(prefix):
        w = sd[prefix + ".weight"]               # (in, out, k)
        return {"kernel": w[:, :, ::-1].transpose(2, 0, 1).copy(),
                "bias": sd[prefix + ".bias"]}

    params: dict = {}
    idx = 1                                      # model.0 is ReflectionPad
    params["conv_pre"] = conv(f"model.{idx}")
    idx += 1
    for i in range(len(cfg.ratios)):
        idx += 1                                 # LeakyReLU
        params[f"ups_{i}"] = convT(f"model.{idx}")
        idx += 1
        for j in range(cfg.n_residual_layers):
            base = f"model.{idx}"
            params[f"res_{i}_{j}"] = {
                "block_conv1": conv(base + ".block.2"),
                "block_conv2": conv(base + ".block.4"),
                "shortcut": conv(base + ".shortcut"),
            }
            idx += 1
    idx += 2                                     # LeakyReLU, ReflectionPad
    params["conv_post"] = conv(f"model.{idx}")
    return {"params": params}
