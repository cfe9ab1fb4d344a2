"""HiFi-GAN V1 generator, TPU-native.

The reference consumes HiFi-GAN through an external package (its ``hifigan/``
directory is a broken symlink); the required surface is reconstructed from
usage at ``utils/model.py:53-65`` (build from a config dict, load the
``"generator"`` entry of a torch checkpoint, fold weight norm, run
``generator(mel)``) plus the upstream V1 topology documented in SURVEY.md
§2.6 #5: conv_pre 80→512 k7; four transposed-conv upsample stages (rates
8,8,2,2 / kernels 16,16,4,4, channel halving 512→32); multi-receptive-field
ResBlocks k∈{3,7,11} with dilations (1,3,5); conv_post →1 k7 with tanh;
LeakyReLU 0.1 between stages (~13.9M params).

TPU-first design decisions:
- Feature-last ``(B, T, C)`` layout throughout so every conv lowers to an
  MXU matmul over the channel axis.
- Transposed convs are expressed as ``lax.conv_general_dilated`` with input
  (lhs) dilation — the exact gradient-of-conv form XLA tiles well — with
  torch-compatible edge semantics so imported checkpoints are bit-faithful.
- Weight norm is always folded at import time (inference) and *not*
  reparameterized during training; GAN fine-tuning uses plain kernels.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

LRELU_SLOPE = 0.1


def _as_tuple(v):
    """Recursively convert (possibly nested) lists to tuples."""
    return tuple(_as_tuple(x) for x in v) if isinstance(v, (list, tuple)) \
        else v


@dataclass(frozen=True)
class HiFiGANConfig:
    """Upstream V1 `config.json` subset actually consumed by the generator
    (reference usage: ``utils/model.py:53-58`` reads the JSON into an
    AttrDict and passes it wholesale)."""

    resblock: str = "1"
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    n_mels: int = 80
    sampling_rate: int = 22050
    # "bfloat16" runs the conv stack on the MXU at half the HBM traffic
    # (params stay float32; the final conv+tanh stays float32 for audio
    # fidelity).  Default float32 matches torch-checkpoint parity.
    compute_dtype: str = "float32"
    # Transposed-conv lowering.  "dilated" (default) is the lhs-dilation
    # form; "polyphase" regroups the kernel by output phase into ONE
    # stride-1 dense conv + depth-to-time reshape.  Same math, same
    # (k, in, out) kernel param; measured on a v5e chip the dilated form
    # wins (benchmarks/results/transpose_ab.json: 49.1 vs 58.4 ms f32,
    # 36.9 vs 40.3 ms bf16 for the full V1 generator at B8xT512) — XLA's
    # TPU emitter already skips the dilation zeros, and polyphase pays for
    # its pad+reshape.  Kept selectable so the A/B stays reproducible.
    transpose_impl: str = "dilated"

    def __post_init__(self):
        # Coerce any list-valued Sequence fields to tuples so every
        # construction path yields a hashable config (hifigan_infer caches
        # its jit wrapper keyed on the generator, which hashes the config).
        for name in ("upsample_rates", "upsample_kernel_sizes",
                     "resblock_kernel_sizes", "resblock_dilation_sizes"):
            object.__setattr__(self, name, _as_tuple(getattr(self, name)))

    @property
    def hop_length(self) -> int:
        out = 1
        for u in self.upsample_rates:
            out *= u
        return out

    def to_dict(self) -> dict:
        """Serializable dict in upstream ``config.json`` key spelling —
        ``from_dict(to_dict())`` round-trips."""
        return {
            "resblock": self.resblock,
            "upsample_rates": list(self.upsample_rates),
            "upsample_kernel_sizes": list(self.upsample_kernel_sizes),
            "upsample_initial_channel": self.upsample_initial_channel,
            "resblock_kernel_sizes": list(self.resblock_kernel_sizes),
            "resblock_dilation_sizes": [
                list(d) for d in self.resblock_dilation_sizes],
            "num_mels": self.n_mels,
            "sampling_rate": self.sampling_rate,
            "compute_dtype": self.compute_dtype,
            "transpose_impl": self.transpose_impl,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "HiFiGANConfig":
        keep = {k: d[k] for k in (
            "resblock", "upsample_rates", "upsample_kernel_sizes",
            "upsample_initial_channel", "resblock_kernel_sizes",
            "resblock_dilation_sizes", "compute_dtype",
            "transpose_impl") if k in d}
        if "num_mels" in d:
            keep["n_mels"] = d["num_mels"]
        if "sampling_rate" in d:
            keep["sampling_rate"] = d["sampling_rate"]
        return cls(**keep)


class Conv1d(nn.Module):
    """Plain 1-D conv, feature-last, torch-compatible explicit padding."""

    features: int
    kernel_size: int
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel_size - 1) * self.dilation // 2
        return nn.Conv(self.features, (self.kernel_size,),
                       kernel_dilation=(self.dilation,),
                       padding=[(pad, pad)], dtype=self.dtype,
                       name="conv")(x)


def _polyphase_taps(k: int, u: int, p: int):
    """Tap table of the torch transposed conv ``y[u·t+r] = Σ x[t+m]·K[i]``.

    Derivation: with the u-dilated input ``xd`` and edge pad ``k-1-p`` the
    transposed conv is ``y[n] = Σ_i xd[n+i-(k-1-p)]·K[i]``; the dilated
    entry is real iff ``(n+i-(k-1-p)) % u == 0``, giving per output phase
    ``r = n % u`` exactly ``⌈k/u⌉``-ish taps ``(m_offset, kernel_index)``.
    Returns ``(taps, m_min, m_max)`` with taps grouped per phase.
    """
    off = k - 1 - p
    taps = []                                  # (phase r, m_offset, kern i)
    for r in range(u):
        for i in range(k):
            if (r + i - off) % u == 0:
                taps.append((r, (r + i - off) // u, i))
    m_min = min(m for _, m, _ in taps)
    m_max = max(m for _, m, _ in taps)
    return taps, m_min, m_max


class ConvTranspose1d(nn.Module):
    """Torch-semantics transposed conv; kernel param layout (k, in, out).

    Output length is ``(T-1)·u − 2p + k`` = ``T·u`` for the V1 stage shapes
    (p = (k−u)//2).  Two mathematically identical lowerings:

    - ``polyphase`` (default): regroup the kernel by output phase into
      ``(m_span, C_in, u·C_out)`` and run ONE stride-1 dense conv over the
      undilated input, then depth-to-time reshape.  Every MXU multiply
      touches real data — the classic lhs-dilation form makes the backend
      slide a k-tap window over a u-dilated input where only ~k/u taps are
      nonzero.
    - ``dilated``: the lhs-dilation (gradient-of-conv) form, for A/B.
    """

    features: int
    kernel_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32
    impl: str = "dilated"       # measured winner, see HiFiGANConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, u = self.kernel_size, self.stride
        p = (k - u) // 2
        cin, cout = x.shape[-1], self.features
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (k, cin, cout))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.impl == "dilated" or u == 1:
            y = lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(1,),
                padding=[(k - 1 - p, k - 1 - p)],
                lhs_dilation=(u,),
                dimension_numbers=("NWC", "WIO", "NWC"))
            return y + bias.astype(self.dtype)

        taps, m_min, m_max = _polyphase_taps(k, u, p)
        span = m_max - m_min + 1
        # regrouped kernel: W[m - m_min, :, r*cout:(r+1)*cout] = K[i]
        wp = jnp.zeros((span, cin, u * cout), kernel.dtype)
        for r, m, i in taps:
            wp = wp.at[m - m_min, :, r * cout:(r + 1) * cout].set(kernel[i])
        xpad = jnp.pad(x.astype(self.dtype),
                       ((0, 0), (-m_min, m_max), (0, 0)))
        y = lax.conv_general_dilated(
            xpad, wp.astype(self.dtype), window_strides=(1,),
            padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"))
        B, T = x.shape[0], x.shape[1]
        y = y.reshape(B, T * u, cout)
        return y + bias.astype(self.dtype)


class ResBlock1(nn.Module):
    """MRF residual block: per dilation d — LReLU → conv(k, dil d) → LReLU →
    conv(k, dil 1) → +residual."""

    channels: int
    kernel_size: int
    dilations: Sequence[int] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = Conv1d(self.channels, self.kernel_size, dilation=d,
                       dtype=self.dtype, name=f"convs1_{i}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            h = Conv1d(self.channels, self.kernel_size, dilation=1,
                       dtype=self.dtype, name=f"convs2_{i}")(h)
            x = x + h
        return x


class ResBlock2(nn.Module):
    """V2/V3 variant: per dilation d — LReLU → conv(k, dil d) → +residual."""

    channels: int
    kernel_size: int
    dilations: Sequence[int] = (1, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = Conv1d(self.channels, self.kernel_size, dilation=d,
                       dtype=self.dtype, name=f"convs_{i}")(h)
            x = x + h
        return x


class HiFiGANGenerator(nn.Module):
    """log-mel (B, T, n_mels) → waveform (B, T·hop) in [-1, 1]."""

    config: HiFiGANConfig = field(default_factory=HiFiGANConfig)

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        dtype = (jnp.bfloat16 if c.compute_dtype == "bfloat16"
                 else jnp.float32)
        res_cls = ResBlock1 if str(c.resblock) == "1" else ResBlock2
        n_kernels = len(c.resblock_kernel_sizes)

        x = Conv1d(c.upsample_initial_channel, 7, dtype=dtype,
                   name="conv_pre")(mel.astype(dtype))
        for i, (u, k) in enumerate(zip(c.upsample_rates,
                                       c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(ch, k, u, dtype=dtype,
                                impl=c.transpose_impl, name=f"ups_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                y = res_cls(ch, rk, tuple(rd), dtype=dtype,
                            name=f"resblocks_{i}_{j}")(x)
                acc = y if acc is None else acc + y
            x = acc / jnp.asarray(n_kernels, dtype)
        # upstream's final activation uses torch's default slope 0.01,
        # not LRELU_SLOPE — kept for checkpoint fidelity.  Final conv +
        # tanh in float32: the waveform's last linear map sets output SNR
        x = nn.leaky_relu(x.astype(jnp.float32), 0.01)
        x = Conv1d(1, 7, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


@functools.lru_cache(maxsize=8)
def _cached_apply(generator: HiFiGANGenerator):
    # one jit wrapper per generator config: `jax.jit(generator.apply)` at
    # every call would rebuild the wrapper and re-trace each time
    return jax.jit(generator.apply)


def hifigan_infer(generator: HiFiGANGenerator, variables, mels,
                  mel_lens=None, max_wav_value: float = 32768.0):
    """Batched mel → waveform list (reference ``utils/model.py:70-88``):
    runs the generator jitted, scales by ``max_wav_value`` and trims each
    item to ``mel_lens[i]·hop`` samples.  Returns float32 waveforms in
    [-max_wav_value, max_wav_value] (callers convert to int16 at IO)."""
    mels = jnp.asarray(mels)
    wavs = _cached_apply(generator)(variables, mels)
    hop = generator.config.hop_length
    import numpy as np
    wavs = np.asarray(wavs) * max_wav_value
    if mel_lens is None:
        return list(wavs)
    return [w[: int(n) * hop] for w, n in zip(wavs, np.asarray(mel_lens))]
