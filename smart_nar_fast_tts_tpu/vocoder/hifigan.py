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
    # Low-channel tail execution.  "grouped" (default) runs every stage
    # whose channel count drops below the 128-lane MXU width in a
    # space-to-depth layout: g = 128//C consecutive time steps are folded
    # into the feature axis so each conv becomes a stride-1 dense conv
    # over (T/g, g·C) with a block-banded kernel (_grouped_conv_kernel).
    # Rationale: the v5e MXU is a 128x128 systolic array, so a C-channel
    # conv matmul runs at (C/128)^2 utilization — measured exactly on the
    # V1 tail (round-4 vocoder_stages.json: stage3 at C=32 hit 11.5 of
    # 197 TFLOP/s = the 6.25% padding bound).  The grouped form trades a
    # ~2-3x dense-FLOP overhead (zeros in the block-banded kernel) for
    # full-width MXU tiles.  Measured, full V1 generator B8xT512 on a v5e
    # chip: f32 49.1 -> 26.8 ms (1.83x), bf16 36.8 -> 23.4 ms (1.57x).
    # Identical math and identical parameter tree; "plain" keeps the
    # per-channel lowering for A/B and for torch-checkpoint bit-parity.
    tail_impl: str = "grouped"

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
            "tail_impl": self.tail_impl,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "HiFiGANConfig":
        keep = {k: d[k] for k in (
            "resblock", "upsample_rates", "upsample_kernel_sizes",
            "upsample_initial_channel", "resblock_kernel_sizes",
            "resblock_dilation_sizes", "compute_dtype",
            "transpose_impl", "tail_impl") if k in d}
        if "num_mels" in d:
            keep["n_mels"] = d["num_mels"]
        if "sampling_rate" in d:
            keep["sampling_rate"] = d["sampling_rate"]
        return cls(**keep)


def _scatter_blocks(entries, span, m_min, cin, cout, gin, gout, kernel):
    """Assemble a block-banded grouped kernel (span, gin·cin, gout·cout)
    from ``entries`` = [(m, a, b, i)]: grouped tap ``m`` maps input slot
    ``a`` (of gin) to output slot ``b`` (of gout) through original tap
    ``kernel[i]``.

    Built as ONE masked gather (index maps are host-side numpy constants)
    rather than a per-entry scatter chain — entry counts reach
    ``g·k ≈ 10³`` at small channel counts, where an unrolled
    ``.at[].set`` chain explodes trace/compile time."""
    import numpy as np
    idx = np.zeros((span, gin, gout), np.int32)
    mask = np.zeros((span, gin, gout), bool)
    for m, a, b, i in entries:
        idx[m - m_min, a, b] = i
        mask[m - m_min, a, b] = True
    # gather (span, gin, gout, cin, cout), zero the unoccupied blocks,
    # then interleave slots with channels: (m, a·cin+c, b·cout+c')
    # jnp.asarray(kernel): params loaded from npz arrive as NUMPY arrays,
    # and numpy fancy-indexing converts the index via __array__ — which
    # raises on the constant-hoisted tracer a lax.while_loop body makes
    # of jnp.asarray(idx); jax-side indexing handles both
    w = jnp.where(jnp.asarray(mask)[..., None, None],
                  jnp.asarray(kernel)[jnp.asarray(idx)], 0)
    w = jnp.transpose(w, (0, 1, 3, 2, 4))
    return w.reshape(span, gin * cin, gout * cout)


def _grouped_conv_kernel(kernel: jnp.ndarray, dilation: int, g: int,
                         pad: int):
    """Space-to-depth form of a stride-1 dilated conv.

    With x viewed grouped as ``X[s, a·C+c] = x[g·s+a, c]``, the conv
    ``y[n] = Σ_i x[n + i·d − pad]·W[i]`` becomes a stride-1 dense conv
    over X: output slot ``b`` at grouped step s reads ungrouped index
    ``e = b + i·d − pad``, i.e. grouped tap ``m = ⌊e/g⌋``, slot
    ``a = e mod g``.  Returns ``(W', m_min, m_max)`` where W' has shape
    ``(m_max−m_min+1, g·Cin, g·Cout)``; callers zero-pad X by
    ``(−m_min, m_max)`` rows and run a VALID conv — zero rows reproduce
    the ungrouped zero padding exactly, so the result is bit-for-bit the
    same function (up to f32 reduction order)."""
    k, cin, cout = kernel.shape
    ents = []
    for b in range(g):
        for i in range(k):
            e = b + i * dilation - pad
            ents.append((e // g, e % g, b, i))
    m_min = min(e[0] for e in ents)
    m_max = max(e[0] for e in ents)
    w = _scatter_blocks(ents, m_max - m_min + 1, m_min, cin, cout, g, g,
                        kernel)
    return w, m_min, m_max


def _grouped_convT_kernel(kernel: jnp.ndarray, u: int, p: int, gi: int):
    """Space-to-depth form of the torch transposed conv: input grouped by
    ``gi`` → output grouped by ``go = u·gi`` at the SAME grouped length.

    Builds on :func:`_polyphase_taps` (y[u·t+r] = Σ x[t+m]·K[i]): with
    t = gi·s + a the output lands in slot ``b = u·a + r`` of grouped step
    s, reading grouped input tap ``⌊(a+m)/gi⌋`` slot ``(a+m) mod gi``."""
    k, cin, cout = kernel.shape
    taps, _, _ = _polyphase_taps(k, u, p)
    ents = []
    for r, m, i in taps:
        for a in range(gi):
            e = a + m
            ents.append((e // gi, e % gi, u * a + r, i))
    m_min = min(e[0] for e in ents)
    m_max = max(e[0] for e in ents)
    w = _scatter_blocks(ents, m_max - m_min + 1, m_min, cin, cout, gi,
                        u * gi, kernel)
    return w, m_min, m_max


def _regroup(x: jnp.ndarray, g_from: int, g_to: int, ch: int) -> jnp.ndarray:
    """(B, T/g_from, g_from·ch) → (B, T/g_to, g_to·ch) — pure reshape."""
    if g_from == g_to:
        return x
    b = x.shape[0]
    return x.reshape(b, -1, ch).reshape(b, -1, g_to * ch)


def _target_group(ch: int, t_ungrouped: int) -> int:
    """Largest space-to-depth factor g with g·ch ≤ 128 that divides T."""
    g = max(1, 128 // ch)
    while g > 1 and t_ungrouped % g:
        g -= 1
    return g


class _ConvParams(nn.Module):
    """Bare kernel+bias declaration matching ``nn.Conv``'s param names,
    shapes, and initializers — lets the grouped path consume the identical
    parameter tree that the plain ``nn.Conv`` path creates."""

    kernel_shape: tuple
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.kernel_shape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class Conv1d(nn.Module):
    """Plain 1-D conv, feature-last, torch-compatible explicit padding.

    With ``group > 1`` the input is a space-to-depth view (B, T/g, g·C)
    and the conv runs as ONE dense stride-1 conv with the block-banded
    kernel from :func:`_grouped_conv_kernel` — full 128-lane MXU tiles at
    low channel counts (same math, same params)."""

    features: int
    kernel_size: int
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    group: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel_size - 1) * self.dilation // 2
        if self.group == 1:
            return nn.Conv(self.features, (self.kernel_size,),
                           kernel_dilation=(self.dilation,),
                           padding=[(pad, pad)], dtype=self.dtype,
                           name="conv")(x)
        g = self.group
        cin = x.shape[-1] // g
        kernel, bias = _ConvParams((self.kernel_size, cin, self.features),
                                   self.features, name="conv")()
        w, m_min, m_max = _grouped_conv_kernel(kernel, self.dilation, g,
                                               pad)
        xpad = jnp.pad(x.astype(self.dtype),
                       ((0, 0), (-m_min, m_max), (0, 0)))
        y = lax.conv_general_dilated(
            xpad, w.astype(self.dtype), window_strides=(1,),
            padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"))
        return y + jnp.tile(bias, g).astype(self.dtype)


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
    group_in: int = 1           # input space-to-depth factor ("grouped")

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, u = self.kernel_size, self.stride
        p = (k - u) // 2
        cin = x.shape[-1] // (self.group_in if self.impl == "grouped"
                              else 1)
        cout = self.features
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (k, cin, cout))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.impl == "grouped":
            # space-to-depth: (B, T/gi, gi·Cin) → (B, T/gi, u·gi·Cout),
            # a grouped view of the (B, u·T, Cout) transposed-conv output
            w, m_min, m_max = _grouped_convT_kernel(kernel, u, p,
                                                    self.group_in)
            xpad = jnp.pad(x.astype(self.dtype),
                           ((0, 0), (-m_min, m_max), (0, 0)))
            y = lax.conv_general_dilated(
                xpad, w.astype(self.dtype), window_strides=(1,),
                padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"))
            return y + jnp.tile(bias, u * self.group_in).astype(self.dtype)
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
    group: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = Conv1d(self.channels, self.kernel_size, dilation=d,
                       dtype=self.dtype, group=self.group,
                       name=f"convs1_{i}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            h = Conv1d(self.channels, self.kernel_size, dilation=1,
                       dtype=self.dtype, group=self.group,
                       name=f"convs2_{i}")(h)
            x = x + h
        return x


class ResBlock2(nn.Module):
    """V2/V3 variant: per dilation d — LReLU → conv(k, dil d) → +residual."""

    channels: int
    kernel_size: int
    dilations: Sequence[int] = (1, 3)
    dtype: jnp.dtype = jnp.float32
    group: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = Conv1d(self.channels, self.kernel_size, dilation=d,
                       dtype=self.dtype, group=self.group,
                       name=f"convs_{i}")(h)
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
        grouped = c.tail_impl == "grouped"
        g = 1                       # current space-to-depth group of x
        t = mel.shape[1]            # ungrouped time length of x
        for i, (u, k) in enumerate(zip(c.upsample_rates,
                                       c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            t = t * u
            gt = _target_group(ch, t) if grouped else 1
            x = nn.leaky_relu(x, LRELU_SLOPE)
            if g > 1 or gt > 1:
                x = ConvTranspose1d(ch, k, u, dtype=dtype, impl="grouped",
                                    group_in=g, name=f"ups_{i}")(x)
                x = _regroup(x, g * u, gt, ch)
                g = gt
            else:
                x = ConvTranspose1d(ch, k, u, dtype=dtype,
                                    impl=c.transpose_impl,
                                    name=f"ups_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                y = res_cls(ch, rk, tuple(rd), dtype=dtype, group=g,
                            name=f"resblocks_{i}_{j}")(x)
                acc = y if acc is None else acc + y
            x = acc / jnp.asarray(n_kernels, dtype)
        # upstream's final activation uses torch's default slope 0.01,
        # not LRELU_SLOPE — kept for checkpoint fidelity.  Final conv +
        # tanh in float32: the waveform's last linear map sets output SNR
        x = nn.leaky_relu(x.astype(jnp.float32), 0.01)
        x = Conv1d(1, 7, group=g, name="conv_post")(x)
        x = jnp.tanh(x)
        if g > 1:                   # (B, T/g, g) → ungrouped (B, T, 1)
            x = x.reshape(x.shape[0], -1, 1)
        return x[..., 0]


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
