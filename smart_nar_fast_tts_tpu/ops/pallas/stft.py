"""Fused STFT → log-mel Pallas kernel.

One pass per frame block: window multiply, DFT as two MXU matmuls against
the real/imag cosine bases, power → magnitude, mel projection (third
matmul), log compression, plus the L2 frame energy — none of the
intermediates (complex spectrum, magnitude) ever round-trips to HBM.  The
pure-JAX oracle is ``audio.stft.mel_spectrogram`` (reference semantics:
``audio/stft.py:159-178``).

The DFT-by-matmul trades FLOPs for MXU residency (2·n_fft·n_bins MACs/frame
≈ 1 MFLOP at n_fft 1024 — noise next to HBM savings), exactly how the
reference's ``STFT.transform`` conv1d-against-DFT-basis works on GPU
(``audio/stft.py:52-81``), minus its hardcoded ``.cuda()``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ...audio.stft import MelSpectrogramConfig, frame_signal


@functools.lru_cache(maxsize=8)
def _dft_mel_constants(cfg: MelSpectrogramConfig):
    """(windowed cos basis, windowed sin basis, melᵀ) as numpy constants.

    Folding the analysis window into the DFT basis removes the elementwise
    pre-multiply: frames @ (win·cos) == (frames·win) @ cos.
    """
    n = cfg.n_fft
    n_bins = n // 2 + 1
    k = np.arange(n)[:, None] * np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * k / n
    win = np.asarray(cfg.window, np.float64)[:, None]
    cos_b = (np.cos(ang) * win).astype(np.float32)        # (n_fft, n_bins)
    sin_b = (-np.sin(ang) * win).astype(np.float32)
    mel_t = np.asarray(cfg.mel_basis, np.float32).T       # (n_bins, n_mels)
    return cos_b, sin_b, mel_t


def _logmel_kernel(frames_ref, cos_ref, sin_ref, mel_ref, mel_out_ref,
                   energy_out_ref, *, clip: float):
    f = frames_ref[0].astype(jnp.float32)                 # (Fb, n_fft)
    re = jnp.dot(f, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(f, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im                             # (Fb, n_bins)
    mag = jnp.sqrt(power)
    mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32)
    mel_out_ref[0] = jnp.log(jnp.clip(mel, min=clip))
    energy_out_ref[0] = jnp.sqrt(
        jnp.sum(power, axis=-1, keepdims=True))           # (Fb, 1)


def fused_log_mel(y: jnp.ndarray, cfg: MelSpectrogramConfig,
                  block_f: int = 128, interpret: bool = False
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T) waveform → (log-mel (B, n_mels, F), energy (B, F)).

    Output contract identical to ``audio.stft.mel_spectrogram``.
    """
    B = y.shape[0]
    frames = frame_signal(y, cfg.n_fft, cfg.hop_length)   # (B, F, n_fft)
    F = frames.shape[1]
    F_p = -(-F // block_f) * block_f
    frames = jnp.pad(frames, ((0, 0), (0, F_p - F), (0, 0)))

    cos_b, sin_b, mel_t = _dft_mel_constants(cfg)
    n_bins, n_mels = mel_t.shape

    mel, energy = pl.pallas_call(
        functools.partial(_logmel_kernel, clip=float(cfg.compression_clip)),
        out_shape=(
            jax.ShapeDtypeStruct((B, F_p, n_mels), jnp.float32),
            jax.ShapeDtypeStruct((B, F_p, 1), jnp.float32),
        ),
        grid=(B, F_p // block_f),
        in_specs=[
            pl.BlockSpec((1, block_f, cfg.n_fft), lambda b, i: (b, i, 0)),
            pl.BlockSpec((cfg.n_fft, n_bins), lambda b, i: (0, 0)),
            pl.BlockSpec((cfg.n_fft, n_bins), lambda b, i: (0, 0)),
            pl.BlockSpec((n_bins, n_mels), lambda b, i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_f, n_mels), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_f, 1), lambda b, i: (b, i, 0)),
        ),
        interpret=interpret,
    )(frames, jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(mel_t))

    mel = jnp.swapaxes(mel[:, :F, :], 1, 2)               # (B, n_mels, F)
    energy = energy[:, :F, 0]
    return mel, energy
