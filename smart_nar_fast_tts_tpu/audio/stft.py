"""STFT / mel-spectrogram feature extraction as pure JAX functions.

Feature definition matches the reference TacotronSTFT
(``audio/stft.py:52-81,159-178``):

- reflect-pad the waveform by ``n_fft//2`` on both sides,
- frame with hop ``hop_length`` and window length ``n_fft`` (the periodic
  Hann window of ``win_length`` is zero-padded centered to ``n_fft``),
- magnitude of the DFT (the reference computes it as a conv1d against an
  explicit Fourier basis; mathematically identical to windowed rFFT),
- mel = Slaney filterbank @ magnitude, log-compressed with
  ``log(clamp(x, 1e-5))`` (``audio/audio_processing.py:86-93``),
- energy = L2 norm of the magnitude spectrum per frame
  (``audio/stft.py:177``).

The reference implementation hardcodes ``.cuda()`` (``audio/stft.py:68-70``),
forcing a GPU for *preprocessing*; here the same math runs on any backend
and vmaps/jits cleanly.  Frame count is ``T//hop + 1`` for input length T.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .mel import hann_window, mel_filterbank, pad_center


@dataclass(frozen=True)
class MelSpectrogramConfig:
    sampling_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    mel_fmin: float = 0.0
    mel_fmax: float | None = 8000.0
    compression_clip: float = 1e-5

    @functools.cached_property
    def window(self) -> np.ndarray:
        return pad_center(hann_window(self.win_length), self.n_fft)

    @functools.cached_property
    def mel_basis(self) -> np.ndarray:
        return mel_filterbank(self.sampling_rate, self.n_fft, self.n_mels,
                              self.mel_fmin, self.mel_fmax)


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(B, T) → (B, F, n_fft) frames of the reflect-padded signal."""
    pad = n_fft // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n = y.shape[-1]
    num_frames = 1 + (n - n_fft) // hop
    idx = (np.arange(num_frames)[:, None] * hop
           + np.arange(n_fft)[None, :])          # static gather indices
    return y[:, idx]


def stft_magnitude(y: jnp.ndarray, cfg: MelSpectrogramConfig) -> jnp.ndarray:
    """(B, T) waveform in [-1, 1] → (B, n_fft//2+1, F) magnitude."""
    frames = frame_signal(y, cfg.n_fft, cfg.hop_length)
    frames = frames * jnp.asarray(cfg.window)
    spec = jnp.fft.rfft(frames, axis=-1)
    mag = jnp.abs(spec)                          # (B, F, n_bins)
    return jnp.swapaxes(mag, -1, -2)


def mel_spectrogram(y: jnp.ndarray, cfg: MelSpectrogramConfig
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T) waveform → (mel (B, n_mels, F), energy (B, F)).

    Same output contract as reference ``TacotronSTFT.mel_spectrogram``
    (``audio/stft.py:159-178``).
    """
    mag = stft_magnitude(y, cfg)
    mel = jnp.einsum("mf,bft->bmt", jnp.asarray(cfg.mel_basis), mag)
    mel = jnp.log(jnp.clip(mel, min=cfg.compression_clip))
    energy = jnp.linalg.norm(mag, axis=1)
    return mel, energy


@functools.partial(jax.jit, static_argnums=(1,))
def mel_spectrogram_jit(y: jnp.ndarray, cfg: MelSpectrogramConfig):
    return mel_spectrogram(y, cfg)


@functools.partial(jax.jit, static_argnums=(1,))
def _mel_prepadded_jit(y: jnp.ndarray, cfg: MelSpectrogramConfig):
    """mel/energy of an already reflect+zero padded (B, N) signal —
    frames are taken directly (no internal padding)."""
    n = y.shape[-1]
    num_frames = 1 + (n - cfg.n_fft) // cfg.hop_length
    idx = (np.arange(num_frames)[:, None] * cfg.hop_length
           + np.arange(cfg.n_fft)[None, :])
    frames = y[:, idx] * jnp.asarray(cfg.window)
    mag = jnp.swapaxes(jnp.abs(jnp.fft.rfft(frames, axis=-1)), -1, -2)
    mel = jnp.einsum("mf,bft->bmt", jnp.asarray(cfg.mel_basis), mag)
    mel = jnp.log(jnp.clip(mel, min=cfg.compression_clip))
    energy = jnp.linalg.norm(mag, axis=1)
    return mel, energy


def mel_spectrogram_bucketed(y: np.ndarray, cfg: MelSpectrogramConfig,
                             bucket_frames: int = 256
                             ) -> tuple[np.ndarray, np.ndarray]:
    """Exact :func:`mel_spectrogram` of a 1-D waveform through
    SHAPE-BUCKETED compiled programs.

    ``mel_spectrogram`` traces one XLA program per distinct waveform
    length; a corpus preprocessor feeding it raw utterances therefore
    compiles per *utterance* (measured ~9 s/utt on a tunneled chip, ~100%
    compile).  Here the reflect padding is applied host-side, the padded
    signal is zero-extended to a multiple of ``bucket_frames·hop``, and a
    single jitted program per bucket computes the frames; the true frame
    count is sliced off.  Zero-extension beyond the reflect pad cannot
    reach any retained frame, so the result is numerically identical to
    the unbucketed path — static shapes are how this stays TPU-native.
    """
    y = np.asarray(y, np.float32)
    hop, n_fft = cfg.hop_length, cfg.n_fft
    frames_true = 1 + len(y) // hop
    y_ref = np.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
    step = bucket_frames * hop
    target = max(n_fft, ((len(y_ref) + step - 1) // step) * step)
    y_pad = np.pad(y_ref, (0, target - len(y_ref)))
    mel, energy = _mel_prepadded_jit(jnp.asarray(y_pad)[None], cfg)
    return (np.asarray(mel[0])[:, :frames_true],
            np.asarray(energy[0])[:frames_true])


# ---------------------------------------------------------------------------
# Inverse STFT + Griffin-Lim (debug/parity path; reference
# audio/stft.py:83-124, audio/audio_processing.py:66-81)
# ---------------------------------------------------------------------------

def _window_sumsquare(cfg: MelSpectrogramConfig, n_frames: int) -> np.ndarray:
    """Sum-squared window envelope (reference audio/audio_processing.py:7-63).
    Vectorized overlap-add of win² at every hop."""
    n = cfg.n_fft + cfg.hop_length * (n_frames - 1)
    win_sq = pad_center(hann_window(cfg.win_length) ** 2, cfg.n_fft)
    out = np.zeros(n, dtype=np.float64)
    for i in range(n_frames):
        s = i * cfg.hop_length
        out[s:min(n, s + cfg.n_fft)] += win_sq[:max(0, min(cfg.n_fft,
                                                           n - s))]
    return out.astype(np.float32)


def _overlap_add(frames: jnp.ndarray, cfg: MelSpectrogramConfig
                 ) -> jnp.ndarray:
    """(B, F, n_fft) time frames → (B, hop·(F−1)) signal: synthesis window,
    overlap-add at every hop, window-sumsquare normalize, center trim.

    When ``hop | n_fft`` (every standard config here: 1024/256), the
    overlap-add is computed scatter-free: each frame splits into
    R = n_fft/hop hop-aligned chunks, and chunk r of frame f lands at
    block f+r — so the whole reduction is R shifted pads + adds.  The
    scatter-add formulation this replaces (duplicate indices, 525k rows at
    n_fft=1024) measured **7.7 ms of the 10.9 ms Vocos forward** on a v5e
    (71% of the serving default's vocoder time, benchmarks round 4); the
    pad-sum form is pure layout + vector adds.
    """
    frames = frames * jnp.asarray(cfg.window)     # synthesis window
    b, f, _ = frames.shape
    hop, n_fft = cfg.hop_length, cfg.n_fft
    n = n_fft + hop * (f - 1)
    if n_fft % hop == 0:
        r_count = n_fft // hop
        chunks = frames.reshape(b, f, r_count, hop)
        sig = sum(
            jnp.pad(chunks[:, :, r, :],
                    ((0, 0), (r, r_count - 1 - r), (0, 0)))
            for r in range(r_count)).reshape(b, n)
    else:
        # general hop: scatter-add with static (duplicate) indices
        idx = (np.arange(f)[:, None] * hop
               + np.arange(n_fft)[None, :]).reshape(-1)
        sig = jnp.zeros((b, n)).at[:, idx].add(frames.reshape(b, -1))
    wss = _window_sumsquare(cfg, f)
    sig = jnp.where(wss[None, :] > 1e-11, sig / jnp.maximum(wss, 1e-11), sig)
    pad = cfg.n_fft // 2
    return sig[:, pad:n - pad]


def istft(magnitude: jnp.ndarray, phase: jnp.ndarray,
          cfg: MelSpectrogramConfig) -> jnp.ndarray:
    """(B, n_bins, F) magnitude+phase → (B, T) via windowed overlap-add."""
    spec = magnitude * jnp.exp(1j * phase)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=cfg.n_fft, axis=-1)
    return _overlap_add(frames, cfg)


@functools.lru_cache(maxsize=4)
def _irdft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse real-DFT as two (n_bins, n_fft) real bases:
    ``x = Re(X) @ C + Im(X) @ S`` ≡ ``irfft(X, n_fft)``.  Conjugate-symmetry
    weights: bins 0 and n_fft/2 count once, interior bins twice."""
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    w = np.full((n_fft // 2 + 1, 1), 2.0)
    w[0, 0] = w[-1, 0] = 1.0
    c = (w * np.cos(ang) / n_fft).astype(np.float32)
    s = (-w * np.sin(ang) / n_fft).astype(np.float32)
    return c, s


def istft_matmul(magnitude: jnp.ndarray, phase: jnp.ndarray,
                 cfg: MelSpectrogramConfig) -> jnp.ndarray:
    """iSTFT with the inverse rDFT expressed as two real matmuls.

    Numerically equivalent to :func:`istft` (≤1e-5 at n_fft=1024) but uses
    no complex dtype and no FFT kernel — this TPU runtime's backend has no
    complex-FFT lowering (UNIMPLEMENTED), and a (F, 513)×(513, 1024) dense
    matmul is MXU-native anyway (the Vocos head's synthesis cost is ~8% of
    its backbone FLOPs in this form).  This is the serving path of
    :class:`..vocoder.VocosGenerator`.
    """
    c, s = _irdft_bases(cfg.n_fft)
    re = jnp.swapaxes(magnitude * jnp.cos(phase), -1, -2)   # (B, F, bins)
    im = jnp.swapaxes(magnitude * jnp.sin(phase), -1, -2)
    frames = re @ jnp.asarray(c) + im @ jnp.asarray(s)      # (B, F, n_fft)
    return _overlap_add(frames, cfg)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _griffin_lim_jit(magnitude: jnp.ndarray, cfg: MelSpectrogramConfig,
                     n_iters: int, key: jax.Array) -> jnp.ndarray:
    phase = jax.random.uniform(key, magnitude.shape, minval=-np.pi,
                               maxval=np.pi)

    def body(_, phase):
        sig = istft(magnitude, phase, cfg)
        frames = frame_signal(sig, cfg.n_fft, cfg.hop_length)
        spec = jnp.fft.rfft(frames * jnp.asarray(cfg.window), axis=-1)
        return jnp.angle(jnp.swapaxes(spec, -1, -2))

    phase = jax.lax.fori_loop(0, n_iters, body, phase)
    return istft(magnitude, phase, cfg)


def griffin_lim(magnitude: jnp.ndarray, cfg: MelSpectrogramConfig,
                n_iters: int = 30, key: jax.Array | None = None
                ) -> jnp.ndarray:
    """Phase reconstruction by alternating projections
    (reference audio/audio_processing.py:66-81).

    Runs as ONE jitted program (loop + final iSTFT): eager per-op dispatch
    is both slow on a remote-attached chip and exercises standalone complex
    kernels some TPU runtimes lack.  Needs ≥4 frames so the reflect pad in
    the re-analysis framing is valid (pad n_fft//2 ≤ signal length − 1).
    """
    if magnitude.shape[-1] < 4:
        raise ValueError(
            f"griffin_lim needs ≥4 frames, got {magnitude.shape[-1]}")
    if key is None:
        key = jax.random.PRNGKey(0)
    return _griffin_lim_jit(magnitude, cfg, n_iters, key)
