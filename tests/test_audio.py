"""DSP-layer golden tests: mel filterbank and STFT vs independent
numpy/scipy oracles (SURVEY.md §4 test strategy)."""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from smart_nar_fast_tts_tpu.audio import (
    MelSpectrogramConfig, hann_window, mel_filterbank, mel_spectrogram,
    stft_magnitude,
)
from smart_nar_fast_tts_tpu.audio.mel import hz_to_mel, mel_to_hz
from smart_nar_fast_tts_tpu.audio.stft import griffin_lim, istft


CFG = MelSpectrogramConfig()


def test_hann_window_matches_scipy():
    ours = hann_window(1024)
    scipys = scipy.signal.get_window("hann", 1024, fftbins=True)
    np.testing.assert_allclose(ours, scipys, atol=1e-7)


def test_slaney_mel_scale_fixed_points():
    # linear region: 200/3 Hz per mel; 1000 Hz == mel 15 exactly
    assert hz_to_mel(0.0) == 0.0
    np.testing.assert_allclose(hz_to_mel(1000.0), 15.0)
    np.testing.assert_allclose(mel_to_hz(15.0), 1000.0)
    np.testing.assert_allclose(hz_to_mel(200.0 / 3.0), 1.0)
    # log region roundtrip
    for f in (2000.0, 4000.0, 7600.0):
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-12)


def test_mel_filterbank_shape_and_structure():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert fb.dtype == np.float32
    assert (fb >= 0).all()
    # every filter has support; peaks move monotonically right
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    assert fb.sum(axis=1).min() > 0
    # above fmax (8000 Hz -> bin 8000/ (22050/2) * 512 ≈ 371.5) all zero
    top_bin = int(np.ceil(8000.0 / (22050 / 2) * 512)) + 1
    assert fb[:, top_bin + 1:].sum() == 0


def test_mel_filterbank_slaney_normalization():
    """Slaney norm: weight integral of filter i ≈ 2/(hz[i+2]-hz[i]) scaled
    triangle area — equivalently, an unnormalized triangle peaks at 1."""
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(8000.0), 82))
    enorm = 2.0 / (mel_pts[2:] - mel_pts[:-2])
    denorm_peak = (fb / enorm[:, None]).max(axis=1)
    # wide filters hit their triangle apex ≈ 1 (grid resolution limited)
    assert denorm_peak.min() > 0.6
    assert denorm_peak.max() <= 1.0 + 1e-6


def _oracle_stft_mag(y: np.ndarray, cfg: MelSpectrogramConfig) -> np.ndarray:
    """Direct per-frame loop oracle for the reference's conv-DFT transform
    (reference audio/stft.py:52-81)."""
    pad = cfg.n_fft // 2
    ypad = np.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    win = cfg.window
    frames = 1 + (ypad.shape[1] - cfg.n_fft) // cfg.hop_length
    out = np.zeros((y.shape[0], cfg.n_fft // 2 + 1, frames))
    for b in range(y.shape[0]):
        for t in range(frames):
            seg = ypad[b, t * cfg.hop_length:t * cfg.hop_length + cfg.n_fft]
            spec = np.fft.rfft(seg * win)
            out[b, :, t] = np.abs(spec)
    return out


def test_stft_magnitude_matches_oracle():
    rng = np.random.default_rng(0)
    y = rng.uniform(-1, 1, size=(2, 4096)).astype(np.float32)
    ours = np.asarray(stft_magnitude(jnp.asarray(y), CFG))
    oracle = _oracle_stft_mag(y, CFG)
    assert ours.shape == oracle.shape == (2, 513, 17)  # 4096/256 + 1
    np.testing.assert_allclose(ours, oracle, atol=2e-3, rtol=1e-4)


def test_mel_spectrogram_contract():
    rng = np.random.default_rng(1)
    y = rng.uniform(-0.5, 0.5, size=(1, 22050)).astype(np.float32)
    mel, energy = mel_spectrogram(jnp.asarray(y), CFG)
    assert mel.shape == (1, 80, 22050 // 256 + 1)
    assert energy.shape == (1, 22050 // 256 + 1)
    # log compression: silence clamps at log(1e-5)
    mel_sil, energy_sil = mel_spectrogram(jnp.zeros((1, 2048)), CFG)
    np.testing.assert_allclose(np.asarray(mel_sil),
                               np.log(1e-5), atol=1e-6)
    np.testing.assert_allclose(np.asarray(energy_sil), 0.0, atol=1e-6)


def test_mel_spectrogram_sine_peak():
    """A pure 440 Hz tone concentrates mel energy at the right filter."""
    t = np.arange(22050) / 22050
    y = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)[None]
    mel, _ = mel_spectrogram(jnp.asarray(y), CFG)
    mean_mel = np.asarray(mel).mean(-1)
    peak_filter = mean_mel.argmax()
    # which mel filter covers 440 Hz?
    fb = CFG.mel_basis
    expected = fb[:, int(round(440.0 / (22050 / 2) * 512))].argmax()
    assert abs(int(peak_filter) - int(expected)) <= 1


def test_istft_roundtrip():
    rng = np.random.default_rng(2)
    y = rng.uniform(-0.8, 0.8, size=(1, 4096)).astype(np.float32)
    frames = jnp.asarray(y)
    from smart_nar_fast_tts_tpu.audio.stft import frame_signal
    f = frame_signal(frames, CFG.n_fft, CFG.hop_length)
    spec = jnp.fft.rfft(f * jnp.asarray(CFG.window), axis=-1)
    mag = jnp.abs(jnp.swapaxes(spec, -1, -2))
    phase = jnp.angle(jnp.swapaxes(spec, -1, -2))
    recon = np.asarray(istft(mag, phase, CFG))
    # interior reconstructs near-exactly (edges lose window support)
    np.testing.assert_allclose(recon[0, 512:-512], y[0, 512:-512], atol=1e-3)


def test_griffin_lim_reduces_error():
    """Griffin-Lim from a real magnitude should produce a signal whose
    magnitude spectrum approaches the target."""
    t = np.arange(8192) / 22050
    y = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)[None]
    mag = stft_magnitude(jnp.asarray(y), CFG)
    recon = griffin_lim(mag, CFG, n_iters=8)
    mag2 = stft_magnitude(recon[:, :y.shape[1]], CFG)
    rel = (np.linalg.norm(np.asarray(mag2 - mag))
           / np.linalg.norm(np.asarray(mag)))
    assert rel < 0.35


def test_mel_spectrogram_bucketed_matches_unbucketed():
    """Round-5: the shape-bucketed preprocessor mel path (one compiled
    program per length bucket) must be numerically identical to the
    per-length path — zero-extension beyond the host-side reflect pad
    cannot reach any retained frame."""
    import jax.numpy as jnp

    from smart_nar_fast_tts_tpu.audio.stft import (MelSpectrogramConfig,
                                                   mel_spectrogram,
                                                   mel_spectrogram_bucketed)
    cfg = MelSpectrogramConfig()
    rng = np.random.default_rng(0)
    for n in (22050, 30011, 7777):
        y = rng.standard_normal(n).astype(np.float32) * 0.3
        ma, ea = mel_spectrogram(jnp.asarray(y)[None], cfg)
        mb, eb = mel_spectrogram_bucketed(y, cfg)
        assert mb.shape == ma[0].shape
        np.testing.assert_array_equal(np.asarray(ma[0]), mb)
        np.testing.assert_allclose(np.asarray(ea[0]), eb, rtol=1e-5,
                                   atol=1e-4)
