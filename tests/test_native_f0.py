"""Native C++ F0 tracker vs the numpy oracle.

The C++ module (``native/f0/f0.cc``) implements the identical NCCF math in
double precision; on synthetic harmonic + noise + silence signals the two
must agree on voicing decisions and on F0 values to sub-cent accuracy.
"""

import numpy as np
import pytest

import conftest  # noqa: F401

from smart_nar_fast_tts_tpu.data.native_f0 import (estimate_f0_native,
                                                   estimate_f0_nccf_native,
                                                   native_available)
from smart_nar_fast_tts_tpu.data.pitch import estimate_f0

SR, HOP = 22050, 256

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for native f0")


def _signal(seed=0, seconds=1.2):
    """Voiced (gliding harmonic) → silence → voiced, plus noise floor."""
    rng = np.random.RandomState(seed)
    t = np.arange(int(SR * seconds)) / SR
    f = 140.0 + 60.0 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f) / SR
    wav = (0.6 * np.sin(phase) + 0.25 * np.sin(2 * phase)
           + 0.1 * np.sin(3 * phase))
    third = len(wav) // 3
    wav[third:2 * third] = 0.0
    return (wav + 0.005 * rng.randn(len(wav))).astype(np.float64)


class TestNativeF0:
    def test_matches_numpy_oracle(self):
        wav = _signal()
        ref = estimate_f0(wav, SR, HOP)
        got = estimate_f0_nccf_native(wav, SR, HOP)
        assert got.shape == ref.shape
        both_voiced = (ref > 0) & (got > 0)
        # voicing decisions: identical math → identical gates
        agree = np.mean((ref > 0) == (got > 0))
        assert agree >= 0.99, f"voicing agreement {agree}"
        np.testing.assert_allclose(got[both_voiced], ref[both_voiced],
                                   rtol=1e-6)

    def test_tracks_true_pitch(self):
        t = np.arange(SR) / SR
        wav = np.sin(2 * np.pi * 220.0 * t)
        f0 = estimate_f0_native(wav, SR, HOP)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0)
        np.testing.assert_allclose(np.median(voiced), 220.0, rtol=0.01)

    def test_silence_unvoiced(self):
        f0 = estimate_f0_native(np.zeros(SR // 2), SR, HOP)
        np.testing.assert_array_equal(f0, 0.0)

    def test_env_off_falls_back(self, monkeypatch):
        monkeypatch.setenv("SMART_TTS_NATIVE_F0", "off")
        from smart_nar_fast_tts_tpu.data.world_f0 import estimate_f0_world
        wav = _signal(seed=1)
        got = estimate_f0_native(wav, SR, HOP)       # world by default
        ref = estimate_f0_world(wav, SR, HOP)
        np.testing.assert_array_equal(got, ref)

    def test_env_selects_nccf(self, monkeypatch):
        monkeypatch.setenv("SMART_TTS_F0", "nccf")
        wav = _signal(seed=2)
        got = estimate_f0_native(wav, SR, HOP)
        ref = estimate_f0_nccf_native(wav, SR, HOP)
        np.testing.assert_array_equal(got, ref)
