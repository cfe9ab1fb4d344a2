"""Property tests (SURVEY.md §4): invariants that must hold for any input —
Σduration bookkeeping, padding invariance of the batched static-shape
forward, mask invariance of the losses, upsampling weight normalization.
"""

import numpy as np
import pytest

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from smart_nar_fast_tts_tpu.config import (FeatureStats, ModelConfig,
                                           PreprocessConfig)
from smart_nar_fast_tts_tpu.models import FastSpeech2Align
from smart_nar_fast_tts_tpu.ops.duration import durations_from_attention
from smart_nar_fast_tts_tpu.ops.upsample import (gaussian_upsample,
                                                 hard_upsample)

STATS = FeatureStats(
    pitch_min=71.0, pitch_max=799.8, pitch_mean=207.4, pitch_std=46.5,
    energy_min=0.018, energy_max=314.9, energy_mean=37.3, energy_std=25.1)


class TestDurationProperties:
    def _attn(self, B=3, H=2, T=40, L=12, seed=0):
        rng = np.random.RandomState(seed)
        a = rng.rand(B, H, T, L).astype(np.float32)
        a /= a.sum(-1, keepdims=True)
        return jnp.asarray(a)

    def test_sum_durations_equals_mel_len(self):
        # intended semantics: every valid frame is assigned exactly once
        attn = self._attn()
        src_lens = jnp.asarray([12, 7, 3])
        mel_lens = jnp.asarray([40, 25, 9])
        d = durations_from_attention(attn, src_lens, mel_lens)
        np.testing.assert_array_equal(np.asarray(d.sum(axis=1)),
                                      np.asarray(mel_lens))

    def test_padded_phonemes_zero_duration(self):
        attn = self._attn(seed=1)
        src_lens = jnp.asarray([12, 5, 2])
        mel_lens = jnp.asarray([40, 40, 40])
        d = np.asarray(durations_from_attention(attn, src_lens, mel_lens))
        for b, sl in enumerate(np.asarray(src_lens)):
            assert np.all(d[b, sl:] == 0)

    def test_soft_mode_sum_and_padding(self):
        """Round-5 'soft' expected-count rule: exact frame-count total via
        cumulative rounding, zeros on padded phonemes, nonnegative."""
        attn = self._attn(seed=3)
        src_lens = jnp.asarray([12, 7, 3])
        mel_lens = jnp.asarray([40, 25, 9])
        d = np.asarray(durations_from_attention(
            attn, src_lens, mel_lens, mode="soft", head_reduce="mean"))
        np.testing.assert_array_equal(d.sum(axis=1), np.asarray(mel_lens))
        assert np.all(d >= 0)
        for b, sl in enumerate(np.asarray(src_lens)):
            assert np.all(d[b, sl:] == 0)

    def test_soft_matches_numpy_oracle(self):
        attn = self._attn(B=1, seed=4)
        src_lens = jnp.asarray([9])
        mel_lens = jnp.asarray([31])
        d = np.asarray(durations_from_attention(
            attn, src_lens, mel_lens, mode="soft",
            head_reduce="mean"))[0, :9]
        a = np.asarray(attn)[0].mean(0)[:31, :9]
        p = a / a.sum(axis=1, keepdims=True)
        soft = p.sum(axis=0)
        want = np.diff(np.round(np.cumsum(soft)), prepend=0.0)
        np.testing.assert_array_equal(d, want.astype(np.int32))

    def test_buggy_mode_counts_all_heads(self):
        # reference literal math: Σ counts ≈ n_head · ilen (SURVEY §2.4.1)
        attn = self._attn(B=1, H=2, T=40, L=12, seed=2)
        src_lens = jnp.asarray([12])
        mel_lens = jnp.asarray([40])
        d = durations_from_attention(attn, src_lens, mel_lens, mode="buggy")
        assert int(d.sum()) == 2 * 12


class TestUpsampleProperties:
    def test_hard_upsample_total_frames(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 6, 4).astype(np.float32))
        d = jnp.asarray([[3, 0, 2, 1, 0, 4], [1, 1, 1, 0, 0, 0]],
                        jnp.float32)
        out, mel_len = hard_upsample(x, d, max_len=16)
        np.testing.assert_array_equal(np.asarray(mel_len), [10, 3])
        # frames beyond Σd are zero
        assert np.all(np.asarray(out[0, 10:]) == 0)
        assert np.all(np.asarray(out[1, 3:]) == 0)
        # each valid frame is a copy of exactly one phoneme vector
        np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(x[0, 0]))
        np.testing.assert_allclose(np.asarray(out[0, 3]), np.asarray(x[0, 2]))

    def test_gaussian_weights_normalized(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 8, 4).astype(np.float32))
        d = jnp.asarray(rng.randint(1, 6, (1, 8)), jnp.float32)
        valid = jnp.ones((1, 8))
        _, mel_len, w = gaussian_upsample(x, d, 64, valid)
        n = int(mel_len[0])
        sums = np.asarray(w)[0, :, :n].sum(axis=0)
        np.testing.assert_allclose(sums, 1.0, atol=1e-5)


class TestPaddingInvariance:
    """Growing the batch or the frame capacity must not change an item's
    outputs (the core static-shape masking contract)."""

    @pytest.fixture(scope="class")
    def model_and_vars(self):
        cfg = ModelConfig()
        pre = PreprocessConfig(stats=STATS)
        model = FastSpeech2Align(cfg, pre)
        rng = np.random.RandomState(0)
        texts = jnp.asarray(rng.randint(2, 300, (1, 16)), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), texts,
                               jnp.asarray([16], jnp.int32), max_mel_len=64)
        return model, variables, texts

    def test_batch_duplicate_invariance(self, model_and_vars):
        # identical items in a batch → identical full outputs (equal mel
        # capacity, so even the PostNet tail semantics match)
        model, variables, texts = model_and_vars
        solo = model.apply(variables, texts, jnp.asarray([16], jnp.int32),
                           max_mel_len=96, deterministic=True)
        batch = model.apply(variables, jnp.tile(texts, (3, 1)),
                            jnp.asarray([16, 16, 16], jnp.int32),
                            max_mel_len=96, deterministic=True)
        n = int(solo.mel_lens[0])
        for b in range(3):
            assert int(batch.mel_lens[b]) == n
            np.testing.assert_allclose(
                np.asarray(batch.postnet_mel[b, :n]),
                np.asarray(solo.postnet_mel[0, :n]), atol=2e-5, rtol=1e-4)

    def test_batch_mixing_text_side_invariance(self, model_and_vars):
        # mixing in a different (shorter) item must not change another
        # item's text-side quantities — encoder reps, predicted durations,
        # mel length.  Frame-side outputs are batch-mel-capacity-coupled BY
        # DESIGN (reference semantics: tensors end at the batch max mel
        # length; conv boundaries there feed self-attention, which mixes
        # every frame), so only capacity-preserving comparisons are exact.
        model, variables, texts = model_and_vars
        src_lens = jnp.asarray([16], jnp.int32)
        solo = model.apply(variables, texts, src_lens, max_mel_len=96,
                           deterministic=True)
        rng = np.random.RandomState(7)
        other = jnp.asarray(rng.randint(2, 300, (1, 16)), jnp.int32)
        other = other.at[0, 9:].set(0)
        batch = model.apply(variables, jnp.concatenate([texts, other]),
                            jnp.asarray([16, 9], jnp.int32), max_mel_len=96,
                            deterministic=True)
        assert int(batch.mel_lens[0]) == int(solo.mel_lens[0])
        np.testing.assert_allclose(
            np.asarray(batch.log_duration_prediction[0]),
            np.asarray(solo.log_duration_prediction[0]),
            atol=2e-5, rtol=1e-4)

    def test_capacity_padding_invariance(self, model_and_vars):
        model, variables, texts = model_and_vars
        src_lens = jnp.asarray([16], jnp.int32)
        a = model.apply(variables, texts, src_lens, max_mel_len=96,
                        deterministic=True)
        b = model.apply(variables, texts, src_lens, max_mel_len=160,
                        deterministic=True)
        n = min(int(a.mel_lens[0]), 96)
        assert int(b.mel_lens[0]) == int(a.mel_lens[0])
        np.testing.assert_allclose(np.asarray(b.postnet_mel[0, :n]),
                                   np.asarray(a.postnet_mel[0, :n]),
                                   atol=2e-5, rtol=1e-4)


class TestBF16ComputePath:
    def test_bfloat16_forward_close_to_f32(self):
        cfg32 = ModelConfig()
        cfg16 = ModelConfig(compute_dtype="bfloat16")
        pre = PreprocessConfig(stats=STATS)
        rng = np.random.RandomState(0)
        texts = jnp.asarray(rng.randint(2, 300, (2, 24)), jnp.int32)
        src_lens = jnp.asarray([24, 17], jnp.int32)

        m32 = FastSpeech2Align(cfg32, pre)
        variables = m32.init(jax.random.PRNGKey(0), texts, src_lens,
                             max_mel_len=96)
        a = m32.apply(variables, texts, src_lens, max_mel_len=96,
                      deterministic=True)
        m16 = FastSpeech2Align(cfg16, pre)
        # same f32 params, bf16 activations
        b = m16.apply(variables, texts, src_lens, max_mel_len=96,
                      deterministic=True)
        assert b.postnet_mel.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(b.postnet_mel)))
        # bf16 has ~3 decimal digits; random-init mels are O(1)
        n = min(int(a.mel_lens[0]), int(b.mel_lens[0]))
        assert n > 0
        diff = np.max(np.abs(np.asarray(a.postnet_mel[0, :n])
                             - np.asarray(b.postnet_mel[0, :n])))
        assert diff < 0.25, f"bf16 drift too large: {diff}"
