"""Vocoder GAN training stack: discriminators, losses, jitted GAN step.

The reference never trains its vocoder (``utils/model.py:38-67`` only loads
checkpoints), so there is no torch oracle here; these tests validate the
HiFi-GAN paper semantics directly — output shapes, loss identities at fixed
points, and that the two-optimizer jitted step runs, stays finite, and
updates both parameter trees (single device and 8-way data-parallel mesh).
"""

import numpy as np
import pytest

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from smart_nar_fast_tts_tpu.audio.stft import MelSpectrogramConfig
from smart_nar_fast_tts_tpu.parallel.mesh import make_mesh
from smart_nar_fast_tts_tpu.vocoder import HiFiGANConfig, HiFiGANGenerator
from smart_nar_fast_tts_tpu.vocoder.discriminators import (
    HiFiGANDiscriminator, MultiPeriodDiscriminator, MultiScaleDiscriminator)
from smart_nar_fast_tts_tpu.vocoder.losses import (
    discriminator_loss, feature_matching_loss, generator_adversarial_loss,
    mel_l1_loss)
from smart_nar_fast_tts_tpu.training.vocoder import (
    VocoderState, create_vocoder_state, make_vocoder_optimizer,
    make_vocoder_train_step, sample_segments)

# Tiny everything: 4x2 upsample (hop 8), 1 resblock kernel, narrow channels.
TINY_GEN = HiFiGANConfig(
    upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=16, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),), n_mels=8)
TINY_SCALE_LAYERS = ((8, 15, 1, 1), (16, 41, 4, 4), (16, 5, 1, 1))
TINY_MEL = MelSpectrogramConfig(n_fft=32, hop_length=8, win_length=32,
                                n_mels=8, mel_fmax=None)
SEG = 256  # samples per training segment


def tiny_disc():
    return HiFiGANDiscriminator(
        periods=(2, 3), period_channels=(4, 8), n_scales=2,
        scale_layers=TINY_SCALE_LAYERS)


class TestDiscriminators:
    def test_mpd_shapes(self):
        mpd = MultiPeriodDiscriminator(periods=(2, 3, 5))
        wav = jnp.zeros((2, 100))
        vars_ = mpd.init(jax.random.PRNGKey(0), wav)
        out = mpd.apply(vars_, wav)
        assert len(out) == 3
        for score, feats in out:
            assert score.shape[0] == 2 and score.ndim == 2
            assert len(feats) == 6  # 4 strided + 1 plain + post

    def test_mpd_period_padding(self):
        # T=101 not divisible by 3: reflect-pad then fold must not crash
        mpd = MultiPeriodDiscriminator(periods=(3,))
        wav = jnp.ones((1, 101))
        vars_ = mpd.init(jax.random.PRNGKey(0), wav)
        (score, _), = mpd.apply(vars_, wav)
        assert np.all(np.isfinite(score))

    def test_msd_shapes(self):
        msd = MultiScaleDiscriminator(n_scales=3, layers=TINY_SCALE_LAYERS)
        wav = jnp.zeros((2, 256))
        vars_ = msd.init(jax.random.PRNGKey(0), wav, update_stats=True)
        out, _ = msd.apply(vars_, wav, update_stats=True,
                           mutable=["batch_stats"])
        assert len(out) == 3
        # each pooled scale halves time (stride 2)
        t0 = out[0][0].shape[1]
        assert out[1][0].shape[1] in (t0 // 2, t0 // 2 + 1)

    def test_msd_spectral_norm_state(self):
        msd = MultiScaleDiscriminator(n_scales=2, layers=TINY_SCALE_LAYERS)
        wav = jnp.zeros((1, 128))
        vars_ = msd.init(jax.random.PRNGKey(0), wav, update_stats=True)
        # scale 0 uses spectral norm → power-iteration vectors exist
        assert "batch_stats" in vars_
        assert any("scale_0" in k for k in vars_["batch_stats"])


class TestLosses:
    def _fake(self, score, feats=()):
        return [(jnp.asarray(score), [jnp.asarray(f) for f in feats])]

    def test_discriminator_loss_fixed_point(self):
        # perfect discriminator: D(real)=1, D(fake)=0 → loss 0
        real = self._fake(np.ones((2, 4), np.float32))
        fake = self._fake(np.zeros((2, 4), np.float32))
        assert float(discriminator_loss(real, fake)) == pytest.approx(0.0)
        # fully fooled: D(real)=0, D(fake)=1 → 1 + 1 = 2
        assert float(discriminator_loss(fake, real)) == pytest.approx(2.0)

    def test_generator_adv_loss(self):
        fake = self._fake(np.ones((2, 4), np.float32))
        assert float(generator_adversarial_loss(fake)) == pytest.approx(0.0)
        fake = self._fake(np.zeros((2, 4), np.float32))
        assert float(generator_adversarial_loss(fake)) == pytest.approx(1.0)

    def test_feature_matching(self):
        a = np.ones((1, 3, 2), np.float32)
        real = self._fake(np.zeros((1, 2)), [a, 2 * a])
        fake = self._fake(np.zeros((1, 2)), [a, a])
        # layer sums: mean|a−a| + mean|2a−a| = 0 + 1
        assert float(feature_matching_loss(real, fake)) == pytest.approx(1.0)

    def test_mel_l1_zero_on_identical(self):
        wav = jnp.asarray(np.random.RandomState(0)
                          .randn(1, 512).astype(np.float32))
        # abs tolerance: with SMART_TTS_PALLAS=interpret the real branch
        # runs the DFT-matmul kernel (≈1e-7 fp32 drift vs rfft)
        assert float(mel_l1_loss(wav, wav, TINY_MEL)) == pytest.approx(
            0.0, abs=1e-5)


class TestTrainStep:
    def _setup(self, mesh=None):
        gen = HiFiGANGenerator(TINY_GEN)
        disc = tiny_disc()
        gen_tx = make_vocoder_optimizer(2e-4)
        disc_tx = make_vocoder_optimizer(2e-4)
        state = create_vocoder_state(gen, disc, gen_tx, disc_tx,
                                     segment_size=SEG, seed=0)
        step = make_vocoder_train_step(gen, disc, TINY_MEL, gen_tx, disc_tx,
                                       mesh=mesh)
        return state, step

    def test_step_runs_and_updates(self):
        state, step = self._setup()
        wavs = jnp.asarray(np.random.RandomState(1)
                           .randn(2, SEG).astype(np.float32) * 0.1)
        # donate_argnums invalidates the input state's buffers — copy first
        g0 = np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0])
        d0 = np.asarray(jax.tree_util.tree_leaves(state.disc_params)[0])
        new_state, metrics = step(state, wavs)
        assert int(new_state.step) == 1
        for v in (metrics.disc, metrics.gen_adv, metrics.feature,
                  metrics.mel, metrics.gen_total):
            assert np.isfinite(float(v))
        g1 = jax.tree_util.tree_leaves(new_state.gen_params)[0]
        d1 = jax.tree_util.tree_leaves(new_state.disc_params)[0]
        assert not np.allclose(np.asarray(g0), np.asarray(g1))
        assert not np.allclose(np.asarray(d0), np.asarray(d1))

    def test_scanned_multi_step(self):
        """steps_per_dispatch=K runs K GAN steps in one program: the step
        counter advances by K and the result equals K sequential
        single-step dispatches on the same batches."""
        gen = HiFiGANGenerator(TINY_GEN)
        disc = tiny_disc()
        gen_tx = make_vocoder_optimizer(2e-4)
        disc_tx = make_vocoder_optimizer(2e-4)
        wavs = np.random.RandomState(5).randn(3, 2, SEG).astype(
            np.float32) * 0.1

        state1 = create_vocoder_state(gen, disc, gen_tx, disc_tx,
                                      segment_size=SEG, seed=0)
        one = make_vocoder_train_step(gen, disc, TINY_MEL, gen_tx, disc_tx)
        for i in range(3):
            state1, m1 = one(state1, jnp.asarray(wavs[i]))

        state3 = create_vocoder_state(gen, disc, gen_tx, disc_tx,
                                      segment_size=SEG, seed=0)
        multi = make_vocoder_train_step(gen, disc, TINY_MEL, gen_tx,
                                        disc_tx, steps_per_dispatch=3)
        state3, m3 = multi(state3, jnp.asarray(wavs))
        assert int(state3.step) == 3 == int(state1.step)
        # last-step metrics agree with the sequential run
        np.testing.assert_allclose(float(m3.gen_total),
                                   float(m1.gen_total), rtol=1e-4)
        a = jax.tree_util.tree_leaves(state1.gen_params)[0]
        b = jax.tree_util.tree_leaves(state3.gen_params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_step_data_parallel_mesh(self):
        mesh = make_mesh((8, 1))
        state, step = self._setup(mesh=mesh)
        wavs = jnp.asarray(np.random.RandomState(2)
                           .randn(8, SEG).astype(np.float32) * 0.1)
        new_state, metrics = step(state, wavs)
        assert np.isfinite(float(metrics.gen_total))
        assert int(new_state.step) == 1

    def test_warm_start_generator(self):
        gen = HiFiGANGenerator(TINY_GEN)
        disc = tiny_disc()
        tx = make_vocoder_optimizer()
        mel = jnp.zeros((1, SEG // TINY_GEN.hop_length, TINY_GEN.n_mels))
        pretrained = gen.init(jax.random.PRNGKey(7), mel)["params"]
        state = create_vocoder_state(gen, disc, tx, tx, SEG,
                                     gen_params=pretrained)
        leaves_a = jax.tree_util.tree_leaves(pretrained)
        leaves_b = jax.tree_util.tree_leaves(state.gen_params)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSampleSegments:
    def test_shapes_and_padding(self):
        rng = np.random.default_rng(0)
        wavs = [np.ones(1000, np.float32), np.ones(100, np.float32)]
        out = sample_segments(wavs, batch_size=4, segment_size=256, rng=rng)
        assert out.shape == (4, 256)
        assert out.dtype == np.float32
        # any row drawn from the short clip is zero-padded past 100
        short_rows = np.asarray([row[100:].sum() == 0 and row[:100].all()
                                 for row in out])
        long_rows = np.asarray([row.all() for row in out])
        assert np.all(short_rows | long_rows)
