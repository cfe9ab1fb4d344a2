"""Vocos iSTFT-head vocoder (vocoder/vocos.py).

No torch oracle exists (the reference has no such vocoder — this is the
TPU-first family added on top of its ``vocoder(mel) -> wav`` surface,
``utils/model.py:53-88``), so these tests validate the design contracts
directly: the HiFi-GAN-compatible length contract, an analysis→synthesis
identity through the iSTFT head math, bf16/f32 agreement, trainability
under the generic GAN step, and the CLI path.
"""

import numpy as np
import pytest

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from smart_nar_fast_tts_tpu.audio.stft import (MelSpectrogramConfig,
                                               frame_signal, istft)
from smart_nar_fast_tts_tpu.parallel.mesh import make_mesh
from smart_nar_fast_tts_tpu.training.vocoder import (
    create_vocoder_state, make_vocoder_optimizer, make_vocoder_train_step)
from smart_nar_fast_tts_tpu.vocoder import (VocosConfig, VocosGenerator,
                                            vocos_infer)
from smart_nar_fast_tts_tpu.vocoder.discriminators import HiFiGANDiscriminator

TINY = VocosConfig(n_mels=8, dim=16, intermediate=32, n_layers=2,
                   n_fft=32, hop=8, win_length=32)
TINY_MEL = MelSpectrogramConfig(n_fft=32, hop_length=8, win_length=32,
                                n_mels=8, mel_fmax=None)


class TestGenerator:
    def test_length_contract(self):
        """T mel frames → exactly T·hop samples, like HiFiGANGenerator."""
        g = VocosGenerator(TINY)
        for t in (4, 17, 33):
            mel = jnp.zeros((2, t, 8))
            v = g.init(jax.random.PRNGKey(0), mel)
            wav = jax.jit(g.apply)(v, mel)
            assert wav.shape == (2, t * TINY.hop)
            assert np.all(np.isfinite(np.asarray(wav)))

    def test_default_size_matches_v1_class(self):
        """Default config lands in HiFi-GAN V1's parameter class (~13-14M)
        so GAN capacity comparisons are apples-to-apples."""
        g = VocosGenerator(VocosConfig())
        v = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 80)))
        n = sum(x.size for x in jax.tree_util.tree_leaves(v))
        assert 12e6 < n < 15e6

    def test_istft_head_identity(self):
        """If the head emitted the true STFT of a waveform, the generator's
        padded overlap-add must reconstruct that waveform.  Exercises the
        exact mag/phase→wav path the model output flows through (edge-pad
        by one frame, (B,T,bins)→(B,bins,T+1) layout, OLA normalize)."""
        cfg = TINY
        rng = np.random.RandomState(0)
        t_frames = 24
        wav = rng.randn(t_frames * cfg.hop).astype(np.float32) * 0.3
        # analysis with the generator's own STFT config (centered framing)
        scfg = cfg.stft_config()
        frames = frame_signal(jnp.asarray(wav)[None], cfg.n_fft, cfg.hop)
        spec = jnp.fft.rfft(frames * jnp.asarray(scfg.window), axis=-1)
        mag = jnp.abs(spec)[:, :t_frames + 1]      # (1, T+1, bins)
        phase = jnp.angle(spec)[:, :t_frames + 1]
        out = istft(jnp.swapaxes(mag, 1, 2), jnp.swapaxes(phase, 1, 2),
                    scfg)
        n = min(out.shape[1], wav.shape[0])
        err = np.abs(np.asarray(out)[0, :n] - wav[:n]).max()
        assert err < 1e-4, err

    def test_istft_matmul_matches_fft_istft(self):
        """The matmul-iDFT serving path (audio.stft.istft_matmul — no
        complex FFT, MXU-native) is numerically the FFT istft."""
        from smart_nar_fast_tts_tpu.audio.stft import istft_matmul
        rng = np.random.RandomState(7)
        for n_fft, hop in ((32, 8), (1024, 256)):
            cfg = MelSpectrogramConfig(n_fft=n_fft, hop_length=hop,
                                       win_length=n_fft, n_mels=8,
                                       mel_fmax=None)
            f = 9
            mag = jnp.asarray(np.abs(rng.randn(2, n_fft // 2 + 1, f)),
                              jnp.float32)
            ph = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                         (2, n_fft // 2 + 1, f)),
                             jnp.float32)
            a = np.asarray(istft(mag, ph, cfg))
            b = np.asarray(istft_matmul(mag, ph, cfg))
            np.testing.assert_allclose(b, a, atol=2e-4 if n_fft > 64
                                       else 1e-5)

    def test_bf16_close_to_f32(self):
        mel = jnp.asarray(np.random.RandomState(1).randn(1, 16, 8),
                          jnp.float32)
        g32 = VocosGenerator(TINY)
        v = g32.init(jax.random.PRNGKey(2), mel)
        w32 = g32.apply(v, mel)
        g16 = VocosGenerator(
            VocosConfig(**{**TINY.to_dict(), "compute_dtype": "bfloat16"}))
        w16 = g16.apply(v, mel)
        denom = float(jnp.linalg.norm(w32)) + 1e-8
        rel = float(jnp.linalg.norm(w32 - w16)) / denom
        assert rel < 0.1, rel

    def test_magnitude_is_capped(self):
        """Head log-magnitudes are clipped before exp — a wild early-training
        head must not produce inf/nan audio."""
        g = VocosGenerator(TINY)
        mel = jnp.full((1, 8, 8), 50.0)  # absurd input drives the head hard
        v = g.init(jax.random.PRNGKey(0), mel)
        big = jax.tree_util.tree_map(lambda x: x * 100.0, v)
        wav = g.apply(big, mel)
        assert np.all(np.isfinite(np.asarray(wav)))

    def test_infer_trims_to_mel_lens(self):
        g = VocosGenerator(TINY)
        mel = jnp.zeros((2, 10, 8))
        v = g.init(jax.random.PRNGKey(0), mel)
        wavs = vocos_infer(g, v, mel, mel_lens=[10, 6])
        assert wavs[0].shape == (10 * TINY.hop,)
        assert wavs[1].shape == (6 * TINY.hop,)
        assert np.abs(wavs[0]).max() <= 32768.0


class TestGanTraining:
    def _setup(self, mesh=None):
        gen = VocosGenerator(TINY)
        disc = HiFiGANDiscriminator(
            periods=(2, 3), period_channels=(4, 8), n_scales=2,
            scale_layers=((8, 15, 1, 1), (16, 41, 4, 4), (16, 5, 1, 1)))
        gen_tx = make_vocoder_optimizer(2e-4)
        disc_tx = make_vocoder_optimizer(2e-4)
        state = create_vocoder_state(gen, disc, gen_tx, disc_tx,
                                     segment_size=256, seed=0)
        step = make_vocoder_train_step(gen, disc, TINY_MEL, gen_tx, disc_tx,
                                       mesh=mesh)
        return state, step

    def test_gan_step_runs_and_updates(self):
        """The generic GAN step (training/vocoder.py) trains this family
        unchanged: finite losses, both trees move."""
        state, step = self._setup()
        wavs = jnp.asarray(np.random.RandomState(1)
                           .randn(2, 256).astype(np.float32) * 0.1)
        g0 = np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0])
        new_state, metrics = step(state, wavs)
        for v in (metrics.disc, metrics.gen_adv, metrics.feature,
                  metrics.mel, metrics.gen_total):
            assert np.isfinite(float(v))
        g1 = jax.tree_util.tree_leaves(new_state.gen_params)[0]
        assert not np.allclose(g0, np.asarray(g1))

    def test_gan_step_data_parallel(self):
        mesh = make_mesh((8, 1))
        state, step = self._setup(mesh=mesh)
        wavs = jnp.asarray(np.random.RandomState(2)
                           .randn(8, 256).astype(np.float32) * 0.1)
        new_state, metrics = step(state, wavs)
        assert np.isfinite(float(metrics.gen_total))
        assert int(new_state.step) == 1


class TestStreamingAndLoading:
    def test_streaming_matches_full(self):
        """Chunked synthesis through the generic StreamingVocoder equals the
        whole-mel forward: the Vocos halo (backbone receptive radius +
        iSTFT overlap-add margin, streaming.vocos_receptive_halo) is
        sufficient."""
        from smart_nar_fast_tts_tpu.vocoder import StreamingVocoder
        g = VocosGenerator(TINY)
        rng = np.random.RandomState(3)
        mel = jnp.asarray(rng.randn(1, 120, 8), jnp.float32)
        v = g.init(jax.random.PRNGKey(1), mel)
        full = np.asarray(g.apply(v, mel))[0]
        sv = StreamingVocoder(g, v, chunk_frames=16)
        chunked = sv.synthesize(np.asarray(mel[0]))
        assert chunked.shape == full.shape
        np.testing.assert_allclose(chunked, full, atol=2e-5)

    def test_load_vocoder_family_dispatch(self, tmp_path):
        """load_vocoder rebuilds the right generator family from the
        config.json the training CLI writes, and the params round-trip."""
        import json
        from flax import serialization
        from smart_nar_fast_tts_tpu.vocoder.convert import load_vocoder
        g = VocosGenerator(TINY)
        mel = jnp.asarray(np.random.RandomState(4).randn(1, 12, 8),
                          jnp.float32)
        v = g.init(jax.random.PRNGKey(5), mel)
        (tmp_path / "config.json").write_text(
            json.dumps({"family": "vocos", **TINY.to_dict()}))
        ckpt = tmp_path / "generator_1.msgpack"
        ckpt.write_bytes(serialization.to_bytes(v["params"]))
        g2, v2 = load_vocoder(str(ckpt))
        assert isinstance(g2, VocosGenerator) and g2.config == TINY
        np.testing.assert_allclose(np.asarray(g2.apply(v2, mel)),
                                   np.asarray(g.apply(v, mel)), atol=0)


class TestCli:
    def test_train_vocoder_cli_vocos(self, tmp_path):
        """End-to-end CLI smoke: --generator vocos trains, saves params +
        a config.json tagged with the family."""
        import json
        from smart_nar_fast_tts_tpu.data.wavio import save_wav
        wav_dir = tmp_path / "wavs"
        wav_dir.mkdir()
        rng = np.random.RandomState(0)
        for i in range(2):
            save_wav(str(wav_dir / f"{i}.wav"),
                     rng.randn(600).astype(np.float32) * 0.1, 22050)
        out = tmp_path / "out"
        from smart_nar_fast_tts_tpu.cli.train_vocoder import main
        main(["--wav_dir", str(wav_dir), "--steps", "2", "--batch_size",
              "2", "--segment_size", "128", "--debug_tiny", "--generator",
              "vocos", "--out_dir", str(out), "--save_every", "2",
              "--log_every", "1"])
        cfg = json.loads((out / "config.json").read_text())
        assert cfg["family"] == "vocos" and cfg["dim"] == 16
        assert (out / "generator_2.msgpack").exists()
