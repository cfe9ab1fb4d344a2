"""Long-form synthesis (VERDICT round-2 Missing #2 / SURVEY §5.7).

The reference caps inference at ``max_seq_len=1000`` frames (~11.6 s at hop
256) and silently truncates anything longer (``model/modules.py:228`` pads/
clips the regulator output).  Here serving escalates to the smallest frame
capacity that fits the predicted duration (``cli/synthesize._auto_cap_forward``)
and a ≥4096-frame utterance must come out whole: mel length equals the
predicted total duration, nothing clipped, and the streaming vocoder turns
the long mel into audio at O(1) memory.
"""

import numpy as np
import pytest

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from smart_nar_fast_tts_tpu.cli.synthesize import _auto_cap_forward
from smart_nar_fast_tts_tpu.config import (FeatureStats, ModelConfig,
                                           PreprocessConfig,
                                           TransformerConfig,
                                           VarianceEmbeddingConfig,
                                           VariancePredictorConfig)
from smart_nar_fast_tts_tpu.models import FastSpeech2Align


class _FakeOut:
    def __init__(self, durations):
        self.duration_rounded = np.asarray(durations, np.float32)


class TestAutoCapEscalation:
    """Unit contract of the capacity picker, independent of the model."""

    def _fwd_at(self, calls):
        def factory(cap):
            def fwd(durations):
                calls.append(cap)
                return _FakeOut(durations)
            return fwd
        return factory

    def test_short_stays_at_smallest_cap(self):
        calls = []
        fwd = _auto_cap_forward(self._fwd_at(calls), [1000, 4096])
        fwd([[100.0, 200.0]])
        assert calls == [1000]

    def test_long_escalates_once(self):
        calls = []
        fwd = _auto_cap_forward(self._fwd_at(calls), [1000, 2048, 4096])
        fwd([[1500.0, 1000.0]])          # Σ = 2500 -> needs 4096
        assert calls == [1000, 4096]

    def test_past_largest_cap_fails_loudly(self):
        calls = []
        fwd = _auto_cap_forward(self._fwd_at(calls), [1000, 4096])
        with pytest.raises(SystemExit, match="serving_mel_caps"):
            fwd([[5000.0]])

    def test_batch_uses_max_item(self):
        calls = []
        fwd = _auto_cap_forward(self._fwd_at(calls), [1000, 2048])
        fwd([[10.0, 20.0], [900.0, 800.0]])   # max item Σ = 1700
        assert calls == [1000, 2048]


class TestLongUtteranceThroughModel:
    """A ≥4096-frame utterance synthesized whole on CPU through the real
    model + streaming vocoder (the reference would truncate it to 1000)."""

    @pytest.fixture(scope="class")
    def model_and_vars(self):
        cfg = ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=1, encoder_head=2, encoder_hidden=16,
                decoder_layer=1, decoder_head=2, decoder_hidden=16,
                conv_filter_size=32),
            variance_predictor=VariancePredictorConfig(filter_size=16),
            variance_embedding=VarianceEmbeddingConfig(n_bins=16),
            max_seq_len=1000)
        pre = PreprocessConfig(stats=FeatureStats())
        model = FastSpeech2Align(cfg, pre)
        texts0 = jnp.zeros((1, 4), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), texts0,
                               jnp.asarray([4], jnp.int32), max_mel_len=64)
        # bias high enough that 128 phonemes predict >=4096 frames
        dp = variables["params"]["variance_adaptor"][
            "duration_predictor"]["linear_layer"]
        dp["bias"] = dp["bias"] + np.log(64.0)
        return model, variables

    def test_full_length_synthesis(self, model_and_vars):
        model, variables = model_and_vars
        L = 128
        rng = np.random.default_rng(0)
        texts = jnp.asarray(rng.integers(2, 300, size=(1, L)), jnp.int32)
        src_lens = jnp.asarray([L], jnp.int32)

        def fwd_at(cap):
            return lambda: model.apply(variables, texts, src_lens,
                                       max_mel_len=cap, deterministic=True)

        fwd = _auto_cap_forward(fwd_at, [1000, 6144])
        out = fwd()
        total = int(np.asarray(out.duration_rounded).sum())
        assert total >= 4096, f"fixture too short: {total} frames"
        # nothing clipped: the mel length IS the predicted duration
        assert int(out.mel_lens[0]) == total
        assert out.postnet_mel.shape == (1, 6144, 80)
        mel = np.asarray(out.postnet_mel[0, :total])
        assert np.isfinite(mel).all()
        # valid frames carry signal; frames past the length are zero-masked
        valid = np.asarray(out.mel_valid[0])
        assert valid[:total].all() and not valid[total:].any()

    def test_flagship_config_long_form(self):
        """VERDICT r3 Weak #5: the toy-model long test can't catch
        flagship-shape capacity/shape bugs — run the REAL ModelConfig()
        (d=256, 4-layer stacks) through the 4096-cap escalation path on
        CPU once.  B=1 and a single forward keep CI cost bounded (~30 s
        compile + run)."""
        cfg = ModelConfig(max_seq_len=1000)          # flagship defaults
        pre = PreprocessConfig(stats=FeatureStats())
        model = FastSpeech2Align(cfg, pre)
        L = 192
        rng = np.random.default_rng(3)
        texts = jnp.asarray(rng.integers(2, 300, size=(1, L)), jnp.int32)
        src_lens = jnp.asarray([L], jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), texts, src_lens,
                               max_mel_len=64)
        # ~24 frames/phoneme -> 192 phonemes predict past 4096 frames
        # (random-init predictions average exp ~0.6, so the bias must
        # overshoot: log(42)·0.6 ≈ 25 f/p ≈ 4.8k frames, inside (4096, 6144])
        dp = variables["params"]["variance_adaptor"][
            "duration_predictor"]["linear_layer"]
        dp["bias"] = dp["bias"] + np.log(42.0)

        def fwd_at(cap):
            return lambda: model.apply(variables, texts, src_lens,
                                       max_mel_len=cap, deterministic=True)

        fwd = _auto_cap_forward(fwd_at, [1000, 6144])
        out = fwd()
        total = int(np.asarray(out.duration_rounded).sum())
        assert total >= 4096, f"fixture too short: {total} frames"
        assert int(out.mel_lens[0]) == total          # nothing clipped
        assert out.postnet_mel.shape == (1, 6144, 80)
        mel = np.asarray(out.postnet_mel[0, :total])
        assert np.isfinite(mel).all()
        valid = np.asarray(out.mel_valid[0])
        assert valid[:total].all() and not valid[total:].any()

    def test_streaming_vocoder_covers_long_mel(self, model_and_vars):
        from smart_nar_fast_tts_tpu.vocoder import (HiFiGANConfig,
                                                    HiFiGANGenerator,
                                                    StreamingVocoder)
        model, variables = model_and_vars
        L = 128
        rng = np.random.default_rng(1)
        texts = jnp.asarray(rng.integers(2, 300, size=(1, L)), jnp.int32)
        out = model.apply(variables, texts, jnp.asarray([L], jnp.int32),
                          max_mel_len=6144, deterministic=True)
        total = int(out.mel_lens[0])
        assert total >= 4096
        mel = np.asarray(out.postnet_mel[0, :total])

        vcfg = HiFiGANConfig(
            upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
            upsample_initial_channel=8, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 2),), n_mels=80)
        gen = HiFiGANGenerator(vcfg)
        gen_vars = gen.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 80)))
        sv = StreamingVocoder(gen, gen_vars, chunk_frames=256)
        wav = np.concatenate(list(sv.synthesize_chunks(mel)))
        assert wav.shape == (total * vcfg.hop_length,)
        assert np.isfinite(wav).all()
