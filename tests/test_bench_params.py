"""The committed-trained-params path of ``bench.py``: the f16 npz store
(``benchmarks.train_flagship.save_variables_npz``) must round-trip any
variables tree to f16 resolution through nothing but the tree structure an
``init`` rebuilds — the loader the driver-facing bench relies on."""

import numpy as np
import pytest

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from benchmarks.train_flagship import (load_variables_npz,
                                       save_variables_npz)


def _tiny_variables():
    from smart_nar_fast_tts_tpu.config import (FeatureStats, ModelConfig,
                                               PreprocessConfig,
                                               TransformerConfig)
    from smart_nar_fast_tts_tpu.models import FastSpeech2Align
    cfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_head=2,
            decoder_head=2, encoder_hidden=16, decoder_hidden=16,
            conv_filter_size=32),
        max_seq_len=64)
    model = FastSpeech2Align(cfg, PreprocessConfig(stats=FeatureStats()))
    texts = jnp.zeros((1, 4), jnp.int32)
    lens = jnp.asarray([4], jnp.int32)
    v = model.init(jax.random.PRNGKey(0), texts, lens,
                   mels=jnp.zeros((1, 8, 80)),
                   mel_lens=jnp.asarray([8], jnp.int32),
                   p_targets=jnp.zeros((1, 8)), e_targets=jnp.zeros((1, 8)))
    return model, v, texts, lens


def test_round_trip_f16_resolution(tmp_path):
    model, variables, texts, lens = _tiny_variables()
    path = str(tmp_path / "params.npz")
    n = save_variables_npz(path, variables)
    assert n == len(jax.tree.leaves(variables))

    # loader rebuilds from a FRESH init tree (different values, same shape)
    _, fresh, *_ = _tiny_variables()
    loaded = load_variables_npz(path, fresh)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(variables)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype
        if b.dtype == np.float32:       # f16 storage resolution
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)
        else:
            np.testing.assert_array_equal(a, b)


def test_loaded_params_drive_the_model(tmp_path):
    model, variables, texts, lens = _tiny_variables()
    path = str(tmp_path / "params.npz")
    save_variables_npz(path, variables)
    _, fresh, *_ = _tiny_variables()
    loaded = load_variables_npz(path, fresh)
    ref = model.apply(variables, texts, lens, max_mel_len=16,
                      deterministic=True)
    got = model.apply(loaded, texts, lens, max_mel_len=16,
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(got.postnet_mel),
                               np.asarray(ref.postnet_mel),
                               rtol=1e-2, atol=1e-2)


def test_vocoder_tree_round_trips(tmp_path):
    """bench.py / benchmarks.export_trained load GAN-trained vocoder params
    (``vocoder_params.npz``) through the same flatten-order loader — the
    HiFi-GAN variables tree must survive the f16 store bit-compatibly."""
    from smart_nar_fast_tts_tpu.vocoder import (HiFiGANConfig,
                                                HiFiGANGenerator)
    gen = HiFiGANGenerator(HiFiGANConfig(
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), n_mels=8))
    mel = jnp.zeros((1, 16, 8))
    variables = gen.init(jax.random.PRNGKey(0), mel)
    path = str(tmp_path / "voc.npz")
    save_variables_npz(path, variables)
    fresh = gen.init(jax.random.PRNGKey(7), mel)
    loaded = load_variables_npz(path, fresh)
    ref = np.asarray(gen.apply(variables, mel))
    got = np.asarray(gen.apply(loaded, mel))
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-3)


def test_vocos_tree_round_trips(tmp_path):
    """The Vocos serving variant of bench.py loads ``vocos_params.npz``
    through the same flatten-order loader — the VocosGenerator variables
    tree must survive the f16 store with matching forwards."""
    from smart_nar_fast_tts_tpu.vocoder import VocosConfig, VocosGenerator
    gen = VocosGenerator(VocosConfig(
        dim=32, intermediate=64, n_layers=2, n_fft=64, hop=16, win_length=64,
        n_mels=8))
    mel = jnp.zeros((1, 16, 8))
    variables = gen.init(jax.random.PRNGKey(0), mel)
    path = str(tmp_path / "vocos.npz")
    save_variables_npz(path, variables)
    fresh = gen.init(jax.random.PRNGKey(7), mel)
    loaded = load_variables_npz(path, fresh)
    ref = np.asarray(gen.apply(variables, mel))
    got = np.asarray(gen.apply(loaded, mel))
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-3)


def test_architecture_mismatch_fails_loudly(tmp_path):
    model, variables, *_ = _tiny_variables()
    path = str(tmp_path / "params.npz")
    save_variables_npz(path, variables)

    from smart_nar_fast_tts_tpu.config import (FeatureStats, ModelConfig,
                                               PreprocessConfig,
                                               TransformerConfig)
    from smart_nar_fast_tts_tpu.models import FastSpeech2Align
    other = FastSpeech2Align(
        ModelConfig(transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_head=2,
            decoder_head=2, encoder_hidden=32, decoder_hidden=32,
            conv_filter_size=32), max_seq_len=64),
        PreprocessConfig(stats=FeatureStats()))
    v2 = other.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
                    jnp.asarray([4], jnp.int32), max_mel_len=16)
    with pytest.raises(AssertionError, match="different architecture"):
        load_variables_npz(path, v2)
