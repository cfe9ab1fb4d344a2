"""AOT serving export: jax.export round-trip fidelity.

Contract: an artifact directory produced by ``serving.export_serving_artifacts``
must reproduce the live model's outputs exactly (same backend, same shapes ⇒
same compiled math) through ``serving.ExportedTTS`` with no package model
classes involved at load time.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_nar_fast_tts_tpu.config import (FeatureStats, ModelConfig,
                                           PreprocessConfig,
                                           TransformerConfig,
                                           VarianceEmbeddingConfig,
                                           VariancePredictorConfig)
from smart_nar_fast_tts_tpu.models import FastSpeech2Align
from smart_nar_fast_tts_tpu.serving import ExportedTTS, export_serving_artifacts
from smart_nar_fast_tts_tpu.vocoder import HiFiGANConfig, HiFiGANGenerator

TEXT_BUCKETS = (8, 16)
MEL_BUCKETS = (64, 128)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    out = tmp_path_factory.mktemp("artifact")
    mcfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, encoder_head=2, encoder_hidden=16,
            decoder_layer=1, decoder_head=2, decoder_hidden=16,
            conv_filter_size=32),
        variance_predictor=VariancePredictorConfig(filter_size=16),
        variance_embedding=VarianceEmbeddingConfig(n_bins=16),
        max_seq_len=128)
    pre = PreprocessConfig(stats=FeatureStats(
        pitch_min=-2.0, pitch_max=8.0, pitch_mean=0.0, pitch_std=1.0,
        energy_min=-2.0, energy_max=8.0, energy_mean=0.0, energy_std=1.0))
    model = FastSpeech2Align(mcfg, pre)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4), jnp.int32),
                           jnp.asarray([4], jnp.int32), max_mel_len=128)
    # bias durations up so predicted mel_lens are nonzero
    dp = variables["params"]["variance_adaptor"]["duration_predictor"][
        "linear_layer"]
    dp["bias"] = dp["bias"] + np.log(5.0)

    vcfg = HiFiGANConfig(upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                         upsample_initial_channel=8,
                         resblock_kernel_sizes=(3,),
                         resblock_dilation_sizes=((1, 2),), n_mels=80)
    gen = HiFiGANGenerator(vcfg)
    gen_vars = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 80)))

    manifest = export_serving_artifacts(
        str(out), model, variables,
        text_buckets=TEXT_BUCKETS, mel_buckets=MEL_BUCKETS,
        batch_size=1, max_mel_len=128,
        generator=gen, gen_variables=gen_vars, stream_chunk=16,
        provenance={"test": "round-trip"})
    return out, model, variables, gen, gen_vars, manifest


def test_manifest_and_files(artifact):
    out, *_, manifest = artifact
    assert (out / "manifest.json").exists()
    on_disk = json.loads((out / "manifest.json").read_text())
    assert on_disk["acoustic"] == manifest["acoustic"]
    for entry in manifest["acoustic"] + manifest["vocoder"]:
        assert (out / entry["file"]).exists()
    assert (out / manifest["streaming"]["file"]).exists()
    # streaming window = chunk + 2*halo for the tiny topology
    assert manifest["streaming"]["window_frames"] == (
        16 + 2 * manifest["streaming"]["halo_frames"])


def test_acoustic_round_trip_matches_live_model(artifact):
    out, model, variables, *_ = artifact
    tts = ExportedTTS(str(out))
    ids = np.array([5, 9, 2, 7, 11, 3], np.int32)     # -> bucket 8
    got = tts.acoustic(ids)

    texts = np.zeros((1, 8), np.int32)
    texts[0, :6] = ids
    ref = model.apply(variables, jnp.asarray(texts),
                      jnp.asarray([6], jnp.int32), max_mel_len=128,
                      deterministic=True)
    np.testing.assert_array_equal(got["mel_lens"], np.asarray(ref.mel_lens))
    np.testing.assert_allclose(got["postnet_mel"],
                               np.asarray(ref.postnet_mel), atol=1e-5)
    np.testing.assert_array_equal(got["duration_rounded"],
                                  np.asarray(ref.duration_rounded))


def test_bucket_selection(artifact):
    out, *_ = artifact
    tts = ExportedTTS(str(out))
    short = tts.acoustic(np.arange(2, 6, dtype=np.int32))
    long = tts.acoustic(np.arange(2, 16, dtype=np.int32))
    assert short["postnet_mel"].shape[1] == long["postnet_mel"].shape[1]
    assert short["duration_rounded"].shape[1] == 8       # bucket 8
    assert long["duration_rounded"].shape[1] == 16       # bucket 16
    # longer than every exported bucket: a served request must fail loudly,
    # never return silently truncated speech
    with pytest.raises(ValueError, match="largest exported bucket"):
        tts.acoustic(np.arange(2, 2 + 17, dtype=np.int32))


def test_synthesize_end_to_end(artifact):
    out, _, _, gen, gen_vars, _ = artifact
    tts = ExportedTTS(str(out))
    ids = np.array([5, 9, 2, 7], np.int32)
    wav = tts.synthesize(ids)
    n_frames = int(tts.acoustic(ids)["mel_lens"][0])
    assert wav.shape == (n_frames * gen.config.hop_length,)
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 1.0


def test_loader_needs_no_model_classes(artifact):
    """The deserialized program must run from raw bytes + jnp arrays alone —
    simulate a server that never imports the model package's classes."""
    out, *_ , manifest = artifact
    from jax import export as jax_export
    entry = manifest["acoustic"][0]
    with open(out / entry["file"], "rb") as f:
        call = jax_export.deserialize(f.read()).call
    got = call(jnp.zeros((1, entry["text_bucket"]), jnp.int32),
               jnp.ones((1,), jnp.int32))
    assert set(got.keys()) >= {"postnet_mel", "mel_lens"}
