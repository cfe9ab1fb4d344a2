"""Numerical parity vs the reference PyTorch model (BASELINE north star:
mel allclose atol 1e-3).

The reference repo ships no trained checkpoint (hifigan/ and data/ are
broken symlinks), so parity is established the other way around: instantiate
the reference model on CPU torch with its own random init, convert its
state_dict through ``models/convert.py``, and require both frameworks to
produce allclose outputs on identical inputs — which proves the converted
checkpoint path end to end.
"""

import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smart_nar_fast_tts_tpu.config import (
    FeatureStats, ModelConfig, PreprocessConfig)
from smart_nar_fast_tts_tpu.models import FastSpeech2Align
from smart_nar_fast_tts_tpu.models.convert import (
    torch_state_dict_to_variables, variables_to_torch_state_dict)

# NOTE: positive pitch range — the reference's shipped LJSpeech config pairs
# log pitch quantization with *normalized* (negative-min) pitch, which makes
# torch.linspace(log(negative), ...) produce NaN bins (its own model.yaml
# comment forbids the combination).  Parity is checked on the sane config.
STATS = FeatureStats(
    pitch_min=71.0, pitch_max=800.0, pitch_mean=207.0, pitch_std=46.0,
    energy_min=-1.4, energy_max=8.3, energy_mean=37.0, energy_std=25.0)


def _recovered_calculate_duration(self, attn, ilen, olen, max_ilen=None):
    """The method body missing from the shipped source, recovered from
    model/__pycache__/fastspeech2_align.cpython-38.pyc (SURVEY.md §2.4.1)."""
    import torch
    import torch.nn.functional as F
    duration = torch.stack(
        [attn[:olen, :ilen].argmax(-1).eq(i).sum() for i in range(ilen)])
    if max_ilen is not None:
        duration = F.pad(duration, (0, max_ilen - ilen), "constant", 0)
    return duration


def _build_reference(tmp, stats: FeatureStats, pitch_quantization: str,
                     pitch_feature: str = "frame_level",
                     energy_feature: str = "frame_level"):
    """Instantiate the reference FastSpeech2Align on CPU torch with a staged
    stats.json and the given pitch quantization / feature levels."""
    import types
    for name in ("unidecode", "inflect"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.unidecode = lambda s: s
            m.engine = lambda: None
            sys.modules[name] = m
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch
    torch.manual_seed(0)
    with open(os.path.join(str(tmp), "stats.json"), "w") as f:
        json.dump({
            "pitch": [stats.pitch_min, stats.pitch_max,
                      stats.pitch_mean, stats.pitch_std],
            "energy": [stats.energy_min, stats.energy_max,
                       stats.energy_mean, stats.energy_std],
        }, f)
    preprocess_config = {
        "path": {"preprocessed_path": str(tmp)},
        "preprocessing": {
            "mel": {"n_mel_channels": 80},
            "pitch": {"feature": pitch_feature},
            "energy": {"feature": energy_feature},
        },
    }
    model_config = {
        "transformer": {
            "encoder_layer": 4, "encoder_head": 2,
            "encoder_hidden": 256, "decoder_layer": 4,
            "decoder_head": 2, "decoder_hidden": 256,
            "conv_filter_size": 1024, "conv_kernel_size": [9, 1],
            "encoder_dropout": 0.2, "decoder_dropout": 0.2,
        },
        "variance_predictor": {
            "filter_size": 256, "kernel_size": 3, "dropout": 0.5},
        "variance_embedding": {
            "pitch_quantization": pitch_quantization,
            "energy_quantization": "linear", "n_bins": 256},
        "multi_speaker": False,
        "max_seq_len": 1000,
    }
    from model.fastspeech2_align import FastSpeech2Align as RefModel
    RefModel._calculate_duration = _recovered_calculate_duration
    ref = RefModel(preprocess_config, model_config)
    ref.eval()
    return ref, torch


@pytest.fixture(scope="module")
def reference_model(tmp_path_factory):
    """Reference FastSpeech2Align on CPU torch with stats.json staged."""
    try:
        yield _build_reference(tmp_path_factory.mktemp("ref_stats"),
                               STATS, "log")
    finally:
        if "/root/reference" in sys.path:
            sys.path.remove("/root/reference")


@pytest.fixture(scope="module")
def converted(reference_model):
    from smart_nar_fast_tts_tpu.config import VarianceEmbeddingConfig
    ref, torch = reference_model
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    # log pitch quantization to match the reference fixture's model_config
    # (valid here: STATS carries unnormalized positive-Hz pitch)
    cfg = ModelConfig(
        upsampling="hard",     # reference parity: torch runs the hard regulator
        duration_extraction="buggy",
        variance_embedding=VarianceEmbeddingConfig(
            pitch_quantization="log"))
    variables = torch_state_dict_to_variables(sd, cfg)
    pre = PreprocessConfig(stats=STATS, pitch_normalization=False,
                           energy_normalization=False)
    model = FastSpeech2Align(cfg, pre)
    return ref, torch, model, variables, cfg


def _inputs(torch, seed=0, B=2, L=14, T=48):
    rng = np.random.default_rng(seed)
    texts = rng.integers(2, 300, size=(B, L)).astype(np.int64)
    src_lens = np.array([L, L - 4], dtype=np.int64)
    for b, n in enumerate(src_lens):
        texts[b, n:] = 0
    mels = rng.normal(0, 1, size=(B, T, 80)).astype(np.float32)
    mel_lens = np.array([T, T - 12], dtype=np.int64)
    pitch = rng.uniform(60.0, 700.0, size=(B, T)).astype(np.float32)
    energy = np.abs(rng.normal(2, 1, size=(B, T))).astype(np.float32)
    for b, n in enumerate(mel_lens):
        mels[b, n:] = 0
        pitch[b, n:] = 0
        energy[b, n:] = 0
    return texts, src_lens, mels, mel_lens, pitch, energy


def test_training_forward_parity(converted):
    """Full train-path forward (mel-encoder alignment, buggy duration
    extraction, hard length regulation, frame-level variances, postnet)
    matches the reference within atol 1e-3 everywhere."""
    ref, torch, model, variables, cfg = converted
    texts, src_lens, mels, mel_lens, pitch, energy = _inputs(torch)

    with torch.no_grad():
        (r_mel, r_post, r_p, r_e, r_logd, r_dr, r_smask, r_mmask,
         r_slen, r_mlen, r_attn, r_dtgt) = ref(
            torch.zeros(2, dtype=torch.long),
            torch.from_numpy(texts), torch.from_numpy(src_lens),
            int(src_lens.max()),
            mels=torch.from_numpy(mels),
            mel_lens=torch.from_numpy(mel_lens),
            max_mel_len=int(mel_lens.max()),
            p_targets=torch.from_numpy(pitch),
            e_targets=torch.from_numpy(energy))

    out = model.apply(
        variables, jnp.asarray(texts), jnp.asarray(src_lens),
        mels=jnp.asarray(mels), mel_lens=jnp.asarray(mel_lens),
        p_targets=jnp.asarray(pitch), e_targets=jnp.asarray(energy),
        deterministic=True)

    # alignment attention maps (4 layers)
    ref_attn = np.stack([a.numpy() for a in r_attn])
    ours_attn = np.array(out.alignments, copy=True)
    # padded mel query rows are NaN in the reference, zeros here — compare
    # valid rows only
    for b, n in enumerate(mel_lens):
        ref_attn[:, b, :, n:] = 0.0
        ours_attn[:, b, :, n:] = 0.0
    np.testing.assert_allclose(ours_attn, ref_attn, atol=1e-4)

    np.testing.assert_array_equal(
        np.asarray(out.duration_targets), r_dtgt.numpy())
    np.testing.assert_allclose(
        np.asarray(out.log_duration_prediction), r_logd.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.pitch_prediction), r_p.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.energy_prediction), r_e.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.mel), r_mel.numpy(), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out.postnet_mel), r_post.numpy(), atol=1e-3)


def test_inference_forward_parity(converted):
    """Inference path (predicted durations → length regulation) matches the
    reference's variable-length output on the valid frames."""
    ref, torch, model, variables, cfg = converted
    texts, src_lens, *_ = _inputs(torch, seed=3)

    with torch.no_grad():
        (r_mel, r_post, r_p, r_e, r_logd, r_dr, _, _, _, r_mlen,
         _, _) = ref(
            torch.zeros(2, dtype=torch.long),
            torch.from_numpy(texts), torch.from_numpy(src_lens),
            int(src_lens.max()))

    T_cap = 256
    out = model.apply(
        variables, jnp.asarray(texts), jnp.asarray(src_lens),
        max_mel_len=T_cap, deterministic=True)

    np.testing.assert_allclose(
        np.asarray(out.log_duration_prediction), r_logd.numpy(), atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(out.duration_rounded), r_dr.numpy())
    np.testing.assert_array_equal(np.asarray(out.mel_lens), r_mlen.numpy())
    ours_mel = np.asarray(out.postnet_mel)
    ref_mel = r_post.numpy()
    for b in range(2):
        n = int(r_mlen[b])
        np.testing.assert_allclose(ours_mel[b, :n], ref_mel[b, :n],
                                   atol=1e-3)


def test_loss_parity(converted):
    """All 7 loss terms match the reference FastSpeech2Loss on the same
    (converted) model outputs."""
    ref, torch, model, variables, cfg = converted
    texts, src_lens, mels, mel_lens, pitch, energy = _inputs(torch, seed=5)

    with torch.no_grad():
        r_out = ref(
            torch.zeros(2, dtype=torch.long),
            torch.from_numpy(texts), torch.from_numpy(src_lens),
            int(src_lens.max()),
            mels=torch.from_numpy(mels),
            mel_lens=torch.from_numpy(mel_lens),
            max_mel_len=int(mel_lens.max()),
            p_targets=torch.from_numpy(pitch),
            e_targets=torch.from_numpy(energy))
        from model.loss import FastSpeech2Loss as RefLoss
        ref_loss = RefLoss(
            {"preprocessing": {"pitch": {"feature": "frame_level"},
                               "energy": {"feature": "frame_level"}}}, {})
        inputs = (None, None, None, None,
                  torch.from_numpy(src_lens), int(src_lens.max()),
                  torch.from_numpy(mels), torch.from_numpy(mel_lens),
                  int(mel_lens.max()), torch.from_numpy(pitch),
                  torch.from_numpy(energy))
        r_total, r_mel, r_post, r_pitch, r_energy, r_dur, r_attn = \
            ref_loss(inputs, r_out)

    from smart_nar_fast_tts_tpu.models import FastSpeech2Loss
    pre = PreprocessConfig(stats=STATS)
    out = model.apply(
        variables, jnp.asarray(texts), jnp.asarray(src_lens),
        mels=jnp.asarray(mels), mel_lens=jnp.asarray(mel_lens),
        p_targets=jnp.asarray(pitch), e_targets=jnp.asarray(energy),
        deterministic=True)
    losses = FastSpeech2Loss(pre)(
        out, jnp.asarray(mels), jnp.asarray(pitch), jnp.asarray(energy))

    np.testing.assert_allclose(float(losses.mel), float(r_mel), atol=1e-4)
    np.testing.assert_allclose(float(losses.postnet_mel), float(r_post),
                               atol=1e-4)
    np.testing.assert_allclose(float(losses.pitch), float(r_pitch),
                               rtol=1e-4)
    np.testing.assert_allclose(float(losses.energy), float(r_energy),
                               rtol=1e-4)
    np.testing.assert_allclose(float(losses.duration), float(r_dur),
                               rtol=1e-4)
    np.testing.assert_allclose(float(losses.attention), float(r_attn),
                               rtol=1e-4)
    np.testing.assert_allclose(float(losses.total), float(r_total),
                               rtol=1e-4)


def test_state_dict_roundtrip(converted):
    ref, torch, model, variables, cfg = converted
    sd0 = {k: v.detach().numpy() for k, v in ref.state_dict().items()
           if "position_enc" not in k and "_bins" not in k
           and "num_batches_tracked" not in k}
    sd1 = variables_to_torch_state_dict(variables, cfg)
    assert set(sd1) == set(sd0)
    for k in sd0:
        np.testing.assert_array_equal(sd0[k], sd1[k], err_msg=k)


def test_import_checkpoint_cli_roundtrip(reference_model, tmp_path):
    """Reference .pth.tar → import CLI → Orbax restore → same mel as the
    direct in-memory conversion (the reference-user migration path)."""
    ref, torch = reference_model
    ckpt = tmp_path / "12345.pth.tar"
    torch.save({"model": ref.state_dict()}, str(ckpt))

    import json as _json
    import yaml
    stats_dir = tmp_path / "pre"
    stats_dir.mkdir()
    with open(stats_dir / "stats.json", "w") as f:
        _json.dump({
            "pitch": [STATS.pitch_min, STATS.pitch_max, STATS.pitch_mean,
                      STATS.pitch_std],
            "energy": [STATS.energy_min, STATS.energy_max,
                       STATS.energy_mean, STATS.energy_std]}, f)
    p_yaml = tmp_path / "p.yaml"
    m_yaml = tmp_path / "m.yaml"
    t_yaml = tmp_path / "t.yaml"
    p_yaml.write_text(yaml.dump(
        {"path": {"preprocessed_path": str(stats_dir)}}))
    m_yaml.write_text(yaml.dump({}))
    t_yaml.write_text(yaml.dump(
        {"path": {"ckpt_path": str(tmp_path / "ckpt")}}))

    from smart_nar_fast_tts_tpu.cli import import_checkpoint
    import_checkpoint.main([
        "--torch_ckpt", str(ckpt), "-p", str(p_yaml), "-m", str(m_yaml),
        "-t", str(t_yaml)])

    # restore through the training checkpoint manager
    from smart_nar_fast_tts_tpu.config import Config
    from smart_nar_fast_tts_tpu.models import FastSpeech2Align
    from smart_nar_fast_tts_tpu.training.checkpoint import CheckpointManager
    from smart_nar_fast_tts_tpu.training.schedule import make_optimizer
    from smart_nar_fast_tts_tpu.training.state import create_train_state

    cfg = Config.from_yaml_triplet(str(p_yaml), str(m_yaml), str(t_yaml))
    import dataclasses
    from smart_nar_fast_tts_tpu.config import FeatureStats
    cfg = dataclasses.replace(cfg, preprocess=dataclasses.replace(
        cfg.preprocess,
        stats=FeatureStats.from_stats_json(str(stats_dir / "stats.json"))))
    model = FastSpeech2Align(cfg.model, cfg.preprocess)
    rng = np.random.RandomState(3)
    texts = jnp.asarray(rng.randint(2, 300, (1, 12)), jnp.int32)
    src_lens = jnp.asarray([12], jnp.int32)
    T0 = 8
    init_vars = model.init(
        jax.random.PRNGKey(0), texts, src_lens,
        mels=jnp.zeros((1, T0, 80)), mel_lens=jnp.asarray([T0], jnp.int32),
        p_targets=jnp.zeros((1, T0)), e_targets=jnp.zeros((1, T0)))
    tx = make_optimizer(cfg.train.optimizer, 256)
    state = create_train_state(init_vars, tx)
    mngr = CheckpointManager(cfg.train.ckpt_path)
    state, _ = mngr.restore(state)
    mngr.close()
    assert int(np.asarray(state.step)) == 12345

    got = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        texts, src_lens, max_mel_len=64, deterministic=True)

    # oracle: direct in-memory conversion
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    direct = torch_state_dict_to_variables(sd, cfg.model)
    want = model.apply(direct, texts, src_lens, max_mel_len=64,
                       deterministic=True)
    np.testing.assert_allclose(np.asarray(got.postnet_mel),
                               np.asarray(want.postnet_mel), atol=1e-6)


# -- shipped-config (normalized stats) parity — VERDICT.md Missing #5 -------

# Shipped-style LJSpeech stats.json: pitch/energy are z-normalized during
# preprocessing (preprocess.yaml:29-34), so min is negative.  The shipped
# model.yaml pairs this with LOG pitch quantization — a NaN-bin config error
# both frameworks reject (see test_log_plus_normalized_is_config_error); the
# valid migration is linear quantization, covered here.
STATS_SHIPPED = FeatureStats(
    pitch_min=-2.917, pitch_max=11.391, pitch_mean=207.0, pitch_std=46.58,
    energy_min=-1.375, energy_max=8.256, energy_mean=21.08,
    energy_std=14.77)


@pytest.fixture(scope="module")
def reference_model_shipped(tmp_path_factory):
    return _build_reference(tmp_path_factory.mktemp("ref_stats_shipped"),
                            STATS_SHIPPED, "linear")


def test_training_forward_parity_shipped_config(reference_model_shipped):
    """Parity on the configuration a reference user would actually migrate:
    shipped-style normalized stats + linear pitch quantization."""
    ref, torch = reference_model_shipped
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = ModelConfig(duration_extraction="buggy",
                      upsampling="hard")     # linear pitch default; hard = parity
    variables = torch_state_dict_to_variables(sd, cfg)
    pre = PreprocessConfig(stats=STATS_SHIPPED)
    model = FastSpeech2Align(cfg, pre)

    rng = np.random.default_rng(11)
    B, L, T = 2, 14, 48
    texts = rng.integers(2, 300, size=(B, L)).astype(np.int64)
    src_lens = np.array([L, L - 4], dtype=np.int64)
    for b, n in enumerate(src_lens):
        texts[b, n:] = 0
    mels = rng.normal(0, 1, size=(B, T, 80)).astype(np.float32)
    mel_lens = np.array([T, T - 12], dtype=np.int64)
    # normalized-feature ranges (z-scores), matching the stats above
    pitch = rng.uniform(-2.8, 11.0, size=(B, T)).astype(np.float32)
    energy = rng.uniform(-1.3, 8.0, size=(B, T)).astype(np.float32)
    for b, n in enumerate(mel_lens):
        mels[b, n:] = 0
        pitch[b, n:] = 0
        energy[b, n:] = 0

    with torch.no_grad():
        (r_mel, r_post, r_p, r_e, r_logd, *_rest, r_dtgt) = ref(
            torch.zeros(B, dtype=torch.long),
            torch.from_numpy(texts), torch.from_numpy(src_lens),
            int(src_lens.max()),
            mels=torch.from_numpy(mels),
            mel_lens=torch.from_numpy(mel_lens),
            max_mel_len=int(mel_lens.max()),
            p_targets=torch.from_numpy(pitch),
            e_targets=torch.from_numpy(energy))

    out = model.apply(
        variables, jnp.asarray(texts), jnp.asarray(src_lens),
        mels=jnp.asarray(mels), mel_lens=jnp.asarray(mel_lens),
        p_targets=jnp.asarray(pitch), e_targets=jnp.asarray(energy),
        deterministic=True)

    np.testing.assert_array_equal(
        np.asarray(out.duration_targets), r_dtgt.numpy())
    np.testing.assert_allclose(
        np.asarray(out.pitch_prediction), r_p.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.energy_prediction), r_e.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.mel), r_mel.numpy(), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out.postnet_mel), r_post.numpy(), atol=1e-3)


def test_log_plus_normalized_is_config_error():
    """The literal shipped model.yaml+preprocess.yaml combination (log pitch
    quantization over normalized pitch) NaNs in the reference; here it is a
    validated config error at both the Config and bin-construction layers."""
    from smart_nar_fast_tts_tpu.config import (Config,
                                               VarianceEmbeddingConfig)
    with pytest.raises(ValueError, match="log"):
        Config(model=ModelConfig(
            variance_embedding=VarianceEmbeddingConfig(
                pitch_quantization="log")),
            preprocess=PreprocessConfig(pitch_normalization=True))

    from smart_nar_fast_tts_tpu.models.variance import quantization_bins
    with pytest.raises(ValueError, match="positive"):
        quantization_bins(-2.9, 11.4, 256, log_scale=True)


# -- phoneme-level variance features -----------------------------------------

@pytest.fixture(scope="module")
def reference_model_phoneme(tmp_path_factory):
    return _build_reference(tmp_path_factory.mktemp("ref_stats_ph"),
                            STATS, "log", pitch_feature="phoneme_level",
                            energy_feature="phoneme_level")


def test_training_forward_parity_phoneme_level(reference_model_phoneme):
    """Phoneme-level pitch/energy (reference preprocess.yaml's other
    feature mode, modules.py:80-100): targets are (B, L_txt), embeddings
    added BEFORE length regulation; parity on all predictions + mels."""
    from smart_nar_fast_tts_tpu.config import VarianceEmbeddingConfig
    ref, torch = reference_model_phoneme
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = ModelConfig(
        upsampling="hard",     # reference parity: torch runs the hard regulator
        duration_extraction="buggy",
        variance_embedding=VarianceEmbeddingConfig(
            pitch_quantization="log"))
    variables = torch_state_dict_to_variables(sd, cfg)
    pre = PreprocessConfig(stats=STATS, pitch_normalization=False,
                           energy_normalization=False,
                           pitch_feature="phoneme_level",
                           energy_feature="phoneme_level")
    model = FastSpeech2Align(cfg, pre)

    rng = np.random.default_rng(21)
    B, L, T = 2, 14, 48
    texts = rng.integers(2, 300, size=(B, L)).astype(np.int64)
    src_lens = np.array([L, L - 4], dtype=np.int64)
    for b, n in enumerate(src_lens):
        texts[b, n:] = 0
    mels = rng.normal(0, 1, size=(B, T, 80)).astype(np.float32)
    mel_lens = np.array([T, T - 12], dtype=np.int64)
    # phoneme-level targets: one value per phoneme
    pitch = rng.uniform(80.0, 600.0, size=(B, L)).astype(np.float32)
    energy = np.abs(rng.normal(2, 1, size=(B, L))).astype(np.float32)
    for b, n in enumerate(src_lens):
        pitch[b, n:] = 0
        energy[b, n:] = 0
    for b, n in enumerate(mel_lens):
        mels[b, n:] = 0

    with torch.no_grad():
        (r_mel, r_post, r_p, r_e, r_logd, *_rest, r_dtgt) = ref(
            torch.zeros(B, dtype=torch.long),
            torch.from_numpy(texts), torch.from_numpy(src_lens),
            int(src_lens.max()),
            mels=torch.from_numpy(mels),
            mel_lens=torch.from_numpy(mel_lens),
            max_mel_len=int(mel_lens.max()),
            p_targets=torch.from_numpy(pitch),
            e_targets=torch.from_numpy(energy))

    out = model.apply(
        variables, jnp.asarray(texts), jnp.asarray(src_lens),
        mels=jnp.asarray(mels), mel_lens=jnp.asarray(mel_lens),
        p_targets=jnp.asarray(pitch), e_targets=jnp.asarray(energy),
        deterministic=True)

    np.testing.assert_array_equal(
        np.asarray(out.duration_targets), r_dtgt.numpy())
    assert out.pitch_prediction.shape == (B, L)      # phoneme-rate
    np.testing.assert_allclose(
        np.asarray(out.pitch_prediction), r_p.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.energy_prediction), r_e.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.mel), r_mel.numpy(), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out.postnet_mel), r_post.numpy(), atol=1e-3)
