"""End-to-end CLI tests on a synthetic corpus: preprocess → train (few
steps, tiny model) → checkpoint restore → evaluate → synthesize
(SURVEY.md §4: the integration tier of the test pyramid)."""

import json
import os

import numpy as np
import pytest
import yaml

from test_data import _make_corpus

SR = 22050


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    in_dir, out_dir = _make_corpus(root, n_utts=6)
    cfgs = {}
    cfgs["preprocess"] = {
        "dataset": "Synthetic",
        "path": {
            "data_path": str(in_dir),
            "preprocessed_path": str(out_dir),
            "lexicon_path": str(root / "missing-lexicon.txt"),
        },
        "preprocessing": {
            "val_size": 2,
            "text": {"text_cleaners": ["english_cleaners"],
                     "language": "en"},
            "audio": {"sampling_rate": SR, "max_wav_value": 32768.0},
            "stft": {"filter_length": 1024, "hop_length": 256,
                     "win_length": 1024},
            "mel": {"n_mel_channels": 80, "mel_fmin": 0,
                    "mel_fmax": 8000},
            "pitch": {"feature": "frame_level", "normalization": True},
            "energy": {"feature": "frame_level", "normalization": True},
        },
    }
    cfgs["model"] = {
        "transformer": {
            "encoder_layer": 1, "encoder_head": 2, "encoder_hidden": 16,
            "decoder_layer": 1, "decoder_head": 2, "decoder_hidden": 16,
            "conv_filter_size": 32, "conv_kernel_size": [9, 1],
            "encoder_dropout": 0.2, "decoder_dropout": 0.2,
        },
        "variance_predictor": {"filter_size": 16, "kernel_size": 3,
                               "dropout": 0.5},
        # linear: pitch is normalized in this corpus — log+normalized is a
        # validated config error (reference model.yaml:18-21 NaN quirk)
        "variance_embedding": {"pitch_quantization": "linear",
                               "energy_quantization": "linear",
                               "n_bins": 16},
        "multi_speaker": False,
        "max_seq_len": 256,
        "vocoder": {"model": "HiFi-GAN", "speaker": "LJSpeech"},
    }
    cfgs["train"] = {
        "path": {
            "ckpt_path": str(root / "ckpt"),
            "log_path": str(root / "log"),
            "result_path": str(root / "result"),
        },
        "optimizer": {
            "batch_size": 2, "betas": [0.9, 0.98], "eps": 1e-9,
            "weight_decay": 0.0, "grad_clip_thresh": 1.0,
            "grad_acc_step": 1, "warm_up_step": 10,
            "anneal_steps": [], "anneal_rate": 1.0,
        },
        "step": {"total_step": 4, "log_step": 2, "synth_step": 4,
                 "val_step": 4, "save_step": 4},
    }
    paths = {}
    for name, d in cfgs.items():
        p = root / f"{name}.yaml"
        p.write_text(yaml.safe_dump(d))
        paths[name] = str(p)
    return root, paths, out_dir


def _config_args(paths):
    return ["-p", paths["preprocess"], "-m", paths["model"],
            "-t", paths["train"]]


def test_preprocess_cli(workspace):
    root, paths, out_dir = workspace
    from smart_nar_fast_tts_tpu.cli.preprocess import main
    main([paths["preprocess"]])
    assert (out_dir / "stats.json").exists()
    assert (out_dir / "train.txt").exists()


def test_train_restore_evaluate_synthesize(workspace, capsys):
    root, paths, out_dir = workspace
    from smart_nar_fast_tts_tpu.cli.preprocess import main as preprocess
    preprocess([paths["preprocess"]])

    from smart_nar_fast_tts_tpu.cli.train import main as train
    train(_config_args(paths))                       # 4 steps + save

    ckpts = os.listdir(root / "ckpt")
    assert any("4" in c for c in ckpts), ckpts
    assert (root / "log" / "train" / "log.txt").exists()

    # resume: bump total steps, restores from step 4
    train(_config_args(paths) + ["--total_step", "6"])

    from smart_nar_fast_tts_tpu.cli.evaluate import main as evaluate
    evaluate(_config_args(paths))
    msg = capsys.readouterr().out
    assert "Validation" in msg and "Total Loss" in msg

    from smart_nar_fast_tts_tpu.cli.synthesize import main as synthesize
    synthesize(_config_args(paths) + ["--text", "hello world"])
    out = capsys.readouterr().out
    wavs = [f for f in os.listdir(root / "result") if f.endswith(".wav")]
    pngs = [f for f in os.listdir(root / "result") if f.endswith(".png")]
    assert wavs and pngs, out


def test_train_vocoder_cli_smoke(tmp_path):
    """Tiny end-to-end GAN fine-tune run: loss finite, checkpoint written."""
    import numpy as np
    from smart_nar_fast_tts_tpu.data.wavio import save_wav
    from smart_nar_fast_tts_tpu.cli import train_vocoder

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        save_wav(str(wav_dir / f"{i}.wav"),
                 (rng.standard_normal(2000) * 3000).astype(np.int16),
                 22050)
    out_dir = tmp_path / "out"
    train_vocoder.main([
        "--wav_dir", str(wav_dir), "--steps", "2", "--batch_size", "2",
        "--segment_size", "256", "--save_every", "2", "--log_every", "1",
        "--out_dir", str(out_dir), "--debug_tiny"])
    assert (out_dir / "generator_2.msgpack").exists()
    # the fine-tune output must round-trip into the serving loader:
    # config.json is written beside the params and load_hifigan rebuilds
    # the same topology (synthesize --vocoder_ckpt gen.msgpack path)
    assert (out_dir / "config.json").exists()
    import jax.numpy as jnp
    from smart_nar_fast_tts_tpu.vocoder import load_hifigan
    gen, variables = load_hifigan(str(out_dir / "generator_2.msgpack"))
    mel = np.zeros((1, 12, gen.config.n_mels), np.float32)
    wav = gen.apply(variables, jnp.asarray(mel))
    assert wav.shape == (1, 12 * gen.config.hop_length)
    assert np.isfinite(np.asarray(wav)).all()


def test_synthesize_stream_chunk(workspace, capsys, tmp_path):
    """--stream_chunk vocodes through StreamingVocoder (chunked windows,
    prints time-to-first-audio) and writes the same artifacts."""
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization
    from smart_nar_fast_tts_tpu.vocoder import HiFiGANConfig, HiFiGANGenerator

    root, paths, out_dir = workspace
    from smart_nar_fast_tts_tpu.cli.preprocess import main as preprocess
    preprocess([paths["preprocess"]])
    from smart_nar_fast_tts_tpu.cli.train import main as train
    train(_config_args(paths))

    # tiny 80-mel generator checkpoint in the msgpack+config.json format
    cfg = HiFiGANConfig(upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                        upsample_initial_channel=8,
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 2),), n_mels=80)
    gen = HiFiGANGenerator(cfg)
    params = gen.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, 80)))["params"]
    voc_dir = tmp_path / "voc"
    voc_dir.mkdir()
    (voc_dir / "config.json").write_text(json.dumps(cfg.to_dict()))
    with open(voc_dir / "gen.msgpack", "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))

    from smart_nar_fast_tts_tpu.cli.synthesize import main as synthesize
    synthesize(_config_args(paths) + [
        "--text", "hello streaming world",
        "--vocoder_ckpt", str(voc_dir / "gen.msgpack"),
        "--stream_chunk", "8"])
    out = capsys.readouterr().out
    assert "first audio" in out, out
    wavs = [f for f in os.listdir(root / "result") if f.endswith(".wav")]
    assert wavs, out


def test_synthesize_vocos_vocoder(workspace, capsys, tmp_path):
    """--vocoder_ckpt with a ``family: vocos`` config.json dispatches
    through load_vocoder to the iSTFT-head generator, both whole-utterance
    and chunked (--stream_chunk through the generic StreamingVocoder)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from smart_nar_fast_tts_tpu.vocoder import VocosConfig, VocosGenerator

    root, paths, out_dir = workspace
    from smart_nar_fast_tts_tpu.cli.preprocess import main as preprocess
    preprocess([paths["preprocess"]])
    from smart_nar_fast_tts_tpu.cli.train import main as train
    train(_config_args(paths))

    cfg = VocosConfig(n_mels=80, dim=16, intermediate=32, n_layers=2,
                      n_fft=256, hop=64, win_length=256)
    gen = VocosGenerator(cfg)
    params = gen.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, 80)))["params"]
    voc_dir = tmp_path / "voc"
    voc_dir.mkdir()
    (voc_dir / "config.json").write_text(
        json.dumps({"family": "vocos", **cfg.to_dict()}))
    with open(voc_dir / "gen.msgpack", "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))

    from smart_nar_fast_tts_tpu.cli.synthesize import main as synthesize
    synthesize(_config_args(paths) + [
        "--text", "hello vocos", "--vocoder_ckpt",
        str(voc_dir / "gen.msgpack")])
    wavs = [f for f in os.listdir(root / "result") if f.endswith(".wav")]
    assert wavs, capsys.readouterr().out

    synthesize(_config_args(paths) + [
        "--text", "hello streaming vocos", "--vocoder_ckpt",
        str(voc_dir / "gen.msgpack"), "--stream_chunk", "8"])
    out = capsys.readouterr().out
    assert "first audio" in out, out


def test_batch_synthesis_from_source(workspace, capsys):
    """VERDICT.md Missing #3: --source metadata mode consumes TextOnlyDataset
    through bucketed static shapes and writes wav/png per utterance."""
    root, paths, out_dir = workspace
    from smart_nar_fast_tts_tpu.cli.preprocess import main as preprocess
    preprocess([paths["preprocess"]])
    from smart_nar_fast_tts_tpu.cli.train import main as train
    train(_config_args(paths))

    src = root / "source.txt"
    src.write_text(
        "utt_a|0|{HH AH0 L OW1}|hello\n"
        "utt_b|0|{W ER1 L D AH0 N D M AO1 R}|world and more\n"
        "utt_c|0|{T EH1 S T}|test\n")
    from smart_nar_fast_tts_tpu.cli.synthesize import main as synthesize
    synthesize(_config_args(paths)
               + ["--source", str(src), "--batch_size", "2"])
    out = capsys.readouterr().out
    assert "3 utterances" in out
    for name in ("utt_a", "utt_b", "utt_c"):
        assert (root / "result" / f"{name}.wav").exists(), out
        assert (root / "result" / f"{name}.png").exists(), out
