"""Synthesis CLI (reference ``synthesize.py:79-128``): text → mel → wav/png.

Usage::

    python -m smart_nar_fast_tts_tpu.cli.synthesize \
        --text "Hello world" --restore_step N \
        -p preprocess.yaml -m model.yaml -t train.yaml \
        [--speaker_id K] [--pitch_control 1.0] [--energy_control 1.0] \
        [--duration_control 1.0]

Includes the ``--speaker_id`` flag the reference reads but never registers
(``synthesize.py:122`` vs ``:81-102``) and exposes ``--duration_control``,
which the reference's VarianceAdaptor supports but its CLI cannot reach
(SURVEY.md §2.4.2).  Vocoding uses HiFi-GAN when a checkpoint is configured,
else Griffin-Lim from the predicted mel.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from ._args import add_config_args, enable_compilation_cache, load_config
from ..text import text_to_sequence
from ..text.g2p import G2P


def main(argv=None) -> None:
    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    add_config_args(parser)
    parser.add_argument("--text", type=str, required=True)
    parser.add_argument("--restore_step", type=int, default=None)
    parser.add_argument("--speaker_id", type=int, default=0)
    parser.add_argument("--pitch_control", type=float, default=1.0)
    parser.add_argument("--energy_control", type=float, default=1.0)
    parser.add_argument("--duration_control", type=float, default=1.0)
    parser.add_argument("--vocoder_ckpt", type=str, default=None,
                        help="HiFi-GAN generator checkpoint "
                             "(msgpack/torch); Griffin-Lim if omitted")
    args = parser.parse_args(argv)

    cfg = load_config(args)
    from ..models import FastSpeech2Align
    from ..training.checkpoint import CheckpointManager
    from ..training.schedule import make_optimizer
    from ..training.state import create_train_state

    model = FastSpeech2Align(cfg.model, cfg.preprocess)

    if cfg.preprocess.language == "en":
        phones = G2P(cfg.preprocess.lexicon_path)(args.text)
    else:
        phones = args.text
    ids = np.asarray(
        text_to_sequence(phones, list(cfg.preprocess.text_cleaners)),
        np.int32)
    print(f"phonemes: {phones}")

    texts = jnp.asarray(ids)[None]
    src_lens = jnp.asarray([len(ids)], jnp.int32)
    speakers = jnp.asarray([args.speaker_id], jnp.int32)

    # init on the training path so the param tree includes the MelEncoder —
    # checkpoints store the full tree
    T0 = 8
    variables = model.init(
        jax.random.PRNGKey(0), texts, src_lens, speakers=speakers,
        mels=jnp.zeros((1, T0, cfg.model.n_mel_channels)),
        mel_lens=jnp.asarray([T0], jnp.int32),
        p_targets=jnp.zeros((1, T0)), e_targets=jnp.zeros((1, T0)))
    tx = make_optimizer(cfg.train.optimizer,
                        cfg.model.transformer.encoder_hidden)
    state = create_train_state(variables, tx)
    mngr = CheckpointManager(cfg.train.ckpt_path)
    state, _ = mngr.restore(state, step=args.restore_step)
    mngr.close()
    restored = int(np.asarray(state.step))
    if restored == 0:
        print("WARNING: no checkpoint found; synthesizing with random init")

    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        texts, src_lens, speakers=speakers,
        max_mel_len=cfg.model.max_seq_len,
        p_control=args.pitch_control, e_control=args.energy_control,
        d_control=args.duration_control, deterministic=True)
    # ≥4 frames so the Griffin-Lim fallback's reflect-pad framing is valid
    # even for a random-init model predicting ~zero duration
    n = max(int(out.mel_lens[0]), 4)
    mel = np.asarray(out.postnet_mel[0, :n])          # (T, n_mels)

    os.makedirs(cfg.train.result_path, exist_ok=True)
    base = os.path.join(cfg.train.result_path,
                        args.text[:32].replace(" ", "_"))

    from ..training.logging import plot_mel
    fig = plot_mel([(mel.T, None, None)], cfg.preprocess.stats,
                   titles=[args.text[:64]])
    fig.savefig(base + ".png")

    wav = _vocode(mel, cfg, args.vocoder_ckpt)
    from ..data.wavio import save_wav
    save_wav(base + ".wav", wav, cfg.preprocess.audio.sampling_rate)
    print(f"wrote {base}.wav ({len(wav) / cfg.preprocess.audio.sampling_rate:.2f}s) "
          f"and {base}.png (ckpt step {restored})")


def _vocode(mel: np.ndarray, cfg, vocoder_ckpt) -> np.ndarray:
    from ..audio.stft import MelSpectrogramConfig
    a = cfg.preprocess.audio
    mcfg = MelSpectrogramConfig(
        sampling_rate=a.sampling_rate, n_fft=a.n_fft,
        hop_length=a.hop_length, win_length=a.win_length, n_mels=a.n_mels,
        mel_fmin=a.mel_fmin, mel_fmax=a.mel_fmax)
    if vocoder_ckpt:
        from ..vocoder import load_hifigan, hifigan_infer
        gen, variables = load_hifigan(vocoder_ckpt)
        return hifigan_infer(gen, variables, mel[None])[0]
    # Griffin-Lim fallback: invert log-mel → linear magnitude via the
    # filterbank pseudo-inverse (debug-quality audio)
    from ..audio.stft import griffin_lim
    import jax.numpy as jnp
    basis = np.asarray(mcfg.mel_basis)                # (n_mels, n_bins)
    inv = np.linalg.pinv(basis)
    mag = np.maximum(inv @ np.exp(mel.T), 0.0)        # (n_bins, T)
    wav = griffin_lim(jnp.asarray(mag)[None], mcfg, n_iters=40)
    return np.asarray(wav[0])


if __name__ == "__main__":
    main()
