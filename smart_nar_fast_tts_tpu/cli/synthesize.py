"""Synthesis CLI (reference ``synthesize.py:79-128``): text → mel → wav/png.

Usage::

    python -m smart_nar_fast_tts_tpu.cli.synthesize \
        --text "Hello world" --restore_step N \
        -p preprocess.yaml -m model.yaml -t train.yaml \
        [--speaker_id K] [--pitch_control 1.0] [--energy_control 1.0] \
        [--duration_control 1.0]

    # batch mode (reference TextDataset, dataset.py:142-191): synthesize
    # every utterance of a metadata file in bucketed static-shape batches
    python -m smart_nar_fast_tts_tpu.cli.synthesize \
        --source val.txt --batch_size 8 ...

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
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--text", type=str, default=None)
    src.add_argument("--source", type=str, default=None,
                     help="metadata file (name|speaker|{phones}|raw per "
                          "line) to synthesize in bucketed batches")
    parser.add_argument("--batch_size", type=int, default=8,
                        help="batch size for --source mode")
    parser.add_argument("--restore_step", type=int, default=None)
    parser.add_argument("--speaker_id", type=int, default=None,
                        help="speaker for --text mode (default 0); in "
                             "--source mode overrides the per-utterance "
                             "metadata speaker column when given")
    parser.add_argument("--pitch_control", type=float, default=1.0)
    parser.add_argument("--energy_control", type=float, default=1.0)
    parser.add_argument("--duration_control", type=float, default=1.0)
    parser.add_argument("--vocoder_ckpt", type=str, default=None,
                        help="HiFi-GAN generator checkpoint "
                             "(msgpack/torch); Griffin-Lim if omitted")
    parser.add_argument("--stream_chunk", type=int, default=0,
                        help="vocode in fixed windows of this many mel "
                             "frames (StreamingVocoder: O(1) memory, one "
                             "compiled shape, prints time-to-first-audio); "
                             "requires --vocoder_ckpt")
    args = parser.parse_args(argv)
    if args.stream_chunk and not args.vocoder_ckpt:
        parser.error("--stream_chunk requires --vocoder_ckpt")

    cfg = load_config(args)
    from ..models import FastSpeech2Align
    from ..training.checkpoint import CheckpointManager
    from ..training.schedule import make_optimizer
    from ..training.state import create_train_state

    model = FastSpeech2Align(cfg.model, cfg.preprocess)

    # init on the training path so the param tree includes the MelEncoder —
    # checkpoints store the full tree
    T0, L0 = 8, 4
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, L0), jnp.int32),
        jnp.asarray([L0], jnp.int32), speakers=jnp.zeros((1,), jnp.int32),
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

    fwds: dict[int, object] = {}

    def fwd_at(cap: int):
        if cap not in fwds:
            fwds[cap] = jax.jit(
                lambda params, bs, texts, src_lens, speakers, _c=cap:
                model.apply(
                    {"params": params, "batch_stats": bs}, texts, src_lens,
                    speakers=speakers, max_mel_len=_c,
                    p_control=args.pitch_control,
                    e_control=args.energy_control,
                    d_control=args.duration_control, deterministic=True))
        return fwds[cap]

    caps = sorted(set(cfg.train.serving_mel_caps)
                  | {cfg.model.max_seq_len})
    fwd = _auto_cap_forward(fwd_at, caps)
    vocode = _make_vocoder(cfg, args.vocoder_ckpt, args.stream_chunk)
    os.makedirs(cfg.train.result_path, exist_ok=True)

    if args.text is not None:
        if "{" in args.text:
            phones = args.text          # already ARPAbet-in-braces
        elif cfg.preprocess.language == "en":
            phones = G2P(cfg.preprocess.lexicon_path)(args.text)
        else:
            phones = args.text
        print(f"phonemes: {phones}")
        ids = np.asarray(
            text_to_sequence(phones, list(cfg.preprocess.text_cleaners)),
            np.int32)
        out = fwd(state.params, state.batch_stats, jnp.asarray(ids)[None],
                  jnp.asarray([len(ids)], jnp.int32),
                  jnp.asarray([args.speaker_id or 0], jnp.int32))
        base = _write_outputs(cfg, args.text[:32].replace(" ", "_"),
                              args.text, out, 0, vocode)
        print(f"wrote {base}.wav and {base}.png (ckpt step {restored})")
    else:
        n = _synthesize_source(cfg, args, state, fwd, vocode)
        print(f"wrote {n} utterances to {cfg.train.result_path} "
              f"(ckpt step {restored})")


def _auto_cap_forward(fwd_at, caps: list[int]):
    """Long-form serving: run at the smallest frame capacity, read the
    predicted total duration (``duration_rounded`` is exact regardless of
    the capacity — it is computed before the length regulator clips), and
    re-run at the smallest cap that fits.  Fails loudly past the largest
    cap instead of truncating speech."""

    def fwd(*fargs):
        out = fwd_at(caps[0])(*fargs)
        need = int(np.asarray(out.duration_rounded).sum(axis=-1).max())
        cap = next((c for c in caps if need <= c), None)
        if cap is None:
            raise SystemExit(
                f"predicted mel length {need} frames exceeds the largest "
                f"serving capacity ({caps[-1]}); raise "
                "train.serving_mel_caps (truncating would drop speech)")
        if cap != caps[0]:
            print(f"  long utterance: {need} frames -> capacity {cap}")
            out = fwd_at(cap)(*fargs)
        return out

    return fwd


def _synthesize_source(cfg, args, state, fwd, vocode) -> int:
    """Batch-synthesize every row of a metadata file (the reference's
    ``TextDataset`` path, ``dataset.py:142-191`` + ``synthesize.py:59-77``)
    through text-length buckets so every compiled shape is static."""
    from ..data.dataset import TextOnlyDataset

    ds = TextOnlyDataset(args.source, cfg.preprocess)
    caps = sorted(cfg.train.text_buckets)
    buckets: dict[int, list[int]] = {}
    for i in range(len(ds)):
        n = len(ds[i]["text"])
        cap = next((c for c in caps if n <= c), None)
        if cap is None:
            raise SystemExit(
                f"utterance {ds[i]['id']!r} has {n} phonemes, more than the "
                f"largest text bucket ({caps[-1]}); raise "
                f"train.text_buckets (truncating would drop speech)")
        buckets.setdefault(cap, []).append(i)

    written = 0
    B = args.batch_size
    for cap in sorted(buckets):
        idxs = buckets[cap]
        for lo in range(0, len(idxs), B):
            chunk = idxs[lo:lo + B]
            texts = np.zeros((B, cap), np.int32)
            src_lens = np.zeros((B,), np.int32)
            speakers = np.zeros((B,), np.int32)
            items = [ds[i] for i in chunk]
            for j, item in enumerate(items):
                t = item["text"]
                texts[j, :len(t)] = t
                src_lens[j] = len(t)
                speakers[j] = (args.speaker_id if args.speaker_id is not None
                               else item["speaker"])
            src_lens = np.maximum(src_lens, 1)      # masked tail slots
            out = fwd(state.params, state.batch_stats, jnp.asarray(texts),
                      jnp.asarray(src_lens), jnp.asarray(speakers))
            for j, item in enumerate(items):
                _write_outputs(cfg, item["id"], item["raw_text"], out, j,
                               vocode)
                written += 1
    return written


def _write_outputs(cfg, name: str, title: str, out, j: int,
                   vocode) -> str:
    """Write ``{result_path}/{name}.wav`` + ``.png`` for batch item ``j``."""
    # ≥4 frames so the Griffin-Lim fallback's reflect-pad framing is valid
    # even for a random-init model predicting ~zero duration
    n = max(int(out.mel_lens[j]), 4)
    mel = np.asarray(out.postnet_mel[j, :n])          # (T, n_mels)
    base = os.path.join(cfg.train.result_path, name)

    from ..training.logging import plot_mel
    fig = plot_mel([(mel.T, None, None)], cfg.preprocess.stats,
                   titles=[title[:64]])
    fig.savefig(base + ".png")
    import matplotlib.pyplot as plt
    plt.close(fig)

    wav = vocode(mel)
    from ..data.wavio import save_wav
    save_wav(base + ".wav", wav, cfg.preprocess.audio.sampling_rate)
    return base


def _make_vocoder(cfg, vocoder_ckpt, stream_chunk: int = 0):
    """Return ``mel (T, n_mels) -> wav`` — HiFi-GAN when a checkpoint is
    given (loaded once; chunked via :class:`StreamingVocoder` when
    ``stream_chunk > 0``), else the Griffin-Lim debug fallback."""
    from ..audio.stft import MelSpectrogramConfig
    a = cfg.preprocess.audio
    mcfg = MelSpectrogramConfig(
        sampling_rate=a.sampling_rate, n_fft=a.n_fft,
        hop_length=a.hop_length, win_length=a.win_length, n_mels=a.n_mels,
        mel_fmin=a.mel_fmin, mel_fmax=a.mel_fmax)
    if vocoder_ckpt:
        from ..vocoder import (VocosGenerator, hifigan_infer, vocos_infer)
        from ..vocoder.convert import load_vocoder
        gen, variables = load_vocoder(vocoder_ckpt)
        infer = (vocos_infer if isinstance(gen, VocosGenerator)
                 else hifigan_infer)
        if stream_chunk:
            import time

            from ..vocoder import StreamingVocoder
            sv = StreamingVocoder(gen, variables,
                                  chunk_frames=stream_chunk)

            def _stream(mel: np.ndarray) -> np.ndarray:
                t0 = time.perf_counter()
                chunks = []
                for i, c in enumerate(sv.synthesize_chunks(mel)):
                    if i == 0:
                        dt = time.perf_counter() - t0
                        print(f"  first audio ({c.shape[0]} samples) after "
                              f"{dt * 1e3:.1f} ms "
                              f"(window={sv.window_frames} frames, "
                              f"halo={sv.halo})")
                    chunks.append(c)
                return np.concatenate(chunks)
            return _stream
        return lambda mel: infer(gen, variables, mel[None])[0]

    # Griffin-Lim fallback: invert log-mel → linear magnitude via the
    # filterbank pseudo-inverse (debug-quality audio)
    from ..audio.stft import griffin_lim
    inv = np.linalg.pinv(np.asarray(mcfg.mel_basis))  # (n_bins, n_mels)

    def _gl(mel: np.ndarray) -> np.ndarray:
        mag = np.maximum(inv @ np.exp(mel.T), 0.0)    # (n_bins, T)
        return np.asarray(griffin_lim(jnp.asarray(mag)[None], mcfg,
                                      n_iters=40)[0])
    return _gl


if __name__ == "__main__":
    main()
