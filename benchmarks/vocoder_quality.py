"""Side-by-side vocoder quality table: which family serves by default?

VERDICT round-3 Next #2: the Vocos iSTFT head is 43x under the RTF target
but had only a smoke checkpoint and no quality comparison against the
GAN-trained HiFi-GAN.  This harness makes the default-vocoder decision a
data question: for every family with committed trained params
(``benchmarks/results/vocoder_params.npz`` = HiFi-GAN V1,
``vocos_params.npz`` = Vocos, ``melgan_params.npz`` if ever promoted), run
the generator over the HELD-OUT val split of the synthetic corpus (the
same corpus the GANs trained on, val utts excluded by the preprocessor's
seeded split) and report objective resynthesis metrics:

- ``mel_l1``: log-mel L1 between GT mel and mel(vocoded wav) — the same
  measure the GAN's mel loss optimizes, on unseen audio;
- ``mrstft``: multi-resolution STFT distance (spectral convergence +
  log-magnitude L1 averaged over 512/1024/2048 FFTs — the Parallel
  WaveGAN auxiliary objective), phase-robust and window-robust where a
  single-resolution mel can alias;
- ``f0_rmse_hz`` / ``voicing_agreement``: DIO+StoneMask F0 of vocoded vs
  GT waveform on frames both judge voiced — prosody preservation, the
  quantity TTS serving actually cares about;
- ``wave_l2``: waveform relative L2 (loose — GAN vocoders are not
  phase-exact, listed for completeness).

Decision rule (VERDICT r4 Weak #3 — made explicit): the serving default
minimizes ``score = mel_l1 / 0.25 + mrstft / 1.0 + f0_rmse_hz / 20``,
i.e. each metric normalized by a just-noticeable-scale denominator so a
mel-L1 win cannot silently outvote a large F0 regression; the weights and
per-family raw metrics are all recorded in the JSON.

Corpus (VERDICT r4 Next #2): ``--corpus scaled`` (default) evaluates on
the held-out val split of the 1200-utterance 8-speaker scaled corpus
(``benchmarks/corpus.py`` through ``cli.preprocess``) — 96 unseen
utterances; ``--corpus toy`` keeps the legacy 96-utt corpus for
comparison with round-4 numbers.

RTF numbers live in ``bench.py`` (chip-measured per family); this file is
the quality side of the table.  Writes
``benchmarks/results/vocoder_quality.json``.

Run: ``python -m benchmarks.vocoder_quality [--corpus scaled|toy]``
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "results")
OUT = os.path.join(RESULTS, "vocoder_quality.json")


def _load_family(name, jnp):
    """(generator, variables) for a committed family, or None."""
    import jax

    from benchmarks.train_flagship import load_variables_npz
    from smart_nar_fast_tts_tpu.vocoder import (HiFiGANConfig,
                                                HiFiGANGenerator,
                                                MelGANConfig,
                                                MelGANGenerator,
                                                VocosConfig, VocosGenerator)
    stem = {"hifigan": "vocoder", "vocos": "vocos", "melgan": "melgan"}[name]
    npz = os.path.join(RESULTS, f"{stem}_params.npz")
    if not os.path.exists(npz):
        return None
    meta_path = os.path.join(RESULTS, f"{stem}_meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    cfg_cls = {"hifigan": HiFiGANConfig, "vocos": VocosConfig,
               "melgan": MelGANConfig}[name]
    cfg = (cfg_cls(**meta["config"]) if isinstance(meta.get("config"), dict)
           else cfg_cls())
    gen_cls = {"hifigan": HiFiGANGenerator, "vocos": VocosGenerator,
               "melgan": MelGANGenerator}[name]
    gen = gen_cls(cfg)
    variables = gen.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 16, cfg.n_mels)))
    variables = load_variables_npz(npz, variables)
    return gen, variables, meta


def _np_stft_mag(wav: np.ndarray, cfg) -> np.ndarray:
    """Host-side numpy mirror of ``audio.stft.stft_magnitude`` (same
    reflect pad, window, rfft) — per-utterance analysis must not pay a
    device round-trip per op on remote-attached chips."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    pad = n_fft // 2
    y = np.pad(wav.astype(np.float64), (pad, pad), mode="reflect")
    num_frames = 1 + (len(y) - n_fft) // hop
    idx = (np.arange(num_frames)[:, None] * hop
           + np.arange(n_fft)[None, :])
    frames = y[idx] * np.asarray(cfg.window)
    return np.abs(np.fft.rfft(frames, axis=-1)).T     # (n_bins, F)


def _np_log_mel(wav: np.ndarray, cfg) -> np.ndarray:
    """numpy mirror of ``audio.stft.mel_spectrogram`` → (F, n_mels)."""
    mag = _np_stft_mag(wav, cfg)
    mel = np.asarray(cfg.mel_basis) @ mag
    return np.log(np.clip(mel, cfg.compression_clip, None)).T


def _mrstft(wav: np.ndarray, wav_gt: np.ndarray, sr: int) -> float:
    """Multi-resolution STFT distance: mean over three resolutions of
    (spectral convergence + log-magnitude L1) — Parallel WaveGAN's
    auxiliary loss."""
    from smart_nar_fast_tts_tpu.audio.stft import MelSpectrogramConfig
    total = 0.0
    resolutions = ((512, 128, 512), (1024, 256, 1024), (2048, 512, 2048))
    for n_fft, hop, win in resolutions:
        cfg = MelSpectrogramConfig(sampling_rate=sr, n_fft=n_fft,
                                   hop_length=hop, win_length=win)
        m_v = _np_stft_mag(wav, cfg)
        m_g = _np_stft_mag(wav_gt, cfg)
        sc = (np.linalg.norm(m_g - m_v)
              / (np.linalg.norm(m_g) + 1e-9))
        logl1 = float(np.mean(np.abs(np.log(m_g + 1e-5)
                                     - np.log(m_v + 1e-5))))
        total += sc + logl1
    return total / len(resolutions)


# Decision rule: lower is better; denominators put each metric on a
# comparable "one unit = noticeable degradation" scale (see module doc).
DECISION_WEIGHTS = {"mel_l1": 0.25, "mrstft": 1.0, "f0_rmse_hz": 20.0}


def decision_score(row: dict) -> float:
    return sum(row[k] / d for k, d in DECISION_WEIGHTS.items()
               if row.get(k) is not None)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/smart_tts_vocq")
    ap.add_argument("--corpus", choices=("scaled", "toy"), default="scaled")
    ap.add_argument("--scaled_root", default="/tmp/scaled_corpus",
                    help="root written by benchmarks.corpus + "
                         "cli.preprocess (raw/ + preprocessed/)")
    ap.add_argument("--split", choices=("val", "all"), default="val")
    ap.add_argument("--n_utts", type=int, default=96)
    args = ap.parse_args(argv)

    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from benchmarks.learning_curve import make_corpus
    from smart_nar_fast_tts_tpu.audio.stft import (MelSpectrogramConfig,
                                                   mel_spectrogram)
    from smart_nar_fast_tts_tpu.config import AudioConfig, PreprocessConfig
    from smart_nar_fast_tts_tpu.data.alignment import get_alignment
    from smart_nar_fast_tts_tpu.data.pitch import estimate_f0
    from smart_nar_fast_tts_tpu.data.preprocessor import Preprocessor
    from smart_nar_fast_tts_tpu.data.textgrid import read_textgrid
    from smart_nar_fast_tts_tpu.data.wavio import load_wav

    if args.corpus == "scaled":
        # held-out val split of the 1200-utt 8-speaker corpus, already
        # preprocessed through the CLI pipeline (96 unseen utterances)
        in_dir = os.path.join(args.scaled_root, "raw")
        out_dir = os.path.join(args.scaled_root, "preprocessed")
        if not os.path.isfile(os.path.join(out_dir, "val.txt")):
            raise SystemExit(
                f"{out_dir}/val.txt not found — generate with "
                "`python -m benchmarks.corpus --root "
                f"{args.scaled_root} --utts 1200` then "
                "`python -m smart_nar_fast_tts_tpu.cli.preprocess "
                "configs/scaled/preprocess.yaml --workers 8`")
        pre_cfg = PreprocessConfig(data_path=in_dir,
                                   preprocessed_path=out_dir,
                                   audio=AudioConfig())
    else:
        os.makedirs(args.workdir, exist_ok=True)
        in_dir, out_dir = make_corpus(args.workdir, n_utts=args.n_utts)
        pre_cfg = PreprocessConfig(data_path=in_dir,
                                   preprocessed_path=out_dir,
                                   val_size=4, audio=AudioConfig())
        Preprocessor(pre_cfg).build_from_path(seed=7)
    sr = pre_cfg.audio.sampling_rate
    hop = pre_cfg.audio.hop_length
    mel_cfg = MelSpectrogramConfig()

    splits = (("val.txt",) if args.split == "val"
              else ("val.txt", "train.txt"))
    utts = []
    for split in splits:
        with open(os.path.join(out_dir, split)) as f:
            utts += [ln.strip().split("|")[:2] for ln in f if ln.strip()]

    # GT mels are stored UN-normalized?  No — preprocessor z-norms pitch and
    # energy only; mels are raw log-mels, exactly what vocoders consume.
    items = []
    for name, speaker in utts:
        mel = np.load(os.path.join(out_dir, "mel",
                                   f"{speaker}-mel-{name}.npy"))
        tg = read_textgrid(os.path.join(out_dir, "TextGrid", speaker,
                                        f"{name}.TextGrid"))
        _, _, start, end = get_alignment(tg.get_tier_by_name("phones"),
                                         sr, hop)
        wav, _ = load_wav(os.path.join(in_dir, speaker, f"{name}.wav"), sr)
        wav = wav[int(sr * start):int(sr * end)][: mel.shape[0] * hop]
        items.append((name, mel.astype(np.float32),
                      wav.astype(np.float32)))

    table = {}
    for family in ("hifigan", "vocos", "melgan"):
        loaded = _load_family(family, jnp)
        if loaded is None:
            continue
        gen, variables, meta = loaded
        apply = jax.jit(gen.apply)
        # one padded bucket shape -> one compile for all utterances (the
        # remote chip pays ~minutes per distinct traced shape); vocoded
        # audio is trimmed back to the true frame count, and the pad region
        # cannot influence kept samples beyond the receptive halo, which
        # the trim discards anyway
        T_BUCKET = max(it[1].shape[0] for it in items)
        mel_l1s, f0_rmses, voic_agree, wave_l2s = [], [], [], []
        mrstfts = []
        for name, mel, wav_gt in items:
            melp = np.zeros((T_BUCKET, mel.shape[1]), np.float32)
            melp[: mel.shape[0]] = mel
            wav = np.asarray(apply(variables,
                                   jnp.asarray(melp[None])))[0]
            wav = wav[: wav_gt.shape[0]]
            n = min(wav.shape[0], wav_gt.shape[0])
            wav, wg = wav[:n], wav_gt[:n]

            remel = _np_log_mel(wav, mel_cfg)[: mel.shape[0]]
            t = remel.shape[0]
            mel_l1s.append(float(np.mean(np.abs(remel - mel[:t]))))
            mrstfts.append(_mrstft(wav, wg, sr))

            f0_v = estimate_f0(wav, sr, hop)
            f0_g = estimate_f0(wg, sr, hop)
            m = min(len(f0_v), len(f0_g))
            f0_v, f0_g = f0_v[:m], f0_g[:m]
            both = (f0_v > 0) & (f0_g > 0)
            either = (f0_v > 0) | (f0_g > 0)
            if both.any():
                f0_rmses.append(float(np.sqrt(np.mean(
                    (f0_v[both] - f0_g[both]) ** 2))))
            if either.any():
                voic_agree.append(float(both.sum() / either.sum()))
            wave_l2s.append(float(np.linalg.norm(wav - wg)
                                  / (np.linalg.norm(wg) + 1e-9)))

        table[family] = {
            "params": f"{family}: "
                      f"{meta.get('steps', '?')} steps"
                      + (f" ({meta['note']})" if meta.get("note") else ""),
            "corpus": meta.get("corpus", "?"),
            "n_utts": len(items),
            "mel_l1": round(float(np.mean(mel_l1s)), 4),
            "mrstft": round(float(np.mean(mrstfts)), 4),
            "f0_rmse_hz": round(float(np.mean(f0_rmses)), 2)
            if f0_rmses else None,
            "voicing_agreement": round(float(np.mean(voic_agree)), 4)
            if voic_agree else None,
            "wave_rel_l2": round(float(np.mean(wave_l2s)), 4),
        }
        table[family]["decision_score"] = round(
            decision_score(table[family]), 4)
        print(json.dumps({family: table[family]}), flush=True)

    if table:
        best = min(table, key=lambda k: table[k]["decision_score"])
        report = {"split": args.split, "held_out": True,
                  "corpus": args.corpus,
                  "families": table,
                  "decision_weights": DECISION_WEIGHTS,
                  "decision_rule": "minimize sum(metric / weight): each "
                                   "denominator is a just-noticeable "
                                   "scale, so no single metric can "
                                   "silently outvote the others",
                  "best_by_decision_score": best,
                  "decision_note": "serving default should pair this "
                                   "table with bench.py per-family RTFs"}
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps({"best_by_decision_score": best}))
    else:
        print(json.dumps({"error": "no committed vocoder params found"}))


if __name__ == "__main__":
    main()
