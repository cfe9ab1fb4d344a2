"""Alignment quality of the trained flagship: does the in-model aligner
actually align?  (VERDICT round-3 Next #4.)

The reference's entire advertised delta over stock FastSpeech2 is that
alignment is learned inside the model instead of imported from MFA labels
(ref README.md:8-13; SURVEY §2.4.1).  Loss curves can't show whether that
worked — this harness measures it directly, because the synthetic corpus
carries ground-truth phone boundaries in its TextGrids
(``learning_curve.make_corpus`` writes them from the true segment times).

For every utterance of the same 96-utt corpus the committed flagship was
trained on (identical seed → identical data), run the TRAINING-path forward
(GT mels in) and compare against the TextGrid durations:

- ``extracted``: durations pulled from the MelEncoder cross-attention
  argmax (the labels the model trains its duration predictor on);
- ``predicted``: ``round(exp(log_d_pred) − 1)`` from the duration predictor
  (what inference actually uses);
- boundary RMSE: cumulative-boundary error in frames (mis-assigning one
  frame between neighbors moves one boundary by 1 but leaves others);
- ``diagonal_mass_pm1``: fraction of last-layer/head-0 attention mass on
  the GT-aligned phoneme ±1 per frame (1.0 = perfectly aligned attention,
  1/L ≈ 0.09 = uniform).

Writes ``benchmarks/results/alignment_quality.json`` and prints one JSON
line.  Runs fine on CPU (96 small forwards).

Run: ``python -m benchmarks.alignment_quality``
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "results",
                   "alignment_quality.json")
L_CAP, T_CAP = 16, 256


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/smart_tts_alignq")
    ap.add_argument("--n_utts", type=int, default=96)
    args = ap.parse_args(argv)

    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from benchmarks.learning_curve import make_corpus
    from benchmarks.train_flagship import (META_JSON, PARAMS_NPZ,
                                           load_variables_npz)
    from smart_nar_fast_tts_tpu.config import (AudioConfig, FeatureStats,
                                               ModelConfig,
                                               PreprocessConfig)
    from smart_nar_fast_tts_tpu.data.alignment import get_alignment
    from smart_nar_fast_tts_tpu.data.preprocessor import Preprocessor
    from smart_nar_fast_tts_tpu.data.textgrid import read_textgrid
    from smart_nar_fast_tts_tpu.models import FastSpeech2Align
    from smart_nar_fast_tts_tpu.text import text_to_sequence

    os.makedirs(args.workdir, exist_ok=True)
    in_dir, out_dir = make_corpus(args.workdir, n_utts=args.n_utts)
    pre_cfg = PreprocessConfig(data_path=in_dir, preprocessed_path=out_dir,
                               val_size=4, audio=AudioConfig())
    Preprocessor(pre_cfg).build_from_path(seed=7)

    with open(META_JSON) as f:
        fmeta = json.load(f)
    import dataclasses
    pre_cfg = dataclasses.replace(
        pre_cfg, stats=FeatureStats(**fmeta["stats"]))
    model = FastSpeech2Align(ModelConfig(), pre_cfg)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
        jnp.asarray([4], jnp.int32), mels=jnp.zeros((1, 8, 80)),
        mel_lens=jnp.asarray([8], jnp.int32),
        p_targets=jnp.zeros((1, 8)), e_targets=jnp.zeros((1, 8)))
    variables = load_variables_npz(PARAMS_NPZ, variables)

    # full attention maps are needed for the diagonality metric — force the
    # XLA path (the fused TPU kernel returns only argmax + guided numerator)
    os.environ["SMART_TTS_PALLAS"] = "off"

    fwd = jax.jit(lambda v, t, sl, m, ml, p, e: model.apply(
        v, t, sl, mels=m, mel_lens=ml, p_targets=p, e_targets=e,
        deterministic=True))

    # metadata: every utterance the flagship saw (train + val)
    lines = []
    for split in ("train.txt", "val.txt"):
        with open(os.path.join(out_dir, split)) as f:
            lines += [ln.strip() for ln in f if ln.strip()]

    ext_err, prd_err, bnd_rmse, diag = [], [], [], []
    owner_hits, owner_near, gt_all = [], [], []
    rule_err, rule_bnd = {}, {}
    n_phones_total = 0
    for ln in lines:
        name, speaker, text, _ = ln.split("|")
        tg = read_textgrid(os.path.join(
            out_dir, "TextGrid", speaker, f"{name}.TextGrid"))
        _, gt_dur, _, _ = get_alignment(
            tg.get_tier_by_name("phones"),
            pre_cfg.audio.sampling_rate, pre_cfg.audio.hop_length)
        gt_dur = np.asarray(gt_dur, np.float32)

        ids = np.asarray(
            text_to_sequence(text, list(pre_cfg.text_cleaners)), np.int32)
        mel = np.load(os.path.join(out_dir, "mel",
                                   f"{speaker}-mel-{name}.npy"))
        pit = np.load(os.path.join(out_dir, "pitch",
                                   f"{speaker}-pitch-{name}.npy"))
        eng = np.load(os.path.join(out_dir, "energy",
                                   f"{speaker}-energy-{name}.npy"))
        Lr, T = len(ids), mel.shape[0]
        assert Lr == len(gt_dur), (name, Lr, len(gt_dur))
        assert Lr <= L_CAP and T <= T_CAP, (name, Lr, T)

        texts = np.zeros((1, L_CAP), np.int32)
        texts[0, :Lr] = ids
        mels = np.zeros((1, T_CAP, mel.shape[1]), np.float32)
        mels[0, :T] = mel
        pitch = np.zeros((1, T_CAP), np.float32)
        pitch[0, :T] = pit
        energy = np.zeros((1, T_CAP), np.float32)
        energy[0, :T] = eng

        out = fwd(variables, jnp.asarray(texts), jnp.asarray([Lr]),
                  jnp.asarray(mels), jnp.asarray([T]),
                  jnp.asarray(pitch), jnp.asarray(energy))

        d_ext = np.asarray(out.duration_targets)[0, :Lr].astype(np.float32)
        d_prd = np.clip(np.round(
            np.exp(np.asarray(out.log_duration_prediction)[0, :Lr]) - 1.0),
            0, None)
        ext_err.append(np.abs(d_ext - gt_dur))
        prd_err.append(np.abs(d_prd - gt_dur))

        # ---- extraction-rule A/B (VERDICT r4 Next #4) ----------------
        # all rules recomputed from the same last-layer attention maps
        full = np.asarray(out.alignments)[-1, 0][:, :T, :Lr]   # (H, T, L)

        def _argmax_counts(a):                    # a: (T, L)
            idx = np.argmax(a, axis=1)
            return np.bincount(idx, minlength=Lr).astype(np.float32)

        def _soft_counts(a):                      # expected-count rule
            p = a / np.maximum(a.sum(axis=1, keepdims=True), 1e-9)
            soft = p.sum(axis=0)
            cum = np.round(np.cumsum(soft))
            return np.diff(cum, prepend=0.0).astype(np.float32)

        for rule, d in (
                ("argmax_h0", _argmax_counts(full[0])),
                ("argmax_hmean", _argmax_counts(full.mean(axis=0))),
                ("soft_h0", _soft_counts(full[0])),
                ("soft_hmean", _soft_counts(full.mean(axis=0)))):
            rule_err.setdefault(rule, []).append(np.abs(d - gt_dur))
            rule_bnd.setdefault(rule, []).append(np.sqrt(np.mean(
                (np.cumsum(d) - np.cumsum(gt_dur)) ** 2)))
        bnd_rmse.append(np.sqrt(np.mean(
            (np.cumsum(d_ext) - np.cumsum(gt_dur)) ** 2)))
        n_phones_total += Lr

        # attention mass on the GT phoneme ±1, last layer head 0
        attn = np.asarray(out.alignments)[-1, 0, 0]      # (T_cap, L_cap)
        owner = np.repeat(np.arange(Lr), gt_dur.astype(int))[:T]
        if owner.shape[0] < T:          # rounding: pad with last phoneme
            owner = np.pad(owner, (0, T - owner.shape[0]), mode="edge")
        cols = np.arange(Lr)[None, :]
        near = np.abs(cols - owner[:, None]) <= 1        # (T, Lr)
        diag.append(float(np.mean(
            np.sum(attn[:T, :Lr] * near, axis=1)
            / np.maximum(np.sum(attn[:T, :Lr], axis=1), 1e-9))))
        am = np.argmax(attn[:T, :Lr], axis=1)
        owner_hits.append(float(np.mean(am == owner)))
        owner_near.append(float(np.mean(np.abs(am - owner) <= 1)))
        gt_all.append(gt_dur)

    ext = np.concatenate(ext_err)
    prd = np.concatenate(prd_err)
    result = {
        "corpus": f"synthetic ({args.n_utts} utts, GT TextGrid boundaries)",
        "params": f"{os.path.relpath(PARAMS_NPZ)}@{fmeta['steps']}",
        "n_utts": len(lines),
        "n_phones": int(n_phones_total),
        "extracted_duration_mae_frames": round(float(ext.mean()), 3),
        "extracted_duration_mae_ms": round(
            float(ext.mean()) * pre_cfg.audio.hop_length
            / pre_cfg.audio.sampling_rate * 1e3, 2),
        "predicted_duration_mae_frames": round(float(prd.mean()), 3),
        "boundary_rmse_frames": round(float(np.mean(bnd_rmse)), 3),
        "gt_duration_mean_frames": round(
            float(np.concatenate(gt_all).mean()), 2),
        "frame_owner_argmax_accuracy": round(
            float(np.mean(owner_hits)), 4),
        "frame_owner_argmax_within_pm1": round(
            float(np.mean(owner_near)), 4),
        "diagonal_mass_pm1": round(float(np.mean(diag)), 4),
        "uniform_baseline_diagonal_mass": round(
            3.0 / (n_phones_total / len(lines)), 4),
        "extraction_rules": {
            rule: {
                "mae_frames": round(
                    float(np.concatenate(errs).mean()), 3),
                "boundary_rmse_frames": round(
                    float(np.mean(rule_bnd[rule])), 3),
            } for rule, errs in rule_err.items()},
        "notes": "extracted = MelEncoder attention argmax counts "
                 "(training labels); predicted = duration predictor at "
                 "inference; GT = TextGrid phone boundaries in frames; "
                 "extraction_rules = same forward, alternative "
                 "label-extraction rules (VERDICT r4 Next #4 A/B)",
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
