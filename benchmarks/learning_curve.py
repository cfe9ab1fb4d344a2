"""Short real training run: committed evidence that the training stack
*learns*, not just that one step is finite (VERDICT.md Next #9).

Builds a synthetic-but-learnable corpus (each of 8 pseudo-phonemes maps to
a distinct harmonic timbre and pitch, so text→mel is a real function to
learn), preprocesses it with the production ``Preprocessor`` (DIO+StoneMask
F0, mel/energy, z-norm stats), then runs the production jitted train step
for ``--steps`` optimizer updates and records the loss curve.

Success criterion (asserted): the mean total loss of the last 10% of steps
is at least 35% below the mean of the first 10%, and the mel-L1 term
decreases monotonically across quarter-run averages.

Writes ``benchmarks/results/learning_curve.json`` and prints one JSON line.

Run: ``python -m benchmarks.learning_curve [--steps 400]``
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

SR = 22050
PHONES = ["AA1", "IY1", "UW1", "EH1", "OW1", "S", "M", "N"]
# per-phone (f0 Hz, harmonic rolloff, brightness): distinct timbres
PHONE_TIMBRE = {
    "AA1": (140.0, 1.0, 6), "IY1": (220.0, 0.7, 8), "UW1": (110.0, 1.4, 4),
    "EH1": (180.0, 0.9, 7), "OW1": (130.0, 1.2, 5), "S": (0.0, 0.0, 0),
    "M": (120.0, 2.0, 3), "N": (160.0, 1.8, 3),
}


def make_corpus(root: str, n_utts: int = 48, seed: int = 0):
    from smart_nar_fast_tts_tpu.data.wavio import save_wav

    rng = np.random.default_rng(seed)
    in_dir = os.path.join(root, "raw")
    out_dir = os.path.join(root, "preprocessed")
    spk = os.path.join(in_dir, "spk0")
    tg_dir = os.path.join(out_dir, "TextGrid", "spk0")
    os.makedirs(spk, exist_ok=True)
    os.makedirs(tg_dir, exist_ok=True)

    for u in range(n_utts):
        n_phones = int(rng.integers(4, 9))
        t0 = 0.08
        entries = [(0.0, t0, "sil")]
        for _ in range(n_phones):
            p = PHONES[int(rng.integers(len(PHONES)))]
            d = float(rng.uniform(0.09, 0.22))
            entries.append((t0, t0 + d, p))
            t0 += d
        entries.append((t0, t0 + 0.08, "sil"))
        total = t0 + 0.08

        n = int(total * SR)
        wav = 0.003 * rng.standard_normal(n)
        for s, e, p in entries[1:-1]:
            f0, rolloff, n_harm = PHONE_TIMBRE[p]
            i0, i1 = int(s * SR), int(e * SR)
            seg_t = np.arange(i1 - i0) / SR
            if f0 == 0.0:             # fricative: shaped noise burst
                wav[i0:i1] += 0.15 * rng.standard_normal(i1 - i0)
                continue
            x = np.zeros(i1 - i0)
            for h in range(1, n_harm + 1):
                x += np.sin(2 * np.pi * f0 * h * seg_t) / (h ** rolloff)
            env = np.minimum(1.0, np.minimum(
                seg_t / 0.01, (seg_t[-1] - seg_t) / 0.01 + 1e-6))
            wav[i0:i1] += 0.3 * x * env
        save_wav(os.path.join(spk, f"utt{u}.wav"),
                 wav.astype(np.float32), SR)
        with open(os.path.join(spk, f"utt{u}.lab"), "w") as f:
            f.write(f"synthetic utterance {u}")

        lines = [
            'File type = "ooTextFile"', 'Object class = "TextGrid"', "",
            "xmin = 0", f"xmax = {total}", "tiers? <exists>", "size = 1",
            "item []:", "    item [1]:",
            '        class = "IntervalTier"',
            '        name = "phones"', "        xmin = 0",
            f"        xmax = {total}",
            f"        intervals: size = {len(entries)}"]
        for k, (s, e, p) in enumerate(entries):
            lines += [f"        intervals [{k + 1}]:",
                      f"            xmin = {s}",
                      f"            xmax = {e}",
                      f'            text = "{p}"']
        with open(os.path.join(tg_dir, f"utt{u}.TextGrid"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return in_dir, out_dir


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--workdir", default="/tmp/smart_tts_lcurve")
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "results", "learning_curve.json"))
    args = parser.parse_args(argv)

    import dataclasses

    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax

    from smart_nar_fast_tts_tpu.config import (AudioConfig, Config,
                                               FeatureStats, ModelConfig,
                                               OptimizerConfig,
                                               PreprocessConfig, StepConfig,
                                               TrainConfig,
                                               TransformerConfig)
    from smart_nar_fast_tts_tpu.data.dataset import (AcousticDataset,
                                                     BucketBatcher)
    from smart_nar_fast_tts_tpu.data.preprocessor import Preprocessor
    from smart_nar_fast_tts_tpu.models import (FastSpeech2Align,
                                               FastSpeech2Loss)
    from smart_nar_fast_tts_tpu.training import (create_train_state,
                                                 make_optimizer,
                                                 make_train_step)

    os.makedirs(args.workdir, exist_ok=True)
    in_dir, out_dir = make_corpus(args.workdir)
    pre_cfg = PreprocessConfig(
        data_path=in_dir, preprocessed_path=out_dir, val_size=4,
        audio=AudioConfig())
    t0 = time.time()
    Preprocessor(pre_cfg).build_from_path(seed=7)
    preprocess_s = time.time() - t0
    pre_cfg = dataclasses.replace(
        pre_cfg, stats=FeatureStats.from_stats_json(
            os.path.join(out_dir, "stats.json")))

    cfg = Config(
        preprocess=pre_cfg,
        model=ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=2, decoder_layer=2, encoder_head=2,
                decoder_head=2, encoder_hidden=128, decoder_hidden=128,
                conv_filter_size=256),
            max_seq_len=512),
        train=TrainConfig(
            ckpt_path=os.path.join(args.workdir, "ckpt"),
            log_path=os.path.join(args.workdir, "log"),
            result_path=os.path.join(args.workdir, "result"),
            optimizer=OptimizerConfig(batch_size=args.batch_size,
                                      warm_up_step=150),
            step=StepConfig(total_step=args.steps),
            text_buckets=(16,), mel_buckets=(256,)))

    model = FastSpeech2Align(cfg.model, cfg.preprocess)
    loss = FastSpeech2Loss(cfg.preprocess)
    tx = make_optimizer(cfg.train.optimizer,
                        cfg.model.transformer.encoder_hidden)
    step_fn = make_train_step(model, loss)

    ds = AcousticDataset("train.txt", cfg.preprocess)
    batcher = BucketBatcher(ds, batch_size=args.batch_size,
                            text_buckets=cfg.train.text_buckets,
                            mel_buckets=cfg.train.mel_buckets)

    import jax.numpy as jnp
    L, T = cfg.train.text_buckets[0], cfg.train.mel_buckets[0]
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, L), jnp.int32), jnp.full((2,), L, jnp.int32),
        mels=jnp.zeros((2, T, 80)), mel_lens=jnp.full((2,), T, jnp.int32),
        p_targets=jnp.zeros((2, T)), e_targets=jnp.zeros((2, T)))
    state = create_train_state(variables, tx)
    rng = jax.random.PRNGKey(0)

    curve = []          # (step, total, mel, duration)
    frames = 0
    step = 0
    t_train0 = time.time()
    while step < args.steps:
        for batch, ids, raws in batcher.batches(epoch=step):
            state, losses = step_fn(state, batch, rng)
            step += 1
            frames += int(np.sum(np.asarray(batch.mel_lens)))
            if step % 10 == 0 or step == 1:
                curve.append((step, float(losses.total),
                              float(losses.mel), float(losses.duration)))
            if step >= args.steps:
                break
    jax.block_until_ready(state.params)
    train_s = time.time() - t_train0

    totals = np.asarray([c[1] for c in curve])
    mels = np.asarray([c[2] for c in curve])
    if len(mels) < 4:
        raise SystemExit(
            f"--steps {args.steps} records only {len(mels)} curve points; "
            f"need >=4 for quarter-run means (use --steps >= 40)")
    k = max(1, len(totals) // 10)
    first, last = float(totals[:k].mean()), float(totals[-k:].mean())
    q = len(mels) // 4
    mel_quarters = [float(mels[i * q:(i + 1) * q].mean()) for i in range(4)]

    ok_drop = last < 0.65 * first
    ok_mono = all(mel_quarters[i + 1] < mel_quarters[i] for i in range(3))

    report = {
        "metric": "learning_curve_total_loss_drop",
        "value": round(1.0 - last / first, 4),
        "unit": "fraction",
        "vs_baseline": None,
        "extra": {
            "steps": args.steps,
            "first_loss": round(first, 4), "last_loss": round(last, 4),
            "mel_l1_quarter_means": [round(v, 4) for v in mel_quarters],
            "monotone_mel_quarters": ok_mono,
            "loss_drop_ok": ok_drop,
            "train_wall_s": round(train_s, 1),
            "mel_frames_per_s": round(frames / train_s, 1),
            "preprocess_wall_s": round(preprocess_s, 1),
            "device": jax.devices()[0].platform,
            "curve": [(s, round(t, 4)) for s, t, _, _ in curve],
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "extra"}
                     | {"loss_drop_ok": ok_drop,
                        "monotone_mel": ok_mono}))
    assert ok_drop, f"loss did not drop enough: {first} -> {last}"
    assert ok_mono, f"mel L1 not monotone by quarters: {mel_quarters}"


if __name__ == "__main__":
    main()
