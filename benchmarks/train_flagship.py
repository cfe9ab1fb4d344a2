"""Train the FLAGSHIP acoustic model to plateau and export serving params.

Round-2 verdict (Missing #3): ``bench.py`` ran random-init weights with a
duration bias, and no wav from a converged model existed.  This script
closes the loop on the hardware:

1. builds the synthetic-but-learnable corpus (``learning_curve.make_corpus``
   — 8 pseudo-phonemes with distinct timbres/pitches) at a configurable
   size and preprocesses it with the production pipeline;
2. trains the flagship ``ModelConfig()`` (d=256, 4L, 2H — reference
   model.yaml:1-11) with the production jitted train step for ``--steps``
   optimizer updates (default 5000);
3. saves an Orbax checkpoint (``--workdir``), plus two committed artifacts:
   - ``benchmarks/results/flagship_params.npz``: all params + batch_stats
     leaves stored float16 by tree-flatten index (~83 MB vs 165 MB f32) —
     ``bench.py`` auto-loads this so driver benches run trained weights;
   - ``benchmarks/results/flagship_meta.json``: loss curve summary, the
     trained phone-id inventory (bench texts must be drawn from symbols
     the model actually learned), and stats for the serving config.
4. synthesizes one held-out utterance from the trained weights through
   Griffin-Lim and writes ``benchmarks/results/trained_sample.wav``.

Run: ``python -m benchmarks.train_flagship [--steps 5000]``
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "results")
PARAMS_NPZ = os.path.join(RESULTS, "flagship_params.npz")
META_JSON = os.path.join(RESULTS, "flagship_meta.json")


def save_variables_npz(path: str, variables) -> int:
    """Flatten {params, batch_stats} and store each leaf float16 by index
    (integer leaves kept as-is).  Loading requires only the same tree
    structure from ``model.init``."""
    import jax
    leaves, _ = jax.tree_util.tree_flatten(variables)
    out = {}
    for i, x in enumerate(leaves):
        a = np.asarray(x)
        out[f"l{i:05d}"] = a.astype(np.float16) \
            if a.dtype == np.float32 else a
    np.savez(path, **out)
    return len(leaves)


def load_variables_npz(path: str, variables_like):
    """Inverse of :func:`save_variables_npz`: replace the leaves of an
    init-built tree with the stored (f16→f32-upcast) arrays."""
    import jax
    leaves, treedef = jax.tree_util.tree_flatten(variables_like)
    npz = np.load(path)
    new = []
    for i, x in enumerate(leaves):
        a = npz[f"l{i:05d}"]
        assert a.shape == np.asarray(x).shape, (
            f"leaf {i}: stored {a.shape} vs model {np.asarray(x).shape} — "
            "the checkpoint was trained with a different architecture")
        new.append(a.astype(np.float32)
                   if a.dtype == np.float16 else a)
    return jax.tree_util.tree_unflatten(treedef, new)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=5000)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--n_utts", type=int, default=96)
    parser.add_argument("--workdir", default="/tmp/smart_tts_flagship")
    args = parser.parse_args(argv)

    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from benchmarks.learning_curve import make_corpus
    from smart_nar_fast_tts_tpu.config import (AudioConfig, FeatureStats,
                                               ModelConfig, OptimizerConfig,
                                               PreprocessConfig)
    from smart_nar_fast_tts_tpu.data.dataset import (AcousticDataset,
                                                     BucketBatcher)
    from smart_nar_fast_tts_tpu.data.preprocessor import Preprocessor
    from smart_nar_fast_tts_tpu.models import (FastSpeech2Align,
                                               FastSpeech2Loss)
    from smart_nar_fast_tts_tpu.text.symbols import SYMBOL_TO_ID
    from smart_nar_fast_tts_tpu.training import (create_train_state,
                                                 make_optimizer,
                                                 make_train_step)
    from smart_nar_fast_tts_tpu.training.checkpoint import CheckpointManager

    os.makedirs(args.workdir, exist_ok=True)
    os.makedirs(RESULTS, exist_ok=True)
    in_dir, out_dir = make_corpus(args.workdir, n_utts=args.n_utts)
    pre_cfg = PreprocessConfig(
        data_path=in_dir, preprocessed_path=out_dir, val_size=4,
        audio=AudioConfig())
    Preprocessor(pre_cfg).build_from_path(seed=7)
    pre_cfg = dataclasses.replace(
        pre_cfg, stats=FeatureStats.from_stats_json(
            os.path.join(out_dir, "stats.json")))

    cfg = ModelConfig(max_seq_len=256)        # FLAGSHIP transformer dims
    model = FastSpeech2Align(cfg, pre_cfg)
    loss = FastSpeech2Loss(pre_cfg)
    tx = make_optimizer(OptimizerConfig(batch_size=args.batch_size,
                                        warm_up_step=500),
                        cfg.transformer.encoder_hidden)
    step_fn = make_train_step(model, loss)

    text_buckets, mel_buckets = (16,), (256,)
    ds = AcousticDataset("train.txt", pre_cfg)
    batcher = BucketBatcher(ds, batch_size=args.batch_size,
                            text_buckets=text_buckets,
                            mel_buckets=mel_buckets)

    L, T = text_buckets[0], mel_buckets[0]
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, L), jnp.int32), jnp.full((2,), L, jnp.int32),
        mels=jnp.zeros((2, T, 80)), mel_lens=jnp.full((2,), T, jnp.int32),
        p_targets=jnp.zeros((2, T)), e_targets=jnp.zeros((2, T)))
    state = create_train_state(variables, tx)
    rng = jax.random.PRNGKey(0)

    curve = []
    step = 0
    t0 = time.time()
    while step < args.steps:
        for batch, ids, raws in batcher.batches(epoch=step):
            state, losses = step_fn(state, batch, rng)
            step += 1
            if step % 50 == 0 or step == 1:
                curve.append((step, float(losses.total),
                              float(losses.mel)))
                if step % 500 == 0 or step == 1:
                    print(f"step {step}: total {curve[-1][1]:.4f} "
                          f"mel {curve[-1][2]:.4f} "
                          f"({time.time() - t0:.0f}s)", flush=True)
            if step >= args.steps:
                break
    jax.block_until_ready(state.params)
    train_s = time.time() - t0

    mngr = CheckpointManager(os.path.join(args.workdir, "ckpt"))
    mngr.save(state, force=True)
    mngr.close()

    trained_vars = {"params": jax.device_get(state.params),
                    "batch_stats": jax.device_get(state.batch_stats)}
    n_leaves = save_variables_npz(PARAMS_NPZ, trained_vars)

    # one synthesized sample from the trained weights (Griffin-Lim; no
    # trained vocoder weights exist in this environment)
    phones = ["AA1", "IY1", "UW1", "EH1", "S", "OW1", "M", "N", "AA1"]
    ids = np.asarray([SYMBOL_TO_ID["@" + p] for p in phones], np.int32)
    out = jax.jit(lambda v, t, s: model.apply(
        v, t, s, max_mel_len=256, deterministic=True))(
        trained_vars, jnp.asarray(ids)[None], jnp.asarray([len(ids)]))
    n = max(int(out.mel_lens[0]), 4)
    mel = np.asarray(out.postnet_mel[0, :n])
    from smart_nar_fast_tts_tpu.audio.stft import (MelSpectrogramConfig,
                                                   griffin_lim)
    mcfg = MelSpectrogramConfig()
    inv = np.linalg.pinv(np.asarray(mcfg.mel_basis))
    mag = np.maximum(inv @ np.exp(mel.T), 0.0)
    wav = np.asarray(griffin_lim(jnp.asarray(mag)[None], mcfg,
                                 n_iters=40)[0])
    from smart_nar_fast_tts_tpu.data.wavio import save_wav
    save_wav(os.path.join(RESULTS, "trained_sample.wav"),
             wav.astype(np.float32), 22050)

    totals = [c[1] for c in curve]
    meta = {
        "steps": step,
        "train_wall_s": round(train_s, 1),
        "first_loss": round(totals[0], 4),
        "last_loss": round(float(np.mean(totals[-5:])), 4),
        "loss_drop": round(1 - float(np.mean(totals[-5:])) / totals[0], 4),
        "device": jax.devices()[0].platform,
        "model": "flagship ModelConfig() d=256 x4L h2",
        "stats": dataclasses.asdict(pre_cfg.stats),
        "phone_ids": sorted(
            int(SYMBOL_TO_ID["@" + p]) for p in (
                "AA1", "IY1", "UW1", "EH1", "OW1", "S", "M", "N")),
        "sample_mel_frames": n,
        "n_leaves": n_leaves,
        "params_file": os.path.basename(PARAMS_NPZ),
        "curve": [(s, round(t, 4)) for s, t, _ in curve[::4]],
    }
    with open(META_JSON, "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps({k: v for k, v in meta.items() if k != "curve"}))


if __name__ == "__main__":
    main()
