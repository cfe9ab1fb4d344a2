"""Standalone validation CLI — the reference's missing ``evaluate.py``
(SURVEY.md §3.5) as a tool: run the val split against a checkpoint and
print the averaged losses.

Usage::

    python -m smart_nar_fast_tts_tpu.cli.evaluate \
        -p preprocess.yaml -m model.yaml -t train.yaml [--restore_step N]
"""

from __future__ import annotations

import argparse

import numpy as np

from ._args import add_config_args, enable_compilation_cache, load_config


def main(argv=None) -> None:
    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    add_config_args(parser)
    parser.add_argument("--restore_step", type=int, default=None)
    args = parser.parse_args(argv)

    cfg = load_config(args)
    from ..training.checkpoint import CheckpointManager
    from ..training.evaluate import evaluate
    from ..training.trainer import Trainer

    trainer = Trainer(cfg)
    state = trainer.init_state()
    mngr = CheckpointManager(cfg.train.ckpt_path)
    state, _ = mngr.restore(state, step=args.restore_step)
    mngr.close()
    step = int(np.asarray(state.step))

    batcher = trainer.make_batcher("val.txt", pad_short="mask")
    msg = evaluate(trainer.eval_step, state, batcher.batches(0), step,
                   cfg.train.step.total_step)
    print(msg)


if __name__ == "__main__":
    main()
