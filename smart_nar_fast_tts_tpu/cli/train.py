"""Training CLI (reference ``train.py:170-196``).

Usage::

    python -m smart_nar_fast_tts_tpu.cli.train \
        -p preprocess.yaml -m model.yaml -t train.yaml [--restore_step N]

``--restore_step`` restores that checkpoint (default: latest, which the
reference cannot do).  Multi-host launches call
``jax.distributed.initialize`` first when ``--distributed`` is set.
"""

from __future__ import annotations

import argparse

import jax

from ._args import add_config_args, enable_compilation_cache, load_config
from ..training.trainer import Trainer


def main(argv=None) -> None:
    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    add_config_args(parser)
    parser.add_argument("--restore_step", type=int, default=None,
                        help="checkpoint step to restore "
                             "(default: latest if any)")
    parser.add_argument("--total_step", type=int, default=None,
                        help="override train.yaml total_step")
    parser.add_argument("--distributed", action="store_true",
                        help="initialize the multi-host JAX runtime")
    args = parser.parse_args(argv)

    if args.distributed:
        jax.distributed.initialize()

    cfg = load_config(args)
    trainer = Trainer(cfg)
    trainer.fit(total_steps=args.total_step, restore=True)


if __name__ == "__main__":
    main()
