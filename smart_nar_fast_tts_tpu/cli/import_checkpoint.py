"""Import a reference (PyTorch) checkpoint into this framework's store.

Migration path for users of the reference repo: their
``output/ckpt/LJSpeech/{step}.pth.tar`` (``{"model": state_dict,
"optimizer": ...}``, reference ``train.py:149-159``) becomes an Orbax
checkpoint that ``cli.train --restore_step`` / ``cli.synthesize`` /
``cli.evaluate`` restore directly (optimizer state is re-initialized; the
Noam schedule resumes from the imported step, matching the reference's own
restore behavior — it also rebuilds the optimizer from ``--restore_step``,
``model/optimizer.py:13``).

    python -m smart_nar_fast_tts_tpu.cli.import_checkpoint \
        --torch_ckpt 160000.pth.tar -p P.yaml -m M.yaml -t T.yaml \
        [--step 160000]
"""

from __future__ import annotations

import argparse
import re

import numpy as np

from ._args import load_config


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--torch_ckpt", type=str, required=True)
    parser.add_argument("--step", type=int, default=None,
                        help="step to record (default: parsed from the "
                             "checkpoint filename)")
    parser.add_argument("-p", "--preprocess_config", type=str, default=None)
    parser.add_argument("-m", "--model_config", type=str, default=None)
    parser.add_argument("-t", "--train_config", type=str, default=None)
    args = parser.parse_args(argv)

    step = args.step
    if step is None:
        m = re.search(r"(\d+)", args.torch_ckpt.rsplit("/", 1)[-1])
        step = int(m.group(1)) if m else 0

    cfg = load_config(args)

    import jax
    import jax.numpy as jnp
    import torch

    from ..models import FastSpeech2Align
    from ..models.convert import torch_state_dict_to_variables
    from ..training.checkpoint import CheckpointManager
    from ..training.schedule import make_optimizer
    from ..training.state import create_train_state

    raw = torch.load(args.torch_ckpt, map_location="cpu",
                     weights_only=True)
    sd = raw.get("model", raw) if isinstance(raw, dict) else raw
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    variables = torch_state_dict_to_variables(sd, cfg.model)

    model = FastSpeech2Align(cfg.model, cfg.preprocess)
    T0, L0 = 8, 8
    init_vars = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, L0), jnp.int32), jnp.asarray([L0], jnp.int32),
        mels=jnp.zeros((1, T0, cfg.model.n_mel_channels)),
        mel_lens=jnp.asarray([T0], jnp.int32),
        p_targets=jnp.zeros((1, T0)), e_targets=jnp.zeros((1, T0)))
    # structural check: imported tree must match the model's param tree
    def key_set(tree):
        return {jax.tree_util.keystr(p) for p, _ in
                jax.tree_util.tree_leaves_with_path(tree)}

    a = key_set(init_vars["params"])
    b = key_set(variables["params"])
    if a != b:
        missing, extra = sorted(a - b)[:5], sorted(b - a)[:5]
        raise SystemExit(f"param tree mismatch: missing={missing} "
                         f"extra={extra}")

    tx = make_optimizer(cfg.train.optimizer,
                        cfg.model.transformer.encoder_hidden)
    state = create_train_state(variables, tx)
    state = state.replace(step=jnp.asarray(step, jnp.int32))

    mngr = CheckpointManager(cfg.train.ckpt_path)
    mngr.save(state, {"epoch": 0, "in_epoch": 0, "imported": True},
              force=True)
    mngr.wait()
    mngr.close()
    print(f"imported step {step} -> {cfg.train.ckpt_path}")


if __name__ == "__main__":
    main()
