"""Export CLI: checkpoint → ahead-of-time compiled serving artifacts.

Usage::

    python -m smart_nar_fast_tts_tpu.cli.export \
        -p preprocess.yaml -m model.yaml -t train.yaml \
        --restore_step 160000 --out_dir artifacts/ \
        [--vocoder_ckpt generator.pth.tar] [--batch_size 1] \
        [--platforms tpu,cpu] [--stream_chunk 64]

Writes ``jax.export`` serialized StableHLO programs (parameters baked in)
for every text/mel bucket plus the streaming vocoder window, and a
``manifest.json``.  Serve with ``smart_nar_fast_tts_tpu.serving.ExportedTTS``
— no model code, configs, or checkpoints needed at serving time.  The
reference has no deployment path beyond re-running its Python stack
(``/root/reference/synthesize.py:116-119``).
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from ._args import add_config_args, enable_compilation_cache, load_config


def main(argv=None) -> None:
    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    add_config_args(parser)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--restore_step", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--vocoder_ckpt", type=str, default=None,
                        help="HiFi-GAN checkpoint (torch or msgpack); "
                             "acoustic-only artifact if omitted")
    parser.add_argument("--stream_chunk", type=int, default=64)
    parser.add_argument("--platforms", type=str, default=None,
                        help="comma-separated lowering platforms, e.g. "
                             "'tpu,cpu' (default: this machine's backend)")
    parser.add_argument("--pitch_control", type=float, default=1.0)
    parser.add_argument("--energy_control", type=float, default=1.0)
    parser.add_argument("--duration_control", type=float, default=1.0)
    args = parser.parse_args(argv)

    cfg = load_config(args)
    from ..models import FastSpeech2Align
    from ..serving import export_serving_artifacts
    from ..training.checkpoint import CheckpointManager
    from ..training.schedule import make_optimizer
    from ..training.state import create_train_state

    model = FastSpeech2Align(cfg.model, cfg.preprocess)
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
        print("WARNING: no checkpoint found; exporting random init")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    generator = gen_variables = None
    if args.vocoder_ckpt:
        from ..vocoder import load_hifigan
        generator, gen_variables = load_hifigan(args.vocoder_ckpt)

    platforms = args.platforms.split(",") if args.platforms else None
    # long-form serving: export the acoustic grid over every serving frame
    # capacity; vocoder buckets get the long caps too so the wav stage can
    # cover whatever the acoustic stage produced
    mel_caps = sorted(set(cfg.train.serving_mel_caps)
                      | {cfg.model.max_seq_len})
    voc_buckets = sorted(set(cfg.train.mel_buckets) | set(mel_caps))
    manifest = export_serving_artifacts(
        args.out_dir, model, variables,
        text_buckets=cfg.train.text_buckets,
        mel_buckets=voc_buckets,
        batch_size=args.batch_size, max_mel_len=cfg.model.max_seq_len,
        mel_caps=mel_caps,
        generator=generator, gen_variables=gen_variables,
        stream_chunk=args.stream_chunk,
        p_control=args.pitch_control, e_control=args.energy_control,
        d_control=args.duration_control, platforms=platforms,
        provenance={"ckpt_path": cfg.train.ckpt_path,
                    "ckpt_step": restored,
                    "vocoder_ckpt": args.vocoder_ckpt or ""})
    n = (len(manifest["probe"]) + len(manifest["acoustic"])
         + len(manifest.get("vocoder", []))
         + (1 if "streaming" in manifest else 0))
    print(f"exported {n} programs to {args.out_dir} "
          f"(ckpt step {restored}, platforms {manifest['platforms']})")


if __name__ == "__main__":
    main()
