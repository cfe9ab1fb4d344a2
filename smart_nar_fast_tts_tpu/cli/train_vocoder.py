"""HiFi-GAN vocoder (fine-)tuning CLI — the GAN training path the reference
lacks (it only downloads checkpoints, ``utils/model.py:38-67``).

    python -m smart_nar_fast_tts_tpu.cli.train_vocoder \
        --wav_dir /path/to/wavs --steps 10000 [--batch_size 16] \
        [--segment_size 8192] [--restore_generator gen.pt|gen.msgpack] \
        [--out_dir ./output/vocoder]

Data-parallel over the mesh ``data`` axis; mel inputs are extracted
in-graph (fused Pallas STFT on TPU), so the host pipeline ships raw
waveform segments only.
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np


def main(argv=None) -> None:
    from ._args import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--wav_dir", type=str, required=True)
    parser.add_argument("--steps", type=int, default=10000)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--segment_size", type=int, default=8192)
    parser.add_argument("--learning_rate", type=float, default=2e-4)
    parser.add_argument("--steps_per_dispatch", type=int, default=1,
                        help="GAN steps per jitted dispatch (lax.scan); "
                             ">1 amortizes the host→chip round trip on "
                             "remote-attached devices")
    parser.add_argument("--generator",
                        choices=("hifigan", "vocos", "melgan"),
                        default="hifigan",
                        help="generator family: HiFi-GAN V1 (torch-parity "
                             "topology), the iSTFT-head Vocos backbone "
                             "(vocoder/vocos.py, TPU-first), or MelGAN "
                             "(vocoder/melgan.py, streaming-halo family)")
    parser.add_argument("--restore_generator", type=str, default=None,
                        help="torch HiFi-GAN ckpt or msgpack params to "
                             "warm-start the generator")
    parser.add_argument("--out_dir", type=str, default="./output/vocoder")
    parser.add_argument("--save_every", type=int, default=1000)
    parser.add_argument("--log_every", type=int, default=100)
    parser.add_argument("--sampling_rate", type=int, default=22050)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--debug_tiny", action="store_true",
                        help="tiny model/mel configs (CI smoke tests)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ..audio.stft import MelSpectrogramConfig
    from ..data.wavio import load_wav
    from ..parallel import make_mesh
    from ..training.vocoder import (create_vocoder_state,
                                    make_vocoder_optimizer,
                                    make_vocoder_train_step,
                                    sample_segments)
    from ..vocoder import (HiFiGANConfig, HiFiGANGenerator, MelGANConfig,
                           MelGANGenerator, VocosConfig, VocosGenerator,
                           load_hifigan)
    from ..vocoder.discriminators import HiFiGANDiscriminator

    paths = sorted(glob.glob(os.path.join(args.wav_dir, "**", "*.wav"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no .wav files under {args.wav_dir}")
    wavs = [load_wav(p, args.sampling_rate)[0].astype(np.float32)
            for p in paths]
    print(f"{len(wavs)} wavs, "
          f"{sum(len(w) for w in wavs) / args.sampling_rate:.1f}s audio")

    if args.debug_tiny:
        if args.generator == "vocos":
            gen_cfg = VocosConfig(
                n_mels=8, dim=16, intermediate=32, n_layers=2, n_fft=32,
                hop=8, win_length=32, sampling_rate=args.sampling_rate)
        elif args.generator == "melgan":
            gen_cfg = MelGANConfig(
                n_mels=8, ngf=8, n_residual_layers=1, ratios=(4, 2),
                sampling_rate=args.sampling_rate)
        else:
            gen_cfg = HiFiGANConfig(
                upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                upsample_initial_channel=16, resblock_kernel_sizes=(3,),
                resblock_dilation_sizes=((1, 2),), n_mels=8,
                sampling_rate=args.sampling_rate)
        discriminator = HiFiGANDiscriminator(
            periods=(2, 3), period_channels=(4, 8), n_scales=2,
            scale_layers=((8, 15, 1, 1), (16, 41, 4, 4), (16, 5, 1, 1)))
        mel_cfg = MelSpectrogramConfig(
            sampling_rate=args.sampling_rate, n_fft=32, hop_length=8,
            win_length=32, n_mels=8, mel_fmax=None)
    else:
        if args.generator == "vocos":
            gen_cfg = VocosConfig(sampling_rate=args.sampling_rate)
        elif args.generator == "melgan":
            gen_cfg = MelGANConfig(sampling_rate=args.sampling_rate)
        else:
            gen_cfg = HiFiGANConfig(sampling_rate=args.sampling_rate)
        discriminator = HiFiGANDiscriminator()
        mel_cfg = MelSpectrogramConfig(sampling_rate=args.sampling_rate)
    generator = {"vocos": VocosGenerator, "melgan": MelGANGenerator,
                 "hifigan": HiFiGANGenerator}[args.generator](gen_cfg)

    gen_params = None
    if args.restore_generator:
        if args.restore_generator.endswith(".msgpack"):
            target = generator.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 8, gen_cfg.n_mels)))["params"]
            with open(args.restore_generator, "rb") as f:
                gen_params = serialization.from_bytes(target, f.read())
        elif args.generator != "hifigan":
            raise SystemExit("torch-checkpoint warm-start is a HiFi-GAN "
                             "topology; use a .msgpack for --generator "
                             "vocos")
        else:
            gen_params = load_hifigan(args.restore_generator)[1]["params"]

    gen_tx = make_vocoder_optimizer(args.learning_rate)
    disc_tx = make_vocoder_optimizer(args.learning_rate)
    state = create_vocoder_state(generator, discriminator, gen_tx, disc_tx,
                                 args.segment_size, seed=args.seed,
                                 gen_params=gen_params)
    # data axis must divide the per-host batch (tiny debug batches on many
    # virtual devices otherwise fail to shard)
    import math
    data_size = math.gcd(args.batch_size // jax.process_count(),
                         jax.local_device_count()) * jax.process_count()
    mesh = make_mesh((data_size, 1),
                     devices=jax.devices()[:data_size])
    k = max(1, args.steps_per_dispatch)
    step_fn = make_vocoder_train_step(generator, discriminator, mel_cfg,
                                      gen_tx, disc_tx, mesh=mesh,
                                      steps_per_dispatch=k)

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed + jax.process_index())
    t0 = time.perf_counter()
    step, last_log = 0, 0
    while step < args.steps:
        if k == 1:
            batch = sample_segments(wavs, args.batch_size,
                                    args.segment_size, rng)
        else:
            batch = np.stack([
                sample_segments(wavs, args.batch_size, args.segment_size,
                                rng) for _ in range(k)])
        state, metrics = step_fn(state, jnp.asarray(batch))
        step += k
        if step - last_log >= args.log_every or step >= args.steps:
            dt = time.perf_counter() - t0
            print(f"step {step}: disc={float(metrics.disc):.4f} "
                  f"gen={float(metrics.gen_total):.4f} "
                  f"mel={float(metrics.mel):.4f} "
                  f"({(step - last_log) / dt:.2f} steps/s)", flush=True)
            if not np.isfinite(float(metrics.gen_total)):
                raise FloatingPointError(f"non-finite loss at step {step}")
            last_log, t0 = step, time.perf_counter()
        if step % args.save_every < k or step >= args.steps:
            if jax.process_index() == 0:
                path = os.path.join(args.out_dir,
                                    f"generator_{step}.msgpack")
                with open(path, "wb") as f:
                    f.write(serialization.to_bytes(
                        jax.device_get(state.gen_params)))
                # config beside the params so load_hifigan() (and therefore
                # synthesize --vocoder_ckpt) can rebuild the topology;
                # always rewritten — a stale config from an earlier run with
                # a different topology would rebuild the wrong model
                cfg_path = os.path.join(args.out_dir, "config.json")
                import json
                with open(cfg_path, "w") as f:
                    json.dump({"family": args.generator,
                               **gen_cfg.to_dict()}, f, indent=1)
                # run provenance beside the checkpoints: what was trained,
                # on what, where — benchmarks.commit_vocoder_params copies
                # this into the committed <family>_meta.json so promoted
                # artifacts carry their true provenance (ADVICE r3)
                with open(os.path.join(args.out_dir, "meta.json"),
                          "w") as f:
                    json.dump({
                        "family": args.generator,
                        "steps_completed": step,
                        "steps_planned": args.steps,
                        "batch_size": args.batch_size,
                        "segment_size": args.segment_size,
                        "learning_rate": args.learning_rate,
                        "corpus": f"{args.wav_dir}: {len(wavs)} wavs, "
                                  f"{sum(len(w) for w in wavs) / args.sampling_rate:.1f}s",
                        "device": jax.devices()[0].platform,
                        "final_losses": {
                            "disc": round(float(metrics.disc), 4),
                            "gen_total": round(float(metrics.gen_total), 4),
                            "mel": round(float(metrics.mel), 4)},
                        "trainer": "smart_nar_fast_tts_tpu.cli."
                                   "train_vocoder (MPD+MSD, in-graph "
                                   "STFT mel loss)",
                    }, f, indent=1)
                print(f"saved {path}", flush=True)


if __name__ == "__main__":
    main()
