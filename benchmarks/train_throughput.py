"""Training-step throughput: mel frames/sec/chip (BASELINE.json `metric`).

Measures the fully jitted sharded train step (forward + backward + Noam-Adam
update, the program ``training/step.py`` compiles, scanned K steps per
dispatch as the trainer runs it) at reference-scale shapes
— batch 48 (reference ``train.yaml:5``), L=128 phonemes, T=896 mel frames
(~10.4 s audio at hop 256 / 22.05 kHz, near the reference's
``max_seq_len=1000`` training cap) — and reports mel frames consumed per
wall-second per chip, for both the f32 and bf16 compute-dtype policies.

The reference publishes no number for this (SURVEY.md §6), so this harness
*defines* the measured baseline the driver records.

    python -m benchmarks.train_throughput          # real chip(s)
    JAX_PLATFORMS=cpu python -m benchmarks.train_throughput --iters 2

Prints one JSON line per dtype policy.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

B, L, T = 48, 128, 896
HOP, SR = 256, 22050


def measure(compute_dtype: str, n_iter: int, steps_per_dispatch: int) -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from smart_nar_fast_tts_tpu.config import (Config, FeatureStats,
                                               PreprocessConfig)
    from smart_nar_fast_tts_tpu.models import (FastSpeech2Align,
                                               FastSpeech2Loss)
    from smart_nar_fast_tts_tpu.parallel import make_mesh
    from smart_nar_fast_tts_tpu.training import (create_train_state,
                                                 make_multi_step,
                                                 make_optimizer)
    from smart_nar_fast_tts_tpu.training.step import Batch

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       compute_dtype=compute_dtype))
    pre = PreprocessConfig(stats=FeatureStats(
        pitch_min=71.0, pitch_max=799.8, pitch_mean=207.4, pitch_std=46.5,
        energy_min=0.018, energy_max=314.9, energy_mean=37.3,
        energy_std=25.1))
    model = FastSpeech2Align(cfg.model, pre)
    loss = FastSpeech2Loss(pre)
    tx = make_optimizer(cfg.train.optimizer,
                        cfg.model.transformer.encoder_hidden)

    n_dev = jax.device_count()
    mesh = make_mesh((n_dev, 1))
    # scanned multi-step dispatch: K optimizer updates per compiled call,
    # amortizing host→chip dispatch latency exactly as the trainer does
    K = steps_per_dispatch
    step_fn = make_multi_step(model, loss, num_steps=K, mesh=mesh)

    rng = np.random.default_rng(0)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, L), jnp.int32), jnp.full((2,), L, jnp.int32),
        mels=jnp.zeros((2, T, cfg.model.n_mel_channels)),
        mel_lens=jnp.full((2,), T, jnp.int32),
        p_targets=jnp.zeros((2, T)), e_targets=jnp.zeros((2, T)))
    state = create_train_state(variables, tx)

    batch_global = B * max(1, n_dev)        # reference batch per chip
    nmel = cfg.model.n_mel_channels
    batch = Batch(
        texts=jnp.asarray(rng.integers(2, 300, (K, batch_global, L)),
                          jnp.int32),
        src_lens=jnp.full((K, batch_global), L, jnp.int32),
        mels=jnp.asarray(
            rng.normal(size=(K, batch_global, T, nmel)), jnp.float32),
        mel_lens=jnp.full((K, batch_global), T, jnp.int32),
        pitch=jnp.asarray(rng.normal(size=(K, batch_global, T)),
                          jnp.float32),
        energy=jnp.asarray(rng.normal(size=(K, batch_global, T)),
                           jnp.float32),
        speakers=jnp.zeros((K, batch_global), jnp.int32))
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch = jax.device_put(
            batch, NamedSharding(mesh, P(None, "data")))
    else:
        batch = jax.device_put(batch)
    key = jax.random.PRNGKey(1)

    # Honest timing on remote-attached chips (see benchmarking.py): the
    # train state threads through successive dispatches, so fetching a
    # scalar from the LAST dispatch's losses transitively awaits every
    # preceding step's device execution.  Slope between two chain lengths
    # cancels RTT and per-dispatch overhead.
    # `state` must thread forward across runs — the step donates its input
    # buffers, so re-dispatching from a stale state is a use-after-donate.
    state_box = [state]

    def run(n: int) -> float:
        losses = None
        for _ in range(n):
            state_box[0], losses = step_fn(state_box[0], batch, key)
        return float(jnp.sum(losses.total))

    run(1)                                              # compile + warm
    n_lo, n_hi = 1, 1 + n_iter
    t_lo = t_hi = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run(n_lo)
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(n_hi)
        t_hi = min(t_hi, time.perf_counter() - t0)
    dt = (t_hi - t_lo) / ((n_hi - n_lo) * K)            # per optimizer step

    frames_per_s_chip = batch_global * T / dt / max(1, n_dev)
    return {
        "metric": f"train_mel_frames_per_sec_per_chip_{compute_dtype}",
        "value": round(frames_per_s_chip, 1),
        "unit": "mel_frames/s/chip",
        "steps_per_sec": round(1.0 / dt, 3),
        "audio_seconds_per_s_per_chip": round(
            frames_per_s_chip * HOP / SR, 2),
        "vs_baseline": None,   # reference publishes no number (SURVEY §6)
    }


def main() -> None:
    import os

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--steps_per_dispatch", type=int, default=16)
    ap.add_argument("--dtypes", nargs="+",
                    default=["float32", "bfloat16"])
    args = ap.parse_args()
    for dtype in args.dtypes:
        print(json.dumps(measure(dtype, args.iters,
                                 args.steps_per_dispatch)))


if __name__ == "__main__":
    main()
