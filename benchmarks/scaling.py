"""Data-parallel scaling-efficiency harness (BASELINE.md north star:
audio-seconds/s ≥ 85% efficiency at 2+ hosts).

Measures training-step throughput (audio seconds consumed per wall second,
mel_frames·hop/SR) on 1 device and on the full ``data`` mesh, and reports
``efficiency = rate_N / (N · rate_1)``.  On real pods run one process per
host (``jax.distributed.initialize`` happens in the CLI); in CI it runs on
the 8-virtual-device CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m benchmarks.scaling

Prints one JSON line compatible with the driver's bench contract.

NOTE: virtual CPU devices share the same physical cores, so the efficiency
number is only meaningful on real multi-chip hardware — the CPU run is a
correctness smoke of the sharded measurement path, not a perf claim.
"""

from __future__ import annotations

import json
import time

import numpy as np


def measure_rate(mesh, batch_size: int, L: int = 64, T: int = 512,
                 n_iter: int = 8) -> float:
    """Audio-seconds/s of the jitted sharded train step on ``mesh``."""
    import jax
    import jax.numpy as jnp

    from smart_nar_fast_tts_tpu.config import (Config, FeatureStats,
                                               PreprocessConfig)
    from smart_nar_fast_tts_tpu.models import (FastSpeech2Align,
                                               FastSpeech2Loss)
    from smart_nar_fast_tts_tpu.parallel import batch_sharding
    from smart_nar_fast_tts_tpu.training import (create_train_state,
                                                 make_optimizer,
                                                 make_train_step)
    from smart_nar_fast_tts_tpu.training.step import Batch

    cfg = Config()
    pre = PreprocessConfig(stats=FeatureStats(
        pitch_min=71.0, pitch_max=799.8, pitch_mean=207.4, pitch_std=46.5,
        energy_min=0.018, energy_max=314.9, energy_mean=37.3,
        energy_std=25.1))
    model = FastSpeech2Align(cfg.model, pre)
    loss = FastSpeech2Loss(pre)
    tx = make_optimizer(cfg.train.optimizer,
                        cfg.model.transformer.encoder_hidden)
    step_fn = make_train_step(model, loss, grad_acc_steps=1, mesh=mesh)

    rng = np.random.default_rng(0)
    B = batch_size
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, L), jnp.int32), jnp.full((2,), L, jnp.int32),
        mels=jnp.zeros((2, T, cfg.model.n_mel_channels)),
        mel_lens=jnp.full((2,), T, jnp.int32),
        p_targets=jnp.zeros((2, T)), e_targets=jnp.zeros((2, T)))
    state = create_train_state(variables, tx)

    batch = Batch(
        texts=jnp.asarray(rng.integers(2, 300, (B, L)), jnp.int32),
        src_lens=jnp.full((B,), L, jnp.int32),
        mels=jnp.asarray(rng.normal(size=(B, T,
                                          cfg.model.n_mel_channels)),
                         jnp.float32),
        mel_lens=jnp.full((B,), T, jnp.int32),
        pitch=jnp.asarray(rng.normal(size=(B, T)), jnp.float32),
        energy=jnp.asarray(rng.normal(size=(B, T)), jnp.float32),
        speakers=jnp.zeros((B,), jnp.int32))
    if mesh.devices.size > 1:
        batch = jax.device_put(batch, batch_sharding(mesh))
    else:
        batch = jax.device_put(batch)
    key = jax.random.PRNGKey(1)

    state, losses = step_fn(state, batch, key)          # compile
    jax.block_until_ready(losses.total)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, losses = step_fn(state, batch, key)
    jax.block_until_ready(losses.total)
    dt = (time.perf_counter() - t0) / n_iter

    hop, sr = 256, 22050
    return (B * T * hop / sr) / dt


def main() -> None:
    import os

    import jax

    # the axon sitecustomize pins jax_platforms to the TPU backend via
    # jax.config (beats the env var) — honor an explicit CPU request so the
    # virtual-device mesh path actually runs on CPU
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from smart_nar_fast_tts_tpu.parallel import make_mesh

    n = jax.device_count()
    if n == 1:
        print(json.dumps({
            "metric": "dp_scaling_efficiency", "value": 1.0,
            "unit": "single device — nothing to scale",
            "vs_baseline": 1.0,
            "audio_seconds_per_s_1dev": round(
                measure_rate(make_mesh((1, 1)), 4), 2)}))
        return
    per_device_batch = 4
    rate_1 = measure_rate(make_mesh((1, 1), devices=jax.devices()[:1]),
                          per_device_batch)
    rate_n = measure_rate(make_mesh((n, 1)), per_device_batch * n)
    eff = rate_n / (n * rate_1)
    print(json.dumps({
        "metric": "dp_scaling_efficiency",
        "value": round(eff, 4),
        "unit": f"rate({n} dev)/({n}*rate(1 dev))",
        "vs_baseline": round(eff / 0.85, 3),
        "audio_seconds_per_s_1dev": round(rate_1, 2),
        f"audio_seconds_per_s_{n}dev": round(rate_n, 2),
    }))


if __name__ == "__main__":
    main()
