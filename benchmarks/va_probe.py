"""Probe: where do the ~1.5 ms of acoustic-forward time outside the three
transformer stacks go?  Times the VarianceAdaptor and its pieces on chip.

Run: python -m benchmarks.va_probe
"""

from __future__ import annotations

import json

import numpy as np


def main() -> None:
    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from smart_nar_fast_tts_tpu import benchmarking as bm
    from smart_nar_fast_tts_tpu.config import (FeatureStats, ModelConfig,
                                               PreprocessConfig)
    from smart_nar_fast_tts_tpu.models.variance import (VarianceAdaptor,
                                                        VariancePredictor)
    from smart_nar_fast_tts_tpu.ops.upsample import gaussian_upsample

    rng = np.random.default_rng(0)
    B, L, T = 8, 128, 1000
    cfg = ModelConfig()
    stats = FeatureStats(
        pitch_min=71.0, pitch_max=799.8, pitch_mean=207.4, pitch_std=46.5,
        energy_min=0.018, energy_max=314.9, energy_mean=37.3,
        energy_std=25.1)

    x = jnp.asarray(rng.normal(size=(B, L, 256)), jnp.float32)
    src_valid = jnp.ones((B, L), bool)
    src_lens = jnp.full((B,), L, jnp.int32)

    va = VarianceAdaptor(cfg, stats)
    va_vars = va.init(jax.random.PRNGKey(0), x, src_valid, T)
    va_f = jax.jit(lambda v, x: va.apply(v, x, src_valid, T).x)

    vp = VariancePredictor(256, 3, 0.5)
    hT = jnp.asarray(rng.normal(size=(B, T, 256)), jnp.float32)
    mel_valid = jnp.ones((B, T), bool)
    vp_vars = vp.init(jax.random.PRNGKey(1), hT, mel_valid)
    vp_f = jax.jit(lambda v, x: vp.apply(v, x, mel_valid))

    dur = jnp.asarray(rng.integers(5, 11, size=(B, L)), jnp.float32)
    gu_f = jax.jit(lambda x, d: gaussian_upsample(
        x, d, T, src_valid.astype(x.dtype), sigma=10.0)[0])

    results = []

    def run(name, step):
        m = bm.seconds_per_iteration(step, k_hi=33)
        results.append({"stage": name, "ms": round(m.seconds * 1e3, 4)})
        print(json.dumps(results[-1]), flush=True)

    run("variance_adaptor_full",
        lambda c: bm.collapse(va_f(va_vars, bm.taint(x, c)), c))
    run("variance_predictor_T1000",
        lambda c: bm.collapse(vp_f(vp_vars, bm.taint(hT, c)), c))
    run("gaussian_upsample",
        lambda c: bm.collapse(gu_f(bm.taint(x, c), dur), c))

    with open("benchmarks/results/va_probe.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
