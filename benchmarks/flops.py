"""Hardware-utilization accounting: achieved FLOP/s vs chip peak.

"Speed of light" on TPU is the MXU's peak matmul throughput; this harness
reports how close each serving/training program gets, using numbers the
compiler itself stands behind:

- FLOPs per program from ``compiled.cost_analysis()['flops']`` (XLA's own
  count of the optimized HLO — not a hand model, and immune to the
  double-counting a paper-formula estimate can hit after fusion);
- seconds per program from the in-graph chained-slope methodology in
  ``smart_nar_fast_tts_tpu/benchmarking.py`` (dispatch/RTT cancel, so the
  quotient is genuine device FLOP/s).

An advisor finding on round 1 (ADVICE.md: README claimed an impossible
1.57 PFLOP/s fp32) is exactly the failure mode this file prevents: every
throughput number the README quotes should come from here, labeled with
the dtype it was measured under.

Prints one JSON line per program: {program, flops_per_iter, seconds,
achieved_tflops, dtype}.  Peak-fraction is left to the reader because the
attached chip generation is environment-dependent (v5e: ~197 bf16 /
~98 f32 dense TFLOP/s per chip).

Run: ``python -m benchmarks.flops``
"""

from __future__ import annotations

import json

import numpy as np

B, L, T_CAP = 8, 128, 1000
B_TRAIN, T_TRAIN = 48, 896


def _cost_flops(jitted, *args) -> float:
    cost = jitted.lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def main() -> None:
    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from smart_nar_fast_tts_tpu import benchmarking as bm
    from smart_nar_fast_tts_tpu.config import (FeatureStats, ModelConfig,
                                               PreprocessConfig)
    from smart_nar_fast_tts_tpu.models import FastSpeech2Align
    from smart_nar_fast_tts_tpu.vocoder import (HiFiGANConfig,
                                                HiFiGANGenerator)

    pre = PreprocessConfig(stats=FeatureStats(
        pitch_min=71.0, pitch_max=799.8, pitch_mean=207.4, pitch_std=46.5,
        energy_min=0.018, energy_max=314.9, energy_mean=37.3,
        energy_std=25.1))
    rng = np.random.default_rng(0)
    texts = jnp.asarray(rng.integers(2, 300, size=(B, L)), jnp.int32)
    src_lens = jnp.asarray(np.full((B,), L), jnp.int32)

    results = []
    for dtype in ("float32", "bfloat16"):
        model = FastSpeech2Align(ModelConfig(compute_dtype=dtype), pre)
        variables = model.init(jax.random.PRNGKey(0), texts, src_lens,
                               max_mel_len=T_CAP)
        voc = HiFiGANGenerator(HiFiGANConfig(compute_dtype=dtype))
        voc_vars = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 80)))
        mel = jnp.asarray(rng.normal(size=(B, 512, 80)), jnp.float32)

        mel_fwd = jax.jit(lambda v, t, s: model.apply(
            v, t, s, max_mel_len=T_CAP, deterministic=True).postnet_mel)
        voc_fwd = jax.jit(voc.apply)

        for name, jitted, args, step in (
            ("acoustic_fwd_B8_T1000", mel_fwd, (variables, texts, src_lens),
             lambda c, f=mel_fwd: bm.collapse(
                 f(variables, bm.taint(texts, c), src_lens), c)),
            ("hifigan_fwd_B8_T512", voc_fwd, (voc_vars, mel),
             lambda c, f=voc_fwd: bm.collapse(
                 f(voc_vars, bm.taint(mel, c)), c)),
        ):
            flops = _cost_flops(jitted, *args)
            m = bm.seconds_per_iteration(step, k_hi=9)
            results.append({
                "program": name,
                "dtype": dtype,
                "flops_per_iter": flops,
                "seconds_per_iter": round(m.seconds, 6),
                "achieved_tflops": round(flops / m.seconds / 1e12, 2),
            })
            print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
