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
achieved_tflops, peak_fraction, dtype} and writes the set to
``benchmarks/results/flops.json``.  Peak fractions assume a v5e chip
(~197 bf16 / ~98 f32 dense TFLOP/s); other generations: divide yourself.

Run: ``python -m benchmarks.flops [--train]``  (--train adds the full
fwd+bwd+Adam train step at the reference's B=48 batch — slower compile)
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

B, L, T_CAP = 8, 128, 1000
B_TRAIN, L_TRAIN, T_TRAIN = 48, 128, 896
PEAK_TFLOPS = {"float32": 98.0, "bfloat16": 197.0}   # v5e dense
OUT = os.path.join(os.path.dirname(__file__), "results", "flops.json")


def _cost_flops(jitted, *args) -> float:
    cost = jitted.lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true",
                    help="also measure the full train step (B=48)")
    args = ap.parse_args()

    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from smart_nar_fast_tts_tpu import benchmarking as bm
    from smart_nar_fast_tts_tpu.config import (FeatureStats, ModelConfig,
                                               OptimizerConfig,
                                               PreprocessConfig)
    from smart_nar_fast_tts_tpu.models import (FastSpeech2Align,
                                               FastSpeech2Loss)
    from smart_nar_fast_tts_tpu.vocoder import (HiFiGANConfig,
                                                HiFiGANGenerator,
                                                VocosConfig, VocosGenerator)

    pre = PreprocessConfig(stats=FeatureStats(
        pitch_min=71.0, pitch_max=799.8, pitch_mean=207.4, pitch_std=46.5,
        energy_min=0.018, energy_max=314.9, energy_mean=37.3,
        energy_std=25.1))
    rng = np.random.default_rng(0)
    texts = jnp.asarray(rng.integers(2, 300, size=(B, L)), jnp.int32)
    src_lens = jnp.asarray(np.full((B,), L), jnp.int32)

    results = []

    def record(name, dtype, flops, seconds):
        results.append({
            "program": name, "dtype": dtype, "flops_per_iter": flops,
            "seconds_per_iter": round(seconds, 6),
            "achieved_tflops": round(flops / seconds / 1e12, 2),
            "peak_fraction": round(flops / seconds / 1e12
                                   / PEAK_TFLOPS[dtype], 3),
            # the honest denominator: XLA default matmul precision runs
            # f32 operands on the bf16 MXU (one pass, ~190 TFLOP/s
            # measured — DESIGN.md §4b, benchmarks/bf16_probe.py), so the
            # machine peak is 197 for BOTH dtype policies; "peak_fraction"
            # against 98 f32 overstates f32 utilization ~2x
            "mxu_peak_fraction": round(flops / seconds / 1e12
                                       / PEAK_TFLOPS["bfloat16"], 3),
        })
        print(json.dumps(results[-1]), flush=True)

    for dtype in ("float32", "bfloat16"):
        model = FastSpeech2Align(ModelConfig(compute_dtype=dtype), pre)
        variables = model.init(jax.random.PRNGKey(0), texts, src_lens,
                               max_mel_len=T_CAP)
        voc = HiFiGANGenerator(HiFiGANConfig(compute_dtype=dtype))
        voc_vars = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 80)))
        mel = jnp.asarray(rng.normal(size=(B, 512, 80)), jnp.float32)

        vcs = VocosGenerator(VocosConfig(compute_dtype=dtype))
        vcs_vars = vcs.init(jax.random.PRNGKey(2), jnp.zeros((1, 16, 80)))

        mel_fwd = jax.jit(lambda v, t, s: model.apply(
            v, t, s, max_mel_len=T_CAP, deterministic=True).postnet_mel)
        voc_fwd = jax.jit(voc.apply)
        vcs_fwd = jax.jit(vcs.apply)

        for name, jitted, fargs, step in (
            ("acoustic_fwd_B8_T1000", mel_fwd, (variables, texts, src_lens),
             lambda c, f=mel_fwd: bm.collapse(
                 f(variables, bm.taint(texts, c), src_lens), c)),
            ("hifigan_fwd_B8_T512", voc_fwd, (voc_vars, mel),
             lambda c, f=voc_fwd: bm.collapse(
                 f(voc_vars, bm.taint(mel, c)), c)),
            ("vocos_fwd_B8_T512", vcs_fwd, (vcs_vars, mel),
             lambda c, f=vcs_fwd: bm.collapse(
                 f(vcs_vars, bm.taint(mel, c)), c)),
        ):
            m = bm.seconds_per_iteration(step, k_hi=9)
            record(name, dtype, _cost_flops(jitted, *fargs), m.seconds)

        if args.train:
            from smart_nar_fast_tts_tpu.training import (Batch,
                                                         create_train_state,
                                                         make_optimizer,
                                                         make_train_step)
            loss = FastSpeech2Loss(pre)
            tr = np.random.default_rng(1)
            batch = Batch(
                texts=jnp.asarray(tr.integers(2, 300, (B_TRAIN, L_TRAIN)),
                                  jnp.int32),
                src_lens=jnp.full((B_TRAIN,), L_TRAIN, jnp.int32),
                mels=jnp.asarray(tr.normal(size=(B_TRAIN, T_TRAIN, 80)),
                                 jnp.float32),
                mel_lens=jnp.full((B_TRAIN,), T_TRAIN, jnp.int32),
                pitch=jnp.asarray(tr.uniform(-1, 1, (B_TRAIN, T_TRAIN)),
                                  jnp.float32),
                energy=jnp.asarray(tr.uniform(0, 2, (B_TRAIN, T_TRAIN)),
                                   jnp.float32))
            tvars = model.init(
                jax.random.PRNGKey(0), batch.texts, batch.src_lens,
                mels=batch.mels, mel_lens=batch.mel_lens,
                p_targets=batch.pitch, e_targets=batch.energy)
            tx = make_optimizer(OptimizerConfig(), 256)
            state0 = create_train_state(tvars, tx)
            step_fn = make_train_step(model, loss)
            rngk = jax.random.PRNGKey(2)
            flops = _cost_flops(step_fn, state0, batch, rngk)

            # the train step donates state, so the state threads through
            # successive dispatches; fetching the LAST losses scalar
            # transitively awaits every preceding step.  Slope between two
            # chain lengths cancels RTT (same method as train_throughput)
            import time
            state_box = [state0]

            def run(n):
                losses = None
                for _ in range(n):
                    state_box[0], losses = step_fn(state_box[0], batch,
                                                   rngk)
                return float(losses.total)

            run(1)                                  # compile + warm
            t_lo = t_hi = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run(1)
                t_lo = min(t_lo, time.perf_counter() - t0)
                t0 = time.perf_counter()
                run(9)
                t_hi = min(t_hi, time.perf_counter() - t0)
            record(f"train_step_B{B_TRAIN}_T{T_TRAIN}", dtype, flops,
                   (t_hi - t_lo) / 8)

    with open(OUT, "w") as f:
        json.dump({"chip": "TPU v5e (v5 lite)",
                   "peak_tflops": PEAK_TFLOPS,
                   "method": "XLA cost_analysis FLOPs / chained-slope "
                             "seconds (benchmarking.py); train step by "
                             "chained state dependency + wall clock",
                   "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
