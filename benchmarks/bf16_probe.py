"""Probe: what does the MXU actually run when the program says float32?

Three regimes on a big square matmul and on the model's hot shapes:
  (a) f32 operands, precision=DEFAULT   (JAX/XLA TPU default)
  (b) f32 operands, precision=HIGHEST   (true f32 via multi-pass)
  (c) bf16 operands

If (a) ~= (c) in seconds, the "f32" programs already ride the bf16 MXU
(XLA default on TPU truncates matmul operands to bf16 with f32
accumulation), and the bf16 activation policy can only win on memory
traffic — which reframes VERDICT round-3 Missing #1.

Also times each acoustic stage (TxtEncoder / VarianceAdaptor / MelDecoder
/ PostNet) under f32 vs bf16 policy to locate where the bf16 program
loses its theoretical gains.

Run: python -m benchmarks.bf16_probe
"""

from __future__ import annotations

import json

import numpy as np


def main() -> None:
    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from smart_nar_fast_tts_tpu import benchmarking as bm

    rng = np.random.default_rng(0)

    def time_matmul(m, k, n, dtype, precision):
        a = jnp.asarray(rng.normal(size=(m, k)), dtype)
        b = jnp.asarray(rng.normal(size=(k, n)), dtype)
        f = jax.jit(lambda a, b: jnp.dot(a, b, precision=precision,
                                         preferred_element_type=jnp.float32))

        def step(c):
            return bm.collapse(f(bm.taint(a, c), b), c)

        meas = bm.seconds_per_iteration(step, k_hi=17)
        flops = 2 * m * k * n
        return meas.seconds, flops / meas.seconds / 1e12

    results = {"matmul": [], "conv": [], "stages": []}
    M = 4096
    for name, dtype, prec in (
        ("f32_default", jnp.float32, lax.Precision.DEFAULT),
        ("f32_highest", jnp.float32, lax.Precision.HIGHEST),
        ("bf16", jnp.bfloat16, lax.Precision.DEFAULT),
    ):
        s, tf = time_matmul(M, M, M, dtype, prec)
        results["matmul"].append(
            {"regime": name, "shape": [M, M, M], "seconds": round(s, 6),
             "achieved_tflops": round(tf, 1)})
        print(json.dumps(results["matmul"][-1]), flush=True)

    # the model's dominant op: conv1d k=9 256->1024 over (B=8, T=1000)
    def time_conv(dtype, precision):
        x = jnp.asarray(rng.normal(size=(8, 1000, 256)), dtype)
        w = jnp.asarray(rng.normal(size=(9, 256, 1024)) * 0.02, dtype)
        f = jax.jit(lambda x, w: lax.conv_general_dilated(
            x, w, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"),
            precision=precision, preferred_element_type=jnp.float32))

        def step(c):
            return bm.collapse(f(bm.taint(x, c), w), c)

        meas = bm.seconds_per_iteration(step, k_hi=33)
        flops = 2 * 8 * 1000 * 9 * 256 * 1024
        return meas.seconds, flops / meas.seconds / 1e12

    for name, dtype, prec in (
        ("f32_default", jnp.float32, lax.Precision.DEFAULT),
        ("f32_highest", jnp.float32, lax.Precision.HIGHEST),
        ("bf16", jnp.bfloat16, lax.Precision.DEFAULT),
    ):
        s, tf = time_conv(dtype, prec)
        results["conv"].append(
            {"regime": name, "op": "conv1d_k9_256x1024_B8T1000",
             "seconds": round(s, 6), "achieved_tflops": round(tf, 1)})
        print(json.dumps(results["conv"][-1]), flush=True)

    # ---- conv over-peak investigation (VERDICT r4 Weak #5a) ----------
    # round-4's committed f32_default conv read 205.2 TFLOP/s against a
    # 197 machine peak.  Two candidate explanations: (i) slope bias at
    # short chains (k_hi=33), (ii) hand-FLOP overcount vs what XLA runs.
    # Measure the same conv at several (k_lo, k_hi) pairs and record the
    # compiler's own cost_analysis flops next to the hand count.
    def conv_fn():
        x = jnp.asarray(rng.normal(size=(8, 1000, 256)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(9, 256, 1024)) * 0.02,
                        jnp.float32)
        f = jax.jit(lambda x, w: lax.conv_general_dilated(
            x, w, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32))
        return f, x, w

    f, x, w = conv_fn()
    cost = f.lower(x, w).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    xla_flops = float(cost.get("flops", float("nan")))
    hand_flops = 2 * 8 * 1000 * 9 * 256 * 1024
    conv_check = {"hand_flops": hand_flops, "xla_cost_flops": xla_flops,
                  "slopes": []}
    for k_lo, k_hi in ((1, 33), (1, 129), (33, 129), (129, 513)):
        def step(c):
            return bm.collapse(f(bm.taint(x, c), w), c)

        m = bm.seconds_per_iteration(step, k_lo=k_lo, k_hi=k_hi)
        conv_check["slopes"].append(
            {"k_lo": k_lo, "k_hi": k_hi,
             "seconds": round(m.seconds, 8),
             "tflops_hand": round(hand_flops / m.seconds / 1e12, 1),
             "tflops_xla": round(xla_flops / m.seconds / 1e12, 1)})
        print(json.dumps(conv_check["slopes"][-1]), flush=True)
    results["conv_overpeak_check"] = conv_check

    # ---- per-stage acoustic breakdown under the two policies ----
    from smart_nar_fast_tts_tpu.config import (FeatureStats, ModelConfig,
                                               PreprocessConfig)
    from smart_nar_fast_tts_tpu.models import FastSpeech2Align
    from smart_nar_fast_tts_tpu.models.encoders import (MelDecoder,
                                                        TxtEncoder)
    from smart_nar_fast_tts_tpu.models.layers import PostNet

    pre = PreprocessConfig(stats=FeatureStats(
        pitch_min=71.0, pitch_max=799.8, pitch_mean=207.4, pitch_std=46.5,
        energy_min=0.018, energy_max=314.9, energy_mean=37.3,
        energy_std=25.1))
    B, L, T = 8, 128, 1000
    texts = jnp.asarray(rng.integers(2, 300, size=(B, L)), jnp.int32)
    src_lens = jnp.full((B,), L, jnp.int32)

    for dtype_name in ("float32", "bfloat16"):
        cfg = ModelConfig(compute_dtype=dtype_name)
        model = FastSpeech2Align(cfg, pre)
        variables = model.init(jax.random.PRNGKey(0), texts, src_lens,
                               max_mel_len=T)

        # full forward
        full = jax.jit(lambda v, t, s: model.apply(
            v, t, s, max_mel_len=T, deterministic=True).postnet_mel)

        # stages
        txt = TxtEncoder(cfg)
        txt_vars = {"params": variables["params"]["txt_encoder"]}
        src_valid = jnp.ones((B, L), bool)
        txt_f = jax.jit(lambda v, t: txt.apply(v, t, src_valid))

        dec = MelDecoder(cfg)
        dec_vars = {"params": variables["params"]["mel_decoder"]}
        mel_valid = jnp.ones((B, T), bool)
        h = jnp.asarray(rng.normal(size=(B, T, 256)), jnp.float32)
        dec_f = jax.jit(lambda v, x: dec.apply(v, x, mel_valid))

        post = PostNet()
        post_vars = {"params": variables["params"]["postnet"],
                     "batch_stats": variables["batch_stats"]["postnet"]}
        m80 = jnp.asarray(rng.normal(size=(B, T, 80)), jnp.float32)
        post_f = jax.jit(lambda v, x: post.apply(v, x))

        for stage, f, arg0, arg1 in (
            ("full_fwd", full, variables, (texts, src_lens)),
            ("txt_encoder", txt_f, txt_vars, (texts,)),
            ("mel_decoder", dec_f, dec_vars, (h,)),
            ("postnet", post_f, post_vars, (m80,)),
        ):
            def step(c, f=f, arg0=arg0, arg1=arg1):
                if len(arg1) == 2:
                    return bm.collapse(f(arg0, bm.taint(arg1[0], c),
                                         arg1[1]), c)
                a = arg1[0]
                if a.dtype == jnp.int32:
                    return bm.collapse(f(arg0, a + (c < -1e30).astype(
                        jnp.int32)), c)
                return bm.collapse(f(arg0, bm.taint(a, c)), c)

            meas = bm.seconds_per_iteration(step, k_hi=17)
            results["stages"].append(
                {"policy": dtype_name, "stage": stage,
                 "ms": round(meas.seconds * 1e3, 4)})
            print(json.dumps(results["stages"][-1]), flush=True)

    with open("benchmarks/results/bf16_probe.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
