"""A/B: transposed-conv lowering (polyphase vs lhs-dilated) on the chip.

The HiFi-GAN vocoder is ~90% of the end-to-end serving budget
(``BENCH_r02.json``), and its four upsample stages are transposed convs.
The classic lhs-dilation lowering slides a k-tap window over a u-dilated
input where only ~k/u taps are nonzero; the polyphase regrouping runs one
dense stride-1 conv instead (``vocoder/hifigan.py ConvTranspose1d``).  This
harness measures the full V1 generator both ways, both dtypes, with the
chained-slope methodology, and writes ``benchmarks/results/transpose_ab.json``.

Run: ``python -m benchmarks.transpose_ab``
"""

from __future__ import annotations

import json
import os

import numpy as np

B, T = 8, 512
OUT = os.path.join(os.path.dirname(__file__), "results",
                   "transpose_ab.json")


def main() -> None:
    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from smart_nar_fast_tts_tpu import benchmarking as bm
    from smart_nar_fast_tts_tpu.vocoder import (HiFiGANConfig,
                                                HiFiGANGenerator)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(B, T, 80)), jnp.float32)
    results = []
    for dtype in ("float32", "bfloat16"):
        for impl in ("dilated", "polyphase"):
            voc = HiFiGANGenerator(HiFiGANConfig(
                compute_dtype=dtype, transpose_impl=impl))
            voc_vars = voc.init(jax.random.PRNGKey(1),
                                jnp.zeros((1, 16, 80)))

            def step(c, f=voc, v=voc_vars):
                return bm.collapse(f.apply(v, bm.taint(mel, c)), c)

            m = bm.seconds_per_iteration(step, k_hi=9)
            cost = jax.jit(voc.apply).lower(
                voc_vars, mel).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):   # older jax returns [dict]
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            results.append({
                "impl": impl, "dtype": dtype,
                "seconds_per_iter": round(m.seconds, 6),
                "flops_per_iter": flops,
                "achieved_tflops": round(flops / m.seconds / 1e12, 2),
            })
            print(json.dumps(results[-1]), flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({"batch": B, "mel_frames": T,
                   "backend": jax.default_backend(),
                   "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
