"""Vocos serving-path breakdown: where do the default vocoder's ms go?

Round-4 history this file documents (and re-measures on demand):

1. ``_overlap_add`` originally used a scatter-add with duplicate indices
   (525k rows at n_fft=1024) — **7.7 ms of the 10.9 ms** Vocos forward at
   B=8, T=512 on a v5e.  Rewritten scatter-free (hop-aligned chunk pads +
   adds, ``audio/stft.py``): 0.05 ms.
2. The ConvNeXt depthwise conv used XLA's grouped-conv lowering
   (``feature_group_count=dim``) — 2x slower than k shifted
   broadcast-FMAs across the 8-block stack (no contraction = no MXU win).
   Rewritten as ``_DepthwiseConv1d`` (``vocoder/vocos.py``): the full
   forward landed at **1.07 ms** (10.2x faster than round 3's committed
   path).

Prints one JSON line per stage; writes
``benchmarks/results/vocos_probe.json``.

Run: ``python -m benchmarks.vocos_probe``
"""

from __future__ import annotations

import json
import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "results",
                   "vocos_probe.json")


def main() -> None:
    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from smart_nar_fast_tts_tpu import benchmarking as bm
    from smart_nar_fast_tts_tpu.audio.stft import _overlap_add, istft_matmul
    from smart_nar_fast_tts_tpu.vocoder import VocosConfig, VocosGenerator

    rng = np.random.default_rng(0)
    B, T = 8, 512
    c = VocosConfig()
    gen = VocosGenerator(c)
    mel = jnp.asarray(rng.normal(size=(B, T, 80)), jnp.float32)
    v = gen.init(jax.random.PRNGKey(0), mel)
    full = jax.jit(gen.apply)

    mag = jnp.asarray(rng.uniform(0.1, 1, (B, c.n_bins, T + 1)),
                      jnp.float32)
    ph = jnp.asarray(rng.uniform(-3, 3, (B, c.n_bins, T + 1)), jnp.float32)
    head = jax.jit(lambda m, p: istft_matmul(m, p, c.stft_config()))

    frames = jnp.asarray(rng.normal(size=(B, T + 1, c.n_fft)), jnp.float32)
    ola = jax.jit(lambda f: _overlap_add(f, c.stft_config()))

    results = []

    def run(name, step):
        m = bm.seconds_per_iteration(step, k_hi=17)
        results.append({"stage": name, "ms": round(m.seconds * 1e3, 3)})
        print(json.dumps(results[-1]), flush=True)

    run("vocos_full_B8_T512",
        lambda cc: bm.collapse(full(v, bm.taint(mel, cc)), cc))
    run("istft_head",
        lambda cc: bm.collapse(head(bm.taint(mag, cc), ph), cc))
    run("overlap_add",
        lambda cc: bm.collapse(ola(bm.taint(frames, cc)), cc))

    with open(OUT, "w") as f:
        json.dump({"backend": jax.default_backend(),
                   "history_ms": {"round3_full": 10.88,
                                  "round3_overlap_add": 7.71,
                                  "round4_full": 1.07},
                   "stages": results}, f, indent=1)


if __name__ == "__main__":
    main()
