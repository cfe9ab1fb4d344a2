"""A/B: length-regulation upsamplers on the chip (VERDICT round-2 item 4).

Three implementations of phoneme→frame expansion:

- ``hard``     vectorized searchsorted+gather (reference LengthRegulator
               semantics, ``ops/upsample.hard_upsample``);
- ``gaussian`` dense (B, L, T) weight matmul (``ops/upsample``), the soft
               upsampler the reference defines but never wires;
- ``banded``   Pallas kernel streaming the Gaussian weights band-diagonally
               (``ops/pallas/upsample.gaussian_upsample_banded``).

Measured with the chained-slope methodology at the serving shape
(B=8, L=128, T=1000, D=256) and the training shape (B=48, L=128, T=896),
plus the FULL flagship model inference forward with ``upsampling='hard'``
vs ``'gaussian'`` — the op-level winner only matters if it moves the model.
Writes ``benchmarks/results/upsample_ab.json``.

Run: ``python -m benchmarks.upsample_ab``
"""

from __future__ import annotations

import json
import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "results",
                   "upsample_ab.json")


def main() -> None:
    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from smart_nar_fast_tts_tpu import benchmarking as bm
    from smart_nar_fast_tts_tpu.config import (FeatureStats, ModelConfig,
                                               PreprocessConfig)
    from smart_nar_fast_tts_tpu.models import FastSpeech2Align
    from smart_nar_fast_tts_tpu.ops.pallas import (gaussian_upsample_banded,
                                                   pallas_interpret,
                                                   use_pallas)
    from smart_nar_fast_tts_tpu.ops.upsample import (gaussian_upsample,
                                                     hard_upsample)

    results: dict = {"backend": jax.default_backend(), "op_level": [],
                     "model_level": []}
    rng = np.random.default_rng(0)

    # ---- op level ---------------------------------------------------------
    for shape_name, (B, L, T, D) in (("serving", (8, 128, 1000, 256)),
                                     ("training", (48, 128, 896, 256))):
        x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
        dur = jnp.asarray(rng.uniform(3, 10, size=(B, L)), jnp.float32)
        pv = jnp.ones((B, L), jnp.float32)
        interp = pallas_interpret() or not use_pallas()

        variants = {
            "hard": lambda x, d, p: hard_upsample(x, d, T)[0],
            "gaussian_xla": lambda x, d, p: gaussian_upsample(
                x, d, T, p)[0],
            "banded_pallas": lambda x, d, p: gaussian_upsample_banded(
                x, d, T, p, interpret=interp)[0],
        }
        for name, fn in variants.items():
            def step(c, f=fn):
                return bm.collapse(f(bm.taint(x, c), dur, pv), c)
            m = bm.seconds_per_iteration(step, k_hi=33)
            results["op_level"].append({
                "shape": shape_name, "impl": name,
                "ms_per_iter": round(m.seconds * 1e3, 4)})
            print(json.dumps(results["op_level"][-1]), flush=True)

    # ---- full-model inference forward --------------------------------------
    pre = PreprocessConfig(stats=FeatureStats(
        pitch_min=71.0, pitch_max=799.8, pitch_mean=207.4, pitch_std=46.5,
        energy_min=0.018, energy_max=314.9, energy_mean=37.3,
        energy_std=25.1))
    B, L, T_CAP = 8, 128, 1000
    texts = jnp.asarray(rng.integers(2, 300, size=(B, L)), jnp.int32)
    src_lens = jnp.asarray(np.full((B,), L), jnp.int32)
    variables = None
    for mode in ("hard", "gaussian"):
        model = FastSpeech2Align(ModelConfig(upsampling=mode), pre)
        if variables is None:    # same tree for both modes
            variables = model.init(jax.random.PRNGKey(0), texts, src_lens,
                                   max_mel_len=T_CAP)

        def step(c, m=model):
            o = m.apply(variables, bm.taint(texts, c), src_lens,
                        max_mel_len=T_CAP, deterministic=True)
            return bm.collapse(o.postnet_mel, c)

        m = bm.seconds_per_iteration(step, k_hi=17)
        results["model_level"].append({
            "impl": mode, "shape": f"B{B}_L{L}_T{T_CAP}",
            "ms_per_iter": round(m.seconds * 1e3, 4)})
        print(json.dumps(results["model_level"][-1]), flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
