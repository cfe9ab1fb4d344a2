"""End-to-end serving benchmark: text → waveform RTF on one chip.

The headline ``bench.py`` measures the acoustic model alone (the quantity
the FastSpeech2 paper's RTF refers to); this harness measures the full
serving path — FastSpeech2Align forward **and** HiFi-GAN V1 vocoding — as
ONE jitted program, so XLA fuses across the model/vocoder boundary and no
mel ever round-trips to the host.  Audio seconds are the valid samples
produced (Σ mel_lens · hop / sr).

    python -m benchmarks.e2e_rtf [--iters 10] [--batch 8]

Prints one JSON line:
    {"metric": "e2e_synthesis_rtf_per_chip", ...} with
    vs_baseline = target_rtf / measured_rtf (>1 = beating the 0.01 target).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

TARGET_RTF = 0.01
HOP, SR = 256, 22050
L, T_CAP = 128, 1000


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--batch", type=int, default=8)
    args = parser.parse_args()
    B = args.batch

    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from smart_nar_fast_tts_tpu.config import (
        FeatureStats, ModelConfig, PreprocessConfig)
    from smart_nar_fast_tts_tpu.models import FastSpeech2Align
    from smart_nar_fast_tts_tpu.vocoder import HiFiGANConfig, HiFiGANGenerator

    cfg = ModelConfig()
    pre = PreprocessConfig(stats=FeatureStats(
        pitch_min=71.0, pitch_max=799.8, pitch_mean=207.4, pitch_std=46.5,
        energy_min=0.018, energy_max=314.9, energy_mean=37.3,
        energy_std=25.1))
    model = FastSpeech2Align(cfg, pre)
    voc = HiFiGANGenerator(HiFiGANConfig())

    rng = np.random.default_rng(0)
    texts = jnp.asarray(rng.integers(2, 300, size=(B, L)), jnp.int32)
    src_lens = jnp.asarray(
        np.clip(rng.integers(L - 32, L + 1, size=(B,)), 1, L), jnp.int32)

    variables = model.init(jax.random.PRNGKey(0), texts, src_lens,
                           max_mel_len=T_CAP)
    params = variables["params"]
    # ~6.7 frames/phoneme (LJSpeech mean) so predicted lengths are honest
    dp = params["variance_adaptor"]["duration_predictor"]["linear_layer"]
    dp["bias"] = dp["bias"] + np.log(7.7)
    variables = {"params": params,
                 "batch_stats": variables.get("batch_stats", {})}
    voc_vars = voc.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 16, cfg.n_mel_channels)))

    @jax.jit
    def synth(variables, voc_vars, texts, src_lens):
        out = model.apply(variables, texts, src_lens, max_mel_len=T_CAP,
                          deterministic=True)
        wav = voc.apply(voc_vars, out.postnet_mel)
        return wav, out.mel_lens

    t0 = time.perf_counter()
    wav, mel_lens = jax.block_until_ready(
        synth(variables, voc_vars, texts, src_lens))
    print(f"# compile+first-run {time.perf_counter() - t0:.1f}s, "
          f"wav {wav.shape} {wav.dtype}")
    audio_seconds = float(jnp.sum(mel_lens)) * HOP / SR
    assert audio_seconds > 0, "duration predictor produced no frames"

    t0 = time.perf_counter()
    for _ in range(args.iters):
        wav, mel_lens = synth(variables, voc_vars, texts, src_lens)
    jax.block_until_ready((wav, mel_lens))
    dt = (time.perf_counter() - t0) / args.iters

    rtf = dt / audio_seconds
    print(json.dumps({
        "metric": "e2e_synthesis_rtf_per_chip",
        "value": round(rtf, 6),
        "unit": "s_compute/s_audio",
        "vs_baseline": round(TARGET_RTF / rtf, 3),
    }))


if __name__ == "__main__":
    main()
