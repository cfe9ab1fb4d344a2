"""Headline benchmark: synthesis real-time factor (RTF) per chip.

BASELINE.md north star: RTF < 0.01 on one TPU chip.  Measures the full
static-shape inference forward (text → postnet mel, B=8, L=128 phonemes,
T=1000 frame capacity); audio seconds are the valid frames produced at
hop 256 / 22.05 kHz.  The duration predictor's output bias is set to a
realistic ~6.7 frames/phoneme (LJSpeech average) so predicted lengths — and
therefore the audio-seconds denominator — are honest rather than the
random-init zero.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = target_rtf / measured_rtf (>1 = beating the target).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

TARGET_RTF = 0.01
HOP, SR = 256, 22050
B, L, T_CAP = 8, 128, 1000


def main():
    from smart_nar_fast_tts_tpu.config import (
        FeatureStats, ModelConfig, PreprocessConfig)
    from smart_nar_fast_tts_tpu.models import FastSpeech2Align

    cfg = ModelConfig()
    pre = PreprocessConfig(stats=FeatureStats(
        pitch_min=71.0, pitch_max=799.8, pitch_mean=207.4, pitch_std=46.5,
        energy_min=0.018, energy_max=314.9, energy_mean=37.3,
        energy_std=25.1))
    model = FastSpeech2Align(cfg, pre)

    rng = np.random.default_rng(0)
    texts = jnp.asarray(rng.integers(2, 300, size=(B, L)), jnp.int32)
    src_lens = jnp.asarray(
        np.clip(rng.integers(L - 32, L + 1, size=(B,)), 1, L), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), texts, src_lens,
                           max_mel_len=T_CAP)
    # ~6.7 frames/phoneme: log(d+1) bias so round(exp(logd)-1) ≈ 6-7
    params = variables["params"]
    dp = params["variance_adaptor"]["duration_predictor"]["linear_layer"]
    dp["bias"] = dp["bias"] + np.log(7.7)
    variables = {"params": params,
                 "batch_stats": variables.get("batch_stats", {})}

    @jax.jit
    def synth(variables, texts, src_lens):
        out = model.apply(variables, texts, src_lens, max_mel_len=T_CAP,
                          deterministic=True)
        return out.postnet_mel, out.mel_lens

    mel, mel_lens = jax.block_until_ready(synth(variables, texts, src_lens))
    audio_seconds = float(jnp.sum(mel_lens)) * HOP / SR
    assert audio_seconds > 0, "duration predictor produced no frames"

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        mel, mel_lens = synth(variables, texts, src_lens)
    jax.block_until_ready((mel, mel_lens))
    dt = (time.perf_counter() - t0) / n_iter

    rtf = dt / audio_seconds
    print(json.dumps({
        "metric": "synthesis_rtf_per_chip",
        "value": round(rtf, 6),
        "unit": "s_compute/s_audio",
        "vs_baseline": round(TARGET_RTF / rtf, 3),
    }))


if __name__ == "__main__":
    main()
