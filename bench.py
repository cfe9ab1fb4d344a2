"""Headline benchmark: END-TO-END serving RTF (text -> waveform) per chip.

BASELINE.md north star: synthesis RTF < 0.01 on one TPU chip.  Round-1
review (VERDICT.md "Weak #1") required the honest serving number: the full
text -> mel -> HiFi-GAN waveform path compiled as ONE jitted program, so XLA
fuses across the model/vocoder boundary and no mel ever round-trips to the
host.

Timing methodology: on this remote-attached chip ``block_until_ready``
resolves at dispatch acknowledgement, NOT device completion (round 1's
numbers were inflated ~250x by this).  We therefore measure with
``smart_nar_fast_tts_tpu.benchmarking``: k iterations chained in-graph with
true data dependencies, one scalar fetched to host, per-iteration time taken
as the slope between two trip counts so RTT/dispatch overhead cancels.

Audio seconds are the valid frames produced at hop 256 / 22.05 kHz.  The
duration predictor's output bias is set to a realistic ~6.7 frames/phoneme
(LJSpeech average) so predicted lengths - and therefore the audio-seconds
denominator - are honest rather than the random-init zero.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}
with vs_baseline = target_rtf / measured_rtf (>1 = beating the target).
"extra" carries the secondary numbers BASELINE.md asks to report:
mel-only RTF and synthesis mel-frames/sec/chip (BASELINE.md row 5).
"""

import json

import numpy as np

TARGET_RTF = 0.01
HOP, SR = 256, 22050
B, L, T_CAP = 8, 128, 1000


def main():
    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from smart_nar_fast_tts_tpu import benchmarking as bm
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
    # ~6.7 frames/phoneme: log(d+1) bias so round(exp(logd)-1) ~= 6-7
    params = variables["params"]
    dp = params["variance_adaptor"]["duration_predictor"]["linear_layer"]
    dp["bias"] = dp["bias"] + np.log(7.7)
    variables = {"params": params,
                 "batch_stats": variables.get("batch_stats", {})}
    voc_vars = voc.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 16, cfg.n_mel_channels)))

    # audio-seconds denominator (one real forward, fetched to host)
    out = model.apply(variables, texts, src_lens, max_mel_len=T_CAP,
                      deterministic=True)
    frames = float(jnp.sum(out.mel_lens))
    assert frames > 0, "duration predictor produced no frames"
    audio_seconds = frames * HOP / SR

    def mel_step(c):
        t = bm.taint(texts, c)
        out = model.apply(variables, t, src_lens, max_mel_len=T_CAP,
                          deterministic=True)
        return bm.collapse(out.postnet_mel, c)

    def e2e_step(c):
        t = bm.taint(texts, c)
        out = model.apply(variables, t, src_lens, max_mel_len=T_CAP,
                          deterministic=True)
        wav = voc.apply(voc_vars, out.postnet_mel)
        return bm.collapse(wav, c)

    m_mel = bm.seconds_per_iteration(mel_step, k_hi=17)
    m_e2e = bm.seconds_per_iteration(e2e_step, k_hi=9)

    rtf = m_e2e.seconds / audio_seconds
    print(json.dumps({
        "metric": "e2e_synthesis_rtf_per_chip",
        "value": round(rtf, 6),
        "unit": "s_compute/s_audio",
        "vs_baseline": round(TARGET_RTF / rtf, 3),
        "extra": {
            "mel_only_rtf": round(m_mel.seconds / audio_seconds, 6),
            "mel_frames_per_sec_per_chip": round(frames / m_mel.seconds, 1),
            "audio_seconds_per_batch": round(audio_seconds, 2),
            "batch": B,
            "timing": "in-graph chained slope (see benchmarking.py)",
        },
    }))


if __name__ == "__main__":
    main()
