"""Streaming serving from AOT artifacts: TTFA + parity, measured.

VERDICT round-3 Missing #3 closed the code path (``ExportedTTS.stream``
consumes the exported ``vocoder_stream_W*.jaxexp`` window program); this
harness is the measurement: export the committed trained flagship +
vocoder into an artifact dir, then

- assert concatenated stream chunks == ``synthesize`` (reduction-order
  tolerance) on the exported programs themselves;
- report wall-clock time-to-first-audio through the AOT path (probe +
  acoustic + ONE vocoder window) vs time-to-last-audio of the full
  ``synthesize`` — both as observed by a client of the artifact dir
  (includes dispatch/transport; the in-graph compute-only TTFA lives in
  ``bench.py`` extra.streaming).

Writes ``benchmarks/results/streaming_aot.json``.

Run: ``python -m benchmarks.streaming_aot [--out_dir DIR]``
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "results")
OUT = os.path.join(RESULTS, "streaming_aot.json")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default=None,
                    help="artifact dir (default: temp)")
    ap.add_argument("--chunk", type=int, default=64)
    args = ap.parse_args(argv)

    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from benchmarks.train_flagship import (META_JSON, PARAMS_NPZ,
                                           load_variables_npz)
    from smart_nar_fast_tts_tpu.config import (FeatureStats, ModelConfig,
                                               PreprocessConfig)
    from smart_nar_fast_tts_tpu.models import FastSpeech2Align
    from smart_nar_fast_tts_tpu.serving import (ExportedTTS,
                                                export_serving_artifacts)
    from smart_nar_fast_tts_tpu.vocoder import HiFiGANConfig, HiFiGANGenerator

    with open(META_JSON) as f:
        meta = json.load(f)
    pre = PreprocessConfig(stats=FeatureStats(**meta["stats"]))
    model = FastSpeech2Align(ModelConfig(), pre)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
        jnp.asarray([8], jnp.int32), mels=jnp.zeros((1, 8, 80)),
        mel_lens=jnp.asarray([8], jnp.int32),
        p_targets=jnp.zeros((1, 8)), e_targets=jnp.zeros((1, 8)))
    variables = load_variables_npz(PARAMS_NPZ, variables)

    voc = HiFiGANGenerator(HiFiGANConfig())
    voc_vars = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 80)))
    voc_npz = os.path.join(RESULTS, "vocoder_params.npz")
    voc_src = "random_init"
    if os.path.exists(voc_npz):
        voc_vars = load_variables_npz(voc_npz, voc_vars)
        voc_src = os.path.relpath(voc_npz)

    out_dir = args.out_dir or tempfile.mkdtemp(prefix="smart_tts_aot_")
    t0 = time.perf_counter()
    # VERDICT r4 Next #7: one export covers a short utterance AND a
    # ≥30 s long-form one (4096-frame capacity) — TTFA should stay ~flat
    # with utterance length while full-synthesis wall grows
    export_serving_artifacts(
        out_dir, model, variables, text_buckets=(64, 256),
        mel_buckets=(512, 1000, 4096), batch_size=1, max_mel_len=4096,
        generator=voc, gen_variables=voc_vars, stream_chunk=args.chunk,
        provenance={"params": os.path.relpath(PARAMS_NPZ),
                    "vocoder": voc_src})
    export_s = time.perf_counter() - t0

    tts = ExportedTTS(out_dir)
    inv = np.asarray(meta["phone_ids"], np.int32)
    rng = np.random.default_rng(0)

    def best_of(f, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    sr = 22050
    chunk_audio_s = args.chunk * tts.hop / sr
    scenarios = {}
    for label, n_phones in (("short", 48), ("long", 224)):
        ids = rng.choice(inv, size=n_phones).astype(np.int32)

        # warm both paths (first call per program pays backend compile of
        # the deserialized StableHLO)
        wav_full = tts.synthesize(ids)
        list(tts.stream(ids))

        # parity on the exported programs
        chunks = list(tts.stream(ids))
        wav_stream = np.concatenate(chunks)
        assert wav_stream.shape == wav_full.shape
        np.testing.assert_allclose(wav_stream, wav_full, atol=1e-5)

        # chunk cadence: inter-chunk production times over one pass —
        # sustained real-time streaming needs every gap < chunk audio
        gaps, t_prev = [], time.perf_counter()
        for _ in tts.stream(ids):
            now = time.perf_counter()
            gaps.append(now - t_prev)
            t_prev = now

        ttfa_s = best_of(lambda: next(iter(tts.stream(ids))))
        tla_s = best_of(lambda: tts.synthesize(ids))
        t_frames = int(tts.acoustic(ids)["mel_lens"][0])
        audio_s = t_frames * tts.hop / sr
        scenarios[label] = {
            "n_phones": n_phones,
            "utterance_frames": t_frames,
            "utterance_audio_s": round(audio_s, 2),
            "n_chunks": len(chunks),
            "ttfa_wall_ms": round(ttfa_s * 1e3, 1),
            "full_synthesize_wall_ms": round(tla_s * 1e3, 1),
            "ttfa_speedup_vs_full": round(tla_s / ttfa_s, 2),
            "chunk_gap_ms": {
                "first": round(gaps[0] * 1e3, 1),
                "median_steady": round(float(np.median(gaps[1:])) * 1e3, 1)
                if len(gaps) > 1 else None,
                "max_steady": round(float(np.max(gaps[1:])) * 1e3, 1)
                if len(gaps) > 1 else None},
            "chunk_audio_ms": round(chunk_audio_s * 1e3, 1),
            "realtime_sustainable": bool(
                len(gaps) > 1
                and float(np.max(gaps[1:])) < chunk_audio_s),
            "stream_equals_synthesize": True,
        }
        print(json.dumps({label: scenarios[label]}), flush=True)

    report = {
        "backend": jax.default_backend(),
        "artifact_dir": out_dir,
        "export_seconds": round(export_s, 1),
        "params": f"{os.path.relpath(PARAMS_NPZ)}@{meta['steps']} "
                  f"+ vocoder:{voc_src}",
        "chunk_frames": tts.stream_chunk,
        "halo_frames": tts.stream_halo,
        "scenarios": scenarios,
        "ttfa_flat_long_vs_short": round(
            scenarios["long"]["ttfa_wall_ms"]
            / scenarios["short"]["ttfa_wall_ms"], 2),
        "note": "wall-clock through the artifact loader includes "
                "dispatch/transport (remote-attached chips add ~2 RTTs); "
                "compute-only TTFA is bench.py extra.streaming",
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
