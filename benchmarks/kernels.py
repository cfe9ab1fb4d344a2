"""Per-kernel microbenchmarks: Pallas TPU kernels vs their XLA oracles.

Times each hot-op kernel (SURVEY.md §7.4.3) against the identical-math
pure-JAX path at model-scale shapes, on whatever the default backend is
(meaningful numbers on real TPU; on CPU this only smokes the dispatch).

    python -m benchmarks.kernels [--iters 50]

Prints one JSON line per kernel:
    {"metric": "kernel_<name>_speedup", "value": <oracle_ms/pallas_ms>, ...}

Shapes (reference-scale, batch 48 per train.yaml:5):
  flash attention      decoder self-attn  B=48 H=2 Lq=Lk=896 D=128
  alignment attention  mel→txt cross-attn B=48 H=2 T=896 L=128 D=128
  gaussian upsampling  B=48 L=128 T=896 D=256
  fused log-mel        B=8 × 10.4 s waveform (229376 samples)
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _time(fn, args, n_iter: int) -> float:
    import jax
    out = jax.block_until_ready(fn(*args))            # compile
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter * 1e3  # ms


def bench_flash_attention(n_iter: int, scale: int = 1) -> dict:
    import jax
    import jax.numpy as jnp
    from smart_nar_fast_tts_tpu.ops.pallas import use_pallas, pallas_interpret
    from smart_nar_fast_tts_tpu.ops.pallas.attention import (
        _attention_reference, flash_attention)

    B, H, L, D = 48 // scale, 2, 896 // scale, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    lens = rng.integers(L // 2, L + 1, size=B)
    valid = jnp.asarray(np.arange(L)[None, :] < lens[:, None])

    oracle = jax.jit(_attention_reference)
    kern = jax.jit(lambda q, k, v, m: flash_attention(
        q, k, v, m, 256, 256, pallas_interpret() or not use_pallas()))
    t_o = _time(oracle, (q, k, v, valid), n_iter)
    t_k = _time(kern, (q, k, v, valid), n_iter)
    return {"metric": "kernel_flash_attention_speedup",
            "value": round(t_o / t_k, 3), "unit": "x vs XLA oracle",
            "oracle_ms": round(t_o, 3), "pallas_ms": round(t_k, 3)}


def bench_alignment_attention(n_iter: int, scale: int = 1) -> dict:
    import jax
    import jax.numpy as jnp
    from smart_nar_fast_tts_tpu.ops.pallas import use_pallas, pallas_interpret
    from smart_nar_fast_tts_tpu.ops.pallas.alignment import (
        _alignment_reference, alignment_attention)

    B, H, T, L, D = 48 // scale, 2, 896 // scale, 128 // min(scale, 4), 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    src = jnp.asarray(rng.integers(L // 2, L + 1, size=B), jnp.int32)
    mel = jnp.asarray(rng.integers(T // 2, T + 1, size=B), jnp.int32)
    valid = jnp.arange(L)[None, :] < src[:, None]

    oracle = jax.jit(lambda *a: _alignment_reference(*a, 0.2))
    interp = pallas_interpret() or not use_pallas()
    kern = jax.jit(lambda *a: alignment_attention(*a, 0.2, 256, interp))
    args = (q, k, v, valid, src, mel)
    t_o = _time(oracle, args, n_iter)
    t_k = _time(kern, args, n_iter)
    return {"metric": "kernel_alignment_attention_speedup",
            "value": round(t_o / t_k, 3), "unit": "x vs XLA oracle",
            "oracle_ms": round(t_o, 3), "pallas_ms": round(t_k, 3)}


def bench_gaussian_upsample(n_iter: int, scale: int = 1) -> dict:
    import jax
    import jax.numpy as jnp
    from smart_nar_fast_tts_tpu.ops.pallas import use_pallas, pallas_interpret
    from smart_nar_fast_tts_tpu.ops.pallas.upsample import (
        gaussian_upsample_banded)
    from smart_nar_fast_tts_tpu.ops.upsample import gaussian_upsample

    B, L, T, D = 48 // scale, 128 // min(scale, 4), 896 // scale, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    dur = jnp.asarray(rng.uniform(3, 10, size=(B, L)), jnp.float32)
    pv = jnp.ones((B, L), jnp.float32)

    oracle = jax.jit(lambda x, d, p: gaussian_upsample(x, d, T, p)[0])
    interp = pallas_interpret() or not use_pallas()
    kern = jax.jit(lambda x, d, p: gaussian_upsample_banded(
        x, d, T, p, interpret=interp)[0])
    t_o = _time(oracle, (x, dur, pv), n_iter)
    t_k = _time(kern, (x, dur, pv), n_iter)
    return {"metric": "kernel_gaussian_upsample_speedup",
            "value": round(t_o / t_k, 3), "unit": "x vs XLA oracle",
            "oracle_ms": round(t_o, 3), "pallas_ms": round(t_k, 3)}


def bench_fused_log_mel(n_iter: int, scale: int = 1) -> dict:
    import jax
    import jax.numpy as jnp
    from smart_nar_fast_tts_tpu.audio.stft import (MelSpectrogramConfig,
                                                   mel_spectrogram)
    from smart_nar_fast_tts_tpu.ops.pallas import use_pallas, pallas_interpret
    from smart_nar_fast_tts_tpu.ops.pallas.stft import fused_log_mel

    cfg = MelSpectrogramConfig()
    B, n_samples = max(1, 8 // scale), 896 * 256 // scale
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.uniform(-1, 1, size=(B, n_samples)), jnp.float32)

    oracle = jax.jit(lambda y: mel_spectrogram(y, cfg))
    interp = pallas_interpret() or not use_pallas()
    kern = jax.jit(lambda y: fused_log_mel(y, cfg, interpret=interp))
    t_o = _time(oracle, (y,), n_iter)
    t_k = _time(kern, (y,), n_iter)
    return {"metric": "kernel_fused_log_mel_speedup",
            "value": round(t_o / t_k, 3), "unit": "x vs XLA oracle",
            "oracle_ms": round(t_o, 3), "pallas_ms": round(t_k, 3)}


def main() -> None:
    import os

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="1/8-scale shapes, 2 iters (CPU interpret smoke)")
    args = ap.parse_args()
    scale = 8 if args.smoke else 1
    if args.smoke:
        args.iters = 2

    benches = {
        "flash_attention": bench_flash_attention,
        "alignment_attention": bench_alignment_attention,
        "gaussian_upsample": bench_gaussian_upsample,
        "fused_log_mel": bench_fused_log_mel,
    }
    for name, fn in benches.items():
        if args.only and name not in args.only:
            continue
        print(json.dumps(fn(args.iters, scale)), flush=True)


if __name__ == "__main__":
    main()
