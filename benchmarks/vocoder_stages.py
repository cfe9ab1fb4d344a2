"""Per-stage cost breakdown of the HiFi-GAN V1 generator on the chip.

The vocoder dominated the end-to-end serving budget for hifigan-family
serving (BENCH_r02/r03), so optimizing it needs a map of WHERE the
milliseconds go.  This harness times each upsample stage (LReLU ->
ConvTranspose -> 3-kernel MRF -> mean) as its own jitted program at the
serving shape (B=8, 512 mel frames -> 131072 samples), plus conv_pre /
conv_post, in float32 and bfloat16, for BOTH tail lowerings
(``tail_impl`` plain vs grouped), with the chained-slope method
(``benchmarking.py``) so dispatch/RTT cancels.

Roofline model (revised in round 5 — the round-4 model was wrong twice):

- ONE machine peak (197 TFLOP/s) for both dtypes: XLA's default-precision
  f32 matmul/conv executes as bf16 MXU passes (DESIGN.md §4b), so a
  98 TFLOP/s "f32 peak" was fiction — it made measured f32 stages appear
  to exceed peak.
- ``mxu_floor_ms``: the 128x128 systolic array computes a conv matmul at
  ``(min(Cin,128)/128)·(min(Cout,128)/128)`` utilization (channel-padding
  bound — verified by round-4 data: stage3 at C=32 achieved 11.5 TFLOP/s
  = 197·6.25%, stage2 at C=64 achieved 46.6 = 197·25%·0.95).  The honest
  per-stage floor is each conv's DENSE flops at its OWN achievable
  utilization, not total flops at machine peak.  For the grouped lowering
  the conv shapes change (g·C = 128 full-width tiles, more dense flops),
  so the floor is computed from that impl's actual conv inventory.

``x_over_roofline`` compares measured time against
``max(mxu_floor, bw_floor)``.  Writes
``benchmarks/results/vocoder_stages.json``.

Run: ``python -m benchmarks.vocoder_stages [--batch 8] [--frames 512]``
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "results")
OUT = os.path.join(RESULTS, "vocoder_stages.json")

# Measured machine peak for MXU matmuls in BOTH dtypes: default-precision
# f32 runs bf16 passes on the MXU (DESIGN.md §4b: 183-205 TFLOP/s
# measured for f32-default convs/matmuls).
PEAK_TFLOPS = 197.0
HBM_GBPS = 819.0


def _mxu_time_ms(rows, taps, cin, cout):
    """Dense conv time floor on the 128x128 MXU: dense flops at the
    channel-padding utilization bound."""
    util = (min(cin, 128) / 128.0) * (min(cout, 128) / 128.0)
    flops = 2.0 * rows * taps * cin * cout
    return flops / (PEAK_TFLOPS * 1e12 * util) * 1e3


def _prim1_span(k, d, g):
    """Grouped-tap count of the space-to-depth dilated conv."""
    pad = (k - 1) * d // 2
    es = [b + i * d - pad for b in range(g) for i in range(k)]
    return max(e // g for e in es) - min(e // g for e in es) + 1


def _prim2_span(k, u, p, gi):
    from smart_nar_fast_tts_tpu.vocoder.hifigan import _polyphase_taps
    taps, _, _ = _polyphase_taps(k, u, p)
    es = [a + m for _, m, _ in taps for a in range(gi)]
    return max(e // gi for e in es) - min(e // gi for e in es) + 1


def stage_mxu_floor_ms(cfg, i, impl, B, t_in, c_in, ch, g_in, g_out):
    """Analytic MXU floor for stage i (convT + 18 MRF convs) under the
    given lowering's actual conv shapes."""
    u = cfg.upsample_rates[i]
    k = cfg.upsample_kernel_sizes[i]
    t_out = t_in * u
    total = 0.0
    if impl == "grouped" and (g_in > 1 or g_out > 1):
        # convT: span taps of (g_in·c_in, u·g_in·ch) over t_in/g_in rows
        span = _prim2_span(k, u, (k - u) // 2, g_in)
        total += _mxu_time_ms(B * t_in // g_in, span, g_in * c_in,
                              u * g_in * ch)
        for rk, rd in zip(cfg.resblock_kernel_sizes,
                          cfg.resblock_dilation_sizes):
            for d in rd:                     # convs1 at dilation d
                total += _mxu_time_ms(B * t_out // g_out,
                                      _prim1_span(rk, d, g_out),
                                      g_out * ch, g_out * ch)
                # paired convs2 at dilation 1
                total += _mxu_time_ms(B * t_out // g_out,
                                      _prim1_span(rk, 1, g_out),
                                      g_out * ch, g_out * ch)
    else:
        # lhs-dilated convT touches ~k/u real taps per output
        total += _mxu_time_ms(B * t_out, max(1, k // u), c_in, ch)
        for rk, rd in zip(cfg.resblock_kernel_sizes,
                          cfg.resblock_dilation_sizes):
            for _ in rd:
                total += _mxu_time_ms(B * t_out, rk, ch, ch)   # convs1
                total += _mxu_time_ms(B * t_out, rk, ch, ch)   # convs2
    return total


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--frames", type=int, default=512)
    args = parser.parse_args(argv)

    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from smart_nar_fast_tts_tpu import benchmarking as bm
    from smart_nar_fast_tts_tpu.vocoder import HiFiGANConfig
    from smart_nar_fast_tts_tpu.vocoder.hifigan import (LRELU_SLOPE, Conv1d,
                                                        ConvTranspose1d,
                                                        ResBlock1, _regroup,
                                                        _target_group)

    cfg = HiFiGANConfig()
    B, T0 = args.batch, args.frames

    class Stage(nn.Module):
        """One upsample stage: LReLU -> ConvT -> MRF mean, in either
        lowering; grouped input arrives space-to-depth packed."""
        ch: int
        k: int
        u: int
        dtype: jnp.dtype
        g_in: int = 1
        g_out: int = 1

        @nn.compact
        def __call__(self, x):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            if self.g_in > 1 or self.g_out > 1:
                x = ConvTranspose1d(self.ch, self.k, self.u,
                                    dtype=self.dtype, impl="grouped",
                                    group_in=self.g_in, name="ups")(x)
                x = _regroup(x, self.g_in * self.u, self.g_out, self.ch)
            else:
                x = ConvTranspose1d(self.ch, self.k, self.u,
                                    dtype=self.dtype,
                                    impl=cfg.transpose_impl, name="ups")(x)
            acc = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
                y = ResBlock1(self.ch, rk, tuple(rd), dtype=self.dtype,
                              group=self.g_out, name=f"res_{j}")(x)
                acc = y if acc is None else acc + y
            return acc / jnp.asarray(len(cfg.resblock_kernel_sizes),
                                     self.dtype)

    def stage_list(dtype, impl):
        """(name, module, input_shape, ungrouped_shape, mxu_floor_ms)."""
        out = [("conv_pre", Conv1d(cfg.upsample_initial_channel, 7,
                                   dtype=dtype), (B, T0, cfg.n_mels),
                (B, T0, cfg.n_mels),
                _mxu_time_ms(B * T0, 7, cfg.n_mels,
                             cfg.upsample_initial_channel))]
        t, c_in, g = T0, cfg.upsample_initial_channel, 1
        for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                       cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            g_out = _target_group(ch, t * u) if impl == "grouped" else 1
            mxu = stage_mxu_floor_ms(cfg, i, impl, B, t, c_in, ch, g,
                                     g_out)
            out.append((f"stage{i}_u{u}_c{ch}",
                        Stage(ch=ch, k=k, u=u, dtype=dtype, g_in=g,
                              g_out=g_out),
                        (B, t // max(g, 1), g * c_in), (B, t, c_in), mxu))
            t, c_in, g = t * u, ch, g_out
        post_g = g if impl == "grouped" else 1
        out.append(("conv_post", Conv1d(1, 7, dtype=jnp.float32,
                                        group=post_g),
                    (B, t // post_g, post_g * c_in), (B, t, c_in),
                    _mxu_time_ms(B * t // post_g,
                                 _prim1_span(7, 1, post_g) if post_g > 1
                                 else 7,
                                 post_g * c_in, post_g * 1)))
        return out

    def approx_hbm_bytes(name, ungrouped_shape, ch_out, dtype_bytes):
        """Activations read+written once per conv (weights are tiny);
        identical for both lowerings (grouping is a relabeling)."""
        B_, t, c_in = ungrouped_shape
        if name.startswith("conv_pre") or name.startswith("conv_post"):
            return (B_ * t * c_in + B_ * t * ch_out) * dtype_bytes
        u = int(name.split("_u")[1].split("_")[0])
        t_out = t * u
        conv_t = (B_ * t * c_in + B_ * t_out * ch_out) * dtype_bytes
        mrf = 18 * 2 * B_ * t_out * ch_out * dtype_bytes
        adds = 8 * B_ * t_out * ch_out * dtype_bytes
        return conv_t + mrf + adds

    report = {"batch": B, "mel_frames": T0,
              "backend": jax.default_backend(),
              "peak_tflops": PEAK_TFLOPS, "stages": []}
    for impl in ("plain", "grouped"):
        for dname, dtype in (("float32", jnp.float32),
                             ("bfloat16", jnp.bfloat16)):
            total_ms = 0.0
            for name, mod, shape, ung, mxu_floor_ms in stage_list(dtype,
                                                                  impl):
                x = jnp.asarray(
                    np.random.default_rng(0).standard_normal(shape),
                    jnp.float32)
                variables = mod.init(jax.random.PRNGKey(0), x)

                def step(c, mod=mod, variables=variables, x=x):
                    xi = bm.taint(x, c)
                    return bm.collapse(mod.apply(variables, xi), c)

                m = bm.seconds_per_iteration_autoscaled(step, k_hi=9)
                lowered = jax.jit(mod.apply).lower(variables, x).compile()
                ca = lowered.cost_analysis()
                if isinstance(ca, list):
                    ca = ca[0]
                flops = float(ca.get("flops", 0.0))
                ch_out = (1 if name == "conv_post" else
                          cfg.upsample_initial_channel
                          if name == "conv_pre"
                          else int(name.split("_c")[1]))
                nbytes = approx_hbm_bytes(name, ung, ch_out,
                                          2 if dname == "bfloat16" else 4)
                compute_floor_ms = flops / (PEAK_TFLOPS * 1e12) * 1e3
                bw_floor_ms = nbytes / (HBM_GBPS * 1e9) * 1e3
                roofline = max(mxu_floor_ms, bw_floor_ms)
                ms = m.seconds * 1e3
                total_ms += ms
                report["stages"].append({
                    "stage": name, "impl": impl, "dtype": dname,
                    "input_shape": list(shape),
                    "ms": round(ms, 3),
                    "achieved_tflops": round(flops / m.seconds / 1e12, 1),
                    "compute_floor_ms": round(compute_floor_ms, 3),
                    "mxu_floor_ms": round(mxu_floor_ms, 3),
                    "bw_floor_ms": round(bw_floor_ms, 3),
                    "roofline_ms": round(roofline, 3),
                    "x_over_roofline": round(ms / max(roofline, 1e-9), 2),
                    "k_hi": m.k_hi,
                    "jitter_ms": round(m["jitter_seconds"] * 1e3, 3),
                })
                print(json.dumps(report["stages"][-1]), flush=True)
            report.setdefault("total_ms", {})[f"{impl}_{dname}"] = round(
                total_ms, 2)

    os.makedirs(RESULTS, exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"total_ms": report["total_ms"]}))


if __name__ == "__main__":
    main()
