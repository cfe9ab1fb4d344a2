"""Per-stage cost breakdown of the HiFi-GAN V1 generator on the chip.

The vocoder is ~90% of the end-to-end serving budget (BENCH_r02/r03), so
optimizing it needs a map of WHERE the milliseconds go.  This harness times
each upsample stage (LReLU -> ConvTranspose -> 3-kernel MRF -> mean) as its
own jitted program at the serving shape (B=8, 512 mel frames -> 131072
samples), plus conv_pre / conv_post, in float32 and bfloat16, with the
chained-slope method (``benchmarking.py``) so dispatch/RTT cancels.

For each stage it also reports a roofline estimate: XLA cost_analysis
FLOPs, approximate HBM bytes (activations read+written per conv, weights
once), and the implied compute- and bandwidth-bound floors on a v5e
(98/197 dense TFLOP/s f32/bf16, ~819 GB/s HBM), so the gap to
speed-of-light is attributable per stage.

Writes ``benchmarks/results/vocoder_stages.json``.

Run: ``python -m benchmarks.vocoder_stages [--batch 8] [--frames 512]``
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "results")
OUT = os.path.join(RESULTS, "vocoder_stages.json")

PEAK_TFLOPS = {"float32": 98.0, "bfloat16": 197.0}
HBM_GBPS = 819.0


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--frames", type=int, default=512)
    args = parser.parse_args(argv)

    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from smart_nar_fast_tts_tpu import benchmarking as bm
    from smart_nar_fast_tts_tpu.vocoder import HiFiGANConfig
    from smart_nar_fast_tts_tpu.vocoder.hifigan import (LRELU_SLOPE, Conv1d,
                                                        ConvTranspose1d,
                                                        ResBlock1)
    import flax.linen as nn

    cfg = HiFiGANConfig()
    B, T0 = args.batch, args.frames

    class Stage(nn.Module):
        """One upsample stage: LReLU -> ConvT -> MRF mean."""
        ch: int
        k: int
        u: int
        dtype: jnp.dtype

        @nn.compact
        def __call__(self, x):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(self.ch, self.k, self.u, dtype=self.dtype,
                                impl=cfg.transpose_impl, name="ups")(x)
            acc = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
                y = ResBlock1(self.ch, rk, tuple(rd), dtype=self.dtype,
                              name=f"res_{j}")(x)
                acc = y if acc is None else acc + y
            return acc / jnp.asarray(len(cfg.resblock_kernel_sizes),
                                     self.dtype)

    def stage_list(dtype):
        """(name, module, input_shape) for conv_pre, stages, conv_post."""
        out = [("conv_pre", Conv1d(cfg.upsample_initial_channel, 7,
                                   dtype=dtype), (B, T0, cfg.n_mels))]
        t, c_in = T0, cfg.upsample_initial_channel
        for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                       cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            out.append((f"stage{i}_u{u}_c{ch}",
                        Stage(ch=ch, k=k, u=u, dtype=dtype), (B, t, c_in)))
            t, c_in = t * u, ch
        out.append(("conv_post", Conv1d(1, 7, dtype=jnp.float32),
                    (B, t, c_in)))
        return out

    def approx_hbm_bytes(name, shape, ch_out, dtype_bytes):
        """Activations read+written once per conv (weights are tiny)."""
        B_, t, c_in = shape
        if name.startswith("conv_pre") or name.startswith("conv_post"):
            return (B_ * t * c_in + B_ * t * ch_out) * dtype_bytes
        u = int(name.split("_u")[1].split("_")[0])
        t_out = t * u
        # convT: read (B,t,c_in) write (B,t_out,ch); 18 MRF convs:
        # each read+write (B,t_out,ch); plus residual adds ~6 reads
        conv_t = (B_ * t * c_in + B_ * t_out * ch_out) * dtype_bytes
        mrf = 18 * 2 * B_ * t_out * ch_out * dtype_bytes
        adds = 8 * B_ * t_out * ch_out * dtype_bytes
        return conv_t + mrf + adds

    report = {"batch": B, "mel_frames": T0,
              "backend": jax.default_backend(), "stages": []}
    for dname, dtype in (("float32", jnp.float32),
                         ("bfloat16", jnp.bfloat16)):
        total_ms = 0.0
        for name, mod, shape in stage_list(dtype):
            x = jnp.asarray(
                np.random.default_rng(0).standard_normal(shape),
                jnp.float32)
            variables = mod.init(jax.random.PRNGKey(0), x)

            def step(c, mod=mod, variables=variables, x=x):
                xi = bm.taint(x, c)
                return bm.collapse(mod.apply(variables, xi), c)

            # autoscaled trip count: cheap stages (conv_pre ~0.03 ms) need
            # hundreds of chained iterations before the slope rises clear
            # of dispatch jitter (VERDICT r3 Weak #2: negative stage time)
            m = bm.seconds_per_iteration_autoscaled(step, k_hi=9)
            lowered = jax.jit(mod.apply).lower(variables, x).compile()
            ca = lowered.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            ch_out = (1 if name == "conv_post" else
                      cfg.upsample_initial_channel if name == "conv_pre"
                      else int(name.split("_c")[1]))
            nbytes = approx_hbm_bytes(name, shape,
                                      ch_out, 2 if dname == "bfloat16"
                                      else 4)
            compute_floor_ms = flops / (PEAK_TFLOPS[dname] * 1e12) * 1e3
            bw_floor_ms = nbytes / (HBM_GBPS * 1e9) * 1e3
            ms = m.seconds * 1e3
            total_ms += ms
            report["stages"].append({
                "stage": name, "dtype": dname, "input_shape": list(shape),
                "ms": round(ms, 3),
                "achieved_tflops": round(flops / m.seconds / 1e12, 1),
                "compute_floor_ms": round(compute_floor_ms, 3),
                "bw_floor_ms": round(bw_floor_ms, 3),
                "roofline_ms": round(max(compute_floor_ms, bw_floor_ms),
                                     3),
                "x_over_roofline": round(
                    ms / max(compute_floor_ms, bw_floor_ms, 1e-9), 2),
                "k_hi": m.k_hi,
                "jitter_ms": round(m["jitter_seconds"] * 1e3, 3),
            })
            print(json.dumps(report["stages"][-1]), flush=True)
        report.setdefault("total_ms", {})[dname] = round(total_ms, 2)

    os.makedirs(RESULTS, exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"total_ms": report["total_ms"]}))


if __name__ == "__main__":
    main()
