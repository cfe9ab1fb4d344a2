"""Backward-pass stage probe: where does the train step's missing MFU go?

VERDICT r4 Next #3: the acoustic FORWARD runs at 68-72% of the v5e MXU
peak, but the full train step (fwd+bwd+Adam, B=48 T=896) measured only
36-39% — and the round-4 stage probes covered the forward only.  This
harness extends the chained-slope methodology to the backward:

- per-SEGMENT fwd and fwd+bwd programs (TxtEncoder, MelEncoder alignment
  stack, VarianceAdaptor incl. gaussian upsample, MelDecoder, PostNet
  with train-mode BN, FastSpeech2Loss incl. guided attention, optimizer
  update) each timed with ``benchmarking.seconds_per_iteration`` and
  FLOP-counted with ``compiled.cost_analysis()`` — so each row carries
  its own achieved TFLOP/s;
- WHOLE-program rows (fwd+loss value, grad, optimizer-only, full train
  step) at the same shapes, so the segment rows can be checked against
  the totals they are supposed to explain.

The per-segment backward uses a scalar sum reduction as the loss proxy:
``grad(lambda p, x: sum(module.apply(p, x)))`` runs exactly the module's
reverse-mode compute (the cotangent entering the module is dense ones,
same arithmetic shape as in the real step).  Each program consumes the
chain carry through a runtime-zero input perturbation (benchmarking.py
``taint``) so chained iterations cannot be CSE'd or overlapped.

Writes ``benchmarks/results/train_probe.json``.
Run: ``python -m benchmarks.train_probe``
"""

from __future__ import annotations

import json
import os

import numpy as np

B, L, T = 48, 128, 896
OUT = os.path.join(os.path.dirname(__file__), "results",
                   "train_probe.json")
PEAK_TFLOPS = 197.0          # v5e MXU (f32 default rides the bf16 array)


def _cost_flops(jitted, *args) -> float:
    cost = jitted.lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def main() -> None:
    global B, L, T
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes for CPU smoke runs")
    ap.add_argument("--compile_only", action="store_true",
                    help="trace/compile/run each program once, skip "
                         "timing (CI smoke)")
    args = ap.parse_args()
    if args.tiny:
        B, L, T = 2, 8, 32

    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from smart_nar_fast_tts_tpu import benchmarking as bm
    from smart_nar_fast_tts_tpu.config import (FeatureStats, ModelConfig,
                                               OptimizerConfig,
                                               PreprocessConfig)
    from smart_nar_fast_tts_tpu.models import (FastSpeech2Align,
                                               FastSpeech2Loss)
    from smart_nar_fast_tts_tpu.models.encoders import (MelDecoder,
                                                        MelEncoder,
                                                        TxtEncoder)
    from smart_nar_fast_tts_tpu.models.layers import PostNet
    from smart_nar_fast_tts_tpu.models.variance import VarianceAdaptor
    from smart_nar_fast_tts_tpu.training import (Batch, create_train_state,
                                                 make_optimizer,
                                                 make_train_step)
    from smart_nar_fast_tts_tpu.training.step import _forward_loss

    pre = PreprocessConfig(stats=FeatureStats(
        pitch_min=71.0, pitch_max=799.8, pitch_mean=207.4, pitch_std=46.5,
        energy_min=0.018, energy_max=314.9, energy_mean=37.3,
        energy_std=25.1))
    cfg = ModelConfig()
    model = FastSpeech2Align(cfg, pre)
    loss_fn = FastSpeech2Loss(pre, guided_sigma=cfg.guided_sigma)

    rng = np.random.default_rng(0)
    batch = Batch(
        texts=jnp.asarray(rng.integers(2, 300, (B, L)), jnp.int32),
        src_lens=jnp.full((B,), L, jnp.int32),
        mels=jnp.asarray(rng.normal(size=(B, T, 80)), jnp.float32),
        mel_lens=jnp.full((B,), T, jnp.int32),
        pitch=jnp.asarray(rng.uniform(-1, 1, (B, T)), jnp.float32),
        energy=jnp.asarray(rng.uniform(0, 2, (B, T)), jnp.float32))
    variables = model.init(
        jax.random.PRNGKey(0), batch.texts, batch.src_lens,
        mels=batch.mels, mel_lens=batch.mel_lens,
        p_targets=batch.pitch, e_targets=batch.energy)
    params, bstats = variables["params"], variables["batch_stats"]

    results = []

    def measure(name, fn_c, flops, k_hi=9):
        """fn_c: (f32 carry) -> output pytree, consuming the carry via
        taint internally so chained iterations stay serialized."""
        jitted = jax.jit(fn_c)

        def step(c):
            return bm.collapse(jitted(c), c)

        if args.compile_only:
            out = jax.block_until_ready(jitted(jnp.float32(0.0)))
            del out
            row = {"program": name, "ms": None, "flops": flops,
                   "compile_only": True}
            results.append(row)
            print(json.dumps(row), flush=True)
            return 1.0
        m = bm.seconds_per_iteration_autoscaled(step, k_hi=k_hi)
        row = {"program": name, "ms": round(m.seconds * 1e3, 4),
               "flops": flops,
               "achieved_tflops": round(flops / m.seconds / 1e12, 1),
               "mxu_peak_fraction": round(
                   flops / m.seconds / 1e12 / PEAK_TFLOPS, 3),
               "k_hi": int(m.k_hi)}
        results.append(row)
        print(json.dumps(row), flush=True)
        return m.seconds

    src_valid = jnp.ones((B, L), bool)
    mel_valid = jnp.ones((B, T), bool)
    h_txt = jnp.asarray(rng.normal(size=(B, L, 256)), jnp.float32)
    m80 = jnp.asarray(rng.normal(size=(B, T, 80)), jnp.float32)
    dur = jnp.full((B, L), T // L, jnp.float32)
    h_mel = jnp.asarray(rng.normal(size=(B, T, 256)), jnp.float32)

    def itaint(ints, c):
        return ints + (c < jnp.float32(-1e30)).astype(ints.dtype)

    # ---- per-segment fwd and fwd+bwd ----------------------------------
    txt = TxtEncoder(cfg)
    tv = {"params": params["txt_encoder"]}
    enc = MelEncoder(cfg)
    ev = {"params": params["mel_encoder"]}
    va = VarianceAdaptor(cfg, pre.stats)
    vv = {"params": params["variance_adaptor"]}
    dec = MelDecoder(cfg)
    dv = {"params": params["mel_decoder"]}
    post = PostNet()
    pv = {"params": params["postnet"], "batch_stats": bstats["postnet"]}

    def va_outs(p, x):
        out = va.apply({"params": p}, x, src_valid, T,
                       mel_valid=mel_valid, pitch_target=batch.pitch,
                       energy_target=batch.energy, duration_target=dur)
        return sum(jnp.sum(o) for o in
                   (out.x, out.pitch_prediction, out.energy_prediction,
                    out.log_duration_prediction) if o is not None)

    def post_out(p, x):
        out, _ = post.apply(
            {"params": p, "batch_stats": pv["batch_stats"]}, x,
            deterministic=False, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        return jnp.sum(out)

    # loss (incl. guided attention): fwd + bwd wrt the model predictions
    out0 = model.apply(variables, batch.texts, batch.src_lens,
                       mels=batch.mels, mel_lens=batch.mel_lens,
                       p_targets=batch.pitch, e_targets=batch.energy,
                       deterministic=True)
    out0 = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a)) if a is not None else None,
        out0)

    def loss_of(tup):
        mel_p, post_p, align = tup
        o = out0._replace(mel=mel_p, postnet_mel=post_p, alignments=align)
        return loss_fn(o, batch.mels, batch.pitch, batch.energy).total

    segs = [
        ("txt_encoder",
         lambda c: txt.apply(tv, itaint(batch.texts, c), src_valid),
         lambda c: jax.grad(lambda p: jnp.sum(txt.apply(
             {"params": p}, itaint(batch.texts, c), src_valid))
         )(tv["params"])),
        ("mel_encoder_align",
         lambda c: enc.apply(ev, bm.taint(h_txt, c), batch.mels,
                             src_valid, mel_valid)[0],
         lambda c: jax.grad(lambda p, xx: jnp.sum(enc.apply(
             {"params": p}, xx, batch.mels, src_valid, mel_valid)[0])
         )(ev["params"], bm.taint(h_txt, c))),
        ("variance_adaptor+upsample",
         lambda c: va.apply(vv, bm.taint(h_txt, c), src_valid, T,
                            mel_valid=mel_valid,
                            pitch_target=batch.pitch,
                            energy_target=batch.energy,
                            duration_target=dur)[:4],
         lambda c: jax.grad(va_outs)(vv["params"],
                                     bm.taint(h_txt, c))),
        ("mel_decoder",
         lambda c: dec.apply(dv, bm.taint(h_mel, c), mel_valid),
         lambda c: jax.grad(lambda p, xx: jnp.sum(dec.apply(
             {"params": p}, xx, mel_valid)))(dv["params"],
                                             bm.taint(h_mel, c))),
        ("postnet_trainBN",
         lambda c: post.apply(pv, bm.taint(m80, c), deterministic=False,
                              mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(0)})[0],
         lambda c: jax.grad(post_out)(pv["params"], bm.taint(m80, c))),
        ("loss_incl_guided",
         lambda c: loss_of((bm.taint(out0.mel, c), out0.postnet_mel,
                            out0.alignments)),
         lambda c: jax.grad(loss_of)((bm.taint(out0.mel, c),
                                      out0.postnet_mel,
                                      out0.alignments))),
    ]

    c0 = jnp.float32(0.0)
    for name, fwd, bwd in segs:
        flops_f = _cost_flops(jax.jit(fwd), c0)
        flops_b = _cost_flops(jax.jit(bwd), c0)
        s_f = measure(f"{name}/fwd", fwd, flops_f)
        s_b = measure(f"{name}/fwd+bwd", bwd, flops_b)
        if args.compile_only:
            continue
        if s_b <= s_f:
            # fwd and fwd+bwd both below the timing-jitter floor (only
            # happens for trivially small programs like the bare loss):
            # a subtraction would fabricate a negative time (VERDICT r3
            # Weak #2 class of error) — report the non-measurement
            row = {"program": f"{name}/bwd_derived", "ms": None,
                   "note": "fwd+bwd measured <= fwd; both below the "
                           "jitter floor, derived bwd not reportable"}
        else:
            row = {"program": f"{name}/bwd_derived",
                   "ms": round((s_b - s_f) * 1e3, 4),
                   "flops": flops_b - flops_f,
                   "achieved_tflops": round(
                       (flops_b - flops_f) / (s_b - s_f) / 1e12, 1),
                   "mxu_peak_fraction": round(
                       (flops_b - flops_f) / (s_b - s_f) / 1e12
                       / PEAK_TFLOPS, 3)}
        results.append(row)
        print(json.dumps(row), flush=True)

    # ---- whole-program rows -------------------------------------------
    tx = make_optimizer(OptimizerConfig(), 256)
    state = create_train_state(jax.tree.map(jnp.array, variables), tx)
    key = jax.random.PRNGKey(2)

    def fwd_loss(c):
        b = batch._replace(mels=bm.taint(batch.mels, c))
        return _forward_loss(model, loss_fn, state.params,
                             state.batch_stats, b, key, True)[0]

    measure("full/fwd+loss", fwd_loss,
            _cost_flops(jax.jit(fwd_loss), c0))

    def full_grad(c):
        b = batch._replace(mels=bm.taint(batch.mels, c))
        return jax.grad(lambda p: _forward_loss(
            model, loss_fn, p, state.batch_stats, b, key, True)[0]
        )(state.params)

    measure("full/grad", full_grad,
            _cost_flops(jax.jit(full_grad), c0), k_hi=5)

    grads0 = jax.jit(full_grad)(c0)
    grads0 = jax.tree.map(jnp.array, grads0)

    def opt_update(c):
        scale = (c < jnp.float32(-1e30)).astype(jnp.float32) + 1.0
        g = jax.tree.map(lambda a: a * scale, grads0)
        return state.apply_gradients(g, state.batch_stats).params

    measure("full/optimizer_update", opt_update,
            _cost_flops(jax.jit(opt_update), c0))

    # full train step — chained state dependency (donated buffers make the
    # while_loop carry approach inapplicable; same method as flops.py)
    import time
    step_fn = make_train_step(model, loss_fn)
    flops_step = _cost_flops(step_fn, state, batch, key)
    box = [state]

    def run(n):
        losses = None
        for _ in range(n):
            box[0], losses = step_fn(box[0], batch, key)
        return float(losses.total)

    run(1)
    if args.compile_only:
        print(json.dumps({"program": "full/train_step",
                          "compile_only": True}), flush=True)
        return
    t_lo = t_hi = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run(1)
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(9)
        t_hi = min(t_hi, time.perf_counter() - t0)
    s = (t_hi - t_lo) / 8
    row = {"program": "full/train_step", "ms": round(s * 1e3, 4),
           "flops": flops_step,
           "achieved_tflops": round(flops_step / s / 1e12, 1),
           "mxu_peak_fraction": round(
               flops_step / s / 1e12 / PEAK_TFLOPS, 3)}
    results.append(row)
    print(json.dumps(row), flush=True)

    with open(OUT, "w") as f:
        json.dump({"chip": "TPU v5e", "shapes": {"B": B, "L": L, "T": T},
                   "peak_tflops": PEAK_TFLOPS,
                   "method": "chained-slope seconds (benchmarking.py) + "
                             "XLA cost_analysis flops; per-segment bwd "
                             "via grad of sum-reduction",
                   "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
