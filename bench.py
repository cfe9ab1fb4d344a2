"""Headline benchmark: END-TO-END serving RTF (text -> waveform) per chip.

BASELINE.md north star: synthesis RTF < 0.01 on one TPU chip.

Serving is modeled the way this framework actually serves — *bucketed*:

  stage A  text -> mel, one jitted program at the full frame capacity
           (output length is unknown before the model runs);
  stage B  the default vocoder family, jitted per mel-length bucket and
           fed the batch's bucket-cap slice — so the generator never
           burns cycles on frames past the batch's real maximum length.

The default family is decided on data, not vibes: the run reads
``benchmarks/results/vocoder_quality.json`` (held-out resynthesis on the
scaled 8-speaker corpus, 96 val utts) and serves whichever family its
weighted decision score picks (round 5: HiFi-GAN — Vocos wins mel-L1 by
a hair but loses MR-STFT 1.74 vs 1.22 and F0-RMSE 74 vs 37 Hz).  The
other family remains fully supported and is measured every run under
``extra.<family>``; the serving surface exports either.

e2e time = slope(A) + slope(B); the host-side bucket pick between the two
dispatches is a max() over an (8,) int array and is pipelined away in a
real server.  The previous single-fused-program number is still reported
(``fused_fullcap_rtf``) for comparison, as is a bfloat16 serving variant
(``bf16/*``) with its waveform error vs the f32 path.

Timing methodology: on this remote-attached chip ``block_until_ready``
resolves at dispatch acknowledgement, NOT device completion (round 1's
numbers were inflated ~250x by this).  We therefore measure with
``smart_nar_fast_tts_tpu.benchmarking``: k iterations chained in-graph with
true data dependencies, one scalar fetched to host, per-iteration time
taken as the slope between two trip counts so RTT/dispatch overhead
cancels.

Audio seconds are the valid frames produced at hop 256 / 22.05 kHz.
Parameters: the committed trained flagship (``benchmarks/results/
flagship_params.npz``, written by ``benchmarks.train_flagship`` from a
5k-step run on the chip) loads by default, with bench texts drawn from the
trained phone inventory; ``SMART_TTS_BENCH_CKPT=<orbax dir | npz>``
overrides, and ``SMART_TTS_BENCH_CKPT=''`` (empty) forces random-init with
a duration-bias of ~6.7 frames/phoneme (the round-2 methodology).

``extra.long`` measures one 256-phoneme utterance at a 4096-frame decoder
capacity — past the reference's hard 1000-frame ceiling (SURVEY §5.7).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}
with vs_baseline = target_rtf / measured_rtf (>1 = beating the target).
"extra" carries the secondary numbers BASELINE.md asks to report:
mel-only RTF and synthesis mel-frames/sec/chip (BASELINE.md row 5) — plus
streaming serving latency (time-to-first-audio at B=1 via StreamingVocoder:
one mel forward + one chunk+2·halo vocoder window).
"""

import json
import os

import numpy as np

TARGET_RTF = 0.01
HOP, SR = 256, 22050
B, L, T_CAP = 8, 128, 1000
MEL_BUCKETS = (128, 256, 384, 512, 640, 768, 1000)
# long-form serving shape (VERDICT round-2 item 2): one utterance past the
# reference's 1000-frame ceiling, decoder attention + vocoder at 4096
L_LONG, T_LONG = 256, 4096
FLAGSHIP_NPZ = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "results",
                            "flagship_params.npz")
FLAGSHIP_META = os.path.join(os.path.dirname(FLAGSHIP_NPZ),
                             "flagship_meta.json")


def _bucket(n: int) -> int:
    return next((b for b in MEL_BUCKETS if n <= b), MEL_BUCKETS[-1])


def main():
    import time
    t_start = time.time()
    # Soft wall-clock deadline: the headline numbers (two-stage e2e RTF,
    # frames/s/chip) are always measured; the comparison extras (fused
    # program, streaming, bf16 variant) are skipped when cold-compiling
    # them over a remote chip would push past the budget, so the driver
    # always gets the one JSON line even under a harness timeout.
    deadline_s = float(os.environ.get("SMART_TTS_BENCH_DEADLINE", "1200"))

    def time_left() -> float:
        return deadline_s - (time.time() - t_start)

    from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from smart_nar_fast_tts_tpu import benchmarking as bm
    from smart_nar_fast_tts_tpu.config import (
        FeatureStats, ModelConfig, PreprocessConfig)
    from smart_nar_fast_tts_tpu.models import FastSpeech2Align
    from smart_nar_fast_tts_tpu.vocoder import HiFiGANConfig, HiFiGANGenerator

    # parameter source: explicit env override > committed trained flagship
    # (benchmarks/train_flagship.py writes f16-stored params + the corpus
    # stats + trained phone inventory) > random init with duration bias
    ckpt_env = os.environ.get("SMART_TTS_BENCH_CKPT")
    ckpt_dir = ckpt_env if ckpt_env is not None else (
        FLAGSHIP_NPZ if os.path.exists(FLAGSHIP_NPZ) else "")
    meta = None
    if ckpt_dir.endswith(".npz") and os.path.exists(FLAGSHIP_META):
        with open(FLAGSHIP_META) as f:
            meta = json.load(f)

    if meta is not None:
        pre = PreprocessConfig(stats=FeatureStats(**meta["stats"]))
    else:
        pre = PreprocessConfig(stats=FeatureStats(
            pitch_min=71.0, pitch_max=799.8, pitch_mean=207.4,
            pitch_std=46.5, energy_min=0.018, energy_max=314.9,
            energy_mean=37.3, energy_std=25.1))

    rng = np.random.default_rng(0)
    if meta is not None:
        # texts drawn from the phones the model was trained on — random
        # vocabulary ids would hit untrained embeddings
        inv = np.asarray(meta["phone_ids"], np.int32)
        texts = jnp.asarray(rng.choice(inv, size=(B, L)), jnp.int32)
        texts_long = jnp.asarray(rng.choice(inv, size=(1, L_LONG)),
                                 jnp.int32)
    else:
        texts = jnp.asarray(rng.integers(2, 300, size=(B, L)), jnp.int32)
        texts_long = jnp.asarray(rng.integers(2, 300, size=(1, L_LONG)),
                                 jnp.int32)
    src_lens = jnp.asarray(
        np.clip(rng.integers(L - 32, L + 1, size=(B,)), 1, L), jnp.int32)
    src_lens_long = jnp.asarray([L_LONG], jnp.int32)

    def build(compute_dtype):
        model = FastSpeech2Align(ModelConfig(compute_dtype=compute_dtype),
                                 pre)
        voc = HiFiGANGenerator(HiFiGANConfig(compute_dtype=compute_dtype))
        # init on the TRAINING path so the param tree includes the
        # MelEncoder — checkpoints store the full tree, and the npz loader
        # maps leaves by flatten order
        variables = model.init(
            jax.random.PRNGKey(0), texts[:1], src_lens[:1],
            mels=jnp.zeros((1, 8, 80)),
            mel_lens=jnp.asarray([8], jnp.int32),
            p_targets=jnp.zeros((1, 8)), e_targets=jnp.zeros((1, 8)))
        params_src = "random_init+duration_bias"
        if ckpt_dir.endswith(".npz"):
            from benchmarks.train_flagship import load_variables_npz
            variables = load_variables_npz(ckpt_dir, variables)
            steps = meta["steps"] if meta else "?"
            params_src = (f"checkpoint:{os.path.relpath(ckpt_dir)}"
                          f"@{steps} (trained flagship, f16-stored)")
        elif ckpt_dir:
            from smart_nar_fast_tts_tpu.training.checkpoint import (
                CheckpointManager)
            from smart_nar_fast_tts_tpu.training.schedule import (
                make_optimizer)
            from smart_nar_fast_tts_tpu.training.state import (
                create_train_state)
            from smart_nar_fast_tts_tpu.config import OptimizerConfig
            state = create_train_state(
                variables, make_optimizer(OptimizerConfig(), 256))
            mngr = CheckpointManager(ckpt_dir)
            state, _ = mngr.restore(state)
            mngr.close()
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            params_src = f"checkpoint:{ckpt_dir}@{int(state.step)}"
        else:
            # ~6.7 frames/phoneme: log(d+1) bias so round(exp(logd)-1)≈6-7
            params = variables["params"]
            dp = params["variance_adaptor"]["duration_predictor"][
                "linear_layer"]
            dp["bias"] = dp["bias"] + np.log(7.7)
            variables = {"params": params,
                         "batch_stats": variables.get("batch_stats", {})}
        voc_vars = voc.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 16, 80)))
        voc_npz = os.path.join(os.path.dirname(FLAGSHIP_NPZ),
                               "vocoder_params.npz")
        if os.path.exists(voc_npz):
            from benchmarks.train_flagship import load_variables_npz
            voc_vars = load_variables_npz(voc_npz, voc_vars)
            params_src += (" + vocoder:"
                           f"{os.path.relpath(voc_npz)}"
                           f" ({_vocoder_provenance('vocoder')})")
        return model, variables, voc, voc_vars, params_src

    def _vocoder_provenance(stem: str) -> str:
        """Steps/note from <stem>_meta.json so the reported label carries
        the checkpoint's actual provenance (ADVICE r3: a mid-run smoke
        checkpoint must not silently read as 'GAN-trained')."""
        meta_path = os.path.join(os.path.dirname(FLAGSHIP_NPZ),
                                 f"{stem}_meta.json")
        if not os.path.exists(meta_path):
            return "GAN-trained, provenance unknown (no meta)"
        with open(meta_path) as f:
            vm = json.load(f)
        s = f"GAN-trained {vm.get('steps', '?')} steps"
        if vm.get("note"):
            s += f", {vm['note']}"
        return s

    def build_vocos(compute_dtype):
        """Default serving family: Vocos from the promoted checkpoint's
        recorded config (ADVICE r3: never assume default VocosConfig)."""
        from smart_nar_fast_tts_tpu.vocoder import (VocosConfig,
                                                    VocosGenerator)
        vmeta_path = os.path.join(os.path.dirname(FLAGSHIP_NPZ),
                                  "vocos_meta.json")
        kw = {}
        if os.path.exists(vmeta_path):
            with open(vmeta_path) as f:
                _vm = json.load(f)
            if isinstance(_vm.get("config"), dict):
                kw = dict(_vm["config"])
        kw["compute_dtype"] = compute_dtype
        vgen = VocosGenerator(VocosConfig(**kw))
        vvars = vgen.init(jax.random.PRNGKey(2), jnp.zeros((1, 16, 80)))
        vsrc = "random_init"
        vocos_npz = os.path.join(os.path.dirname(FLAGSHIP_NPZ),
                                 "vocos_params.npz")
        if os.path.exists(vocos_npz):
            from benchmarks.train_flagship import load_variables_npz
            vvars = load_variables_npz(vocos_npz, vvars)
            vsrc = (f"checkpoint:{os.path.relpath(vocos_npz)}"
                    f" ({_vocoder_provenance('vocos')})")
        return vgen, vvars, vsrc

    model, variables, voc, voc_vars, params_src = build("float32")
    vgen, vvars, vocos_src = build_vocos("float32")

    # headline family = the vocoder_quality.json decision (round 5: the
    # weighted rule — mel_l1/0.25 + mrstft/1.0 + f0_rmse/20 — picks the
    # family; on the scaled 8-speaker corpus HiFi-GAN wins on F0/MR-STFT
    # where round 4's 4-utt table had chosen Vocos on mel-L1 alone)
    best_family, vq_note = "vocos", "no vocoder_quality.json"
    vq_path = os.path.join(os.path.dirname(FLAGSHIP_NPZ),
                           "vocoder_quality.json")
    if os.path.exists(vq_path):
        with open(vq_path) as f:
            _vq = json.load(f)
        best_family = _vq.get("best_by_decision_score", best_family)
        fams = _vq.get("families", {})
        vq_note = ", ".join(
            f"{k}: score {v.get('decision_score')}"
            for k, v in fams.items())
    _families = {"hifigan": (voc, voc_vars), "vocos": (vgen, vvars)}
    head_gen, head_vars = _families.get(best_family, (vgen, vvars))
    alt_name = "vocos" if best_family == "hifigan" else "hifigan"
    alt_gen, alt_vars = _families[alt_name]

    # audio-seconds denominator + the bucket (one real forward to host).
    # Jitted: an eager flax apply on a remote-attached chip dispatches
    # every op individually over the tunnel — minutes of RTT for one
    # forward that jit runs in one program.
    mel_fwd = jax.jit(lambda v, t, s: model.apply(
        v, t, s, max_mel_len=T_CAP, deterministic=True))
    out = mel_fwd(variables, texts, src_lens)
    mel_lens = np.asarray(out.mel_lens)
    frames = float(mel_lens.sum())
    assert frames > 0, "duration predictor produced no frames"
    audio_seconds = frames * HOP / SR
    cap = _bucket(int(mel_lens.max()))
    mel_f32 = jnp.asarray(np.asarray(out.postnet_mel)[:, :cap])

    # -- stage A: text -> mel at full capacity ------------------------------
    def mel_step(c):
        t = bm.taint(texts, c)
        o = model.apply(variables, t, src_lens, max_mel_len=T_CAP,
                        deterministic=True)
        return bm.collapse(o.postnet_mel, c)

    # -- stage B: bucketed DEFAULT vocoder (family decided by
    # vocoder_quality.json's weighted score — see above) --------------------
    def voc_step(c):
        m = bm.taint(mel_f32, c)
        wav = head_gen.apply(head_vars, m)
        return bm.collapse(wav, c)

    # -- round-1 comparison: one fused program at full capacity -------------
    def fused_step(c):
        t = bm.taint(texts, c)
        o = model.apply(variables, t, src_lens, max_mel_len=T_CAP,
                        deterministic=True)
        wav = head_gen.apply(head_vars, o.postnet_mel)
        return bm.collapse(wav, c)

    m_mel = bm.seconds_per_iteration(mel_step, k_hi=17)
    m_voc = bm.seconds_per_iteration(voc_step, k_hi=17)

    e2e = m_mel.seconds + m_voc.seconds
    rtf = e2e / audio_seconds
    extra = {
        "vocoder_family": f"{best_family} (default by vocoder_quality"
                          f".json decision scores — {vq_note}; the other "
                          "family stays selectable and is measured below)",
        "mel_only_rtf": round(m_mel.seconds / audio_seconds, 6),
        "vocoder_rtf": round(m_voc.seconds / audio_seconds, 6),
        "mel_frames_per_sec_per_chip": round(frames / m_mel.seconds, 1),
        "mel_bucket_cap": cap,
        "audio_seconds_per_batch": round(audio_seconds, 2),
        "batch": B,
        "params": params_src + " + " + vocos_src,
        "timing": "in-graph chained slope (see benchmarking.py), "
                  "bucketed two-stage serving",
    }

    # -- the non-default family as a serving variant ------------------------
    if time_left() > 180:
        def alt_step(c):
            m = bm.taint(mel_f32, c)
            wav = alt_gen.apply(alt_vars, m)
            return bm.collapse(wav, c)

        m_alt = bm.seconds_per_iteration(alt_step, k_hi=9)
        e2e_h = m_mel.seconds + m_alt.seconds
        extra[alt_name] = {
            "e2e_rtf": round(e2e_h / audio_seconds, 6),
            "vs_baseline": round(TARGET_RTF * audio_seconds / e2e_h, 3),
            "vocoder_rtf": round(m_alt.seconds / audio_seconds, 6),
        }
    else:
        extra[alt_name] = "skipped (deadline)"

    if time_left() > 120:
        m_fused = bm.seconds_per_iteration(fused_step, k_hi=9)
        extra["fused_fullcap_rtf"] = round(m_fused.seconds / audio_seconds,
                                           6)
    else:
        extra["fused_fullcap_rtf"] = "skipped (deadline)"

    # -- long-form serving: one utterance past the reference's 1000-frame
    # ceiling (decoder attention + vocoder at T_LONG) -------------------------
    if time_left() > 240:
        fwd_long = jax.jit(lambda v, t, s: model.apply(
            v, t, s, max_mel_len=T_LONG, deterministic=True))
        out_l = fwd_long(variables, texts_long, src_lens_long)
        n_l = int(np.asarray(out_l.mel_lens)[0])
        audio_l = n_l * HOP / SR
        long_caps = [c for c in (1024, 2048, 3072, T_LONG) if c >= n_l]
        cap_l = long_caps[0] if long_caps else T_LONG
        mel_l = jnp.asarray(np.asarray(out_l.postnet_mel)[:, :cap_l])

        def mel_long_step(c):
            t = bm.taint(texts_long, c)
            o = model.apply(variables, t, src_lens_long,
                            max_mel_len=T_LONG, deterministic=True)
            return bm.collapse(o.postnet_mel, c)

        def voc_long_step(c):
            m = bm.taint(mel_l, c)
            return bm.collapse(head_gen.apply(head_vars, m), c)

        m_mel_l = bm.seconds_per_iteration(mel_long_step, k_hi=9)
        m_voc_l = bm.seconds_per_iteration(voc_long_step, k_hi=9)
        e2e_l = m_mel_l.seconds + m_voc_l.seconds
        extra["long"] = {
            "rtf": round(e2e_l / audio_l, 6),
            "vs_baseline": round(TARGET_RTF * audio_l / e2e_l, 3),
            "phonemes": L_LONG, "mel_cap": T_LONG,
            "frames": n_l, "audio_seconds": round(audio_l, 2),
            "voc_bucket": cap_l,
            "mel_ms": round(m_mel_l.seconds * 1e3, 2),
            "voc_ms": round(m_voc_l.seconds * 1e3, 2),
        }
    else:
        extra["long"] = "skipped (deadline)"

    # -- streaming serving: time-to-first-audio at B=1 -----------------------
    # TTFA = one B=1 mel forward (stage A must finish before vocoding in the
    # two-stage design) + one StreamingVocoder window (chunk + 2·halo frames).
    if time_left() > 180:
        from smart_nar_fast_tts_tpu.vocoder.streaming import receptive_halo
        STREAM_CHUNK = 64
        halo = receptive_halo(head_gen.config)
        window = STREAM_CHUNK + 2 * halo
        mel_win = mel_f32[:1, :window]

        def mel1_step(c):
            t = bm.taint(texts[:1], c)
            o = model.apply(variables, t, src_lens[:1], max_mel_len=T_CAP,
                            deterministic=True)
            return bm.collapse(o.postnet_mel, c)

        def voc_win_step(c):
            m = bm.taint(mel_win, c)
            wav = head_gen.apply(head_vars, m)
            return bm.collapse(wav, c)

        # autoscaled: the Vocos window at B=1 is tens of microseconds —
        # far below the dispatch-jitter floor of a fixed 17-trip slope
        m_mel1 = bm.seconds_per_iteration_autoscaled(mel1_step, k_hi=17)
        m_win = bm.seconds_per_iteration_autoscaled(voc_win_step, k_hi=17)
        ttfa_ms = (m_mel1.seconds + m_win.seconds) * 1e3
        chunk_audio_s = STREAM_CHUNK * HOP / SR
        extra["streaming"] = {
            # device-compute TTFA: slope timing cancels dispatch+RTT by
            # construction, so a client's observed first-audio latency
            # adds ~2 dispatches of transport on top (setup-dependent;
            # ~26 ms each through this dev tunnel, ~10 us co-located).
            "ttfa_compute_ms": round(ttfa_ms, 2),
            "chunk_frames": STREAM_CHUNK,
            "halo_frames": halo,
            "steady_state_rtf": round(m_win.seconds / chunk_audio_s, 6),
            "chunk_audio_ms": round(chunk_audio_s * 1e3, 1),
            "mel_b1_ms": round(m_mel1.seconds * 1e3, 2),
            "voc_window_ms": round(m_win.seconds * 1e3, 2),
        }
    else:
        extra["streaming"] = "skipped (deadline)"

    # -- bf16 serving variant (acoustic + default vocoder) -------------------
    if time_left() > 240:
        model16, vars16, *_ = build("bfloat16")
        vgen16, vvars16, _ = build_vocos("bfloat16")
        mel16 = mel_f32                 # same mel input: isolate voc dtype
        wav_b16 = np.asarray(jax.jit(vgen16.apply)(vvars16, mel16),
                             np.float32)
        # pure dtype-error measurement: same params through the f32 twin
        f32_twin = np.asarray(jax.jit(vgen.apply)(
            jax.tree.map(lambda x: x.astype(np.float32), vvars16),
            mel_f32))
        rel = float(np.linalg.norm(wav_b16 - f32_twin)
                    / (np.linalg.norm(f32_twin) + 1e-9))

        def mel16_step(c):
            t = bm.taint(texts, c)
            o = model16.apply(vars16, t, src_lens, max_mel_len=T_CAP,
                              deterministic=True)
            return bm.collapse(o.postnet_mel, c)

        def voc16_step(c):
            m = bm.taint(mel16, c)
            wav = vgen16.apply(vvars16, m)
            return bm.collapse(wav, c)

        m_mel16 = bm.seconds_per_iteration(mel16_step, k_hi=17)
        m_voc16 = bm.seconds_per_iteration(voc16_step, k_hi=17)
        e2e16 = m_mel16.seconds + m_voc16.seconds
        extra["bf16"] = {
            "family": "vocos",
            "e2e_rtf": round(e2e16 / audio_seconds, 6),
            "vs_baseline": round(TARGET_RTF * audio_seconds / e2e16, 3),
            "waveform_rel_l2_vs_f32": round(rel, 5),
        }
    else:
        extra["bf16"] = "skipped (deadline)"

    print(json.dumps({
        "metric": "e2e_synthesis_rtf_per_chip",
        "value": round(rtf, 6),
        "unit": "s_compute/s_audio",
        "vs_baseline": round(TARGET_RTF / rtf, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
