"""Scaled multi-speaker synthetic corpus with ground-truth alignments.

VERDICT r4 Next #2: every quality table in rounds 1-4 rested on a
96-utterance single-speaker corpus.  This generator scales the evidence
base: N speakers x M utterances of formant-synthesized pseudo-speech with

- per-SPEAKER identity: base F0 (100-240 Hz), F0 range, formant scale
  (vocal-tract length), speaking rate, breathiness — so the acoustic
  model's speaker embedding has something real to learn;
- per-UTTERANCE prosody: F0 declination, per-phone accents, vibrato,
  lognormal duration jitter, loudness variation — so the variance
  adaptor's pitch/energy/duration predictors see realistic spread;
- per-PHONE structure: vowels are harmonic stacks shaped by 3-formant
  resonance envelopes (formant frequencies scaled per speaker),
  fricatives are spectrally-shaped noise, stops are burst+closure,
  nasals are low-passed harmonics — so text→mel is a real function;
- ground-truth TextGrids (the corpus IS its own aligner oracle).

No real speech exists in this environment (standing constraint); realism
here means statistical shape — duration/pitch/energy distributions and
speaker variation — not human voices.  The output tree is exactly what
``cli.preprocess`` consumes (raw/<spk>/utt.wav + .lab,
preprocessed/TextGrid/<spk>/utt.TextGrid), mirroring the reference's MFA
corpus layout (ref: preprocessor/preprocessor.py:53-150).

Run: ``python -m benchmarks.corpus --root /tmp/corpus --utts 1200``
"""

from __future__ import annotations

import argparse
import os

import numpy as np

SR = 22050

# vowels: (F1, F2, F3) Hz at formant_scale=1 — canonical adult values
VOWELS = {
    "AA1": (730, 1090, 2440), "AE1": (660, 1720, 2410),
    "AH0": (640, 1190, 2390), "EH1": (530, 1840, 2480),
    "IY1": (270, 2290, 3010), "OW1": (570, 840, 2410),
    "UW1": (300, 870, 2240), "AO1": (570, 840, 2410),
}
# consonants: synthesis class + class-specific params
CONSONANTS = {
    "S":  ("noise", 5000, 9000),     # band center lo/hi Hz
    "SH": ("noise", 2000, 6000),
    "F":  ("noise", 1500, 8000),
    "M":  ("nasal", 250, 0),         # nasal murmur cutoff
    "N":  ("nasal", 350, 0),
    "L":  ("approx", 360, 1300),     # F1/F2-ish of the lateral
    "R":  ("approx", 310, 1060),
    "T":  ("stop", 4000, 8000),      # burst band
    "K":  ("stop", 1500, 4000),
}
PHONES = list(VOWELS) + list(CONSONANTS)


def speaker_params(s: int, rng: np.random.Generator) -> dict:
    """Deterministic per-speaker identity (seeded off the corpus rng)."""
    return {
        "f0_base": float(rng.uniform(100.0, 240.0)),
        "f0_range": float(rng.uniform(0.08, 0.22)),     # rel declination
        "formant_scale": float(rng.uniform(0.85, 1.2)),
        "rate": float(rng.uniform(0.8, 1.3)),
        "breath": float(rng.uniform(0.001, 0.006)),
        "gain": float(rng.uniform(0.22, 0.32)),
    }


def _formant_env(freqs_hz: np.ndarray, formants, scale: float
                 ) -> np.ndarray:
    """Amplitude envelope: sum of 3 resonances evaluated at freqs_hz."""
    amp = np.zeros_like(freqs_hz)
    for f, bw, g in zip(formants, (90.0, 120.0, 160.0), (1.0, 0.63, 0.35)):
        fc = f * scale
        amp += g / (1.0 + ((freqs_hz - fc) / bw) ** 2)
    return amp


def _shaped_noise(n: int, lo: float, hi: float,
                  rng: np.random.Generator) -> np.ndarray:
    """White noise band-limited to [lo, hi] Hz via rFFT masking."""
    x = rng.standard_normal(n)
    spec = np.fft.rfft(x)
    f = np.fft.rfftfreq(n, 1.0 / SR)
    mask = ((f >= lo) & (f <= hi)).astype(np.float64)
    # soft edges so the burst doesn't ring
    return np.fft.irfft(spec * mask, n) * 2.0


def synth_utterance(entries, spk: dict, rng: np.random.Generator
                    ) -> np.ndarray:
    """entries = [(start_s, end_s, phone)] (sil included) → waveform."""
    total = entries[-1][1]
    n = int(total * SR)
    wav = spk["breath"] * rng.standard_normal(n)

    # utterance-level F0 plan: declination + vibrato
    f0_start = spk["f0_base"] * (1.0 + spk["f0_range"])
    f0_end = spk["f0_base"] * (1.0 - spk["f0_range"])
    t_all = np.arange(n) / SR
    f0_track = np.interp(t_all, [0.0, total], [f0_start, f0_end])
    f0_track *= 1.0 + 0.01 * np.sin(2 * np.pi * 5.3 * t_all)

    for s, e, p in entries:
        if p == "sil":
            continue
        i0, i1 = int(s * SR), min(int(e * SR), n)
        m = i1 - i0
        if m <= 0:
            continue
        seg_t = np.arange(m) / SR
        env = np.minimum(1.0, np.minimum(seg_t / 0.012,
                                         (seg_t[-1] - seg_t) / 0.012
                                         + 1e-6))
        if p in VOWELS:
            accent = 1.0 + float(rng.uniform(-0.08, 0.12))
            f0 = f0_track[i0:i1] * accent
            phase = 2 * np.pi * np.cumsum(f0) / SR
            x = np.zeros(m)
            f0m = float(f0.mean())
            for h in range(1, int(4800.0 / max(f0m, 50.0)) + 1):
                a = _formant_env(np.asarray([h * f0m]), VOWELS[p],
                                 spk["formant_scale"])[0]
                a *= 1.0 / (1.0 + 0.12 * h)       # glottal rolloff
                x += a * np.sin(h * phase)
            wav[i0:i1] += spk["gain"] * env * x
        else:
            kind, a1, a2 = CONSONANTS[p]
            if kind == "noise":
                wav[i0:i1] += 0.45 * spk["gain"] * env * _shaped_noise(
                    m, a1 * spk["formant_scale"],
                    a2 * spk["formant_scale"], rng)
            elif kind == "stop":
                nb = min(m, int(0.025 * SR))       # burst then closure
                burst = _shaped_noise(nb, a1, a2, rng)
                ramp = np.exp(-np.arange(nb) / (0.006 * SR))
                wav[i0:i0 + nb] += 0.8 * spk["gain"] * burst * ramp
            else:                                   # nasal / approximant
                accent = 1.0 + float(rng.uniform(-0.06, 0.06))
                f0 = f0_track[i0:i1] * accent
                phase = 2 * np.pi * np.cumsum(f0) / SR
                x = np.zeros(m)
                f0m = float(f0.mean())
                cutoff = a1 * spk["formant_scale"]
                for h in range(1, int(3000.0 / max(f0m, 50.0)) + 1):
                    a = 1.0 / (1.0 + (h * f0m / max(cutoff, 100.0)) ** 2)
                    if kind == "approx" and a2:
                        a += 0.4 * _formant_env(
                            np.asarray([h * f0m]), (a1, a2, 2500.0),
                            spk["formant_scale"])[0]
                    x += a * np.sin(h * phase)
                wav[i0:i1] += 0.7 * spk["gain"] * env * x
    peak = np.max(np.abs(wav))
    if peak > 0.97:
        wav *= 0.97 / peak
    return wav.astype(np.float32)


def _write_textgrid(path: str, entries, total: float) -> None:
    lines = [
        'File type = "ooTextFile"', 'Object class = "TextGrid"', "",
        "xmin = 0", f"xmax = {total}", "tiers? <exists>", "size = 1",
        "item []:", "    item [1]:",
        '        class = "IntervalTier"',
        '        name = "phones"', "        xmin = 0",
        f"        xmax = {total}",
        f"        intervals: size = {len(entries)}"]
    for k, (s, e, p) in enumerate(entries):
        lines += [f"        intervals [{k + 1}]:",
                  f"            xmin = {s}",
                  f"            xmax = {e}",
                  f'            text = "{p}"']
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def sample_entries(spk: dict, rng: np.random.Generator,
                   n_phones: int | None = None):
    """Random phone sequence with class-conditional durations."""
    if n_phones is None:
        n_phones = int(rng.integers(5, 17))
    t0 = float(rng.uniform(0.05, 0.1))
    entries = [(0.0, t0, "sil")]
    prev_vowel = False
    for _ in range(n_phones):
        # crude phonotactics: alternate-ish vowels and consonants
        if prev_vowel and rng.random() < 0.75:
            p = list(CONSONANTS)[int(rng.integers(len(CONSONANTS)))]
        else:
            p = list(VOWELS)[int(rng.integers(len(VOWELS)))]
        prev_vowel = p in VOWELS
        base = 0.14 if p in VOWELS else 0.08
        d = base / spk["rate"] * float(rng.lognormal(0.0, 0.25))
        d = float(np.clip(d, 0.045, 0.35))
        entries.append((t0, t0 + d, p))
        t0 += d
    entries.append((t0, t0 + float(rng.uniform(0.05, 0.1)), "sil"))
    return entries


def make_scaled_corpus(root: str, n_utts: int = 1200,
                       n_speakers: int = 8, seed: int = 0):
    """Write raw/<spk>/uttN.{wav,lab} + preprocessed TextGrids; returns
    (in_dir, out_dir, meta dict)."""
    rng = np.random.default_rng(seed)
    in_dir = os.path.join(root, "raw")
    out_dir = os.path.join(root, "preprocessed")
    speakers = {f"spk{s}": speaker_params(s, rng)
                for s in range(n_speakers)}
    total_audio = 0.0
    for u in range(n_utts):
        sname = f"spk{u % n_speakers}"
        spk = speakers[sname]
        spk_dir = os.path.join(in_dir, sname)
        tg_dir = os.path.join(out_dir, "TextGrid", sname)
        os.makedirs(spk_dir, exist_ok=True)
        os.makedirs(tg_dir, exist_ok=True)

        entries = sample_entries(spk, rng)
        wav = synth_utterance(entries, spk, rng)
        total_audio += entries[-1][1]

        from smart_nar_fast_tts_tpu.data.wavio import save_wav
        base = f"utt{u:05d}"
        save_wav(os.path.join(spk_dir, f"{base}.wav"), wav, SR)
        with open(os.path.join(spk_dir, f"{base}.lab"), "w") as f:
            f.write(f"scaled synthetic utterance {u} ({sname})")
        _write_textgrid(os.path.join(tg_dir, f"{base}.TextGrid"),
                        entries, entries[-1][1])
    meta = {
        "n_utts": n_utts, "n_speakers": n_speakers, "seed": seed,
        "total_audio_s": round(total_audio, 1),
        "phone_inventory": PHONES,
        "speakers": speakers,
        "generator": "benchmarks/corpus.py make_scaled_corpus "
                     "(3-formant vowels, shaped-noise consonants, "
                     "per-speaker F0/formant/rate identity)",
    }
    return in_dir, out_dir, meta


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root", required=True)
    parser.add_argument("--utts", type=int, default=1200)
    parser.add_argument("--speakers", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    import json
    in_dir, out_dir, meta = make_scaled_corpus(
        args.root, args.utts, args.speakers, args.seed)
    with open(os.path.join(args.root, "corpus_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps({"in_dir": in_dir, "out_dir": out_dir,
                      "n_utts": meta["n_utts"],
                      "total_audio_s": meta["total_audio_s"]}))


if __name__ == "__main__":
    main()
