"""Offline corpus → feature-store preprocessing.

Parity target: reference ``preprocessor/preprocessor.py:16-309``.  Same
on-disk contract — per-utterance ``mel/ pitch/ energy/`` ``.npy`` files
(mel stored time-major ``(T, n_mels)``), ``speakers.json``, ``stats.json``
with ``{pitch,energy}: [min, max, mean, std]``, shuffled ``train.txt`` /
``val.txt`` metadata (``name|speaker|{phones}|raw_text``) — so feature
stores are interchangeable between frameworks.

Differences by design:
- features come from the pure-JAX STFT/mel (batched, any backend) instead
  of the reference's CUDA-only TacotronSTFT (``audio/stft.py:68-70``
  hardcodes ``.cuda()``);
- F0 from the in-repo tracker (``data/pitch.py``) instead of PyWORLD;
- streaming mean/std uses an explicit running accumulator rather than
  sklearn's StandardScaler (identical math).
"""

from __future__ import annotations

import json
import os
import random

import jax.numpy as jnp
import numpy as np

from ..audio.stft import MelSpectrogramConfig, mel_spectrogram_bucketed
from ..config import PreprocessConfig
from .alignment import get_alignment
from .native_f0 import estimate_f0_native as estimate_f0
from .textgrid import read_textgrid
from .wavio import load_wav


class RunningScaler:
    """Streaming mean/std — sklearn ``StandardScaler.partial_fit`` math
    (sum/sumsq accumulation, population std)."""

    def __init__(self):
        self.n = 0
        self.mean = 0.0
        self.m2 = 0.0

    def partial_fit(self, values: np.ndarray) -> None:
        values = np.asarray(values, np.float64).reshape(-1)
        if values.size == 0:
            return
        n_b, mean_b = values.size, values.mean()
        m2_b = ((values - mean_b) ** 2).sum()
        n = self.n + n_b
        delta = mean_b - self.mean
        self.m2 += m2_b + delta ** 2 * self.n * n_b / n
        self.mean += delta * n_b / n
        self.n = n

    @property
    def scale(self) -> float:
        return float(np.sqrt(self.m2 / self.n)) if self.n else 1.0


def remove_outlier(values: np.ndarray) -> np.ndarray:
    """IQR-1.5 filter (reference ``preprocessor.py:289-297``)."""
    values = np.asarray(values)
    p25, p75 = np.percentile(values, 25), np.percentile(values, 75)
    lower = p25 - 1.5 * (p75 - p25)
    upper = p75 + 1.5 * (p75 - p25)
    return values[(values > lower) & (values < upper)]


class Preprocessor:
    def __init__(self, cfg: PreprocessConfig):
        self.cfg = cfg
        a = cfg.audio
        self.sr = a.sampling_rate
        self.hop = a.hop_length
        self.mel_cfg = MelSpectrogramConfig(
            sampling_rate=a.sampling_rate, n_fft=a.n_fft,
            hop_length=a.hop_length, win_length=a.win_length,
            n_mels=a.n_mels, mel_fmin=a.mel_fmin, mel_fmax=a.mel_fmax)
        self.in_dir = cfg.data_path
        self.out_dir = cfg.preprocessed_path

    # ---- per-utterance --------------------------------------------------
    def process_utterance(self, speaker: str, basename: str):
        wav_path = os.path.join(self.in_dir, speaker, f"{basename}.wav")
        text_path = os.path.join(self.in_dir, speaker, f"{basename}.lab")
        tg_path = os.path.join(self.out_dir, "TextGrid", speaker,
                               f"{basename}.TextGrid")

        textgrid = read_textgrid(tg_path)
        phones, durations, start, end = get_alignment(
            textgrid.get_tier_by_name("phones"), self.sr, self.hop)
        text = "{" + " ".join(phones) + "}"
        if start >= end:
            return None
        total = sum(durations)

        wav, _ = load_wav(wav_path, self.sr)
        wav = wav[int(self.sr * start):int(self.sr * end)]

        with open(text_path) as f:
            raw_text = f.readline().strip("\n")

        pitch = estimate_f0(wav, self.sr, self.hop)[:total]
        if np.sum(pitch != 0) <= 1:
            return None

        # shape-bucketed mel: one compiled program per length bucket
        # instead of one per utterance (identical numbers, see
        # audio/stft.py::mel_spectrogram_bucketed)
        mel, energy = mel_spectrogram_bucketed(wav, self.mel_cfg)
        mel = mel[:, :total]                           # (n_mels, T)
        energy = energy[:total]

        if self.cfg.pitch_feature == "phoneme_level":
            pitch = _phoneme_average(pitch, durations, interpolate=True)
        if self.cfg.energy_feature == "phoneme_level":
            energy = _phoneme_average(energy, durations, interpolate=False)

        os.makedirs(os.path.join(self.out_dir, "pitch"), exist_ok=True)
        os.makedirs(os.path.join(self.out_dir, "energy"), exist_ok=True)
        os.makedirs(os.path.join(self.out_dir, "mel"), exist_ok=True)
        np.save(os.path.join(self.out_dir, "pitch",
                             f"{speaker}-pitch-{basename}.npy"), pitch)
        np.save(os.path.join(self.out_dir, "energy",
                             f"{speaker}-energy-{basename}.npy"), energy)
        np.save(os.path.join(self.out_dir, "mel",
                             f"{speaker}-mel-{basename}.npy"), mel.T)

        return ("|".join([basename, speaker, text, raw_text]),
                remove_outlier(pitch), remove_outlier(energy), mel.shape[1])

    # ---- corpus ---------------------------------------------------------
    def _tasks(self) -> tuple[dict[str, int], list[tuple[str, str]]]:
        speakers: dict[str, int] = {}
        tasks: list[tuple[str, str]] = []
        for i, speaker in enumerate(sorted(os.listdir(self.in_dir))):
            spk_dir = os.path.join(self.in_dir, speaker)
            if not os.path.isdir(spk_dir):
                continue
            speakers[speaker] = i
            for wav_name in sorted(os.listdir(spk_dir)):
                if not wav_name.endswith(".wav"):
                    continue
                basename = wav_name[:-4]
                tg_path = os.path.join(self.out_dir, "TextGrid", speaker,
                                       f"{basename}.TextGrid")
                if os.path.exists(tg_path):
                    tasks.append((speaker, basename))
        return speakers, tasks

    def build_from_path(self, seed: int = 1234,
                        num_workers: int = 1) -> list[str]:
        """Offline pass over the corpus.  ``num_workers > 1`` fans
        utterances out over a process pool (the reference is strictly
        serial, ``preprocessor.py:66-89``); the corpus-wide statistics are
        accumulated in deterministic task order either way, so parallel
        and serial runs produce identical ``stats.json``."""
        out: list[str] = []
        n_frames = 0
        pitch_scaler, energy_scaler = RunningScaler(), RunningScaler()
        speakers, tasks = self._tasks()

        if num_workers > 1:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor
            ctx = mp.get_context("spawn")
            with ProcessPoolExecutor(
                    max_workers=num_workers, mp_context=ctx,
                    initializer=_init_worker,
                    initargs=(self.cfg,)) as ex:
                results = list(ex.map(_run_task, tasks, chunksize=4))
        else:
            results = [self.process_utterance(s, b) for s, b in tasks]

        for ret in results:
            if ret is None:
                continue
            info, pitch, energy, n = ret
            out.append(info)
            pitch_scaler.partial_fit(pitch)
            energy_scaler.partial_fit(energy)
            n_frames += n

        pitch_mean = pitch_scaler.mean if self.cfg.pitch_normalization else 0.0
        pitch_std = pitch_scaler.scale if self.cfg.pitch_normalization else 1.0
        energy_mean = (energy_scaler.mean
                       if self.cfg.energy_normalization else 0.0)
        energy_std = (energy_scaler.scale
                      if self.cfg.energy_normalization else 1.0)

        pitch_min, pitch_max = self._normalize_dir(
            os.path.join(self.out_dir, "pitch"), pitch_mean, pitch_std)
        energy_min, energy_max = self._normalize_dir(
            os.path.join(self.out_dir, "energy"), energy_mean, energy_std)

        with open(os.path.join(self.out_dir, "speakers.json"), "w") as f:
            json.dump(speakers, f)
        with open(os.path.join(self.out_dir, "stats.json"), "w") as f:
            json.dump({
                "pitch": [float(pitch_min), float(pitch_max),
                          float(pitch_mean), float(pitch_std)],
                "energy": [float(energy_min), float(energy_max),
                           float(energy_mean), float(energy_std)],
            }, f)

        rng = random.Random(seed)
        rng.shuffle(out)
        val_size = min(self.cfg.val_size, max(0, len(out) - 1))
        with open(os.path.join(self.out_dir, "train.txt"), "w",
                  encoding="utf-8") as f:
            f.write("".join(m + "\n" for m in out[val_size:]))
        with open(os.path.join(self.out_dir, "val.txt"), "w",
                  encoding="utf-8") as f:
            f.write("".join(m + "\n" for m in out[:val_size]))
        return out

    @staticmethod
    def _normalize_dir(dirname: str, mean: float, std: float
                       ) -> tuple[float, float]:
        vmin, vmax = np.inf, -np.inf
        for filename in sorted(os.listdir(dirname)):
            path = os.path.join(dirname, filename)
            values = (np.load(path) - mean) / std
            np.save(path, values)
            vmin = min(vmin, values.min())
            vmax = max(vmax, values.max())
        return float(vmin), float(vmax)


def _phoneme_average(values: np.ndarray, durations: list[int],
                     interpolate: bool) -> np.ndarray:
    """Frame values → per-phoneme means; for pitch, unvoiced gaps are first
    linearly interpolated (reference ``preprocessor.py:197-227``)."""
    values = np.asarray(values, np.float64).copy()
    if interpolate:
        nz = np.nonzero(values)[0]
        if len(nz):
            values = np.interp(np.arange(len(values)), nz, values[nz])
    out = np.zeros(len(durations), dtype=values.dtype)
    pos = 0
    for i, d in enumerate(durations):
        if d > 0 and pos < len(values):
            out[i] = values[pos:pos + d].mean()
        pos += d
    return out


# ---------------------------------------------------------------------------
# process-pool workers (module-level for spawn pickling)
# ---------------------------------------------------------------------------

_WORKER_PRE: "Preprocessor | None" = None


def _init_worker(cfg: PreprocessConfig) -> None:
    """Pin workers to the CPU backend (offline feature extraction is a
    host-side job; N workers sharing one accelerator would contend) and
    build one Preprocessor per process."""
    global _WORKER_PRE
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    _WORKER_PRE = Preprocessor(cfg)


def _run_task(task: tuple[str, str]):
    speaker, basename = task
    return _WORKER_PRE.process_utterance(speaker, basename)
