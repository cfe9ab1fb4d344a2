"""AOT serving export: self-contained compiled TTS programs on disk.

The reference deploys by shipping the Python model code plus torch
checkpoints and re-instantiating everything at load time
(``/root/reference/synthesize.py:116-119``).  This module adds a deployment
story the reference has no analogue of: ``jax.export`` each serving program
(acoustic text→mel per text bucket, vocoder mel→wav per mel bucket, plus the
streaming-window vocoder shape) into serialized StableHLO artifacts with the
trained parameters baked in as constants.  A server then needs only JAX and
the artifact directory — no model classes, no configs, no checkpoint
plumbing — and every shape it can ever run is compiled ahead of time, so
first-request latency has no trace/compile component.

Layout of an artifact directory::

    manifest.json                    # buckets, shapes, dtypes, provenance
    acoustic_L{bucket}.jaxexp        # (B, L) int32 texts + (B,) lens -> dict
    vocoder_T{bucket}.jaxexp         # (B, T, n_mels) -> (B, T*hop)
    vocoder_stream_W{window}.jaxexp  # (1, W, n_mels) -> (1, W*hop)

Exported acoustic programs return a plain dict (``postnet_mel``,
``mel_lens``, ``duration_rounded``, ``pitch_prediction``,
``energy_prediction``) rather than the internal ``ModelOutput`` NamedTuple so
deserialization needs no package types.

``platforms`` defaults to the machine's actual backend; pass e.g.
``("tpu", "cpu")`` to build one artifact servable on both (XLA lowers a
platform ``cond`` around backend-specific ops).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable, Mapping, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

MANIFEST = "manifest.json"


def _export_one(fn: Callable, args: tuple, path: str,
                platforms: Optional[Sequence[str]]) -> None:
    exp = jax_export.export(jax.jit(fn),
                            platforms=tuple(platforms) if platforms else None
                            )(*args)
    with open(path, "wb") as f:
        f.write(exp.serialize())


def export_serving_artifacts(
    out_dir: str,
    model, variables,
    *,
    text_buckets: Sequence[int],
    mel_buckets: Sequence[int],
    batch_size: int = 1,
    max_mel_len: int = 1000,
    generator=None, gen_variables=None,
    stream_chunk: int = 64,
    p_control: float = 1.0, e_control: float = 1.0, d_control: float = 1.0,
    platforms: Optional[Sequence[str]] = None,
    provenance: Optional[Mapping] = None,
) -> dict:
    """Export the full serving surface into ``out_dir``; returns the
    manifest dict.  ``model``/``variables`` are the acoustic model;
    ``generator``/``gen_variables`` (optional) the HiFi-GAN vocoder."""
    os.makedirs(out_dir, exist_ok=True)
    B = int(batch_size)
    # Serialized artifacts must outlive the exporting JAX/libtpu version:
    # Mosaic (Pallas) custom calls carry no compatibility guarantee across
    # versions, so exports always trace the identical-math XLA paths
    # (ops/pallas.use_pallas() reads this env var at trace time).
    prev_pallas = os.environ.get("SMART_TTS_PALLAS")
    os.environ["SMART_TTS_PALLAS"] = "off"
    try:
        return _export_all(out_dir, model, variables, B, text_buckets,
                           mel_buckets, max_mel_len, generator,
                           gen_variables, stream_chunk, p_control,
                           e_control, d_control, platforms, provenance)
    finally:
        if prev_pallas is None:
            os.environ.pop("SMART_TTS_PALLAS", None)
        else:
            os.environ["SMART_TTS_PALLAS"] = prev_pallas


def _export_all(out_dir, model, variables, B, text_buckets, mel_buckets,
                max_mel_len, generator, gen_variables, stream_chunk,
                p_control, e_control, d_control, platforms,
                provenance) -> dict:
    manifest: dict = {
        "format": "jax.export serialized StableHLO",
        "batch_size": B,
        "max_mel_len": int(max_mel_len),
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "controls": {"p": p_control, "e": e_control, "d": d_control},
        "acoustic": [], "vocoder": [], "provenance": dict(provenance or {}),
    }

    def acoustic_fn(texts, src_lens):
        out = model.apply(variables, texts, src_lens,
                          max_mel_len=max_mel_len, p_control=p_control,
                          e_control=e_control, d_control=d_control,
                          deterministic=True)
        return {"postnet_mel": out.postnet_mel, "mel_lens": out.mel_lens,
                "duration_rounded": out.duration_rounded,
                "pitch_prediction": out.pitch_prediction,
                "energy_prediction": out.energy_prediction}

    for L in sorted(set(int(b) for b in text_buckets)):
        name = f"acoustic_L{L}.jaxexp"
        _export_one(
            acoustic_fn,
            (jnp.zeros((B, L), jnp.int32), jnp.ones((B,), jnp.int32)),
            os.path.join(out_dir, name), platforms)
        manifest["acoustic"].append(
            {"file": name, "text_bucket": L,
             "inputs": [f"int32[{B},{L}] texts", f"int32[{B}] src_lens"]})

    if generator is not None:
        n_mels = generator.config.n_mels
        hop = generator.config.hop_length
        manifest["vocoder_hop"] = hop

        def vocoder_fn(mel):
            return generator.apply(gen_variables, mel)

        for T in sorted(set(int(b) for b in mel_buckets)):
            name = f"vocoder_T{T}.jaxexp"
            _export_one(vocoder_fn, (jnp.zeros((B, T, n_mels)),),
                        os.path.join(out_dir, name), platforms)
            manifest["vocoder"].append(
                {"file": name, "mel_bucket": T,
                 "inputs": [f"float32[{B},{T},{n_mels}] mel"]})

        from .vocoder.streaming import mel_receptive_halo
        halo = mel_receptive_halo(generator.config)
        window = int(stream_chunk) + 2 * halo
        name = f"vocoder_stream_W{window}.jaxexp"
        _export_one(vocoder_fn, (jnp.zeros((1, window, n_mels)),),
                    os.path.join(out_dir, name), platforms)
        manifest["streaming"] = {"file": name, "window_frames": window,
                                 "chunk_frames": int(stream_chunk),
                                 "halo_frames": halo}

    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


@dataclass
class _Program:
    call: Callable
    bucket: int


class ExportedTTS:
    """Load an artifact directory and serve text→mel→wav from the
    ahead-of-time compiled programs only (no model classes needed).

    ``synthesize(token_ids)`` picks the smallest covering text bucket, runs
    the acoustic program, picks the smallest covering mel bucket, runs the
    vocoder program, and trims to the predicted length.
    """

    def __init__(self, artifact_dir: str):
        with open(os.path.join(artifact_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        self.batch_size = int(self.manifest["batch_size"])

        def _load(name: str) -> Callable:
            with open(os.path.join(artifact_dir, name), "rb") as f:
                return jax_export.deserialize(f.read()).call

        self._acoustic = sorted(
            (_Program(_load(e["file"]), e["text_bucket"])
             for e in self.manifest["acoustic"]), key=lambda p: p.bucket)
        self._vocoder = sorted(
            (_Program(_load(e["file"]), e["mel_bucket"])
             for e in self.manifest.get("vocoder", [])),
            key=lambda p: p.bucket)
        self.hop = int(self.manifest.get("vocoder_hop", 256))

    @staticmethod
    def _pick(programs: list[_Program], n: int, what: str) -> _Program:
        for p in programs:
            if n <= p.bucket:
                return p
        raise ValueError(
            f"{what} length {n} exceeds the largest exported bucket "
            f"({programs[-1].bucket}); re-export the artifacts with larger "
            f"{what} buckets (truncating silently would drop speech)")

    def acoustic(self, token_ids: np.ndarray) -> dict:
        """(n,) int token ids → acoustic outputs dict (padded to bucket)."""
        ids = np.asarray(token_ids, np.int32).reshape(-1)
        n = ids.shape[0]
        prog = self._pick(self._acoustic, n, "text")
        texts = np.zeros((self.batch_size, prog.bucket), np.int32)
        texts[0, :n] = ids
        lens = np.full((self.batch_size,), 1, np.int32)
        lens[0] = max(n, 1)
        out = prog.call(jnp.asarray(texts), jnp.asarray(lens))
        return jax.tree.map(np.asarray, out)

    def synthesize(self, token_ids: np.ndarray) -> np.ndarray:
        """(n,) int token ids → float32 waveform in [-1, 1]."""
        if not self._vocoder:
            raise ValueError("artifact was exported without a vocoder")
        out = self.acoustic(token_ids)
        t = max(int(out["mel_lens"][0]), 1)
        prog = self._pick(self._vocoder, t, "mel")
        mel = np.zeros((self.batch_size, prog.bucket,
                        out["postnet_mel"].shape[-1]), np.float32)
        mel[0, :t] = out["postnet_mel"][0, :t]
        wav = np.asarray(prog.call(jnp.asarray(mel)))
        return wav[0, : t * self.hop]
