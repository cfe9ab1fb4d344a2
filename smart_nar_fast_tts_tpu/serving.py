"""AOT serving export: self-contained compiled TTS programs on disk.

The reference deploys by shipping the Python model code plus torch
checkpoints and re-instantiating everything at load time
(``/root/reference/synthesize.py:116-119``).  This module adds a deployment
story the reference has no analogue of: ``jax.export`` each serving program
into serialized StableHLO artifacts, with the trained parameters stored ONCE
as plain arrays (``params.npz``) and fed to every program as inputs —
weights-as-data.  A server then needs only JAX and the artifact directory —
no model classes, no configs, no checkpoint plumbing — and every shape it
can ever run is compiled ahead of time, so first-request latency has no
trace/compile component.

Layout of an artifact directory::

    manifest.json                  # buckets, shapes, dtypes, provenance
    params.npz                     # all weights, one copy (a%05d / v%05d)
    probe_L{L}.jaxexp              # (leaves.., texts, lens[, spk]) -> frames
    acoustic_L{L}_T{T}.jaxexp      # (leaves.., texts, lens[, spk]) -> dict
    vocoder_T{T}.jaxexp            # (leaves.., (B, T, n_mels)) -> (B, T*hop)
    vocoder_stream_W{W}.jaxexp     # (leaves.., (1, W, n_mels)) -> (1, W*hop)

Long-form serving: the per-text-bucket *probe* program returns the predicted
total frame count (cheap — everything past the duration predictor is dead
code and pruned by the compiler), so :class:`ExportedTTS` picks the smallest
``(text_bucket, mel_cap)`` acoustic program that fits and never truncates
speech at the reference's 1000-frame ceiling.

Multi-speaker models (``ModelConfig.multi_speaker``) export programs with a
``speakers (B,) int32`` input; ``ExportedTTS.synthesize(ids, speaker=k)``
threads it through (the reference reads ``--speaker_id`` but never registers
the flag, ref synthesize.py:122 vs :81-102).

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
PARAMS_FILE = "params.npz"
# frame capacity of the probe programs: duration_rounded is exact at any
# capacity (computed before the length regulator clips), so the smallest
# practical cap keeps the dead decoder/postnet cheap to trace
_PROBE_CAP = 8


def _export_one(fn: Callable, args: tuple, path: str,
                platforms: Optional[Sequence[str]]) -> None:
    exp = jax_export.export(jax.jit(fn),
                            platforms=tuple(platforms) if platforms else None
                            )(*args)
    with open(path, "wb") as f:
        f.write(exp.serialize())


def _flatten(variables) -> tuple[list, object]:
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    return leaves, treedef


def export_serving_artifacts(
    out_dir: str,
    model, variables,
    *,
    text_buckets: Sequence[int],
    mel_buckets: Sequence[int],
    batch_size: int = 1,
    max_mel_len: int = 1000,
    mel_caps: Optional[Sequence[int]] = None,
    generator=None, gen_variables=None,
    stream_chunk: int = 64,
    p_control: float = 1.0, e_control: float = 1.0, d_control: float = 1.0,
    platforms: Optional[Sequence[str]] = None,
    provenance: Optional[Mapping] = None,
) -> dict:
    """Export the full serving surface into ``out_dir``; returns the
    manifest dict.  ``model``/``variables`` are the acoustic model;
    ``generator``/``gen_variables`` (optional) the HiFi-GAN vocoder.
    ``mel_caps`` are the acoustic frame capacities exported per text bucket
    (default: just ``max_mel_len``); parameters are stored once in
    ``params.npz``, never duplicated per program."""
    if int(stream_chunk) < 1:
        # mirrors StreamingVocoder.__init__ — catching it at export time
        # beats a range() error at serving time
        raise ValueError(f"stream_chunk must be >= 1, got {stream_chunk}")
    os.makedirs(out_dir, exist_ok=True)
    B = int(batch_size)
    caps = sorted(set(int(c) for c in (mel_caps or (max_mel_len,))))
    # Serialized artifacts must outlive the exporting JAX/libtpu version:
    # Mosaic (Pallas) custom calls carry no compatibility guarantee across
    # versions, so exports always trace the identical-math XLA paths
    # (ops/pallas.use_pallas() reads this env var at trace time).
    prev_pallas = os.environ.get("SMART_TTS_PALLAS")
    os.environ["SMART_TTS_PALLAS"] = "off"
    try:
        return _export_all(out_dir, model, variables, B, text_buckets, caps,
                           mel_buckets, generator, gen_variables,
                           stream_chunk, p_control, e_control, d_control,
                           platforms, provenance)
    finally:
        if prev_pallas is None:
            os.environ.pop("SMART_TTS_PALLAS", None)
        else:
            os.environ["SMART_TTS_PALLAS"] = prev_pallas


def _export_all(out_dir, model, variables, B, text_buckets, mel_caps,
                mel_buckets, generator, gen_variables, stream_chunk,
                p_control, e_control, d_control, platforms,
                provenance) -> dict:
    multi_speaker = bool(getattr(model.cfg, "multi_speaker", False))
    a_leaves, a_treedef = _flatten(variables)
    a_leaves = [jnp.asarray(x) for x in a_leaves]
    npz: dict[str, np.ndarray] = {
        f"a{i:05d}": np.asarray(x) for i, x in enumerate(a_leaves)}

    manifest: dict = {
        "format": "jax.export serialized StableHLO + params.npz "
                  "(weights-as-data)",
        "batch_size": B,
        "multi_speaker": multi_speaker,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "controls": {"p": p_control, "e": e_control, "d": d_control},
        "params": {"file": PARAMS_FILE, "acoustic_leaves": len(a_leaves),
                   "vocoder_leaves": 0},
        "probe": [], "acoustic": [], "vocoder": [],
        "provenance": dict(provenance or {}),
    }

    def _apply(leaves, texts, src_lens, speakers, mel_cap):
        v = jax.tree_util.tree_unflatten(a_treedef, leaves)
        return model.apply(
            v, texts, src_lens, speakers=speakers, max_mel_len=mel_cap,
            p_control=p_control, e_control=e_control, d_control=d_control,
            deterministic=True)

    def make_acoustic_fn(mel_cap):
        if multi_speaker:
            def fn(leaves, texts, src_lens, speakers):
                out = _apply(leaves, texts, src_lens, speakers, mel_cap)
                return _out_dict(out)
        else:
            def fn(leaves, texts, src_lens):
                out = _apply(leaves, texts, src_lens, None, mel_cap)
                return _out_dict(out)
        return fn

    def make_probe_fn():
        # predicted total frames; the decoder/postnet contribute to no
        # output and are dead-code-eliminated by the compiler
        if multi_speaker:
            def fn(leaves, texts, src_lens, speakers):
                out = _apply(leaves, texts, src_lens, speakers, _PROBE_CAP)
                return jnp.sum(out.duration_rounded, axis=-1
                               ).astype(jnp.int32)
        else:
            def fn(leaves, texts, src_lens):
                out = _apply(leaves, texts, src_lens, None, _PROBE_CAP)
                return jnp.sum(out.duration_rounded, axis=-1
                               ).astype(jnp.int32)
        return fn

    def _out_dict(out):
        return {"postnet_mel": out.postnet_mel, "mel_lens": out.mel_lens,
                "duration_rounded": out.duration_rounded,
                "pitch_prediction": out.pitch_prediction,
                "energy_prediction": out.energy_prediction}

    leaves_t = tuple(a_leaves)
    for L in sorted(set(int(b) for b in text_buckets)):
        ex_args = [leaves_t, jnp.zeros((B, L), jnp.int32),
                   jnp.ones((B,), jnp.int32)]
        inputs = ["params leaves", f"int32[{B},{L}] texts",
                  f"int32[{B}] src_lens"]
        if multi_speaker:
            ex_args.append(jnp.zeros((B,), jnp.int32))
            inputs.append(f"int32[{B}] speakers")
        name = f"probe_L{L}.jaxexp"
        _export_one(make_probe_fn(), tuple(ex_args),
                    os.path.join(out_dir, name), platforms)
        manifest["probe"].append({"file": name, "text_bucket": L})
        for T in mel_caps:
            name = f"acoustic_L{L}_T{T}.jaxexp"
            _export_one(make_acoustic_fn(T), tuple(ex_args),
                        os.path.join(out_dir, name), platforms)
            manifest["acoustic"].append(
                {"file": name, "text_bucket": L, "mel_cap": T,
                 "inputs": inputs})

    if generator is not None:
        n_mels = generator.config.n_mels
        hop = generator.config.hop_length
        manifest["vocoder_hop"] = hop
        v_leaves, v_treedef = _flatten(gen_variables)
        v_leaves = tuple(jnp.asarray(x) for x in v_leaves)
        npz.update({f"v{i:05d}": np.asarray(x)
                    for i, x in enumerate(v_leaves)})
        manifest["params"]["vocoder_leaves"] = len(v_leaves)

        def vocoder_fn(leaves, mel):
            return generator.apply(
                jax.tree_util.tree_unflatten(v_treedef, leaves), mel)

        for T in sorted(set(int(b) for b in mel_buckets)):
            name = f"vocoder_T{T}.jaxexp"
            _export_one(vocoder_fn,
                        (v_leaves, jnp.zeros((B, T, n_mels)),),
                        os.path.join(out_dir, name), platforms)
            manifest["vocoder"].append(
                {"file": name, "mel_bucket": T,
                 "inputs": ["params leaves",
                            f"float32[{B},{T},{n_mels}] mel"]})

        from .vocoder.streaming import receptive_halo
        halo = receptive_halo(generator.config)
        window = int(stream_chunk) + 2 * halo
        name = f"vocoder_stream_W{window}.jaxexp"
        _export_one(vocoder_fn, (v_leaves, jnp.zeros((1, window, n_mels)),),
                    os.path.join(out_dir, name), platforms)
        manifest["streaming"] = {"file": name, "window_frames": window,
                                 "chunk_frames": int(stream_chunk),
                                 "halo_frames": halo}

    np.savez(os.path.join(out_dir, PARAMS_FILE), **npz)
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


@dataclass
class _Program:
    call: Callable
    bucket: int
    mel_cap: int = 0


class ExportedTTS:
    """Load an artifact directory and serve text→mel→wav from the
    ahead-of-time compiled programs only (no model classes needed).

    ``synthesize(token_ids, speaker=0)`` picks the smallest covering text
    bucket, asks the probe program for the predicted frame count, runs the
    smallest acoustic program whose frame capacity fits (long-form serving —
    no 1000-frame truncation), then the smallest covering vocoder program,
    and trims to the predicted length.
    """

    def __init__(self, artifact_dir: str):
        with open(os.path.join(artifact_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        self.batch_size = int(self.manifest["batch_size"])
        self.multi_speaker = bool(self.manifest.get("multi_speaker", False))

        p = self.manifest["params"]
        npz = np.load(os.path.join(artifact_dir, p["file"]))
        self._aleaves = tuple(jnp.asarray(npz[f"a{i:05d}"])
                              for i in range(p["acoustic_leaves"]))
        self._vleaves = tuple(jnp.asarray(npz[f"v{i:05d}"])
                              for i in range(p["vocoder_leaves"]))

        def _load(name: str) -> Callable:
            with open(os.path.join(artifact_dir, name), "rb") as f:
                return jax_export.deserialize(f.read()).call

        self._probe = sorted(
            (_Program(_load(e["file"]), e["text_bucket"])
             for e in self.manifest["probe"]), key=lambda p: p.bucket)
        self._acoustic = sorted(
            (_Program(_load(e["file"]), e["text_bucket"], e["mel_cap"])
             for e in self.manifest["acoustic"]),
            key=lambda p: (p.bucket, p.mel_cap))
        self._vocoder = sorted(
            (_Program(_load(e["file"]), e["mel_bucket"])
             for e in self.manifest.get("vocoder", [])),
            key=lambda p: p.bucket)
        self.hop = int(self.manifest.get("vocoder_hop", 256))

        st = self.manifest.get("streaming")
        self._stream_prog = _load(st["file"]) if st else None
        self.stream_window = int(st["window_frames"]) if st else 0
        self.stream_chunk = int(st["chunk_frames"]) if st else 0
        self.stream_halo = int(st["halo_frames"]) if st else 0

    @staticmethod
    def _pick(programs: list, n: int, what: str) -> _Program:
        for p in programs:
            if n <= p.bucket:
                return p
        raise ValueError(
            f"{what} length {n} exceeds the largest exported bucket "
            f"({programs[-1].bucket}); re-export the artifacts with larger "
            f"{what} buckets (truncating silently would drop speech)")

    def _text_args(self, token_ids: np.ndarray, speaker: int
                   ) -> tuple[int, tuple]:
        ids = np.asarray(token_ids, np.int32).reshape(-1)
        n = ids.shape[0]
        bucket = self._pick(self._probe, n, "text").bucket
        texts = np.zeros((self.batch_size, bucket), np.int32)
        texts[0, :n] = ids
        lens = np.full((self.batch_size,), 1, np.int32)
        lens[0] = max(n, 1)
        args = [self._aleaves, jnp.asarray(texts), jnp.asarray(lens)]
        if self.multi_speaker:
            spk = np.full((self.batch_size,), int(speaker), np.int32)
            args.append(jnp.asarray(spk))
        return bucket, tuple(args)

    def predicted_frames(self, token_ids: np.ndarray, speaker: int = 0
                         ) -> int:
        """Probe program: predicted total mel frames for this utterance."""
        bucket, args = self._text_args(token_ids, speaker)
        probe = next(p for p in self._probe if p.bucket == bucket)
        return int(np.asarray(probe.call(*args))[0])

    def acoustic(self, token_ids: np.ndarray, speaker: int = 0) -> dict:
        """(n,) int token ids → acoustic outputs dict (padded to the
        selected frame capacity)."""
        bucket, args = self._text_args(token_ids, speaker)
        frames = self.predicted_frames(token_ids, speaker)
        fits = [p for p in self._acoustic if p.bucket == bucket]
        prog = None
        for p in fits:
            if frames <= p.mel_cap:
                prog = p
                break
        if prog is None:
            raise ValueError(
                f"predicted mel length {frames} exceeds the largest "
                f"exported frame capacity ({fits[-1].mel_cap}); re-export "
                "with larger mel_caps (truncating would drop speech)")
        out = prog.call(*args)
        return jax.tree.map(np.asarray, out)

    def _vocode(self, out: dict) -> np.ndarray:
        """Vocoder tail shared by :meth:`synthesize` and the degenerate
        :meth:`stream` fallback — takes already-computed acoustic outputs
        so the fallback never re-runs probe + acoustic."""
        t = max(int(out["mel_lens"][0]), 1)
        prog = self._pick(self._vocoder, t, "mel")
        mel = np.zeros((self.batch_size, prog.bucket,
                        out["postnet_mel"].shape[-1]), np.float32)
        mel[0, :t] = out["postnet_mel"][0, :t]
        wav = np.asarray(prog.call(self._vleaves, jnp.asarray(mel)))
        return wav[0, : t * self.hop]

    def synthesize(self, token_ids: np.ndarray, speaker: int = 0
                   ) -> np.ndarray:
        """(n,) int token ids → float32 waveform in [-1, 1]."""
        if not self._vocoder:
            raise ValueError("artifact was exported without a vocoder")
        return self._vocode(self.acoustic(token_ids, speaker))

    def stream(self, token_ids: np.ndarray, speaker: int = 0):
        """(n,) int token ids → iterator of float32 waveform chunks, from
        the AOT artifacts only (``manifest['streaming']`` window program).

        The first chunk arrives after probe + acoustic + ONE vocoder window
        (time-to-first-audio), not after the whole utterance is vocoded.
        Concatenated chunks equal :meth:`synthesize` up to cross-shape
        reduction order: both run the vocoder over the same zero-padded
        bucket-length mel, and every kept sample is ≥ halo frames from an
        interior window edge (edge windows sit flush with the padded
        sequence boundaries, where both programs see identical conv
        padding — the exactness argument of ``vocoder/streaming.py``).
        """
        if not self._vocoder:
            raise ValueError("artifact was exported without a vocoder")
        out = self.acoustic(token_ids, speaker)
        t = max(int(out["mel_lens"][0]), 1)
        w, c, h = self.stream_window, self.stream_chunk, self.stream_halo
        # the same bucket (and therefore the same zero-padded mel) the full
        # vocoder program consumes — windows slide over it, so
        # stream ≡ synthesize sample for sample
        prog = self._pick(self._vocoder, t, "mel")
        if self._stream_prog is None or prog.bucket < w:
            # no streaming program (or the covering bucket is narrower than
            # one window): degenerate single-chunk stream through the
            # vocoder tail only (the acoustic pass above is reused)
            yield self._vocode(out)
            return
        mel = np.zeros((prog.bucket, out["postnet_mel"].shape[-1]),
                       np.float32)
        mel[:t] = out["postnet_mel"][0, :t]
        for lo in range(0, t, c):
            hi = min(lo + c, t)
            start = min(max(lo - h, 0), prog.bucket - w)
            window = mel[start: start + w]
            wav = np.asarray(
                self._stream_prog(self._vleaves, jnp.asarray(window[None])))
            yield wav[0, (lo - start) * self.hop: (hi - start) * self.hop]
