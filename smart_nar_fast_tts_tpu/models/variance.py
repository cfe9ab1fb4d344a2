"""Variance adaptor: duration/pitch/energy prediction, quantized variance
embeddings, and length regulation.

Parity target: reference ``model/modules.py:17-159`` (VarianceAdaptor),
``:233-286`` (VariancePredictor).  The Python-loop LengthRegulator is
replaced by the vectorized ``ops.upsample`` kernels; pitch/energy stats come
from the config (``FeatureStats``) instead of a ``stats.json`` read at
module construction (reference ``model/modules.py:41-46``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..config import FeatureStats, ModelConfig, PreprocessConfig
from ..ops.upsample import gaussian_upsample, hard_upsample
from .layers import LN_EPS


def quantization_bins(vmin: float, vmax: float, n_bins: int,
                      log_scale: bool) -> np.ndarray:
    """(n_bins - 1,) bucket boundaries (reference model/modules.py:48-71).

    log quantization requires vmin > 0: the reference's shipped LJSpeech
    config pairs log-pitch with normalized (negative-min) stats and silently
    gets NaN bin edges from ``torch.linspace(log(negative), ...)`` — its own
    model.yaml comment forbids the combination.  Raise instead
    (VERDICT.md Missing #5; :class:`..config.Config` validates the same
    condition at YAML-load time).
    """
    if log_scale:
        if vmin <= 0:
            raise ValueError(
                f"log quantization requires positive stats, got "
                f"vmin={vmin}.  Normalized features need 'linear' "
                "quantization (reference config/LJSpeech/model.yaml:18-21).")
        return np.exp(np.linspace(np.log(vmin), np.log(vmax),
                                  n_bins - 1)).astype(np.float32)
    return np.linspace(vmin, vmax, n_bins - 1).astype(np.float32)


def bucketize(values: jnp.ndarray, bins: jnp.ndarray) -> jnp.ndarray:
    """torch.bucketize(right=False) equivalent:
    index of first boundary >= value (searchsorted side='left').

    ``method='compare_all'``: the default ``'scan'`` lowers to a ~8-step
    sequential binary search whose per-step gathers cost ~0.52 ms for an
    (8, 1000) input on a v5e chip — 40x the 0.013 ms of the all-compare
    reduction over the 255 boundaries (measured, benchmarks/bf16_probe.py
    round 4).  At 256 bins compare-all is a trivially vectorizable
    (values x bins) comparison sum, ideal VPU shape.
    """
    return jnp.searchsorted(bins, values, side="left", method="compare_all")


class VariancePredictor(nn.Module):
    """2× (conv k3 → ReLU → LN → dropout) → linear → scalar per position,
    masked to 0 (reference ``model/modules.py:233-286``)."""

    filter_size: int
    kernel_size: int
    dropout: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray,
                 deterministic: bool = True,
                 cap_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = nn.Conv(self.filter_size, (self.kernel_size,), padding="SAME",
                    name="conv1d_1")(x)
        h = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm_1")(nn.relu(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if cap_valid is not None:
            # reproduce the reference's batch-max tensor boundary: conv2's
            # receptive field sees zero padding beyond the capacity
            h = jnp.where(cap_valid[None, :, None], h, 0.0)
        h = nn.Conv(self.filter_size, (self.kernel_size,), padding="SAME",
                    name="conv1d_2")(h)
        h = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm_2")(nn.relu(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out = nn.Dense(1, name="linear_layer")(h)[..., 0]
        return jnp.where(valid, out, 0.0)


class VarianceAdaptorOutput(NamedTuple):
    x: jnp.ndarray                   # (B, T, D) frame-rate features
    pitch_prediction: jnp.ndarray
    energy_prediction: jnp.ndarray
    log_duration_prediction: jnp.ndarray   # (B, L)
    duration_rounded: jnp.ndarray          # (B, L)
    mel_len: jnp.ndarray                   # (B,)
    mel_valid: jnp.ndarray                 # (B, T)
    mel_cap: jnp.ndarray                   # (T,) batch-level frame capacity
    upsample_weights: Optional[jnp.ndarray]  # (B, L, T) gaussian mode only


class VarianceAdaptor(nn.Module):
    """Reference ``model/modules.py:17-159`` with static-shape length
    regulation.  ``max_len`` is the static frame capacity of the output;
    at inference the predicted durations determine ``mel_len`` and the
    validity mask within that capacity."""

    cfg: ModelConfig
    stats: FeatureStats
    pitch_feature_level: str = "frame_level"
    energy_feature_level: str = "frame_level"

    def setup(self):
        ve = self.cfg.variance_embedding
        vp = self.cfg.variance_predictor
        d = self.cfg.transformer.encoder_hidden
        self.duration_predictor = VariancePredictor(
            vp.filter_size, vp.kernel_size, vp.dropout,
            name="duration_predictor")
        self.pitch_predictor = VariancePredictor(
            vp.filter_size, vp.kernel_size, vp.dropout,
            name="pitch_predictor")
        self.energy_predictor = VariancePredictor(
            vp.filter_size, vp.kernel_size, vp.dropout,
            name="energy_predictor")
        self.pitch_bins = jnp.asarray(quantization_bins(
            self.stats.pitch_min, self.stats.pitch_max, ve.n_bins,
            ve.pitch_quantization == "log"))
        self.energy_bins = jnp.asarray(quantization_bins(
            self.stats.energy_min, self.stats.energy_max, ve.n_bins,
            ve.energy_quantization == "log"))
        self.pitch_embedding = nn.Embed(ve.n_bins, d,
                                        name="pitch_embedding")
        self.energy_embedding = nn.Embed(ve.n_bins, d,
                                         name="energy_embedding")

    def _variance(self, predictor, embedding, bins, x, target, valid,
                  control, deterministic, cap_valid):
        """Predict; embed target (train) or scaled prediction (infer)
        (reference ``model/modules.py:80-100``).

        The embedding is zeroed beyond the batch-level capacity: the
        reference's tensors physically end at the batch max length, so the
        next conv's receptive field sees zero padding there — while
        positions between an item's own length and the batch max DO carry
        ``embedding[bucketize(0)]`` exactly like the reference's padded
        compute."""
        prediction = predictor(x, valid, deterministic, cap_valid)
        if target is not None:
            emb = embedding(bucketize(target, bins))
        else:
            prediction = prediction * control
            emb = embedding(bucketize(prediction, bins))
        if cap_valid is not None:
            emb = jnp.where(cap_valid[None, :, None], emb, 0.0)
        return prediction, emb

    def __call__(self, x, src_valid, max_len,
                 mel_valid=None,
                 pitch_target=None, energy_target=None,
                 duration_target=None,
                 p_control=1.0, e_control=1.0, d_control=1.0,
                 deterministic: bool = True,
                 src_cap=None, mel_cap=None) -> VarianceAdaptorOutput:
        log_d_pred = self.duration_predictor(x, src_valid, deterministic,
                                             src_cap)

        pitch_pred = energy_pred = None
        if self.pitch_feature_level == "phoneme_level":
            pitch_pred, emb = self._variance(
                self.pitch_predictor, self.pitch_embedding, self.pitch_bins,
                x, pitch_target, src_valid, p_control, deterministic,
                src_cap)
            x = x + emb
        if self.energy_feature_level == "phoneme_level":
            energy_pred, emb = self._variance(
                self.energy_predictor, self.energy_embedding,
                self.energy_bins, x, energy_target, src_valid, e_control,
                deterministic, src_cap)
            x = x + emb

        if duration_target is not None:
            duration_rounded = duration_target
        else:
            # round(exp(logd) - 1) * d_control, clamped ≥ 0
            # (reference model/modules.py:131-137)
            duration_rounded = jnp.clip(
                jnp.round(jnp.exp(log_d_pred) - 1.0) * d_control, min=0.0)
            duration_rounded = duration_rounded * src_valid

        weights = None
        if self.cfg.upsampling == "gaussian":
            # dense (B, L, T) weight matmul — the measured winner on TPU
            # at model shapes (benchmarks/results/upsample_ab.json); the
            # unused weights output is dead-code-eliminated under jit
            x, mel_len, weights = gaussian_upsample(
                x, duration_rounded, max_len, src_valid.astype(x.dtype),
                sigma=self.cfg.gaussian_sigma)
        elif self.cfg.upsampling == "gaussian_banded":
            from ..ops.pallas import (gaussian_upsample_banded,
                                      pallas_interpret, use_pallas)
            if use_pallas():
                # band-skipping Pallas kernel: no (B, L, T) weight tensor
                # in HBM — for capacities where dense weights would not fit
                x, mel_len = gaussian_upsample_banded(
                    x, duration_rounded, max_len,
                    src_valid.astype(x.dtype),
                    sigma=self.cfg.gaussian_sigma,
                    interpret=pallas_interpret())
            else:
                x, mel_len, weights = gaussian_upsample(
                    x, duration_rounded, max_len, src_valid.astype(x.dtype),
                    sigma=self.cfg.gaussian_sigma)
        else:
            x, mel_len = hard_upsample(x, duration_rounded, max_len)

        if duration_target is None or mel_valid is None:
            mel_valid = (jnp.arange(max_len)[None, :]
                         < mel_len[:, None])
        if mel_cap is None:
            # batch-level frame capacity (the reference's inference tensors
            # end at the batch max predicted mel length); in training the
            # caller passes the capacity from the GT mel lengths
            mel_cap = jnp.arange(max_len) < jnp.max(mel_len)

        if self.pitch_feature_level == "frame_level":
            pitch_pred, emb = self._variance(
                self.pitch_predictor, self.pitch_embedding, self.pitch_bins,
                x, pitch_target, mel_valid, p_control, deterministic,
                mel_cap)
            x = x + emb
        if self.energy_feature_level == "frame_level":
            energy_pred, emb = self._variance(
                self.energy_predictor, self.energy_embedding,
                self.energy_bins, x, energy_target, mel_valid, e_control,
                deterministic, mel_cap)
            x = x + emb

        return VarianceAdaptorOutput(
            x=x, pitch_prediction=pitch_pred, energy_prediction=energy_pred,
            log_duration_prediction=log_d_pred,
            duration_rounded=duration_rounded, mel_len=mel_len,
            mel_valid=mel_valid, mel_cap=mel_cap, upsample_weights=weights)
