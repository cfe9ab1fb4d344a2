"""Metrics/observability: TensorBoard scalars, mel figures, audio clips,
plain-text logs.

Parity target: reference ``utils/tools.py:64-86`` (``log``) and
``:202-251`` (``plot_mel`` with pitch/energy overlays), ``train.py:48-56``
(train/val SummaryWriter pair) and ``:97-109`` (message format + log.txt).
Multi-host aware: only process 0 writes (SURVEY.md §2.6 #9).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..config import FeatureStats


class MetricWriter:
    """TensorBoard + append-only text log; no-ops on non-primary hosts."""

    def __init__(self, log_dir: str, enabled: Optional[bool] = None):
        self.enabled = (jax.process_index() == 0
                        if enabled is None else enabled)
        self._tb = None
        self.log_dir = log_dir
        if self.enabled:
            os.makedirs(log_dir, exist_ok=True)
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir)

    def scalars(self, step: int, losses) -> None:
        """LossBreakdown → the reference's 7 scalar tags
        (``utils/tools.py:66-76``)."""
        if not self.enabled:
            return
        names = ("total_loss", "mel_loss", "mel_postnet_loss", "pitch_loss",
                 "energy_loss", "duration_loss", "attn_loss")
        values = (losses.total, losses.mel, losses.postnet_mel, losses.pitch,
                  losses.energy, losses.duration, losses.attention)
        for name, value in zip(names, values):
            self._tb.add_scalar(f"Loss/{name}", float(value), step)

    def scalar(self, step: int, tag: str, value: float) -> None:
        if self.enabled:
            self._tb.add_scalar(tag, float(value), step)

    def scalar_dict(self, step: int, values: dict, prefix: str = "Perf"
                    ) -> None:
        if self.enabled:
            for tag, value in values.items():
                self._tb.add_scalar(f"{prefix}/{tag}", float(value), step)

    def figure(self, step: int, tag: str, fig) -> None:
        if self.enabled:
            self._tb.add_figure(tag, fig, step)

    def audio(self, step: int, tag: str, wav: np.ndarray,
              sampling_rate: int) -> None:
        if self.enabled:
            peak = float(np.max(np.abs(wav))) or 1.0
            self._tb.add_audio(tag, wav / peak, step,
                               sample_rate=sampling_rate)

    def message(self, text: str, filename: str = "log.txt") -> None:
        """Append-only text log (reference ``train.py:104-108``)."""
        if not self.enabled:
            return
        with open(os.path.join(self.log_dir, filename), "a") as f:
            f.write(text + "\n")

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()


def format_losses(step: int, total_step: int, losses) -> str:
    """The reference's two-line progress message (``train.py:97-103``)."""
    return (
        f"Step {step}/{total_step}, "
        "Total Loss: {:.4f}, Mel Loss: {:.4f}, Mel PostNet Loss: {:.4f}, "
        "Pitch Loss: {:.4f}, Energy Loss: {:.4f}, Duration Loss: {:.4f}, "
        "Attn Loss: {:.4f}".format(
            float(losses.total), float(losses.mel),
            float(losses.postnet_mel), float(losses.pitch),
            float(losses.energy), float(losses.duration),
            float(losses.attention)))


def plot_mel(data, stats: Optional[FeatureStats], titles=None):
    """Stacked mel panels with pitch/energy overlays
    (reference ``utils/tools.py:202-251``).

    data: list of (mel (n_mels, T), pitch (T,), energy (T,)) tuples; pitch
    is de-normalized with the corpus stats when given.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(data)
    fig, axes = plt.subplots(n, 1, squeeze=False, figsize=(8, 3 * n))
    titles = titles or [None] * n
    for i, (mel, pitch, energy) in enumerate(data):
        ax = axes[i][0]
        ax.imshow(mel, origin="lower", aspect="auto")
        ax.set_ylim(0, mel.shape[0])
        ax.set_title(titles[i], fontsize="medium")
        ax.tick_params(labelsize="x-small")

        if pitch is not None:
            if stats is not None:
                pitch = pitch * stats.pitch_std + stats.pitch_mean
            ax1 = ax.twinx()
            ax1.plot(pitch, color="tomato", linewidth=0.7)
            ax1.set_ylabel("F0 (Hz)", color="tomato", fontsize="x-small")
            ax1.tick_params(labelsize="x-small", colors="tomato")
        if energy is not None:
            if stats is not None:
                energy = energy * stats.energy_std + stats.energy_mean
            ax2 = ax.twinx()
            ax2.spines["right"].set_position(("outward", 40))
            ax2.plot(energy, color="darkviolet", linewidth=0.7)
            ax2.set_ylabel("Energy", color="darkviolet",
                           fontsize="x-small")
            ax2.tick_params(labelsize="x-small", colors="darkviolet")
    fig.tight_layout()
    return fig
