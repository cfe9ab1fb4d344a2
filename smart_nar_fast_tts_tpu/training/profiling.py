"""Profiling & step-timing observability (SURVEY.md §5.1).

The reference has none (two tqdm bars, ``train.py:69-74``).  Here:

- ``StepProfiler``: windowed ``jax.profiler`` trace capture — arms at a
  configured step, stops N steps later, writes an xprof/TensorBoard-
  compatible trace directory (host 0 only on multi-host).
- ``Throughput``: wall-clock steps/sec and mel-frames/sec/chip, the
  BASELINE.md "mel frames/sec/chip" metric, logged alongside the losses.
"""

from __future__ import annotations

import time
from typing import Optional

import jax


class StepProfiler:
    """Captures one ``jax.profiler`` trace window during training.

    start_step = 0 disables.  Only host 0 traces (a per-host trace of the
    same program adds nothing and multiplies trace size).
    """

    def __init__(self, log_dir: str, start_step: int = 0,
                 num_steps: int = 5):
        self.log_dir = f"{log_dir}/profile"
        self.start_step = start_step
        self.num_steps = num_steps
        self._active = False

    def step(self, step: int) -> None:
        if self.start_step <= 0 or jax.process_index() != 0:
            return
        if not self._active and step == self.start_step:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._active and step >= self.start_step + self.num_steps:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:  # trace window ran past the end of training
            jax.profiler.stop_trace()
            self._active = False


class Throughput:
    """Rolling steps/sec + frames/sec/chip between log points."""

    def __init__(self) -> None:
        self._t0: Optional[float] = None
        self._steps = 0
        self._frames = 0

    def update(self, n_frames: int) -> None:
        if self._t0 is None:
            self._t0 = time.perf_counter()   # first step excluded (compile)
            return
        self._steps += 1
        self._frames += n_frames

    def snapshot(self) -> Optional[dict]:
        """Rates since the last snapshot; None until 2+ steps observed."""
        if self._t0 is None or self._steps == 0:
            return None
        dt = time.perf_counter() - self._t0
        n_chips = jax.device_count()
        out = {
            "steps_per_sec": self._steps / dt,
            "mel_frames_per_sec_per_chip": self._frames / dt / n_chips,
        }
        self._t0 = time.perf_counter()
        self._steps = 0
        self._frames = 0
        return out
