"""Validation loop — the reference's *missing* ``evaluate.py``
reconstructed from its call-site contract (``train.py:142``:
``message = evaluate(model, step, configs, val_logger, vocoder)``;
SURVEY.md §3.5): run the whole val split, average the 7 losses, log them,
return the formatted message.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import numpy as np

from .logging import MetricWriter, format_losses
from .state import TrainState


def evaluate(eval_step: Callable, state: TrainState,
             batches: Iterable, step: int, total_step: int,
             writer: Optional[MetricWriter] = None) -> str:
    """Average LossBreakdown over ``batches`` (an iterable of
    ``(Batch, ids, raw_texts)`` or bare ``Batch``) and log/format it."""
    sums = None
    count = 0
    for item in batches:
        batch = item[0] if isinstance(item, tuple) else item
        losses = eval_step(state, batch)
        vals = np.asarray([float(x) for x in losses])
        sums = vals if sums is None else sums + vals
        count += 1
    if count == 0:
        return "Validation: no batches"
    mean = sums / count
    losses = type(losses)(*[float(v) for v in mean])
    if writer is not None:
        writer.scalars(step, losses)
    return format_losses(step, total_step, losses).replace(
        f"Step {step}/{total_step}", f"Validation Step {step}")
