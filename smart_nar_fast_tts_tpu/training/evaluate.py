"""Validation loop — the reference's *missing* ``evaluate.py``
reconstructed from its call-site contract (``train.py:142``:
``message = evaluate(model, step, configs, val_logger, vocoder)``;
SURVEY.md §3.5): run the whole val split, average the 7 losses, log them,
return the formatted message.

Averaging is element-weighted: each loss term is aggregated as
``Σ_b loss_b · w_b / Σ_b w_b`` where ``w_b`` is that term's valid-element
count in batch ``b`` (the denominator of its in-batch masked mean).  The
result is therefore the exact corpus-level mean — invariant to bucket/batch
partitioning and to short tail batches (VERDICT.md Weak #6; the reference's
upstream evaluate.py used per-batch equal weights).  Invariance is exact up
to the reference's padded-compute quirk: VariancePredictor convs read
padding up to the batch max length (see the partition-invariance test in
``tests/test_trainer.py`` for the precise statement).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import numpy as np

from .logging import MetricWriter, format_losses
from .state import TrainState


def weighted_average(eval_step: Callable, state: TrainState,
                     batches: Iterable):
    """Element-weighted LossBreakdown over ``batches`` (an iterable of
    ``(Batch, ids, raw_texts)`` or bare ``Batch``), or None when empty.

    ``eval_step`` follows the :func:`..training.step.make_eval_step`
    contract: ``(state, batch) -> (LossBreakdown, LossBreakdown weights)``.
    """
    sums = None
    wsums = None
    losses = None
    for item in batches:
        batch = item[0] if isinstance(item, tuple) else item
        losses, weights = eval_step(state, batch)
        vals = np.asarray([float(x) for x in losses])
        w = np.asarray([float(x) for x in weights])
        sums = vals * w if sums is None else sums + vals * w
        wsums = w if wsums is None else wsums + w
    if sums is None:
        return None
    mean = sums / np.maximum(wsums, 1.0)
    mean[0] = mean[1:].sum()        # total = recombined weighted term means
    return type(losses)(*[float(v) for v in mean])


def evaluate(eval_step: Callable, state: TrainState,
             batches: Iterable, step: int, total_step: int,
             writer: Optional[MetricWriter] = None) -> str:
    """Run the val split, log the weighted-average losses, return the
    reference-format message."""
    losses = weighted_average(eval_step, state, batches)
    if losses is None:
        return "Validation: no batches"
    if writer is not None:
        writer.scalars(step, losses)
    return format_losses(step, total_step, losses).replace(
        f"Step {step}/{total_step}", f"Validation Step {step}")
