"""Noam learning-rate schedule and the Adam optimizer chain.

Parity target: reference ``model/optimizer.py:5-51`` (``ScheduledOptim``) —
``lr = d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)``, multiplied by
``anneal_rate`` once past each entry of ``anneal_steps``; Adam with
β=(0.9, 0.98), ε=1e-9, weight decay 0, preceded by global-norm clipping at
1.0 (reference ``train.py:90-94``).

The reference increments its step counter *before* computing the LR, so step
1 is the first LR ever applied; ``noam_schedule`` takes that 1-based step.
optax calls the schedule with the 0-based update count, hence the ``+ 1``
inside ``make_optimizer``.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from ..config import OptimizerConfig


def noam_schedule(step: jnp.ndarray, d_model: int, warmup: int,
                  anneal_steps: tuple[int, ...] = (),
                  anneal_rate: float = 1.0) -> jnp.ndarray:
    """LR at 1-based ``step`` (reference ``model/optimizer.py:33-44``)."""
    step = jnp.maximum(step.astype(jnp.float32), 1.0)
    scale = jnp.minimum(step ** -0.5, step * float(warmup) ** -1.5)
    for s in anneal_steps:
        scale = jnp.where(step > s, scale * anneal_rate, scale)
    return float(d_model) ** -0.5 * scale


def make_optimizer(cfg: OptimizerConfig, d_model: int
                   ) -> optax.GradientTransformation:
    """clip-by-global-norm → Adam → Noam LR (reference ``train.py:90-94`` +
    ``model/optimizer.py``)."""

    def lr(count):
        return noam_schedule(count + 1, d_model, cfg.warm_up_step,
                             cfg.anneal_steps, cfg.anneal_rate)

    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_thresh),
        optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps),
        optax.add_decayed_weights(cfg.weight_decay)
        if cfg.weight_decay else optax.identity(),
        optax.scale_by_learning_rate(lr),
    )
