"""Training runtime: optimizer schedule, train state, jitted sharded steps."""

from .schedule import noam_schedule, make_optimizer
from .state import TrainState, create_train_state
from .step import Batch, make_train_step, make_multi_step, make_eval_step
from .checkpoint import CheckpointManager
from .evaluate import evaluate
from .logging import MetricWriter, format_losses, plot_mel
from .trainer import Trainer
from .vocoder import (VocoderState, VocoderMetrics, create_vocoder_state,
                      make_vocoder_optimizer, make_vocoder_train_step,
                      sample_segments)

__all__ = [
    "noam_schedule", "make_optimizer", "TrainState", "create_train_state",
    "Batch", "make_train_step", "make_multi_step", "make_eval_step",
    "CheckpointManager",
    "evaluate", "MetricWriter", "format_losses", "plot_mel", "Trainer",
    "VocoderState", "VocoderMetrics", "create_vocoder_state",
    "make_vocoder_optimizer", "make_vocoder_train_step", "sample_segments",
]
