"""Sharded async checkpoint/restore via Orbax.

Replaces the reference's ``torch.save({"model": ..., "optimizer": ...},
"{step}.pth.tar")`` every 10k steps (``train.py:149-159``) and
``--restore_step`` loading (``utils/model.py:16-29``).  Upgrades
(SURVEY.md §5.4): the optimizer **step counter and data-epoch position are
inside the checkpoint** (the reference reconstructs the step from the CLI
flag and always restarts the data iterator), saves are async (training
continues during IO), retention is managed, and restore is multi-host safe
(every host restores the same global state).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    """Thin Orbax wrapper bound to this framework's TrainState layout."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True,
                create=True))

    def save(self, state: TrainState, data_state: Optional[dict] = None,
             force: bool = False) -> bool:
        """Async-save params/opt_state/batch_stats/step (+ data iterator
        position).  Returns whether a save was initiated."""
        step = int(np.asarray(state.step))
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "batch_stats": state.batch_stats,
            "step": step,
        }
        args = {"state": ocp.args.StandardSave(payload),
                "data": ocp.args.JsonSave(data_state or {})}
        return self._mngr.save(step, args=ocp.args.Composite(**args),
                               force=force)

    def restore(self, state: TrainState, step: Optional[int] = None
                ) -> tuple[TrainState, Optional[dict]]:
        """Restore into the given (abstract or concrete) state template."""
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            return state, None
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "batch_stats": state.batch_stats,
            "step": 0,
        }
        restored = self._mngr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
                data=ocp.args.JsonRestore()))
        got = restored["state"]
        data_state = restored.get("data")
        new_state = state.replace(
            step=np.int32(got["step"]),
            params=got["params"],
            opt_state=got["opt_state"],
            batch_stats=got["batch_stats"])
        return new_state, data_state

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()
