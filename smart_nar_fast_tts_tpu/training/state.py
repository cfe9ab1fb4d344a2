"""Train state: params, optimizer state, batch stats, step counter.

Replaces the reference's mutable ``(model, ScheduledOptim)`` pair
(``utils/model.py:11-31``) with an immutable pytree threaded through the
jitted step.  The step counter lives inside the state (and therefore inside
checkpoints) — unlike the reference, which reconstructs it from the
``--restore_step`` CLI flag (``model/optimizer.py:13``, SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray                 # () int32, number of updates applied
    params: Any
    opt_state: Any
    batch_stats: Any                  # PostNet BatchNorm running stats
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, opt_state = self.tx.update(grads, self.opt_state,
                                            self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params,
                            opt_state=opt_state,
                            batch_stats=new_batch_stats)


def create_train_state(variables: Any, tx: optax.GradientTransformation
                       ) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
