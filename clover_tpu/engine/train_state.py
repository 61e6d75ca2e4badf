"""Train state: one pytree carrying everything a step mutates.

The orbax checkpoint of this state is the whole recovery story
(reference resume: runner.resume restoring epoch/iter/optimizer,
SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    batch_stats: Optional[Any] = None
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params, tx, batch_stats=None, ema_params=None) -> "TrainState":
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
            batch_stats=batch_stats,
            ema_params=ema_params,
        )

    def apply_gradients(self, grads, ema_momentum: Optional[float] = None,
                        **changes) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if self.ema_params is not None and ema_momentum is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_momentum + p * (1.0 - ema_momentum),
                self.ema_params, new_params)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            **changes,
        )
