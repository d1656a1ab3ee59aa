"""Train state: params + batch stats + optimizer state + step + PRNG.

TPU-native replacement for the reference's mmcv Runner state (model /
optimizer / epoch in a .pth). A single pytree that jit-able train steps
thread through; orbax checkpoints it wholesale (utils/checkpoint.py).
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.struct
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array

    @classmethod
    def create(cls, variables, tx, rng):
        params = variables["params"]
        return cls(params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32),
                   rng=rng)

    def apply_gradients(self, grads, tx, new_batch_stats=None, new_rng=None):
        updates, opt_state = tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            opt_state=opt_state,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            step=self.step + 1,
            rng=new_rng if new_rng is not None else self.rng)
