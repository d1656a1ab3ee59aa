"""Mixed-precision helpers: dtype policies and dynamic loss scaling.

Parity target: the reference's two mixed-precision stacks — apex amp O1
(dmb/apis/train.py:104-108) and the mmcv-style fp16 module
(dmb/utils/fp16/: auto_fp16 decorators + Fp16OptimizerHook with static
loss scale 512 and fp32 master weights).

On TPU, bf16 shares f32's exponent range so training needs NO loss
scaling — the framework's `model.dtype = "bfloat16"` knob (f32 params,
bf16 compute) is the recommended policy and is what the trainer uses.
DynamicLossScale is provided for float16 targets (GPU parity / research):
standard doubling/halving scale management as a jit-safe pytree.
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.struct


@flax.struct.dataclass
class DynamicLossScale:
    """Jit-safe dynamic loss scale (grow on stability, shrink on non-finite).

    Usage:
      scale = DynamicLossScale.create(2.0 ** 15)
      scaled_loss = loss * scale.value
      grads = jax.tree.map(lambda g: g / scale.value, scaled_grads)
      finite = all_finite(grads)
      scale = scale.update(finite)
      # apply grads only where finite (jnp.where per leaf or skip step)
    """
    value: jnp.ndarray
    growth_interval: int = flax.struct.field(pytree_node=False, default=2000)
    factor: float = flax.struct.field(pytree_node=False, default=2.0)
    counter: jnp.ndarray = None

    @classmethod
    def create(cls, initial=2.0 ** 15, growth_interval=2000, factor=2.0):
        return cls(value=jnp.float32(initial),
                   growth_interval=growth_interval, factor=factor,
                   counter=jnp.int32(0))

    def update(self, grads_finite):
        grow = (self.counter + 1) >= self.growth_interval
        new_value = jnp.where(
            grads_finite,
            jnp.where(grow, self.value * self.factor, self.value),
            jnp.maximum(self.value / self.factor, 1.0))
        new_counter = jnp.where(grads_finite & ~grow, self.counter + 1, 0)
        return self.replace(value=new_value, counter=new_counter)


def all_finite(tree):
    """Scalar bool: every leaf of the pytree is finite."""
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return jnp.bool_(True)
    return jnp.all(jnp.asarray(
        [jnp.all(jnp.isfinite(l)) for l in leaves]))


def select_tree(pred, true_tree, false_tree):
    """Per-leaf where(pred, a, b) — apply-or-skip for scaled training."""
    return jax.tree.map(lambda a, b: jnp.where(pred, a, b),
                        true_tree, false_tree)
