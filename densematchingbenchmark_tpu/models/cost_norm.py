"""Learnable cost-volume normalization (Range/Var/Std/Sigmoid).

Parity target: dmb/modeling/stereo/cost_processors/utils/cost_norm.py:7-100
— normalize over the disparity axis with a learnable scalar affine
(weight, bias). Functional core + a tiny Flax wrapper for the params.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

EPS = 1e-5


def range_norm(x, axis=1):
    lo = jnp.min(x, axis=axis, keepdims=True)
    hi = jnp.max(x, axis=axis, keepdims=True)
    return (x - lo) / (hi - lo + EPS)


def var_norm(x, axis=1):
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.var(x, axis=axis, keepdims=True, ddof=1)
    return jnp.abs(x - mean) / (var + EPS)


def std_norm(x, axis=1):
    mean = jnp.mean(x, axis=axis, keepdims=True)
    std = jnp.std(x, axis=axis, keepdims=True, ddof=1)
    return jnp.abs(x - mean) / (std + EPS)


def sigmoid_norm(x, axis=1):
    return nn.sigmoid(x)


_NORMS = {"range": range_norm, "var": var_norm, "std": std_norm,
          "sigmoid": sigmoid_norm}


class CostVolumeNorm(nn.Module):
    """norm(x) * weight + bias with learnable (or frozen) scalars."""
    kind: str = "range"
    axis: int = 1
    affine: bool = True
    init_weight: float = 1.0
    init_bias: float = 0.0

    @nn.compact
    def __call__(self, x):
        normed = _NORMS[self.kind](x, self.axis)
        if self.affine:
            w = self.param("weight",
                           lambda k: jnp.full((1,), self.init_weight))
            b = self.param("bias", lambda k: jnp.full((1,), self.init_bias))
        else:
            w, b = self.init_weight, self.init_bias
        return normed * w + b
