"""Confidence measurement network (AcfNet).

Parity target: dmb/modeling/stereo/cmn/cmn.py:10-92. One small conv head per
cost volume maps the D-channel cost to a single-channel confidence cost;
sigmoid gives confidence; variance = alpha * (1 - conf) + beta modulates the
focal loss's unimodal GT distribution. The NLL loss on conf costs is
computed outside the module (losses/disp_losses.py:conf_nll_loss).
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .layers import conv_bn_relu


class ConfHead(nn.Module):
    """cost [B, D, H, W] -> conf cost [B, H, W, 1] (cmn/cmn.py:10-36)."""
    in_planes: int
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cost, train: bool = False):
        x = jnp.transpose(cost, (0, 2, 3, 1)).astype(self.dtype)  # D -> C
        sec = max(self.in_planes // 3, 1)
        x = conv_bn_relu(self.batch_norm, sec, 3, 1, 1, bias=False,
                         dtype=self.dtype)(x, train)
        return nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)(x).astype(jnp.float32)


class Cmn(nn.Module):
    """Returns (variances, confs, conf_costs), one entry per cost volume."""
    in_planes: int
    num: int
    alpha: float
    beta: float
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, costs, train: bool = False):
        assert len(costs) == self.num, (
            f"cmn configured for {self.num} cost volumes, got {len(costs)}")
        conf_costs = [
            ConfHead(self.in_planes, self.batch_norm, self.dtype)(c, train)
            for c in costs]
        confs = [nn.sigmoid(cc) for cc in conf_costs]
        variances = [self.alpha * (1.0 - conf) + self.beta for conf in confs]
        return variances, confs, conf_costs
