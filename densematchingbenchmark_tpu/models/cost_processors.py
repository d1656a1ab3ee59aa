"""Cost processors: raw volume construction + aggregation orchestrators.

Parity target: dmb/modeling/stereo/cost_processors/builder.py:21-95
(CatCostProcessor / DifCostProcessor / CorCostProcessor). Each builds the raw
volume at feature scale with the configured search range and hands it to an
aggregator module which returns a list of scored cost volumes (best first).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.cost_volume import cat_volume, dif_volume, correlation1d_volume


class CostProcessor(nn.Module):
    """Generic (volume builder -> aggregator) pipeline.

    volume_type: 'concatenation' | 'difference' | 'correlation'.
    max_disp/start_disp/dilation are in feature-scale units (e.g. 192//4).
    """
    aggregator: nn.Module
    volume_type: str = "concatenation"
    max_disp: int = 48
    start_disp: int = 0
    dilation: int = 1
    normalize: bool = False  # difference volume channel-norm option
    p: float = 1.0
    dtype: Any = jnp.float32
    # Optional NamedSharding for the raw volume [B, D, H, W, C]: batch on
    # the data axis, disparity on the model axis (the cost-volume sharding
    # capability, SURVEY.md §5). GSPMD propagates it through aggregation,
    # inserting halo exchanges for the strided 3-D convs.
    volume_sharding: Any = None

    @nn.compact
    def __call__(self, ref_fms, tgt_fms, disp_sample: Optional[Any] = None,
                 train: bool = False):
        kw = dict(max_disp=self.max_disp, start_disp=self.start_disp,
                  dilation=self.dilation, disp_sample=disp_sample)
        if self.volume_type == "concatenation":
            raw = cat_volume(ref_fms, tgt_fms, **kw)
        elif self.volume_type == "difference":
            raw = dif_volume(ref_fms, tgt_fms, normalize=self.normalize,
                             p=self.p, **kw)
        elif self.volume_type == "correlation":
            # correlation collapses channels: [B, D, H, W]; aggregators that
            # consume it expect a channel axis
            raw = correlation1d_volume(ref_fms, tgt_fms, **kw)[..., None]
        else:
            raise ValueError(f"unknown volume type {self.volume_type}")
        raw = raw.astype(self.dtype)
        if self.volume_sharding is not None:
            raw = jax.lax.with_sharding_constraint(raw, self.volume_sharding)
        costs = self.aggregator(raw, train=train)
        return costs if isinstance(costs, (list, tuple)) else [costs]
