"""Parallelism: device meshes, shardings, distributed helpers."""

from .mesh import (make_mesh, batch_sharding, replicated,
                   cost_volume_sharding, shard_batch, DATA_AXIS, MODEL_AXIS)
from .distributed import (init_distributed, add_distributed_args,
                          resolve_launcher)

__all__ = ["make_mesh", "batch_sharding", "replicated",
           "cost_volume_sharding", "shard_batch", "DATA_AXIS", "MODEL_AXIS",
           "init_distributed", "add_distributed_args", "resolve_launcher"]
