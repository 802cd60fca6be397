"""Multi-chip parallelism: device mesh, sharding specs, sharded steps."""
from .mesh import (data_sharding, make_mesh, replicate, shard_batch,
                   sharded_train_step)

__all__ = ["make_mesh", "data_sharding", "replicate", "shard_batch",
           "sharded_train_step"]
