"""Multi-chip parallelism: device mesh, sharding specs, sharded steps."""
from .mesh import (data_sharding, make_mesh, make_mesh_2d, model_axis_size,
                   model_shardings, place_model_parallel, replicate,
                   shard_batch, sharded_train_step)

__all__ = ["make_mesh", "make_mesh_2d", "data_sharding", "model_axis_size",
           "model_shardings", "place_model_parallel", "replicate",
           "shard_batch", "sharded_train_step"]
