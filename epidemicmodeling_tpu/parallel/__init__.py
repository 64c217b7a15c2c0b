from .mesh import (make_mesh, shard_batch_arrays, shard_region_batch,
                   sharded_train_prescribe_step)

__all__ = ["make_mesh", "shard_batch_arrays", "shard_region_batch",
           "sharded_train_prescribe_step"]
