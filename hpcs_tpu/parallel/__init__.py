from .data_parallel import (
    make_data_parallel_epoch_fn,
    make_data_parallel_test_step,
    make_data_parallel_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from .point_parallel import (
    make_mesh_2d,
    make_point_sharded_forward,
    make_point_sharded_train_step,
    shard_points_batch,
)

__all__ = [
    "make_data_parallel_epoch_fn",
    "make_data_parallel_test_step",
    "make_data_parallel_train_step",
    "make_mesh",
    "make_mesh_2d",
    "make_point_sharded_forward",
    "make_point_sharded_train_step",
    "shard_points_batch",
    "replicate",
    "shard_batch",
]
