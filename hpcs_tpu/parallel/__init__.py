from .data_parallel import (
    make_data_parallel_test_step,
    make_data_parallel_train_step,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = [
    "make_data_parallel_test_step",
    "make_data_parallel_train_step",
    "make_mesh",
    "replicate",
    "shard_batch",
]
