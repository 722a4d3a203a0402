from .mesh import (
    composite_shardings,
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_batch,
    spatial_batch_specs,
    spatial_shard_batch,
    zero_shardings,
)
from .data_parallel import make_shard_map_train_step
from .distributed import host_batch_slice, initialize_distributed

__all__ = [
    "composite_shardings",
    "make_mesh",
    "make_mesh_2d",
    "replicate",
    "shard_batch",
    "spatial_batch_specs",
    "spatial_shard_batch",
    "zero_shardings",
    "make_shard_map_train_step",
    "initialize_distributed",
    "host_batch_slice",
]
