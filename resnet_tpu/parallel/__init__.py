from .mesh import make_mesh, replicate, shard_batch
from .data_parallel import make_shard_map_train_step
from .distributed import host_batch_slice, initialize_distributed

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "make_shard_map_train_step",
    "initialize_distributed",
    "host_batch_slice",
]
