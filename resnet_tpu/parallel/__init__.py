from .mesh import make_mesh, replicate, shard_batch
from .data_parallel import make_shard_map_train_step

__all__ = ["make_mesh", "replicate", "shard_batch", "make_shard_map_train_step"]
