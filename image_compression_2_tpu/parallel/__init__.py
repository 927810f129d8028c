from .distributed import global_batch_slice, initialize_distributed
from .mesh import create_mesh, data_sharding, replicated, shard_batch

__all__ = [
    "create_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "global_batch_slice",
    "initialize_distributed",
]
