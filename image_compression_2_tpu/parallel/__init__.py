from .distributed import global_batch_slice, initialize_distributed
from .mesh import create_mesh, data_sharding, replicated, shard_batch
from .sp import ambient_mesh, shard_spatial, wants_sp
from .tp import leaf_spec, shard_tree, tree_shardings, wants_tp

__all__ = [
    "ambient_mesh",
    "shard_spatial",
    "wants_sp",
    "create_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "global_batch_slice",
    "initialize_distributed",
    "leaf_spec",
    "shard_tree",
    "tree_shardings",
    "wants_tp",
]
