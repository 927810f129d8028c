from .distributed import global_batch_slice, initialize_distributed
from .mesh import create_mesh, data_sharding, replicated, shard_batch
from .tp import leaf_spec, shard_tree, tree_shardings, wants_tp

__all__ = [
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
