from .mesh import make_mesh, mesh_axis_sizes
from .sharding import (
    batch_sharding,
    replicated_sharding,
    shardings_for_tree,
    shard_batch,
)
from .distributed import initialize_runtime, global_batch_from_local

__all__ = [
    "make_mesh",
    "mesh_axis_sizes",
    "batch_sharding",
    "replicated_sharding",
    "shardings_for_tree",
    "shard_batch",
    "initialize_runtime",
    "global_batch_from_local",
]
