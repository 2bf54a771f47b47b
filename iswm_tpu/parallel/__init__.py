from .distributed import maybe_initialize_distributed, process_local_batch_slice
from .mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    spatial_sharding,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "maybe_initialize_distributed",
    "process_local_batch_slice",
    "replicated",
    "shard_batch",
    "spatial_sharding",
]
