from .mesh import barrier, batch_sharding, is_primary, make_mesh, replicated, shard_batch

__all__ = [
    "barrier",
    "batch_sharding",
    "is_primary",
    "make_mesh",
    "replicated",
    "shard_batch",
]
