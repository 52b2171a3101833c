from .mesh import batch_sharding, is_primary, make_mesh, replicated, shard_batch

__all__ = ["batch_sharding", "is_primary", "make_mesh", "replicated", "shard_batch"]
