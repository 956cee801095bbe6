from .mesh import get_mesh, replicate_to_mesh, shard_batch

__all__ = ["get_mesh", "shard_batch", "replicate_to_mesh"]
