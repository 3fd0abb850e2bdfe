from .mesh import make_mesh, ShardedProfiler

__all__ = ["make_mesh", "ShardedProfiler"]
