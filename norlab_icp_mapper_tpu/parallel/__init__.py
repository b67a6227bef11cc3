from .distributed import make_mesh, DistributedICP, shard_points
from .adapter import ShardedICPAdapter

__all__ = ["make_mesh", "DistributedICP", "shard_points", "ShardedICPAdapter"]
