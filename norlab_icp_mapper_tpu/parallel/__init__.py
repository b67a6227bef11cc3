from .distributed import make_mesh, DistributedICP, shard_points
from .adapter import ShardedICPAdapter
from .sharded_map import ShardedMapConfig, ShardedMapperStep, ShardedMapper

__all__ = ["make_mesh", "DistributedICP", "shard_points",
           "ShardedICPAdapter", "ShardedMapConfig", "ShardedMapperStep",
           "ShardedMapper"]
