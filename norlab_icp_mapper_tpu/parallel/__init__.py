from .distributed import make_mesh, DistributedICP, shard_points
from .sharded_map import ShardedMapConfig, ShardedMapperStep, ShardedMapper

__all__ = ["make_mesh", "DistributedICP", "shard_points",
           "ShardedMapConfig", "ShardedMapperStep", "ShardedMapper"]
