from .distributed import make_mesh, DistributedICP, shard_points

__all__ = ["make_mesh", "DistributedICP", "shard_points"]
