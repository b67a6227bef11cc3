from .nn import knn, nn1
from .voxel import voxel_keys, voxel_select

__all__ = ["knn", "nn1", "voxel_keys", "voxel_select"]
