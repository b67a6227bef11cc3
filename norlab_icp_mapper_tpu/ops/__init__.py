from .nn import knn, nn1
from .voxel import voxel_coords, voxel_select

__all__ = ["knn", "nn1", "voxel_coords", "voxel_select"]
