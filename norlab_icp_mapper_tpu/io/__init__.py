from .vtk import read_vtk, write_vtk
from .trajectory_csv import read_trajectory_csv
from .ply_csv import read_ply, write_ply, read_csv_cloud, write_csv_cloud
from .pcd import read_pcd, write_pcd

__all__ = ["read_vtk", "write_vtk", "read_trajectory_csv",
           "read_ply", "write_ply", "read_csv_cloud", "write_csv_cloud",
           "read_pcd", "write_pcd",
           "read_point_cloud", "write_point_cloud"]


def read_point_cloud(path: str):
    """Format-dispatching loader (extension-based), like lpm DP::load."""
    low = path.lower()
    if low.endswith(".vtk"):
        return read_vtk(path)
    if low.endswith(".ply"):
        return read_ply(path)
    if low.endswith(".csv"):
        return read_csv_cloud(path)
    if low.endswith(".pcd"):
        return read_pcd(path)
    raise ValueError(f"unsupported point cloud format: {path}")


def write_point_cloud(path: str, positions, descriptors=None):
    low = path.lower()
    if low.endswith(".vtk"):
        return write_vtk(path, positions, descriptors)
    if low.endswith(".ply"):
        return write_ply(path, positions, descriptors)
    if low.endswith(".csv"):
        return write_csv_cloud(path, positions, descriptors)
    if low.endswith(".pcd"):
        return write_pcd(path, positions, descriptors)
    raise ValueError(f"unsupported point cloud format: {path}")
