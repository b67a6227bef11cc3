from .vtk import read_vtk, write_vtk
from .trajectory_csv import read_trajectory_csv

__all__ = ["read_vtk", "write_vtk", "read_trajectory_csv"]
