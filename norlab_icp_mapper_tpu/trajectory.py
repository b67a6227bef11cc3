"""Trajectory recorder: append-only pose + timestamp log.

Parity with reference ``Trajectory.{h,cpp}``: ``addPose(pose, stamp)``,
``save(filename)`` (positions as features, rotation columns as
``orientation{X,Y,Z}`` descriptors, nanosecond time channel —
``Trajectory.cpp:15-53``), ``clear()``.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .io.vtk import write_vtk

__all__ = ["Trajectory"]


class Trajectory:
    def __init__(self, dimension: int = 3):
        self.dimension = dimension
        self.poses: List[np.ndarray] = []
        self.timestamps: List[int] = []  # nanoseconds

    def add_pose(self, pose: np.ndarray, timestamp_ns: int) -> None:
        self.poses.append(np.asarray(pose, dtype=np.float32).copy())
        self.timestamps.append(int(timestamp_ns))

    def clear(self) -> None:
        self.poses = []
        self.timestamps = []

    def __len__(self) -> int:
        return len(self.poses)

    def positions(self) -> np.ndarray:
        d = self.dimension
        if not self.poses:
            return np.zeros((0, d), np.float32)
        return np.stack([p[:d, d] for p in self.poses])

    def save(self, filename: str) -> None:
        d = self.dimension
        n = len(self.poses)
        pos = self.positions()
        desc = {}
        axes = ["orientationX", "orientationY", "orientationZ"][:d]
        for col, name in enumerate(axes):
            desc[name] = np.stack([p[:d, col] for p in self.poses]) if n else \
                np.zeros((0, d), np.float32)
        desc["t"] = np.asarray(self.timestamps, np.float64)[:, None].astype(np.float32)
        write_vtk(filename, pos, desc)
