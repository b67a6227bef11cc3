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
        self._poses: List = []  # np arrays, or device arrays (lazy)
        self.timestamps: List[int] = []  # nanoseconds
        self._has_device = False

    def add_pose(self, pose, timestamp_ns: int) -> None:
        """Append a pose; device arrays are accepted and fetched lazily in
        one batched transfer on first host access (the fused pipelined
        mapper appends per-scan poses without syncing the device)."""
        if isinstance(pose, np.ndarray):
            pose = np.asarray(pose, dtype=np.float32).copy()
        else:
            self._has_device = True
        self._poses.append(pose)
        self.timestamps.append(int(timestamp_ns))

    @property
    def poses(self) -> List[np.ndarray]:
        if self._has_device:
            import jax
            self._poses = [np.asarray(p, dtype=np.float32)
                           for p in jax.device_get(self._poses)]
            self._has_device = False
        return self._poses

    def clear(self) -> None:
        self._poses = []
        self.timestamps = []
        self._has_device = False

    def __len__(self) -> int:
        return len(self._poses)

    def positions(self) -> np.ndarray:
        d = self.dimension
        if not self._poses:
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
