"""Checkpoint / resume.

The reference's checkpoint story is map export/import (``getMap``/``setMap``
+ ``Trajectory::save`` — SURVEY.md section 5); restoring a map and switching
mapping off gives localization-only resume (``Mapper.cpp:319-322``).  This
module packages that into one artifact:

  ``save_checkpoint(path, mapper)`` writes a single ``.npz`` holding the
  global map cloud (positions + all descriptors), the current pose, the
  trajectory (poses + timestamps), and the update-condition state.
  ``load_checkpoint(path, mapper)`` restores all of it; pass
  ``localization_only=True`` to also freeze mapping.
"""
from __future__ import annotations

import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]

_RESERVED = ("pose", "traj_poses", "traj_stamps", "last_update_pose",
             "last_update_ns", "positions")


def save_checkpoint(path: str, mapper) -> None:
    cloud = mapper.get_map()
    arrays = {"positions": cloud["positions"]}
    for name, v in cloud.items():
        if name == "positions":
            continue
        if name in _RESERVED:
            raise ValueError(f"descriptor name collides with checkpoint key: {name}")
        arrays[name] = v
    tr = mapper.get_trajectory()
    arrays["pose"] = (mapper.get_pose() if mapper.get_pose() is not None
                      else np.eye(mapper.dim + 1, dtype=np.float32))
    arrays["traj_poses"] = (np.stack(tr.poses) if tr.poses
                            else np.zeros((0, mapper.dim + 1, mapper.dim + 1),
                                          np.float32))
    arrays["traj_stamps"] = np.asarray(tr.timestamps, np.int64)
    arrays["last_update_pose"] = mapper.last_pose_where_map_was_updated
    # exact int64 ns: 2026-epoch nanoseconds (~1.7e18) exceed float64's
    # 2^53 integer range; int64-min is the "never updated" (-inf) sentinel
    ns = mapper.last_time_map_was_updated
    arrays["last_update_ns"] = np.asarray(
        [np.iinfo(np.int64).min if not np.isfinite(ns) else int(ns)],
        np.int64)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, mapper, localization_only: bool = False) -> None:
    data = np.load(path)
    cloud = {"positions": data["positions"]}
    for name in data.files:
        if name not in _RESERVED:
            cloud[name] = data[name]
    mapper.set_map(cloud)  # clears trajectory, re-arms window partition
    tr = mapper.get_trajectory()
    for pose, stamp in zip(data["traj_poses"], data["traj_stamps"]):
        tr.add_pose(pose, int(stamp))
    mapper.pose = data["pose"]
    mapper.last_pose_where_map_was_updated = data["last_update_pose"]
    raw_ns = data["last_update_ns"][0]
    if data["last_update_ns"].dtype.kind == "f":  # legacy float64 artifact
        mapper.last_time_map_was_updated = float(raw_ns)
    else:
        mapper.last_time_map_was_updated = (
            -np.inf if int(raw_ns) == np.iinfo(np.int64).min else int(raw_ns))
    if localization_only:
        mapper.set_is_mapping(False)
