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
    arrays["last_update_ns"] = np.asarray(
        [mapper.last_time_map_was_updated], np.float64)
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
    mapper.last_time_map_was_updated = float(data["last_update_ns"][0])
    if localization_only:
        mapper.set_is_mapping(False)
