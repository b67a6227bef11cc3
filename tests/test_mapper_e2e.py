"""End-to-end Mapper tests on small synthetic worlds (CPU-fast).

Mirrors the reference's de-facto validation (the bundled example pipeline,
SURVEY.md section 4) at reduced scale, plus behaviors the reference only
documents: update-condition policies, localization-only mode, map
export/import round-trip.
"""
import numpy as np
import pytest

from norlab_icp_mapper_tpu import Mapper, PointBatch


def make_world(rng, n=600):
    """Random points on the walls/floor of a corridor."""
    n3 = n // 3
    x = rng.uniform(0, 20, size=(n3,)).astype(np.float32)
    y = rng.uniform(-3, 3, size=(n3,)).astype(np.float32)
    floor = np.column_stack([x, y, np.zeros(n3, np.float32)])
    wall1 = np.column_stack(
        [x, np.full(n3, -3, np.float32),
         rng.uniform(0, 2, size=n3).astype(np.float32)])
    wall2 = np.column_stack(
        [x, np.full(n3, 3, np.float32),
         rng.uniform(0, 2, size=n3).astype(np.float32)])
    return np.concatenate([floor, wall1, wall2])


def scan_at(world, pose, max_range=15.0):
    """Points of `world` visible from pose, in sensor frame."""
    R, t = pose[:3, :3], pose[:3, 3]
    local = (world - t) @ R  # R^T applied on the right
    keep = np.linalg.norm(local, axis=1) < max_range
    return local[keep].astype(np.float32)


BASE_CONFIG = {
    "icp": {
        "matcher": {"KDTreeMatcher": {"knn": 3, "maxDist": 1.0}},
        "outlierFilters": [{"TrimmedDistOutlierFilter": {"ratio": 0.9}}],
        "errorMinimizer": "PointToPlaneErrorMinimizer",
        "transformationCheckers": [
            {"CounterTransformationChecker": {"maxIterationCount": 15}},
        ],
    },
    "input": [],
    "post": [{"SurfaceNormalDataPointsFilter": {"knn": 8}}],
    "mapper": {
        "updateCondition": {"type": "distance", "value": 0.0},
        "mapperModule": [
            {"PointDistanceMapperModule": {"minDistNewPoint": 0.1}}],
        "sensorMaxRange": 15,
    },
}


def pose_at(x, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    T[0, 3] = x
    return T


def drive(mapper, world, xs, noise=0.0, rng=None):
    """Feed scans taken at x positions; odometry optionally perturbed."""
    stamps = (np.arange(len(xs)) * int(1e8)).tolist()
    for x, stamp in zip(xs, stamps):
        true_pose = pose_at(x)
        est = true_pose.copy()
        if noise and rng is not None:
            est[:3, 3] += rng.normal(size=3).astype(np.float32) * noise
        scan = scan_at(world, true_pose)
        batch = PointBatch.from_numpy(scan)
        filtered = mapper.apply_input_filters(batch)
        mapper.process_input(filtered, est, stamp)
    return mapper


def test_mapping_accumulates_map(rng):
    world = make_world(rng)
    mapper = Mapper(BASE_CONFIG, is_3d=True)
    drive(mapper, world, [2.0, 4.0, 6.0])
    cloud = mapper.get_map()
    assert cloud["positions"].shape[0] > 500
    assert len(mapper.get_trajectory()) == 3
    assert mapper.get_pose() is not None


def test_icp_corrects_noisy_odometry(rng):
    world = make_world(rng, n=900)
    mapper = Mapper(BASE_CONFIG, is_3d=True)
    drive(mapper, world, [2.0], noise=0.0)
    # second scan with odometry error: ICP should pull pose back
    true_pose = pose_at(2.5)
    est = true_pose.copy()
    est[:3, 3] += np.array([0.15, -0.1, 0.05], np.float32)
    scan = scan_at(world, true_pose)
    mapper.process_input(
        mapper.apply_input_filters(PointBatch.from_numpy(scan)),
        est, int(2e8))
    err = np.linalg.norm(mapper.get_pose()[:3, 3] - true_pose[:3, 3])
    err_odo = np.linalg.norm(est[:3, 3] - true_pose[:3, 3])
    assert err < 0.5 * err_odo, (err, err_odo)


def test_localization_only_mode(rng):
    world = make_world(rng)
    mapper = Mapper(BASE_CONFIG, is_3d=True)
    drive(mapper, world, [2.0, 4.0])
    n_before = mapper.get_map()["positions"].shape[0]
    mapper.set_is_mapping(False)
    drive(mapper, world, [6.0, 8.0])
    n_after = mapper.get_map()["positions"].shape[0]
    assert n_after == n_before  # no growth while not mapping
    assert len(mapper.get_trajectory()) == 4  # localization continues


def test_get_set_map_roundtrip(rng):
    world = make_world(rng)
    m1 = Mapper(BASE_CONFIG, is_3d=True)
    drive(m1, world, [2.0, 4.0])
    cloud = m1.get_map()

    m2 = Mapper(BASE_CONFIG, is_3d=True)
    m2.set_map(cloud)
    assert not m2.map.is_local_point_cloud_empty()
    assert len(m2.get_trajectory()) == 0  # setMap clears trajectory
    cloud2 = m2.get_map()
    assert cloud2["positions"].shape[0] == cloud["positions"].shape[0]
    # localization on the restored map still works
    m2.set_is_mapping(False)
    drive(m2, world, [3.0])
    assert m2.get_pose() is not None


def test_update_condition_distance_gates_updates(rng):
    world = make_world(rng)
    cfg = {**BASE_CONFIG,
           "mapper": {**BASE_CONFIG["mapper"],
                      "updateCondition": {"type": "distance", "value": 100.0}}}
    mapper = Mapper(cfg, is_3d=True)
    drive(mapper, world, [2.0, 2.5, 3.0])
    # bootstrap update only; later scans within 100 m -> no merge
    tra = mapper.get_trajectory()
    assert len(tra) == 3
    # map only contains first-scan content (scan radius 15 around x=2)
    pos = mapper.get_map()["positions"]
    assert pos[:, 0].max() <= 2.0 + 15.0 + 1e-3


def test_update_condition_delay(rng):
    world = make_world(rng)
    cfg = {**BASE_CONFIG,
           "mapper": {**BASE_CONFIG["mapper"],
                      "updateCondition": {"type": "delay", "value": 1.0}}}
    mapper = Mapper(cfg, is_3d=True)
    # stamps 0.1s apart -> only bootstrap + one update at >1s
    drive(mapper, world, [2.0] * 12)
    assert len(mapper.get_trajectory()) == 12


def test_invalid_config_keys_rejected():
    with pytest.raises(ValueError, match="Invalid key"):
        Mapper({"bogus": {}}, is_3d=True)
    with pytest.raises(ValueError, match="Invalid map update condition"):
        Mapper({"mapper": {"updateCondition": {"type": "nope", "value": 1}}},
               is_3d=True)
    with pytest.raises(ValueError, match="Invalid map update overlap"):
        Mapper({"mapper": {"updateCondition": {"type": "overlap", "value": 2}}},
               is_3d=True)


def test_missing_config_file():
    with pytest.raises(RuntimeError, match="does not exist"):
        Mapper("/nonexistent/config.yaml", is_3d=True)
