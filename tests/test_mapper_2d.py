"""2-D mapping end-to-end (BASELINE.json configs[1]: 2-D lidar,
point-to-point ICP, random-sampling input filter)."""
import numpy as np

from norlab_icp_mapper_tpu import Mapper, PointBatch


CONFIG_2D = {
    "icp": {
        "matcher": {"KDTreeMatcher": {"knn": 1, "maxDist": 1.0}},
        "outlierFilters": [{"TrimmedDistOutlierFilter": {"ratio": 0.9}}],
        "errorMinimizer": "PointToPointErrorMinimizer",
        "transformationCheckers": [
            {"CounterTransformationChecker": {"maxIterationCount": 20}}],
    },
    "input": [{"RandomSamplingDataPointsFilter": {"prob": 0.8}}],
    "post": [],
    "mapper": {
        "updateCondition": {"type": "distance", "value": 0.0},
        "mapperModule": [
            {"PointDistanceMapperModule": {"minDistNewPoint": 0.05}}],
        "sensorMaxRange": 20,
    },
}


def make_room(rng, n=1200):
    """Walls of a 10x6 room plus a pillar."""
    t = rng.uniform(0, 1, size=(n // 4,)).astype(np.float32)
    walls = [
        np.column_stack([t * 10, np.zeros_like(t)]),
        np.column_stack([t * 10, np.full_like(t, 6)]),
        np.column_stack([np.zeros_like(t), t * 6]),
        np.column_stack([np.full_like(t, 10), t * 6]),
    ]
    ang = rng.uniform(0, 2 * np.pi, size=(n // 8,)).astype(np.float32)
    pillar = np.column_stack([3 + 0.4 * np.cos(ang), 3 + 0.4 * np.sin(ang)])
    return np.concatenate(walls + [pillar])


def pose2(x, y, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, x], [s, c, y], [0, 0, 1]], np.float32)


def scan2_at(world, pose, max_range=12.0):
    R, t = pose[:2, :2], pose[:2, 2]
    local = (world - t) @ R
    return local[np.linalg.norm(local, axis=1) < max_range].astype(np.float32)


def test_2d_mapping_and_correction(rng):
    world = make_room(rng)
    mapper = Mapper(CONFIG_2D, is_3d=False)
    # bootstrap
    p0 = pose2(5.0, 3.0)
    scan = PointBatch.from_numpy(scan2_at(world, p0))
    mapper.process_input(mapper.apply_input_filters(scan), p0, 0)
    assert mapper.get_map()["positions"].shape[1] == 2

    # noisy odometry on second scan; point-to-point ICP should correct
    p1 = pose2(5.5, 3.2, 0.1)
    est = p1.copy()
    est[:2, 2] += np.array([0.12, -0.08], np.float32)
    scan = PointBatch.from_numpy(scan2_at(world, p1))
    mapper.process_input(mapper.apply_input_filters(scan), est, int(1e8))
    err = np.linalg.norm(mapper.get_pose()[:2, 2] - p1[:2, 2])
    err_odo = np.linalg.norm(est[:2, 2] - p1[:2, 2])
    assert err < 0.6 * err_odo, (err, err_odo)

    # map holds both scans' content and trajectory is 3x3 poses
    assert len(mapper.get_trajectory()) == 2
    assert mapper.get_pose().shape == (3, 3)


def test_2d_map_save_format(tmp_path, rng):
    world = make_room(rng)
    mapper = Mapper(CONFIG_2D, is_3d=False)
    p0 = pose2(5.0, 3.0)
    scan = PointBatch.from_numpy(scan2_at(world, p0))
    mapper.process_input(mapper.apply_input_filters(scan), p0, 0)
    from norlab_icp_mapper_tpu.io import write_vtk, read_vtk
    cloud = mapper.get_map()
    path = str(tmp_path / "map2d.vtk")
    write_vtk(path, cloud["positions"])  # 2-D saves with z=0
    pos, _ = read_vtk(path)
    assert pos.shape[1] == 3
    np.testing.assert_allclose(pos[:, 2], 0.0)
    tr_path = str(tmp_path / "traj2d.vtk")
    mapper.get_trajectory().save(tr_path)
    tpos, tdesc = read_vtk(tr_path)
    assert tpos.shape[0] == 1 and "orientationX" in tdesc
