"""Online fused mode: register/merge split programs (VERDICT r1 item 5).

Online mode runs the SAME per-scan math as offline, but as two device
programs: the corrected pose is an output of the first (solve) program so a
consumer blocking on ``get_pose()`` never waits for the merge — the
reference's async-map-update design (``Mapper.cpp:248-255,280-287``).  These
tests assert the split path produces the same trajectory and map as the
single fused program, and that the pose handle is live without a drain.
"""
import numpy as np
import pytest

from norlab_icp_mapper_tpu import Mapper, PointBatch


def make_world(rng, n=1500):
    # two walls + floor: enough geometry to constrain point-to-plane
    floor = np.stack([rng.uniform(0, 30, n), rng.uniform(-5, 5, n),
                      np.zeros(n)], 1)
    wall1 = np.stack([rng.uniform(0, 30, n), np.full(n, -5.0),
                      rng.uniform(0, 3, n)], 1)
    wall2 = np.stack([rng.uniform(0, 30, n), np.full(n, 5.0),
                      rng.uniform(0, 3, n)], 1)
    return np.concatenate([floor, wall1, wall2]).astype(np.float32)


def sensor_scan(world, pose, rng_radius=12.0):
    d = np.linalg.norm(world - pose[:3, 3], axis=1)
    pts = world[d < rng_radius]
    R, t = pose[:3, :3], pose[:3, 3]
    return ((pts - t) @ R).astype(np.float32)  # sensor frame


CONFIG = {
    "input": [{"AddDescriptorDataPointsFilter": {
        "descriptorName": "probabilityDynamic",
        "descriptorDimension": 1, "descriptorValues": [0.2]}}],
    "post": [{"SurfaceNormalDataPointsFilter": {"knn": 8}}],
    "mapper": {
        "updateCondition": {"type": "delay", "value": 0.05},
        "sensorMaxRange": 50,
        "mapperModule": [{"PointDistanceMapperModule":
                          {"minDistNewPoint": 0.1}}],
    },
    "icp": {
        "matcher": {"KDTreeMatcher": {"knn": 1, "maxDist": 1.0}},
        "errorMinimizer": "PointToPlaneErrorMinimizer",
        "transformationCheckers": [
            {"CounterTransformationChecker": {"maxIterationCount": 8}}],
    },
}


def drive(mapper, world, poses):
    for i, pose in enumerate(poses):
        scan = sensor_scan(world, pose)
        batch = PointBatch.from_numpy(scan)
        filtered = mapper.apply_input_filters(batch)
        mapper.process_input(filtered, pose, int(1e9 + i * 1e8),
                             scan_valid_hint=scan.shape[0])
    return mapper


def poses_along_x(xs):
    out = []
    for x in xs:
        p = np.eye(4, dtype=np.float32)
        p[0, 3] = x
        out.append(p)
    return out


def test_online_split_matches_offline_fused(rng):
    world = make_world(rng)
    poses = poses_along_x(np.arange(1.0, 10.0, 1.5))

    off = drive(Mapper(CONFIG, is_3d=True, is_online=False, seed=3),
                world, poses)
    off.drain()
    on = drive(Mapper(CONFIG, is_3d=True, is_online=True, seed=3),
               world, poses)
    on.drain()

    t_off = np.stack([np.asarray(p) for p in off.get_trajectory().poses])
    t_on = np.stack([np.asarray(p) for p in on.get_trajectory().poses])
    np.testing.assert_allclose(t_on, t_off, rtol=0, atol=5e-4)

    m_off = off.get_map()["positions"]
    m_on = on.get_map()["positions"]
    assert abs(m_off.shape[0] - m_on.shape[0]) <= 2
    on.shutdown()
    off.shutdown()


def test_online_pose_live_without_drain(rng):
    world = make_world(rng)
    poses = poses_along_x(np.arange(1.0, 6.0, 1.5))
    mapper = drive(Mapper(CONFIG, is_3d=True, is_online=True, seed=0),
                   world, poses)
    # pose must be readable mid-pipeline (no drain): the split register
    # program produced it
    pose = mapper.get_pose()
    assert pose is not None and pose.shape == (4, 4)
    assert np.isfinite(pose).all()
    assert abs(pose[0, 3] - poses[-1][0, 3]) < 0.5
    mapper.drain()
    mapper.shutdown()


def test_failed_fused_step_leaves_clear_state(rng):
    """ADVICE r1: a failure after buffer donation must not leave the Mapper
    pointing at deleted device buffers — accessors raise clearly instead."""
    world = make_world(rng)
    poses = poses_along_x(np.arange(1.0, 5.0, 1.5))
    mapper = drive(Mapper(CONFIG, is_3d=True, is_online=False, seed=1),
                   world, poses)

    class Boom(RuntimeError):
        pass

    def explode(*a, **k):
        raise Boom("injected dispatch failure")

    mapper._fused._jit = explode
    scan = sensor_scan(world, poses[-1])
    batch = mapper.apply_input_filters(PointBatch.from_numpy(scan))
    with pytest.raises(RuntimeError, match="unrecoverable"):
        mapper.process_input(batch, poses[-1], int(9e9),
                             scan_valid_hint=scan.shape[0])
    assert mapper.map.local is None
    assert mapper.map.is_local_point_cloud_empty()
