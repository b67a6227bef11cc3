"""Dynamic-vs-static point maintenance on a moving-object sequence
(BASELINE.json configs[3]): a box drives through a static room; its old
positions must gain dynamic probability and be cut from the map."""
import numpy as np

from norlab_icp_mapper_tpu import Mapper, PointBatch


CONFIG = {
    "icp": {
        "matcher": {"KDTreeMatcher": {"knn": 3, "maxDist": 1.0}},
        "errorMinimizer": "IdentityErrorMinimizer",
        "transformationCheckers": [
            {"CounterTransformationChecker": {"maxIterationCount": 5}}],
    },
    "input": [{"AddDescriptorDataPointsFilter": {
        "descriptorName": "probabilityDynamic", "descriptorDimension": 1,
        "descriptorValues": [0.6]}}],
    "post": [
        {"SurfaceNormalDataPointsFilter": {"knn": 8, "maxDist": 2.0}},
        {"CutAtDescriptorThresholdDataPointsFilter": {
            "descName": "probabilityDynamic", "useLargerThan": 1,
            "threshold": 0.65}},
    ],
    "mapper": {
        "updateCondition": {"type": "delay", "value": 0.0},
        "mapperModule": [
            {"DynamicPointsMapperModule": {
                "thresholdDynamic": 0.9, "alpha": 0.8, "beta": 0.99,
                "beamHalfAngle": 0.05, "epsilonA": 0.02, "epsilonD": 0.02,
                "sensorMaxRange": 50}},
            {"PointDistanceMapperModule": {"minDistNewPoint": 0.05}},
        ],
        "sensorMaxRange": 50,
    },
}


def room_walls(rng, n=1500):
    """Static square room 20x20 around origin, walls at +-10."""
    t = rng.uniform(-10, 10, size=(n // 4,)).astype(np.float32)
    z = rng.uniform(0, 2, size=(n // 4,)).astype(np.float32)
    return np.concatenate([
        np.column_stack([t, np.full_like(t, -10), z]),
        np.column_stack([t, np.full_like(t, 10), z]),
        np.column_stack([np.full_like(t, -10), t, z]),
        np.column_stack([np.full_like(t, 10), t, z]),
    ])


def box_at(rng, center, n=150):
    """A small box (moving object) at `center`."""
    pts = rng.uniform(-0.4, 0.4, size=(n, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2])
    return pts + np.asarray(center, np.float32)


def test_moving_object_removed_static_kept(rng):
    walls = room_walls(rng)
    mapper = Mapper(CONFIG, is_3d=True)
    pose = np.eye(4, dtype=np.float32)  # sensor at origin
    pose[2, 3] = 1.0
    # box moves along x: 5 -> -5 over 8 frames (fresh samples each frame)
    xs = np.linspace(5, -5, 8)
    for i, bx in enumerate(xs):
        world = np.concatenate([walls, box_at(rng, (bx, 0.0, 0.0))])
        local = world - pose[:3, 3]
        scan = PointBatch.from_numpy(local.astype(np.float32))
        mapper.process_input(mapper.apply_input_filters(scan), pose,
                             i * int(1e8))
    cloud = mapper.get_map()
    pos = cloud["positions"]
    # static walls survive
    n_wall = np.sum(np.abs(np.abs(pos[:, 1]) - 10) < 0.5) + \
        np.sum(np.abs(np.abs(pos[:, 0]) - 10) < 0.5)
    assert n_wall > 800, n_wall
    # early box positions (x near 5, away from current box at -5) were seen
    # through repeatedly -> cut from the map. A minority of points whose
    # beams have no background return behind them (rays exiting above the
    # walls) legitimately survive — the reference keeps those too.
    early_box = np.sum(
        (np.abs(pos[:, 0] - 5.0) < 0.6) & (np.abs(pos[:, 1]) < 0.6))
    assert early_box < 100, early_box  # ~300 were added; >2/3 removed


def test_ate_metric():
    from norlab_icp_mapper_tpu.utils.metrics import ate, rpe
    ref = np.cumsum(np.ones((10, 3)) * 0.1, axis=0)
    est = ref + 0.05
    a = ate(est, ref)
    np.testing.assert_allclose(a, np.sqrt(3) * 0.05, rtol=1e-6)
    assert ate(est, ref, align=True) < 1e-9  # constant offset aligns away
    poses = [np.eye(4) for _ in range(5)]
    t, r = rpe(poses, poses)
    assert t == 0.0 and r == 0.0
