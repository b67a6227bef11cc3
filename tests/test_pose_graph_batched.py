"""Batched loop-closure registration + Mapper keyframe integration
(VERDICT r1 item 9: vmapped candidate registrations, keyframe selection in
the Mapper, end-to-end trajectory improvement on a synthetic loop)."""
import numpy as np
import jax.numpy as jnp

from norlab_icp_mapper_tpu import Mapper, PointBatch, se3
from norlab_icp_mapper_tpu.slam import (
    detect_loop_closures, detect_loop_closures_batched)


def test_batched_matches_serial(rng):
    from norlab_icp_mapper_tpu.icp.engine import ICPEngine
    from tests.test_icp import make_structured_cloud

    cloud = make_structured_cloud(rng)
    n = 13
    poses = np.stack([np.eye(4, dtype=np.float32)] * n)
    for i in range(1, 12):
        poses[i][0, 3] = 100.0 + i
    scans = [cloud if i in (0, 12) else cloud + 500.0 for i in range(n)]

    kf_pos = jnp.stack([jnp.asarray(s) for s in scans])
    kf_mask = jnp.ones(kf_pos.shape[:2], bool)
    ei, ej, Z, w = detect_loop_closures_batched(
        kf_pos, kf_mask, poses, min_index_gap=5, max_dist=2.0,
        match_max_dist=1.0, normal_radius=1.5)
    assert (0, 12) in list(zip(ei, ej))
    k = list(zip(ei, ej)).index((0, 12))
    np.testing.assert_allclose(Z[k], np.eye(4), atol=2e-2)

    engine = ICPEngine({
        "matcher": {"KDTreeMatcher": {"knn": 1, "maxDist": 1.0}},
        "errorMinimizer": "PointToPlaneErrorMinimizer",
        "referenceDataPointsFilters": [
            {"SurfaceNormalDataPointsFilter": {"knn": 8}}],
        "transformationCheckers": [
            {"CounterTransformationChecker": {"maxIterationCount": 10}}],
    }, dim=3)
    sei, sej, sZ, _ = detect_loop_closures(scans, poses, engine,
                                           min_index_gap=5, max_dist=2.0)
    ks = list(zip(sei, sej)).index((0, 12))
    np.testing.assert_allclose(Z[k], sZ[ks], atol=3e-2)


def room_world(rng, n=3000):
    """Square room with pillars: constrains all 6 DoF from anywhere."""
    side = 24.0
    walls = []
    for axis, const in ((1, 0.0), (1, side), (0, 0.0), (0, side)):
        m = n // 6
        u = rng.uniform(0, side, m)
        z = rng.uniform(0, 3, m)
        w = np.zeros((m, 3), np.float32)
        w[:, axis] = const
        w[:, 1 - axis] = u
        w[:, 2] = z
        walls.append(w)
    floor = np.stack([rng.uniform(0, side, n // 3),
                      rng.uniform(0, side, n // 3),
                      np.zeros(n // 3)], 1).astype(np.float32)
    pillars = []
    for px, py in ((8, 8), (16, 8), (8, 16), (16, 16)):
        m = n // 12
        th = rng.uniform(0, 2 * np.pi, m)
        pillars.append(np.stack([px + 0.5 * np.cos(th),
                                 py + 0.5 * np.sin(th),
                                 rng.uniform(0, 3, m)], 1))
    return np.concatenate(walls + [floor] + pillars).astype(np.float32)


def loop_poses(n=10, c=12.0, r=7.0):
    out = []
    for i in range(n):
        th = 2 * np.pi * i / n
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = c + r * np.cos(th)
        T[1, 3] = c + r * np.sin(th)
        T[2, 3] = 1.0
        out.append(T)
    return out


def test_mapper_keyframes_and_refine(rng):
    world = room_world(rng)
    gt = loop_poses(10)
    # drifted odometry: integrate noisy relative motions
    drifted = [gt[0]]
    for i in range(1, len(gt)):
        rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        xi = np.array([0.04, 0.04, 0.0, 0.0, 0.0, 0.015], np.float32)
        noise = np.asarray(se3.exp_se3(jnp.asarray(
            rng.normal(size=6).astype(np.float32) * xi)), np.float32)
        drifted.append((drifted[-1] @ rel @ noise).astype(np.float32))

    config = {
        "mapper": {"updateCondition": {"type": "delay", "value": 0.05},
                   "sensorMaxRange": 50,
                   "mapperModule": [{"PointDistanceMapperModule":
                                     {"minDistNewPoint": 0.1}}]},
        # Identity: the trajectory IS the drifted odometry — refinement must
        # fix it from the keyframe scans alone
        "icp": {"matcher": {"KDTreeMatcher": {"knn": 1, "maxDist": 1.0}},
                "errorMinimizer": "IdentityErrorMinimizer",
                "transformationCheckers": [
                    {"CounterTransformationChecker":
                     {"maxIterationCount": 1}}]},
    }
    mapper = Mapper(config, is_3d=True, is_online=False)
    mapper.enable_keyframes(min_distance=0.5)
    for i, (true_pose, est_pose) in enumerate(zip(gt, drifted)):
        # the robot is TRULY at the ground-truth pose (scans taken there);
        # only the odometry estimate drifts
        d = np.linalg.norm(world - true_pose[:3, 3], axis=1)
        local = ((world[d < 12.0] - true_pose[:3, 3]) @ true_pose[:3, :3])
        scan = PointBatch.from_numpy(local.astype(np.float32)[:2048])
        mapper.process_input(mapper.apply_input_filters(scan), est_pose,
                             int(1e9 + i * 1e8),
                             scan_valid_hint=min(local.shape[0], 2048))
    mapper.drain()
    assert len(mapper._keyframes) >= 8, len(mapper._keyframes)

    before, after, info = mapper.refine_trajectory(
        min_index_gap=4, max_dist=20.0, min_overlap=0.3,
        match_max_dist=1.5, normal_radius=1.0)
    assert info["loop_closures"], "no loop closures found"

    gt_xyz = np.stack([p[:3, 3] for p in gt[:before.shape[0]]])
    err_before = np.linalg.norm(before[:, :3, 3] - gt_xyz, axis=1).mean()
    err_after = np.linalg.norm(after[:, :3, 3] - gt_xyz, axis=1).mean()
    assert err_after < err_before * 0.8, (err_before, err_after)
