import numpy as np
import jax.numpy as jnp
import pytest

from norlab_icp_mapper_tpu import se3
from norlab_icp_mapper_tpu.points import PointBatch
from norlab_icp_mapper_tpu.icp.engine import ICPEngine


def make_structured_cloud(rng, n=800):
    """Three orthogonal planes — well-constrained for point-to-plane."""
    n3 = n // 3
    xy = rng.uniform(-2, 2, size=(n3, 2)).astype(np.float32)
    a = np.column_stack([xy, np.zeros(n3, np.float32)])
    b = np.column_stack([xy[:, :1], np.zeros(n3, np.float32), xy[:, 1:]])
    c = np.column_stack([np.zeros(n3, np.float32), xy])
    return np.concatenate([a, b, c]) + np.array([1.0, 2.0, 0.5], np.float32)


def perturbation(trans=0.1, rot=0.05, seed=7):
    r = np.random.default_rng(seed)
    xi = np.concatenate([r.normal(size=3) * trans,
                         r.normal(size=3) * rot]).astype(np.float32)
    return np.asarray(se3.exp_se3(jnp.asarray(xi)))


BASE_CFG = {
    "matcher": {"KDTreeMatcher": {"knn": 1, "maxDist": 1.0}},
    "outlierFilters": [{"TrimmedDistOutlierFilter": {"ratio": 0.9}}],
    "errorMinimizer": "PointToPlaneErrorMinimizer",
    "referenceDataPointsFilters": [{"SurfaceNormalDataPointsFilter": {"knn": 8}}],
    "transformationCheckers": [
        {"CounterTransformationChecker": {"maxIterationCount": 30}},
        {"DifferentialTransformationChecker": {
            "minDiffRotErr": 1e-5, "minDiffTransErr": 1e-5, "smoothLength": 3}},
    ],
}


def run_icp(cfg, cloud, T_true, dim=3):
    engine = ICPEngine(cfg, dim=dim)
    ref = PointBatch.from_numpy(cloud)
    engine.set_map(ref)
    # reading = cloud moved by T_err; ICP should recover correction ≈ inverse
    moved = cloud @ np.asarray(T_true)[:dim, :dim].T + np.asarray(T_true)[:dim, dim]
    reading = PointBatch.from_numpy(moved.astype(np.float32))
    return engine(reading), engine


def test_point_to_plane_recovers_transform(rng):
    cloud = make_structured_cloud(rng)
    T_err = perturbation(0.05, 0.03)
    result, _ = run_icp(BASE_CFG, cloud, T_err)
    recovered = np.asarray(result.correction)
    np.testing.assert_allclose(recovered @ T_err, np.eye(4), atol=5e-3)
    assert float(result.overlap) > 0.9


def test_point_to_point_recovers_transform(rng):
    cfg = dict(BASE_CFG)
    cfg["errorMinimizer"] = "PointToPointErrorMinimizer"
    cfg["referenceDataPointsFilters"] = []
    cloud = rng.uniform(-2, 2, size=(500, 3)).astype(np.float32)
    T_err = perturbation(0.03, 0.02)
    result, _ = run_icp(cfg, cloud, T_err)
    recovered = np.asarray(result.correction)
    np.testing.assert_allclose(recovered @ T_err, np.eye(4), atol=2e-2)


def test_identity_minimizer_returns_identity(rng):
    cfg = dict(BASE_CFG)
    cfg["errorMinimizer"] = "IdentityErrorMinimizer"
    cfg["referenceDataPointsFilters"] = []
    cloud = make_structured_cloud(rng)
    result, _ = run_icp(cfg, cloud, perturbation(0.05, 0.03))
    np.testing.assert_allclose(np.asarray(result.correction), np.eye(4))
    # overlap must still be measured for the update-condition policy
    assert 0.0 < float(result.overlap) <= 1.0


def test_counter_checker_limits_iterations(rng):
    cfg = dict(BASE_CFG)
    cfg["transformationCheckers"] = [
        {"CounterTransformationChecker": {"maxIterationCount": 3}}]
    cloud = make_structured_cloud(rng)
    result, _ = run_icp(cfg, cloud, perturbation(0.3, 0.2))
    assert int(result.iterations) == 3


def test_2d_point_to_point(rng):
    # square outline in 2-D
    t = np.linspace(0, 1, 200, dtype=np.float32)
    edges = [np.column_stack([t, np.zeros_like(t)]),
             np.column_stack([np.ones_like(t), t]),
             np.column_stack([t, np.ones_like(t)]),
             np.column_stack([np.zeros_like(t), t])]
    cloud = np.concatenate(edges) * 3.0
    theta = 0.05
    c, s = np.cos(theta), np.sin(theta)
    T_err = np.array([[c, -s, 0.1], [s, c, -0.05], [0, 0, 1]], np.float32)
    cfg = {
        "matcher": {"KDTreeMatcher": {"knn": 1, "maxDist": 1.0}},
        "errorMinimizer": "PointToPointErrorMinimizer",
        "transformationCheckers": [
            {"CounterTransformationChecker": {"maxIterationCount": 30}}],
    }
    result, _ = run_icp(cfg, cloud, T_err, dim=2)
    np.testing.assert_allclose(
        np.asarray(result.correction) @ T_err, np.eye(3), atol=3e-2)


def test_missing_normals_raises(rng):
    cfg = dict(BASE_CFG)
    cfg["referenceDataPointsFilters"] = []
    engine = ICPEngine(cfg, dim=3)
    engine.set_map(PointBatch.from_numpy(make_structured_cloud(rng)))
    with pytest.raises(ValueError, match="normals"):
        engine(PointBatch.from_numpy(make_structured_cloud(rng)))


def test_unknown_config_key_rejected():
    with pytest.raises(ValueError, match="unknown section"):
        ICPEngine({"bogusSection": {}}, dim=3)


def test_reading_step_filters_subsample_each_iteration(rng):
    cfg = dict(BASE_CFG)
    cfg["readingStepDataPointsFilters"] = [
        {"RandomSamplingDataPointsFilter": {"prob": 0.5}}]
    cloud = make_structured_cloud(rng)
    T_err = perturbation(0.05, 0.03)
    result, _ = run_icp(cfg, cloud, T_err)
    recovered = np.asarray(result.correction)
    # still converges (looser: only half the points participate per step)
    np.testing.assert_allclose(recovered @ T_err, np.eye(4), atol=2e-2)


def test_bound_checker_throws_on_violation(rng):
    """lpm's BoundTransformationChecker THROWS when the accumulated
    transform exceeds the bound (registration aborts); the engine
    reproduces the throw host-side after the device loop stops."""
    cfg = dict(BASE_CFG)
    cfg["transformationCheckers"] = [
        {"CounterTransformationChecker": {"maxIterationCount": 30}},
        {"BoundTransformationChecker": {
            "maxRotationNorm": 0.01, "maxTranslationNorm": 0.01}},
    ]
    cloud = make_structured_cloud(rng)
    T_err = perturbation(0.3, 0.0, seed=3)  # needs a ~0.3 m correction
    with pytest.raises(RuntimeError, match="BoundTransformationChecker"):
        run_icp(cfg, cloud, T_err)


def test_bound_checker_passes_within_bound(rng):
    cfg = dict(BASE_CFG)
    cfg["transformationCheckers"] = [
        {"CounterTransformationChecker": {"maxIterationCount": 30}},
        {"BoundTransformationChecker": {
            "maxRotationNorm": 1.0, "maxTranslationNorm": 1.0}},
    ]
    cloud = make_structured_cloud(rng)
    T_err = perturbation(0.05, 0.03)
    result, _ = run_icp(cfg, cloud, T_err)
    np.testing.assert_allclose(
        np.asarray(result.correction) @ T_err, np.eye(4), atol=5e-3)
