"""Inspector wiring + insert-overflow surfacing (VERDICT r1 items 7/10)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from norlab_icp_mapper_tpu import PointBatch
from norlab_icp_mapper_tpu.icp.engine import ICPEngine
from norlab_icp_mapper_tpu.utils import tracing


def structured_cloud(rng, n=900):
    a = np.stack([rng.uniform(0, 5, n // 3), rng.uniform(0, 5, n // 3),
                  np.zeros(n // 3)], 1)
    b = np.stack([rng.uniform(0, 5, n // 3), np.zeros(n // 3),
                  rng.uniform(0, 3, n // 3)], 1)
    c = np.stack([np.zeros(n // 3), rng.uniform(0, 5, n // 3),
                  rng.uniform(0, 3, n // 3)], 1)
    return np.concatenate([a, b, c]).astype(np.float32)


def engine_config(inspector):
    return {
        "matcher": {"KDTreeMatcher": {"knn": 1, "maxDist": 1.0}},
        "errorMinimizer": "PointToPlaneErrorMinimizer",
        "referenceDataPointsFilters": [
            {"SurfaceNormalDataPointsFilter": {"knn": 8}}],
        "transformationCheckers": [
            {"CounterTransformationChecker": {"maxIterationCount": 8}},
            {"DifferentialTransformationChecker": {
                "minDiffRotErr": 1e-4, "minDiffTransErr": 1e-4,
                "smoothLength": 2}}],
        "inspector": inspector,
    }


def test_performance_inspector_records_iterations(rng):
    cloud = structured_cloud(rng)
    engine = ICPEngine(engine_config("PerformanceInspector"), dim=3)
    engine.set_map(PointBatch.from_numpy(cloud))
    moved = cloud + np.array([0.08, -0.05, 0.03], np.float32)
    result = engine(PointBatch.from_numpy(moved))
    # inspected solve converged AND recorded one entry per iteration
    assert len(engine.inspector.history) == int(result.iterations)
    assert len(engine.inspector.history) >= 2
    assert all("overlap" in h and "residual" in h
               for h in engine.inspector.history)
    corr = np.asarray(result.correction)
    assert np.linalg.norm(corr[:3, 3] + [0.08, -0.05, 0.03]) < 0.02


def test_vtk_inspector_dumps_iterations(rng, tmp_path):
    cloud = structured_cloud(rng)
    dump = str(tmp_path / "inspect")
    cfg = engine_config({"VTKFileInspector": {"baseFileName": dump}})
    engine = ICPEngine(cfg, dim=3)
    engine.set_map(PointBatch.from_numpy(cloud))
    moved = cloud + np.array([0.05, 0.0, 0.0], np.float32)
    result = engine(PointBatch.from_numpy(moved))
    files = sorted(os.listdir(dump))
    assert len(files) == int(result.iterations)
    assert files[0].startswith("iter_") and files[0].endswith(".vtk")


def test_insert_overflow_is_counted(rng):
    from norlab_icp_mapper_tpu.points import insert

    tracing.set_overflow_sink(tracing.accumulate_overflow)
    try:
        base = tracing.overflow_totals().get("points_insert", 0)
        dst = PointBatch.from_numpy(
            rng.normal(size=(100, 3)).astype(np.float32), capacity=128)
        src = PointBatch.from_numpy(
            rng.normal(size=(100, 3)).astype(np.float32))
        out = insert(dst, src)
        jax.block_until_ready(out.positions)
        # 100 + 100 into capacity 128: 72 dropped
        total = tracing.overflow_totals().get("points_insert", 0) - base
        assert total == 72, total
        assert int(jax.device_get(out.count())) == 128
    finally:
        tracing.set_overflow_sink(None)
