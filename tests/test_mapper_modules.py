import numpy as np
import jax.numpy as jnp
import pytest

from norlab_icp_mapper_tpu.points import PointBatch
from norlab_icp_mapper_tpu.mapper_modules.core import mapper_module_registry


I4 = jnp.eye(4)


def make(pos, desc=None):
    return PointBatch.from_numpy(np.asarray(pos, np.float32), desc)


def test_point_distance_dedup():
    m = mapper_module_registry.create("PointDistanceMapperModule",
                                      {"minDistNewPoint": 0.5})
    map_b = make([[0, 0, 0], [10, 0, 0]])
    scan = make([[0.1, 0, 0], [5, 0, 0]])  # first too close, second far
    out = m.update_map(scan, map_b, I4)
    pos = out.to_numpy()["positions"]
    assert pos.shape[0] == 3
    # order: map points first, then new scan points (reference concatenate)
    np.testing.assert_allclose(pos[:2], [[0, 0, 0], [10, 0, 0]])
    np.testing.assert_allclose(pos[2], [5, 0, 0])


def test_point_distance_empty_map_keeps_all():
    m = mapper_module_registry.create("PointDistanceMapperModule", {})
    scan = make([[1, 1, 1]])
    out = m.create_map(scan, I4)
    assert int(out.count()) == 1


def test_octree_module_decimates(rng):
    m = mapper_module_registry.create("OctreeMapperModule", {
        "maxSizeByNode": 1.0, "samplingMethod": 0})
    pts = rng.uniform(0, 0.9, size=(50, 3)).astype(np.float32)
    out = m.create_map(make(pts), I4)
    assert int(out.count()) == 1  # all in one voxel
    out2 = m.update_map(make(pts + 5.0), out, I4)
    assert int(out2.count()) == 2


def test_dynamic_points_requires_descriptors():
    m = mapper_module_registry.create("DynamicPointsMapperModule", {})
    scan = make([[1, 0, 0]])
    map_b = make([[1, 0, 0]])
    with pytest.raises(ValueError, match="probabilityDynamic"):
        m.update_map(scan, map_b, I4)
    scan2 = make([[1, 0, 0]],
                 {"probabilityDynamic": np.array([[0.6]], np.float32)})
    with pytest.raises(ValueError, match="normals"):
        m.update_map(scan2, map_b, I4)


def test_dynamic_points_occluded_point_goes_dynamic():
    """A map point in front of the matched scan point (scan sees THROUGH it)
    must gain dynamic probability; a map point at the scan surface must not."""
    m = mapper_module_registry.create("DynamicPointsMapperModule", {
        "thresholdDynamic": 0.9, "alpha": 0.8, "beta": 0.99,
        "beamHalfAngle": 0.05, "epsilonA": 0.01, "epsilonD": 0.01,
        "sensorMaxRange": 200})
    scan = make([[10.0, 0, 0]],
                {"probabilityDynamic": np.array([[0.6]], np.float32)})
    map_pos = [[5.0, 0, 0],  # in front of scan return: now see-through -> dynamic
               [10.0, 0, 0]]  # consistent with scan: stays static-ish
    map_b = make(map_pos, {
        "normals": np.array([[1, 0, 0], [1, 0, 0]], np.float32),
        "probabilityDynamic": np.array([[0.2], [0.2]], np.float32)})
    out = m.update_map(scan, map_b, I4)
    prob = out.to_numpy()["probabilityDynamic"][:, 0]
    assert prob[0] > 0.3  # occluded point got more dynamic
    assert prob[1] <= 0.2 + 1e-3  # surface point did not increase


def test_dynamic_points_beyond_match_radius_untouched():
    m = mapper_module_registry.create("DynamicPointsMapperModule",
                                      {"beamHalfAngle": 0.001})
    scan = make([[10.0, 0, 0]],
                {"probabilityDynamic": np.array([[0.6]], np.float32)})
    # map point 90 degrees away: no angular match
    map_b = make([[0, 10.0, 0]], {
        "normals": np.array([[0, 1, 0]], np.float32),
        "probabilityDynamic": np.array([[0.37]], np.float32)})
    out = m.update_map(scan, map_b, I4)
    np.testing.assert_allclose(
        out.to_numpy()["probabilityDynamic"], [[0.37]], atol=1e-7)


def test_registry_lists_reference_modules():
    names = mapper_module_registry.names()
    assert {"PointDistanceMapperModule", "OctreeMapperModule",
            "DynamicPointsMapperModule"} <= set(names)
