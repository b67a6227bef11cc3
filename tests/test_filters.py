import numpy as np
import jax
import jax.numpy as jnp
import pytest

from norlab_icp_mapper_tpu.points import PointBatch
from norlab_icp_mapper_tpu.filters.core import FilterChain, filter_registry


def make(pos, desc=None):
    return PointBatch.from_numpy(np.asarray(pos, np.float32), desc)


def survivors(batch):
    return batch.to_numpy()["positions"]


def test_bounding_box_remove_inside():
    b = make([[0, 0, 0], [5, 5, 5]])
    f = filter_registry.create("BoundingBoxDataPointsFilter", {
        "xMin": -1, "xMax": 1, "yMin": -1, "yMax": 1, "zMin": -1, "zMax": 1,
        "removeInside": 1})
    out = survivors(f.apply(b))
    np.testing.assert_allclose(out, [[5, 5, 5]])


def test_bounding_box_keep_inside():
    b = make([[0, 0, 0], [5, 5, 5]])
    f = filter_registry.create("BoundingBoxDataPointsFilter", {
        "xMin": -1, "xMax": 1, "yMin": -1, "yMax": 1, "zMin": -1, "zMax": 1,
        "removeInside": 0})
    np.testing.assert_allclose(survivors(f.apply(b)), [[0, 0, 0]])


def test_distance_limit_radial():
    b = make([[0.5, 0, 0], [10, 0, 0]])
    f = filter_registry.create("DistanceLimitDataPointsFilter", {
        "dim": -1, "dist": 1.0, "removeInside": 0})
    np.testing.assert_allclose(survivors(f.apply(b)), [[0.5, 0, 0]])
    f2 = filter_registry.create("DistanceLimitDataPointsFilter", {
        "dim": -1, "dist": 1.0, "removeInside": 1})
    np.testing.assert_allclose(survivors(f2.apply(b)), [[10, 0, 0]])


def test_add_descriptor():
    b = make([[1, 2, 3]])
    f = filter_registry.create("AddDescriptorDataPointsFilter", {
        "descriptorName": "probabilityDynamic", "descriptorDimension": 1,
        "descriptorValues": [0.6]})
    out = f.apply(b)
    np.testing.assert_allclose(
        out.to_numpy()["probabilityDynamic"], [[0.6]])


def test_cut_at_descriptor_threshold():
    b = make([[0, 0, 0], [1, 1, 1]],
             {"probabilityDynamic": np.array([[0.9], [0.3]], np.float32)})
    f = filter_registry.create("CutAtDescriptorThresholdDataPointsFilter", {
        "descName": "probabilityDynamic", "useLargerThan": 1, "threshold": 0.65})
    np.testing.assert_allclose(survivors(f.apply(b)), [[1, 1, 1]])


def test_random_sampling_prob(rng):
    pos = rng.normal(size=(4000, 3)).astype(np.float32)
    b = make(pos)
    f = filter_registry.create("RandomSamplingDataPointsFilter", {"prob": 0.5})
    out = f.apply(b, jax.random.PRNGKey(0))
    frac = int(out.count()) / 4000
    assert 0.45 < frac < 0.55


def test_max_point_count():
    b = make(np.arange(30).reshape(10, 3))
    f = filter_registry.create("MaxPointCountDataPointsFilter", {"maxCount": 4})
    assert int(f.apply(b).count()) == 4


def test_surface_normals_on_plane(rng):
    # z=0 plane: normals must be ±z
    xy = rng.uniform(-1, 1, size=(300, 2)).astype(np.float32)
    pos = np.column_stack([xy, np.zeros(300, np.float32)])
    f = filter_registry.create("SurfaceNormalDataPointsFilter", {"knn": 8})
    out = f.apply(make(pos))
    n = out.to_numpy()["normals"]
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
    np.testing.assert_allclose(n[:, :2], 0.0, atol=1e-3)


def test_orient_normals_toward_center():
    pos = np.array([[1.0, 0, 0]], np.float32)
    b = make(pos, {"normals": np.array([[1.0, 0, 0]], np.float32)})
    f = filter_registry.create("OrientNormalsDataPointsFilter",
                               {"towardCenter": 1})
    n = f.apply(b).to_numpy()["normals"]
    np.testing.assert_allclose(n, [[-1, 0, 0]])


def test_octree_grid_decimates(rng):
    # 1000 points in a 1m cube, voxel 0.5 → at most 8 survivors
    pos = rng.uniform(0, 1, size=(1000, 3)).astype(np.float32)
    f = filter_registry.create("OctreeGridDataPointsFilter", {
        "maxSizeByNode": 0.5, "samplingMethod": 0})
    out = f.apply(make(pos))
    assert int(out.count()) <= 8
    # first-point mode keeps original coordinates
    kept = survivors(out)
    assert all(any(np.allclose(k, p) for p in pos) for k in kept)


def test_octree_grid_centroid(rng):
    pos = np.array([[0.1, 0.1, 0.1], [0.3, 0.3, 0.3]], np.float32)
    f = filter_registry.create("OctreeGridDataPointsFilter", {
        "maxSizeByNode": 1.0, "samplingMethod": 2})
    out = survivors(f.apply(make(pos)))
    np.testing.assert_allclose(out, [[0.2, 0.2, 0.2]], atol=1e-6)


def test_chain_from_yaml_and_unknown_param():
    chain = FilterChain.from_yaml([
        {"BoundingBoxDataPointsFilter": {
            "xMin": -1, "xMax": 1, "yMin": -1, "yMax": 1, "zMin": -1,
            "zMax": 1, "removeInside": 1}},
        "IdentityDataPointsFilter",
    ])
    assert len(chain) == 2
    with pytest.raises(ValueError, match="unknown parameter"):
        FilterChain.from_yaml([{"BoundingBoxDataPointsFilter": {"bogus": 1}}])


def test_remove_nan():
    pos = np.array([[0, 0, 0], [np.nan, 0, 0]], np.float32)
    f = filter_registry.create("RemoveNaNDataPointsFilter", {})
    assert int(f.apply(make(pos)).count()) == 1
