import numpy as np
import jax.numpy as jnp
import pytest

from norlab_icp_mapper_tpu.points import PointBatch
from norlab_icp_mapper_tpu.filters.core import filter_registry
from norlab_icp_mapper_tpu.io import write_vtk
from norlab_icp_mapper_tpu.io.loader import ScanLoader


def make(pos, desc=None):
    return PointBatch.from_numpy(np.asarray(pos, np.float32), desc)


def surv(batch):
    return batch.to_numpy()["positions"]


def test_max_min_dist_filters():
    b = make([[0.5, 0, 0], [5, 0, 0]])
    f = filter_registry.create("MaxDistDataPointsFilter", {"maxDist": 1.0})
    np.testing.assert_allclose(surv(f.apply(b)), [[0.5, 0, 0]])
    f = filter_registry.create("MinDistDataPointsFilter", {"minDist": 1.0})
    np.testing.assert_allclose(surv(f.apply(b)), [[5, 0, 0]])


def test_shadow_filter():
    # point at x=1 with normal along x (facing sensor) vs normal along y
    b = make([[1, 0, 0], [1, 0, 0]],
             {"normals": np.array([[1, 0, 0], [0, 1, 0]], np.float32)})
    f = filter_registry.create("ShadowDataPointsFilter", {"eps": 0.5})
    out = f.apply(b)
    assert int(out.count()) == 1


def test_voxel_grid_centroid():
    pos = np.array([[0.1, 0.1, 0.1], [0.3, 0.3, 0.3], [5, 5, 5]], np.float32)
    f = filter_registry.create("VoxelGridDataPointsFilter", {
        "vSizeX": 1.0, "vSizeY": 1.0, "vSizeZ": 1.0, "useCentroid": 1})
    out = surv(f.apply(make(pos)))
    assert out.shape[0] == 2
    assert any(np.allclose(o, [0.2, 0.2, 0.2], atol=1e-6) for o in out)


def test_scan_loader_order_and_content(tmp_path, rng):
    paths = []
    clouds = []
    for i in range(5):
        pos = rng.normal(size=(20 + i, 3)).astype(np.float32)
        p = str(tmp_path / f"scan_{i}.vtk")
        write_vtk(p, pos)
        paths.append(p)
        clouds.append(pos)
    loader = ScanLoader(paths, extras=list(range(5)), prefetch=3)
    seen = list(loader)
    assert [e for _, _, e in seen] == [0, 1, 2, 3, 4]
    assert [n for _, n, _ in seen] == [20, 21, 22, 23, 24]
    for (batch, _, _), pos in zip(seen, clouds):
        np.testing.assert_allclose(batch.to_numpy()["positions"], pos,
                                   rtol=1e-5, atol=1e-5)
    loader.close()
