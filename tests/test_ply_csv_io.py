import numpy as np

from norlab_icp_mapper_tpu.io import (
    read_ply, write_ply, read_csv_cloud, write_csv_cloud,
    read_point_cloud, write_point_cloud)


def cloud(rng):
    pos = rng.normal(size=(40, 3)).astype(np.float32)
    desc = {
        "normals": rng.normal(size=(40, 3)).astype(np.float32),
        "intensity": rng.uniform(size=(40, 1)).astype(np.float32),
    }
    return pos, desc


def test_ply_roundtrip(tmp_path, rng):
    pos, desc = cloud(rng)
    p = str(tmp_path / "c.ply")
    write_ply(p, pos, desc)
    pos2, desc2 = read_ply(p)
    np.testing.assert_allclose(pos2, pos, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(desc2["normals"], desc["normals"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(desc2["intensity"], desc["intensity"],
                               rtol=1e-5, atol=1e-6)


def test_csv_roundtrip(tmp_path, rng):
    pos, desc = cloud(rng)
    p = str(tmp_path / "c.csv")
    write_csv_cloud(p, pos, desc)
    pos2, desc2 = read_csv_cloud(p)
    np.testing.assert_allclose(pos2, pos, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(desc2["normals"], desc["normals"],
                               rtol=1e-5, atol=1e-5)


def test_dispatching_loader(tmp_path, rng):
    pos, desc = cloud(rng)
    for ext in ("vtk", "ply", "csv"):
        p = str(tmp_path / f"c.{ext}")
        write_point_cloud(p, pos, desc)
        pos2, desc2 = read_point_cloud(p)
        np.testing.assert_allclose(pos2, pos, rtol=1e-5, atol=1e-5)
        assert "normals" in desc2
