import numpy as np

from norlab_icp_mapper_tpu.io import (
    read_pcd, write_pcd, read_point_cloud, write_point_cloud)


def cloud(rng):
    pos = rng.normal(size=(37, 3)).astype(np.float32)
    desc = {
        "normals": rng.normal(size=(37, 3)).astype(np.float32),
        "intensity": rng.uniform(size=(37, 1)).astype(np.float32),
    }
    return pos, desc


def test_pcd_ascii_roundtrip(tmp_path, rng):
    pos, desc = cloud(rng)
    p = str(tmp_path / "c.pcd")
    write_pcd(p, pos, desc)
    pos2, desc2 = read_pcd(p)
    np.testing.assert_allclose(pos2, pos, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(desc2["normals"], desc["normals"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(desc2["intensity"], desc["intensity"],
                               rtol=1e-5, atol=1e-6)


def test_pcd_binary_roundtrip(tmp_path, rng):
    pos, desc = cloud(rng)
    p = str(tmp_path / "c.pcd")
    write_pcd(p, pos, desc, binary=True)
    pos2, desc2 = read_pcd(p)
    np.testing.assert_array_equal(pos2, pos)
    np.testing.assert_array_equal(desc2["normals"], desc["normals"])


def test_pcd_nan_rows_dropped(tmp_path, rng):
    pos, desc = cloud(rng)
    pos[5] = np.nan
    p = str(tmp_path / "c.pcd")
    write_pcd(p, pos, desc, binary=True)
    pos2, desc2 = read_pcd(p)
    assert pos2.shape == (36, 3)
    np.testing.assert_array_equal(pos2, np.delete(pos, 5, axis=0))
    np.testing.assert_array_equal(desc2["intensity"],
                                  np.delete(desc["intensity"], 5, axis=0))


def test_pcd_dispatch(tmp_path, rng):
    pos, desc = cloud(rng)
    p = str(tmp_path / "c.pcd")
    write_point_cloud(p, pos, desc)
    pos2, _ = read_point_cloud(p)
    np.testing.assert_allclose(pos2, pos, rtol=1e-5, atol=1e-5)


def test_pcd_mixed_types(tmp_path):
    # hand-written PCD with integer ring field (common lidar export)
    p = str(tmp_path / "m.pcd")
    body = "\n".join(f"{i} {i * 2} {i * 3} {i % 4}" for i in range(6))
    with open(p, "w") as f:
        f.write("VERSION 0.7\nFIELDS x y z ring\nSIZE 4 4 4 2\n"
                "TYPE F F F U\nCOUNT 1 1 1 1\nWIDTH 6\nHEIGHT 1\n"
                "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 6\nDATA ascii\n" + body + "\n")
    pos, desc = read_pcd(p)
    assert pos.shape == (6, 3)
    np.testing.assert_array_equal(desc["ring"][:, 0], np.arange(6) % 4)
