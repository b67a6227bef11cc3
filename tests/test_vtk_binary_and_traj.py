"""Binary legacy-VTK read, double-typed channels, and exact trajectory
timestamps (VERDICT r1 items 6 and 10; reference ``Trajectory.cpp:15-53``,
lpm binary VTK IO)."""
import io
import struct

import numpy as np

from norlab_icp_mapper_tpu.io.vtk import read_vtk, write_vtk
from norlab_icp_mapper_tpu.trajectory import Trajectory


def _write_binary_vtk(path, pos, scalars=None, normals=None, field=None):
    """Hand-rolled legacy BINARY VTK writer (big-endian payloads)."""
    buf = io.BytesIO()
    n = pos.shape[0]
    buf.write(b"# vtk DataFile Version 3.0\n")
    buf.write(b"test binary\n")
    buf.write(b"BINARY\nDATASET POLYDATA\n")
    buf.write(f"POINTS {n} float\n".encode())
    buf.write(pos.astype(">f4").tobytes())
    buf.write(b"\n")
    buf.write(f"VERTICES {n} {2 * n}\n".encode())
    verts = np.column_stack(
        [np.ones(n, np.int32), np.arange(n, dtype=np.int32)])
    buf.write(verts.astype(">i4").tobytes())
    buf.write(b"\n")
    buf.write(f"POINT_DATA {n}\n".encode())
    if scalars is not None:
        name, arr = scalars
        k = arr.shape[1]
        buf.write(f"SCALARS {name} float {k}\n".encode())
        buf.write(b"LOOKUP_TABLE default\n")
        buf.write(arr.astype(">f4").tobytes())
        buf.write(b"\n")
    if normals is not None:
        buf.write(b"NORMALS normals float\n")
        buf.write(normals.astype(">f4").tobytes())
        buf.write(b"\n")
    if field is not None:
        name, arr = field
        buf.write(f"FIELD fdata 1\n".encode())
        buf.write(f"{name} {arr.shape[1]} {arr.shape[0]} double\n".encode())
        buf.write(arr.astype(">f8").tobytes())
        buf.write(b"\n")
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def test_binary_vtk_read(tmp_path, rng):
    n = 137
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    prob = rng.uniform(size=(n, 1)).astype(np.float32)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    fld = rng.normal(size=(n, 2)).astype(np.float64)
    p = str(tmp_path / "bin.vtk")
    _write_binary_vtk(p, pos, scalars=("probabilityDynamic", prob),
                      normals=normals, field=("extras", fld))
    rp, desc = read_vtk(p)
    np.testing.assert_allclose(rp, pos, rtol=0, atol=0)
    np.testing.assert_allclose(desc["probabilityDynamic"], prob)
    np.testing.assert_allclose(desc["normals"], normals)
    assert desc["extras"].dtype == np.float64
    np.testing.assert_allclose(desc["extras"], fld, rtol=0, atol=0)


def test_ascii_double_roundtrip(tmp_path, rng):
    n = 19
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    # values exceeding f32 precision must survive a write/read cycle
    big = (np.arange(n, dtype=np.float64) * 1e9 + 123456789.0)[:, None]
    p = str(tmp_path / "dbl.vtk")
    write_vtk(p, pos, {"t_sec": big})
    rp, desc = read_vtk(p)
    assert desc["t_sec"].dtype == np.float64
    np.testing.assert_allclose(desc["t_sec"], big, rtol=0, atol=0)
    np.testing.assert_allclose(rp, pos, rtol=1e-5)  # ASCII %.7g positions


def test_trajectory_timestamp_ns_roundtrip(tmp_path, rng):
    traj = Trajectory(3)
    # 2026-epoch nanoseconds: ~1.77e18, far beyond f32/f64 integer range
    base_ns = 1_771_234_567_890_123_456
    stamps = [base_ns + i * 99_999_937 for i in range(7)]
    for i, t in enumerate(stamps):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [i * 0.5, -i, 0.25 * i]
        traj.add_pose(pose, t)
    p = str(tmp_path / "traj.vtk")
    traj.save(p)
    loaded = Trajectory.load(p, 3)
    assert loaded.timestamps == stamps  # exact, to the nanosecond
    np.testing.assert_allclose(loaded.positions(), traj.positions(),
                               rtol=0, atol=1e-6)
    for a, b in zip(loaded.poses, traj.poses):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_trajectory_2d_roundtrip(tmp_path):
    traj = Trajectory(2)
    th = 0.3
    pose = np.array([[np.cos(th), -np.sin(th), 1.5],
                     [np.sin(th), np.cos(th), -2.0],
                     [0, 0, 1]], np.float32)
    traj.add_pose(pose, 42)
    p = str(tmp_path / "traj2d.vtk")
    traj.save(p)
    loaded = Trajectory.load(p, 2)
    assert loaded.timestamps == [42]
    np.testing.assert_allclose(loaded.poses[0], pose, atol=1e-6)
