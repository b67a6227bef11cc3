"""Native C++ VTK parser vs the numpy oracle."""
import os

import numpy as np
import pytest

from norlab_icp_mapper_tpu.io import vtk as vtk_mod
from norlab_icp_mapper_tpu.io.native import read_vtk_native, write_vtk_native

SCAN = "/root/reference/examples/data/scans/cloud_1690309709_285305600.vtk"


def numpy_read(path):
    """Force the pure-numpy parser (bypasses the native fast path)."""
    os.environ["NIM_TPU_DISABLE_NATIVE"] = "1"
    try:
        import norlab_icp_mapper_tpu.io.native as native
        native._tried = True
        native._lib = None
        return vtk_mod.read_vtk(path)
    finally:
        del os.environ["NIM_TPU_DISABLE_NATIVE"]
        native._tried = False


@pytest.mark.skipif(not os.path.exists(SCAN), reason="example data absent")
def test_native_matches_numpy_on_example_scan():
    native = read_vtk_native(SCAN)
    if native is None:
        pytest.skip("native toolchain unavailable")
    pos_n, desc_n = native
    pos_p, desc_p = numpy_read(SCAN)
    np.testing.assert_allclose(pos_n, pos_p, rtol=1e-6)
    assert sorted(desc_n) == sorted(desc_p)
    for k in desc_p:
        np.testing.assert_allclose(desc_n[k], desc_p[k], rtol=1e-6)


def test_native_write_read_roundtrip(tmp_path, rng):
    pos = rng.normal(size=(50, 3)).astype(np.float32)
    desc = {
        "normals": rng.normal(size=(50, 3)).astype(np.float32),
        "probabilityDynamic": rng.uniform(size=(50, 1)).astype(np.float32),
    }
    path = str(tmp_path / "t.vtk")
    if not write_vtk_native(path, pos, desc):
        pytest.skip("native toolchain unavailable")
    back = read_vtk_native(path)
    assert back is not None
    pos2, desc2 = back
    np.testing.assert_allclose(pos2, pos, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(desc2["normals"], desc["normals"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(desc2["probabilityDynamic"],
                               desc["probabilityDynamic"], rtol=1e-5,
                               atol=1e-6)
    # and the numpy parser reads the native writer's output identically
    pos3, desc3 = numpy_read(path)
    np.testing.assert_allclose(pos3, pos2, rtol=1e-6)
    assert sorted(desc3) == sorted(desc2)
