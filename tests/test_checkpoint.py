import numpy as np

from norlab_icp_mapper_tpu import Mapper, PointBatch
from norlab_icp_mapper_tpu.utils import save_checkpoint, load_checkpoint
from tests.test_mapper_e2e import BASE_CONFIG, make_world, drive


def test_checkpoint_roundtrip(tmp_path, rng):
    world = make_world(rng)
    m1 = Mapper(BASE_CONFIG, is_3d=True)
    drive(m1, world, [2.0, 4.0])
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, m1)

    m2 = Mapper(BASE_CONFIG, is_3d=True)
    load_checkpoint(path, m2, localization_only=True)
    assert not m2.get_is_mapping()
    assert len(m2.get_trajectory()) == 2
    np.testing.assert_allclose(m2.get_pose(), m1.get_pose())
    c1, c2 = m1.get_map(), m2.get_map()
    assert c1["positions"].shape == c2["positions"].shape
    # resumed mapper localizes on the restored map
    drive(m2, world, [5.0])
    assert m2.get_pose() is not None
    # and did not grow the map
    assert m2.get_map()["positions"].shape == c2["positions"].shape


def test_stage_timer():
    from norlab_icp_mapper_tpu.utils import StageTimer
    t = StageTimer(sync=False)
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert "a" in t.report()
