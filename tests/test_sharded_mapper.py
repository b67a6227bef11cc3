"""Full Mapper pipeline with the registration running on the 8-device mesh
(BASELINE.json configs[4] logic, validated on the virtual CPU mesh)."""
import numpy as np

from norlab_icp_mapper_tpu import Mapper, PointBatch
from norlab_icp_mapper_tpu.parallel import make_mesh
from norlab_icp_mapper_tpu.parallel.adapter import ShardedICPAdapter
from tests.test_mapper_e2e import BASE_CONFIG, make_world, pose_at, scan_at


def test_sharded_registration_in_mapper(rng):
    world = make_world(rng, n=900)
    mesh = make_mesh()
    mapper = Mapper(BASE_CONFIG, is_3d=True)
    adapter = ShardedICPAdapter(mesh, BASE_CONFIG["icp"], dim=3,
                                cell_size=2.0)
    mapper.icp = adapter
    mapper.map.icp = adapter

    # bootstrap
    p0 = pose_at(2.0)
    scan = PointBatch.from_numpy(scan_at(world, p0))
    mapper.process_input(mapper.apply_input_filters(scan), p0, 0)
    assert adapter.has_map()

    # noisy odometry: the distributed solve must correct it
    true_pose = pose_at(2.5)
    est = true_pose.copy()
    est[:3, 3] += np.array([0.12, -0.08, 0.05], np.float32)
    scan = PointBatch.from_numpy(scan_at(world, true_pose))
    mapper.process_input(mapper.apply_input_filters(scan), est, int(1e8))
    err = np.linalg.norm(mapper.get_pose()[:3, 3] - true_pose[:3, 3])
    err_odo = np.linalg.norm(est[:3, 3] - true_pose[:3, 3])
    assert err < 0.5 * err_odo, (err, err_odo)
    assert len(mapper.get_trajectory()) == 2
