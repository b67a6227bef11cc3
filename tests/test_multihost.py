"""Two REAL processes form one mesh and run the sharded per-scan step.

BASELINE.json configs[4]: multi-host runs are first-class.  This launches
two OS processes (4 virtual CPU devices each) coordinated through
``jax.distributed``; both run the full device-resident sharded map step
over the resulting 8-shard mesh and must agree bitwise on the corrected
pose and the map count.
"""
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["NIM_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from norlab_icp_mapper_tpu.parallel import multihost
multihost.initialize()
assert jax.process_count() == 2
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np
from norlab_icp_mapper_tpu import PointBatch
from norlab_icp_mapper_tpu.parallel import ShardedMapConfig, ShardedMapper
from norlab_icp_mapper_tpu.parallel.multihost import global_mesh

rng = np.random.default_rng(0)  # same seed in both processes
n = 600
cloud = np.stack([rng.uniform(0, 8, n), rng.uniform(-3, 3, n),
                  rng.uniform(0, 2, n)], 1).astype(np.float32)

cfg = ShardedMapConfig(dim=3, cell_size=1.0, voxel_size=0.1,
                       normal_radius=0.6, normal_min_knn=3,
                       match_max_dist=0.5, max_iter=2, halo_capacity=512,
                       ref_tile=128, update_condition="delay",
                       update_value=0.01)
mapper = ShardedMapper(global_mesh(), cfg)
pose = np.eye(4, dtype=np.float32)
mapper.process_input(PointBatch.from_numpy(cloud), pose, 0.0)
pose2 = pose.copy(); pose2[0, 3] = 0.05
mapper.process_input(PointBatch.from_numpy(cloud), pose2, 0.1)
m = mapper.drain()
out_pose = mapper.get_pose()
print("RESULT", jax.process_index(), int(m["count"]),
      ",".join(f"{v:.6f}" for v in out_pose.reshape(-1)), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_step(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "NIM_REPO": REPO,
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_PLATFORMS": "cpu",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, err[-3000:]
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, count, pose = line.split(" ", 3)
                results[int(pid)] = (int(count), pose)
    assert set(results) == {0, 1}, outs
    assert results[0] == results[1], results
    assert results[0][0] > 100
