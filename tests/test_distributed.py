"""Distributed (sharded-map) ICP tests on the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from norlab_icp_mapper_tpu import se3
from norlab_icp_mapper_tpu.parallel import make_mesh, DistributedICP, shard_points


def structured_cloud(rng, n=900):
    n3 = n // 3
    xy = rng.uniform(-4, 4, size=(n3, 2)).astype(np.float32)
    a = np.column_stack([xy, np.zeros(n3, np.float32)])
    b = np.column_stack([xy[:, :1], np.zeros(n3, np.float32), xy[:, 1:]])
    c = np.column_stack([np.zeros(n3, np.float32), xy])
    return np.concatenate([a, b, c])


def normals_for(cloud):
    """Analytic normals for the three-plane cloud."""
    n = np.zeros_like(cloud)
    third = cloud.shape[0] // 3
    n[:third, 2] = 1
    n[third:2 * third, 1] = 1
    n[2 * third:, 0] = 1
    return n


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_distributed_matches_known_transform(rng):
    cloud = structured_cloud(rng)
    normals = normals_for(cloud)
    mask = np.ones(cloud.shape[0], bool)
    mesh = make_mesh()
    mp, mn, mm = shard_points(cloud, normals, mask, mesh.devices.size,
                              cell_size=1.0)

    xi = np.array([0.05, -0.03, 0.02, 0.02, -0.01, 0.03], np.float32)
    T_err = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    moved = (cloud @ T_err[:3, :3].T + T_err[:3, 3]).astype(np.float32)

    icp = DistributedICP(mesh, max_dist=1.0, max_iter=15)
    T, overlap, rms = icp.solve(
        jnp.asarray(moved), jnp.ones(moved.shape[0], bool),
        jnp.asarray(mp), jnp.asarray(mn), jnp.asarray(mm))
    np.testing.assert_allclose(np.asarray(T) @ T_err, np.eye(4), atol=5e-3)
    assert float(overlap) > 0.9
    assert float(rms) < 0.02


def test_distributed_equals_single_shard(rng):
    """Sharding must not change the answer: 1 shard vs 8 shards."""
    cloud = structured_cloud(rng, n=600)
    normals = normals_for(cloud)
    mask = np.ones(cloud.shape[0], bool)
    xi = np.array([0.03, 0.01, -0.02, 0.01, 0.02, -0.01], np.float32)
    T_err = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    moved = (cloud @ T_err[:3, :3].T + T_err[:3, 3]).astype(np.float32)
    rm = jnp.ones(moved.shape[0], bool)

    results = []
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        mp, mn, mm = shard_points(cloud, normals, mask, n_dev, cell_size=1.0)
        icp = DistributedICP(mesh, max_dist=1.0, max_iter=8)
        T, overlap, rms = icp.solve(jnp.asarray(moved), rm,
                                    jnp.asarray(mp), jnp.asarray(mn),
                                    jnp.asarray(mm))
        results.append((np.asarray(T), float(overlap)))
    np.testing.assert_allclose(results[0][0], results[1][0], atol=1e-4)
    assert abs(results[0][1] - results[1][1]) < 1e-4
