import numpy as np
import jax.numpy as jnp

from norlab_icp_mapper_tpu import se3
from norlab_icp_mapper_tpu.points import PointBatch


def random_se3(rng):
    w = rng.normal(size=3) * 0.5
    v = rng.normal(size=3)
    return se3.exp_se3(jnp.asarray(np.concatenate([v, w]), jnp.float32))


def test_exp_log_roundtrip(rng):
    for _ in range(10):
        xi = jnp.asarray(rng.normal(size=6) * 0.5, jnp.float32)
        T = se3.exp_se3(xi)
        xi2 = se3.log_se3(T)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_exp_zero_is_identity():
    T = se3.exp_se3(jnp.zeros(6, jnp.float32))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-6)


def test_inverse(rng):
    T = random_se3(np.random.default_rng(3))
    I = np.asarray(T @ se3.inverse(T))
    np.testing.assert_allclose(I, np.eye(4), atol=1e-5)


def test_rotation_is_orthonormal(rng):
    T = random_se3(rng)
    R = np.asarray(T)[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) > 0.99


def test_apply_rotates_normals(rng):
    pos = rng.normal(size=(20, 3)).astype(np.float32)
    normals = rng.normal(size=(20, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    b = PointBatch.from_numpy(pos, {"normals": normals, "intensity": pos[:, :1]})
    T = random_se3(rng)
    out = se3.apply(T, b)
    R = np.asarray(T)[:3, :3]
    t = np.asarray(T)[:3, 3]
    np.testing.assert_allclose(
        np.asarray(out.positions)[:20], pos @ R.T + t, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.descriptors["normals"])[:20], normals @ R.T, atol=1e-4)
    # non-covariant descriptors untouched
    np.testing.assert_allclose(
        np.asarray(out.descriptors["intensity"])[:20], pos[:, :1], atol=1e-6)


def test_exp_se2():
    T = se3.exp_se2(jnp.asarray([1.0, 0.0, np.pi / 2], jnp.float32))
    R = np.asarray(T)[:2, :2]
    np.testing.assert_allclose(R, [[0, -1], [1, 0]], atol=1e-5)


def test_quat_identity():
    R = se3.quat_to_rot(jnp.asarray([0.0, 0, 0, 1], jnp.float32))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
