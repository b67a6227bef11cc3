import numpy as np
import jax.numpy as jnp
from scipy.spatial import cKDTree

from norlab_icp_mapper_tpu.ops.nn import knn, nn1


def test_knn_matches_scipy(rng):
    q = rng.normal(size=(200, 3)).astype(np.float32)
    r = rng.normal(size=(500, 3)).astype(np.float32)
    d2, idx = knn(jnp.asarray(q), jnp.asarray(r), k=4, ref_tile=128)
    tree = cKDTree(r)
    dist, ind = tree.query(q, k=4)
    np.testing.assert_array_equal(np.asarray(idx), ind)
    np.testing.assert_allclose(np.asarray(d2), dist ** 2, rtol=1e-4, atol=1e-5)


def test_knn_radius_and_masks(rng):
    q = np.array([[0, 0, 0], [10, 10, 10]], np.float32)
    r = np.array([[0.1, 0, 0], [5, 5, 5]], np.float32)
    d2, idx = knn(jnp.asarray(q), jnp.asarray(r), k=1, max_radius=1.0)
    assert idx[0, 0] == 0
    assert idx[1, 0] == -1 and np.isinf(d2[1, 0])


def test_knn_ref_mask_excludes(rng):
    q = np.zeros((1, 3), np.float32)
    r = np.array([[0.1, 0, 0], [0.2, 0, 0]], np.float32)
    mask = jnp.asarray([False, True])
    d2, idx = knn(jnp.asarray(q), jnp.asarray(r), ref_mask=mask, k=1)
    assert idx[0, 0] == 1


def test_query_mask_invalidates():
    q = np.zeros((2, 3), np.float32)
    r = np.zeros((3, 3), np.float32)
    qm = jnp.asarray([True, False])
    d2, idx = knn(jnp.asarray(q), jnp.asarray(r), query_mask=qm, k=1)
    assert idx[1, 0] == -1


def test_nn1_squared_distances(rng):
    q = rng.normal(size=(50, 2)).astype(np.float32)
    r = rng.normal(size=(100, 2)).astype(np.float32)
    d2, idx = nn1(jnp.asarray(q), jnp.asarray(r))
    tree = cKDTree(r)
    dist, ind = tree.query(q, k=1)
    np.testing.assert_array_equal(np.asarray(idx), ind)
    np.testing.assert_allclose(np.asarray(d2), dist ** 2, rtol=1e-4, atol=1e-6)
