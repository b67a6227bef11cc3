import numpy as np
import jax.numpy as jnp

from norlab_icp_mapper_tpu.ops.eigen import sym_eig3_smallest, sym_eig2_smallest


def random_sym3(rng, n):
    M = rng.normal(size=(n, 3, 3)).astype(np.float32)
    return (M @ np.swapaxes(M, 1, 2)).astype(np.float32)


def test_eig3_matches_numpy(rng):
    A = random_sym3(rng, 200)
    evals, v = sym_eig3_smallest(jnp.asarray(A))
    ref_vals, ref_vecs = np.linalg.eigh(A.astype(np.float64))
    np.testing.assert_allclose(np.asarray(evals), ref_vals, rtol=2e-3,
                               atol=2e-3)
    # eigenvector up to sign: |cos angle| ~ 1
    cos = np.abs(np.sum(np.asarray(v) * ref_vecs[:, :, 0], axis=1))
    assert np.all(cos > 0.99), cos.min()


def test_eig3_degenerate_isotropic():
    A = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    evals, v = sym_eig3_smallest(A)
    np.testing.assert_allclose(np.asarray(evals), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=1), 1.0,
                               atol=1e-5)


def test_eig2_matches_numpy(rng):
    M = rng.normal(size=(100, 2, 2)).astype(np.float32)
    A = (M @ np.swapaxes(M, 1, 2)).astype(np.float32)
    evals, v = sym_eig2_smallest(jnp.asarray(A))
    ref_vals, ref_vecs = np.linalg.eigh(A.astype(np.float64))
    np.testing.assert_allclose(np.asarray(evals), ref_vals, rtol=2e-3,
                               atol=2e-3)
    cos = np.abs(np.sum(np.asarray(v) * ref_vecs[:, :, 0], axis=1))
    assert np.all(cos > 0.99)
