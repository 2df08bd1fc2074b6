"""Tests for the TPU doubly-stochastic metric solver.

No CVXPY here, so correctness is established structurally:
  * isomorphic graphs (A2 = P A1 P^T, V2 = P V1) have optimal value 0 with
    S = P -- the solver must approach it;
  * identical graphs -> 0 with S = I;
  * the solver's objective must beat naive feasible guesses (uniform S);
  * solution is doubly stochastic;
  * symmetry / scale behavior of the feature term.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fsw_gnn_tpu.ops.sinkhorn import dsmetric_solve, sinkhorn_project
from fsw_gnn_tpu.utils import dsmetric


def _rand_graph(rng, n, d):
    A = (rng.random((n, n)) < 0.4).astype(np.float64)
    np.fill_diagonal(A, 0)
    A = np.maximum(A, A.T)
    V = rng.standard_normal((n, d))
    return A, V


def test_sinkhorn_project_is_doubly_stochastic():
    rng = np.random.default_rng(0)
    S = sinkhorn_project(jnp.asarray(rng.standard_normal((7, 7))), 100)
    np.testing.assert_allclose(np.asarray(S).sum(0), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(S).sum(1), 1.0, atol=1e-6)
    assert np.all(np.asarray(S) >= 0)


def test_identical_graphs_near_zero():
    rng = np.random.default_rng(1)
    A, V = _rand_graph(rng, 8, 3)
    val = dsmetric(A, V, A, V, dtype=jnp.float64)
    # uniform-S objective for comparison
    n = A.shape[0]
    S_u = np.full((n, n), 1.0 / n)
    D = np.linalg.norm(V[:, None] - V[None, :], axis=-1)
    obj_u = np.linalg.norm(A @ S_u - S_u @ A) + (S_u * D).sum()
    assert val < 0.1 * obj_u, (val, obj_u)


def test_isomorphic_graphs_near_zero():
    rng = np.random.default_rng(2)
    n = 8
    A1, V1 = _rand_graph(rng, n, 4)
    perm = rng.permutation(n)
    P = np.eye(n)[perm]
    A2 = P @ A1 @ P.T
    V2 = P @ V1
    val, S = dsmetric(A1, V1, A2, V2, return_S=True, dtype=jnp.float64,
                      n_outer=800)
    np.testing.assert_allclose(S.sum(0), 1.0, atol=1e-5)
    np.testing.assert_allclose(S.sum(1), 1.0, atol=1e-5)
    # value far below the uniform-guess objective
    S_u = np.full((n, n), 1.0 / n)
    D = np.linalg.norm(V1[:, None] - V2[None, :], axis=-1)
    obj_u = np.linalg.norm(A1 @ S_u - S_u @ A2) + (S_u * D).sum()
    assert val < 0.15 * obj_u, (val, obj_u)


def test_beats_uniform_on_random_pair():
    rng = np.random.default_rng(3)
    A1, V1 = _rand_graph(rng, 10, 3)
    A2, V2 = _rand_graph(rng, 10, 3)
    val = dsmetric(A1, V1, A2, V2, dtype=jnp.float64)
    n = 10
    S_u = np.full((n, n), 1.0 / n)
    D = np.linalg.norm(V1[:, None] - V2[None, :], axis=-1)
    obj_u = np.linalg.norm(A1 @ S_u - S_u @ A2) + (S_u * D).sum()
    assert val <= obj_u * 1.001


def test_squared_dists_variant_runs():
    rng = np.random.default_rng(4)
    A1, V1 = _rand_graph(rng, 6, 2)
    A2, V2 = _rand_graph(rng, 6, 2)
    v = dsmetric(A1, V1, A2, V2, use_squared_dists=True, dtype=jnp.float64)
    assert np.isfinite(v) and v >= 0


def test_shape_mismatch_rejected():
    rng = np.random.default_rng(5)
    A1, V1 = _rand_graph(rng, 5, 2)
    A2, V2 = _rand_graph(rng, 6, 2)
    with pytest.raises(AssertionError):
        dsmetric(A1, V1, A2, V2)
