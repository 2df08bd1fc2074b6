"""Input validation utilities."""
import numpy as np
import jax.numpy as jnp
import pytest

from fsw_gnn_tpu import from_edge_index
from fsw_gnn_tpu.utils import (validate_edge_index, validate_graph,
                               validate_multiset_inputs)


def test_validate_multiset():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((3, 5, 2))
    W = np.abs(rng.standard_normal((3, 5)))
    validate_multiset_inputs(X, W)
    with pytest.raises(AssertionError):
        validate_multiset_inputs(X, -W)
    Xn = X.copy()
    Xn[0, 0, 0] = np.nan
    with pytest.raises(AssertionError):
        validate_multiset_inputs(Xn)


def test_validate_edge_index_and_graph():
    rng = np.random.default_rng(1)
    n = 20
    A = rng.random((n, n)) < 0.2
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    ei = np.stack([src, dst])
    validate_edge_index(ei, n)
    with pytest.raises(AssertionError):
        validate_edge_index(ei, 3)
    g = from_edge_index(ei, n, dtype=jnp.float64)
    validate_graph(g)
