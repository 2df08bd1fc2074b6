"""Input validation -- the reference's `fsw_embedding_basic_safety_checks`
(fsw_embedding.py:104-116, 626-757) as explicit host-side utilities.

In a jitted TPU pipeline, per-forward runtime checks would either block
dispatch or be traced away, so validation is an explicit call at data
ingestion (where the reference's checks conceptually belong).  For in-jit
checking, `checkify_embed` wraps a functional embed call with
jax.experimental.checkify.
"""
from __future__ import annotations

import numpy as np


def validate_multiset_inputs(X, W=None):
    X = np.asarray(X)
    assert X.ndim >= 2, 'X must have rank >= 2 (..., n, d_in)'
    assert np.isfinite(X).all(), 'X must be finite (no NaN/inf)'
    if W is not None:
        W = np.asarray(W)
        assert W.shape == X.shape[:-1], (
            f'W shape {W.shape} must equal X.shape[:-1] {X.shape[:-1]}')
        assert np.isfinite(W).all(), 'W must be finite'
        assert (W >= 0).all(), 'all weights must be nonnegative'


def validate_edge_index(edge_index, num_nodes: int):
    ei = np.asarray(edge_index)
    assert ei.ndim == 2 and ei.shape[0] == 2, 'edge_index must be (2, E)'
    assert ei.min(initial=0) >= 0, 'negative node ids'
    assert ei.max(initial=-1) < num_nodes, 'node id out of range'


def validate_graph(graph):
    """Invariants of the CSR layout (the reference's verify_coalescence
    analogue, fsw_embedding.py:2311-2322)."""
    dst = np.asarray(graph.dst)
    row_ptr = np.asarray(graph.row_ptr)
    w = np.asarray(graph.weight)
    assert (np.diff(dst) >= 0).all(), 'dst must be sorted non-decreasing'
    assert row_ptr[0] == 0 and row_ptr[-1] == dst.shape[0], 'bad row_ptr'
    assert (np.diff(row_ptr) >= 0).all(), 'row_ptr must be non-decreasing'
    counts = np.bincount(dst, minlength=graph.num_recipients)
    np.testing.assert_array_equal(counts, np.diff(row_ptr))
    assert np.isfinite(w).all(), 'weights must be finite'
    assert (w >= 0).all(), 'weights must be nonnegative'
    assert (w[graph.num_edges:] == 0).all(), 'padding must carry zero weight'


def checkify_embed(fn):
    """Wrap a functional embed call with jax.experimental.checkify so NaN
    production inside jit raises instead of propagating."""
    import jax
    from jax.experimental import checkify

    def wrapped(*args, **kwargs):
        checked = checkify.checkify(lambda *a: fn(*a, **kwargs),
                                    errors=checkify.float_checks)
        err, out = checked(*args)
        err.throw()
        return out
    return wrapped
