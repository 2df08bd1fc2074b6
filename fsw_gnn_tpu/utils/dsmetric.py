"""User-facing doubly-stochastic graph metric.

API-compatible with the reference `dsmetric` (/root/reference/dsmetric.py:5):
accepts numpy/JAX arrays, returns a float (and optionally the optimized S).
Runs the TPU Sinkhorn/mirror-descent solver from ops.sinkhorn.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.sinkhorn import dsmetric_solve


def dsmetric(A1, V1, A2, V2, lambda_features=1.0, use_squared_dists=False,
             return_S=False, n_outer=500, dtype=jnp.float32):
    A1 = jnp.asarray(np.asarray(A1), dtype)
    V1 = jnp.asarray(np.asarray(V1), dtype)
    A2 = jnp.asarray(np.asarray(A2), dtype)
    V2 = jnp.asarray(np.asarray(V2), dtype)
    n, d = V1.shape
    n2, d2 = V2.shape
    assert n == n2, 'Graph sizes (number of nodes) must match.'
    assert d == d2, 'Feature dimensions must match.'

    out = dsmetric_solve(A1, V1, A2, V2, lambda_features=lambda_features,
                         use_squared_dists=use_squared_dists,
                         n_outer=n_outer, return_S=return_S)
    if return_S:
        obj, S = out
        return float(obj), np.asarray(S)
    return float(out)
