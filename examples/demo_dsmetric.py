"""Doubly-stochastic graph metric demo -- TPU-native equivalent of the
reference's dsmetric.py (CVXPY) using the entropic mirror-descent solver.

Run: python examples/demo_dsmetric.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fsw_gnn_tpu import dsmetric

rng = np.random.default_rng(0)
n, d = 12, 4

A1 = (rng.random((n, n)) < 0.3).astype(float)
np.fill_diagonal(A1, 0)
A1 = np.maximum(A1, A1.T)
V1 = rng.standard_normal((n, d))

# an isomorphic copy: the metric should be near zero
perm = rng.permutation(n)
P = np.eye(n)[perm]
A2, V2 = P @ A1 @ P.T, P @ V1

# and an unrelated graph: the metric should be clearly positive
A3 = (rng.random((n, n)) < 0.3).astype(float)
np.fill_diagonal(A3, 0)
A3 = np.maximum(A3, A3.T)
V3 = rng.standard_normal((n, d))

d_iso = dsmetric(A1, V1, A2, V2)
d_rand = dsmetric(A1, V1, A3, V3)
print(f'dsmetric(G, isomorphic(G)) = {d_iso:.4f}')
print(f'dsmetric(G, random H)      = {d_rand:.4f}')
