"""Fused Pallas table kernel vs the reference XLA table path (interpret
mode on CPU).

ATTIC: not part of the CI suite (pytest.ini testpaths=tests).  Run
standalone from the repo root with
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python -m pytest benchmarks/attic -q
"""
import os
import sys

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp
import pytest

from fsw_gnn_tpu import (FSWConfig, from_edge_index, fsw_embed_table,
                         to_neighbor_table)
from fsw_gnn_tpu.embedding import lowclamp
from fsw_table_pallas import (_sort_pairs_along_b,
                              fsw_table_forward)


def test_bitonic_sort_network():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 16, 3)).astype(np.float32)
    w = rng.standard_normal((5, 16, 3)).astype(np.float32)
    ps, ws = _sort_pairs_along_b(jnp.asarray(x), jnp.asarray(w), b_axis=1)
    ps, ws = np.asarray(ps), np.asarray(ws)
    order = np.argsort(x, axis=1)
    np.testing.assert_allclose(ps, np.take_along_axis(x, order, axis=1),
                               rtol=1e-6)
    np.testing.assert_allclose(ws, np.take_along_axis(w, order, axis=1),
                               rtol=1e-6)


def test_bitonic_sort_with_ties_preserves_multiset():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 3, (4, 8, 1)).astype(np.float32)  # many ties
    w = rng.standard_normal((4, 8, 1)).astype(np.float32)
    ps, ws = _sort_pairs_along_b(jnp.asarray(x), jnp.asarray(w), b_axis=1)
    ps, ws = np.asarray(ps)[..., 0], np.asarray(ws)[..., 0]
    for r in range(4):
        assert sorted(x[r, :, 0].tolist()) == ps[r].tolist()
        # payload multiset preserved
        np.testing.assert_allclose(sorted(w[r, :, 0].tolist()),
                                   sorted(ws[r].tolist()), rtol=1e-6)


def _setup(rng, n=64, d_in=8, S=16, B=16, p=0.15):
    A = rng.random((n, n)) < p
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    g = from_edge_index(np.stack([src, dst]), n, dtype=jnp.float32)
    t = to_neighbor_table(g, bucket_size=B)
    X = jnp.asarray(rng.standard_normal((n, d_in)), jnp.float32)
    cfg = FSWConfig(d_in=d_in, d_out=S, enable_bias=False)
    proj = rng.standard_normal((S, d_in))
    proj /= np.linalg.norm(proj, axis=1, keepdims=True)
    proj = jnp.asarray(proj, jnp.float32)
    freqs = jnp.abs(jnp.asarray(rng.standard_normal(S), jnp.float32)) + 0.2
    return g, t, X, cfg, proj, freqs


def test_fused_kernel_matches_xla_table_path():
    rng = np.random.default_rng(2)
    g, t, X, cfg, proj, freqs = _setup(rng)

    want = fsw_embed_table(X, t, proj, freqs, cfg)

    Xp = X @ proj.T
    w_sum = t.weight.sum(axis=1)
    w_sum_padded = lowclamp(w_sum, cfg.total_mass_pad_thresh)
    pad_norm = lowclamp(cfg.total_mass_pad_thresh - w_sum, 0.0) / w_sum_padded
    wn = t.weight / w_sum_padded[:, None]
    got = fsw_table_forward(t.idx, wn, pad_norm, Xp, freqs,
                            tile_r=8, tile_s=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_fused_kernel_multi_tile_grid():
    rng = np.random.default_rng(3)
    g, t, X, cfg, proj, freqs = _setup(rng, n=128, S=32, B=32, p=0.1)
    want = fsw_embed_table(X, t, proj, freqs, cfg)
    Xp = X @ proj.T
    w_sum = t.weight.sum(axis=1)
    w_sum_padded = lowclamp(w_sum, cfg.total_mass_pad_thresh)
    pad_norm = lowclamp(cfg.total_mass_pad_thresh - w_sum, 0.0) / w_sum_padded
    wn = t.weight / w_sum_padded[:, None]
    got = fsw_table_forward(t.idx, wn, pad_norm, Xp, freqs,
                            tile_r=16, tile_s=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
