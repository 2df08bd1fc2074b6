"""Correctness of the comm/compute-overlapped distributed aggregation
prototype on the virtual mesh: slice-chunked projection exchange must
reproduce the single-device table embedding exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fsw_gnn_tpu import (FSWConfig, from_edge_index, fsw_embed_table,
                         to_neighbor_table)
from fsw_gnn_tpu.parallel import make_graph_mesh, partition_graph, \
    shard_node_features, unshard_recipient_values
from fsw_gnn_tpu.parallel.overlap import make_overlapped_forward


@pytest.mark.parametrize('n_chunks', [1, 4])
def test_overlapped_forward_matches_single_device(n_chunks):
    rng = np.random.default_rng(7)
    n, d_in, d_out = 64, 5, 12
    A = rng.random((n, n)) < 0.15
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    g = from_edge_index(np.stack([src, dst]), n, dtype=jnp.float64)
    X = rng.standard_normal((n, d_in))

    cfg = FSWConfig(d_in=d_in, d_out=d_out, enable_bias=False)
    proj = rng.standard_normal((cfg.nSlices, d_in))
    proj /= np.linalg.norm(proj, axis=1, keepdims=True)
    freqs = np.abs(rng.standard_normal(cfg.nFreqs)) + 0.1

    want = np.asarray(fsw_embed_table(
        jnp.asarray(X), to_neighbor_table(g), jnp.asarray(proj),
        jnp.asarray(freqs), cfg))

    Pn = 4
    mesh = make_graph_mesh(Pn)
    shards = partition_graph(g, Pn, layout='table')
    Xs = shard_node_features(X, shards)
    fwd = make_overlapped_forward(shards, mesh, cfg, jnp.asarray(proj),
                                  jnp.asarray(freqs), n_chunks=n_chunks)
    got = unshard_recipient_values(fwd(Xs), shards)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
