"""Correctness of the comm/compute-overlapped distributed aggregation
prototype on the virtual mesh: slice-chunked projection exchange must
reproduce the single-device table embedding exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fsw_gnn_tpu import (FSWConfig, from_edge_index, fsw_embed_table,
                         fsw_embed_multi_table, to_neighbor_table)
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


# ---------------------------------------------------------------------------
# PRODUCTION overlap exchange (exchange='overlap'): the model keeps raw
# features local and exchanges each layer's sender projections slice-chunk
# by slice-chunk inside the embedding (fsw_embed_local_overlap).
# ---------------------------------------------------------------------------

import optax

from fsw_gnn_tpu import FSWGNN
from fsw_gnn_tpu.parallel import (make_distributed_forward,
                                  make_distributed_train_step,
                                  shard_recipient_labels)


def _random_graph_idx(rng, n, p=0.15):
    A = rng.random((n, n)) < p
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    return np.stack([src, dst]).astype(np.int64)


@pytest.mark.parametrize('num_devices', [4, 8])
def test_overlap_exchange_matches_all_gather_forward(num_devices):
    rng = np.random.default_rng(31)
    n, d_in, d_out = 72, 5, 4
    g = from_edge_index(_random_graph_idx(rng, n), n, dtype=jnp.float64)
    X = rng.standard_normal((n, d_in))

    model = FSWGNN(in_channels=d_in, hidden_dims=(6, d_out),
                   minimize_slice_coherence=False, dtype=jnp.float64)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X), g)

    mesh = make_graph_mesh(num_devices)
    shards = partition_graph(g, num_devices)
    Xs = shard_node_features(np.asarray(X), shards)
    fwd_ag = make_distributed_forward(model, shards, mesh, variables,
                                      exchange='all_gather')
    fwd_ov = make_distributed_forward(model, shards, mesh, variables,
                                      exchange='overlap', overlap_chunks=3)
    a = unshard_recipient_values(fwd_ag(Xs, shards), shards)
    b = unshard_recipient_values(fwd_ov(Xs, shards), shards)
    np.testing.assert_allclose(b, a, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize('cartesian', [False, True])
@pytest.mark.parametrize('d_edge', [0, 2])
def test_overlap_embed_matches_table_edge_and_cartesian(cartesian, d_edge):
    """fsw_embed_local_overlap == fsw_embed_table on the SAME (Multi)Table
    with an identity gather: covers the round-4 scope extensions -- edge
    features (projections shard-local, only sender projections exchanged)
    and cartesian mode (chunking rides the slice axis; quadrature is
    (R, chunk, F) per chunk)."""
    from fsw_gnn_tpu import to_multi_table
    from fsw_gnn_tpu.parallel.overlap import fsw_embed_local_overlap

    rng = np.random.default_rng(17)
    n, d_in = 48, 5
    ei = _random_graph_idx(rng, n)
    ef = (rng.standard_normal((ei.shape[1], d_edge)) if d_edge else None)
    g = from_edge_index(ei, n, edge_features=ef, dtype=jnp.float64)
    X = jnp.asarray(rng.standard_normal((n, d_in)))

    if cartesian:
        cfg = FSWConfig(d_in=d_in, d_edge=d_edge, n_slices=6, n_freqs=3,
                        enable_bias=False)
    else:
        cfg = FSWConfig(d_in=d_in, d_edge=d_edge, d_out=10,
                        enable_bias=False)
    proj = rng.standard_normal((cfg.nSlices, d_in + d_edge))
    proj /= np.linalg.norm(proj, axis=1, keepdims=True)
    freqs = np.abs(rng.standard_normal(
        (cfg.nFreqs,) if not cartesian else (cfg.nFreqs,))) + 0.1
    proj, freqs = jnp.asarray(proj), jnp.asarray(freqs)

    mt = to_multi_table(g)
    want = np.asarray(fsw_embed_multi_table(X, mt, proj, freqs, cfg))
    got = np.asarray(fsw_embed_local_overlap(
        X, mt, proj, freqs, cfg, proj_gather_fn=lambda x: x, n_chunks=3))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_overlap_exchange_matches_all_gather_with_edge_features():
    """overlap vs all_gather under edge partitioning WITH edge features:
    identical forward and identical one-step SGD update (f64)."""
    rng = np.random.default_rng(33)
    n, d_in, d_edge, n_classes = 48, 4, 3, 3
    ei = _random_graph_idx(rng, n)
    ef = rng.standard_normal((ei.shape[1], d_edge))
    g = from_edge_index(ei, n, edge_features=ef, dtype=jnp.float64)
    X = rng.standard_normal((n, d_in))
    y = rng.integers(0, n_classes, n)

    model = FSWGNN(in_channels=d_in, hidden_dims=(5, n_classes),
                   edgefeat_dim=d_edge, minimize_slice_coherence=False,
                   dtype=jnp.float64)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X), g)
    params = variables['params']
    fixed = {k: v for k, v in variables.items() if k != 'params'}

    Pn = 4
    mesh = make_graph_mesh(Pn)
    shards = partition_graph(g, Pn)
    Xs = shard_node_features(np.asarray(X), shards)
    labels, mask = shard_recipient_labels(y, np.ones(n), shards)

    fwd_ag = make_distributed_forward(model, shards, mesh, variables,
                                      exchange='all_gather')
    fwd_ov = make_distributed_forward(model, shards, mesh, variables,
                                      exchange='overlap', overlap_chunks=3)
    a = unshard_recipient_values(fwd_ag(Xs, shards), shards)
    b = unshard_recipient_values(fwd_ov(Xs, shards), shards)
    np.testing.assert_allclose(b, a, rtol=1e-10, atol=1e-12)

    opt = optax.sgd(1.0)
    outs = {}
    for exch in ['all_gather', 'overlap']:
        step = make_distributed_train_step(model, opt, shards, mesh,
                                           fixed_collections=fixed,
                                           exchange=exch)
        p_in = jax.tree_util.tree_map(jnp.array, params)  # step donates
        p_new, _, _, loss = step(p_in, opt.init(params), {}, Xs, shards,
                                 labels, jnp.asarray(mask, jnp.float64),
                                 jax.random.PRNGKey(0))
        outs[exch] = (p_new, float(loss))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=1e-10, atol=1e-12),
        outs['all_gather'][0], outs['overlap'][0])
    np.testing.assert_allclose(outs['all_gather'][1], outs['overlap'][1],
                               rtol=1e-12)


def test_overlap_train_step_grads_match_all_gather():
    """overlap vs all_gather: identical one-step SGD update (f64)."""
    rng = np.random.default_rng(32)
    n, d_in, n_classes = 40, 4, 3
    g = from_edge_index(_random_graph_idx(rng, n), n, dtype=jnp.float64)
    X = rng.standard_normal((n, d_in))
    y = rng.integers(0, n_classes, n)

    model = FSWGNN(in_channels=d_in, hidden_dims=(n_classes,),
                   minimize_slice_coherence=False, dtype=jnp.float64)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X), g)
    params = variables['params']
    fixed = {k: v for k, v in variables.items() if k != 'params'}

    Pn = 4
    mesh = make_graph_mesh(Pn)
    shards = partition_graph(g, Pn)
    Xs = shard_node_features(np.asarray(X), shards)
    labels, mask = shard_recipient_labels(y, np.ones(n), shards)

    opt = optax.sgd(1.0)
    outs = {}
    for exch in ['all_gather', 'overlap']:
        step = make_distributed_train_step(model, opt, shards, mesh,
                                           fixed_collections=fixed,
                                           exchange=exch)
        p_in = jax.tree_util.tree_map(jnp.array, params)  # step donates
        p_new, _, _, loss = step(p_in, opt.init(params), {}, Xs, shards,
                                 labels, jnp.asarray(mask, jnp.float64),
                                 jax.random.PRNGKey(0))
        outs[exch] = (p_new, float(loss))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-10, atol=1e-12),
        outs['all_gather'][0], outs['overlap'][0])
    np.testing.assert_allclose(outs['all_gather'][1], outs['overlap'][1],
                               rtol=1e-12)
