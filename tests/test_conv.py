"""Tests of FSWConv / FSWReadout / FSWGNN.

The reference fsw_conv.py cannot be imported here (needs torch_geometric),
so parity is tested compositionally: the adjacency builder + embedding stage
against the reference FSW_embedding in graph mode (the whole non-MLP part of
FSW_conv.forward, fsw_conv.py:331-358), and the metamorphic properties of the
reference test script (/root/reference/test_conv.py): gradient flow and
homogeneity of the homogeneous configuration.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from _reference import make_reference_embedding
from fsw_gnn_tpu import (FSWConfig, FSWConv, FSWGNN, FSWReadout,
                         from_edge_index, readout_graph)
from fsw_gnn_tpu.modules import FSWEmbedding


def _random_graph(rng, n, p=0.25):
    A = rng.random((n, n)) < p
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    return np.stack([src, dst]).astype(np.int64)


def _torch_sparse_from_graph(g):
    """Reference-format sparse adjacency from our (padded) Graph."""
    E = g.num_edges
    idx = torch.from_numpy(np.stack([np.asarray(g.dst)[:E],
                                     np.asarray(g.src)[:E]]).astype(np.int64))
    vals = torch.from_numpy(np.asarray(g.weight)[:E].astype(np.float64))
    return torch.sparse_coo_tensor(idx, vals,
                                   (g.num_recipients, g.num_nodes)).coalesce()


@pytest.mark.parametrize('self_loop,weighting', [(0.0, 'unit'), (0.4, 'unit'),
                                                 (0.0, 'gcn'), (0.3, 'gcn')])
def test_adjacency_plus_embedding_parity(self_loop, weighting):
    """from_edge_index (self-loops/gcn) + CSR embedding == reference
    FSW_embedding on the same adjacency."""
    rng = np.random.default_rng(0)
    n, d_in, d_out = 25, 5, 8
    edge_index = _random_graph(rng, n)
    X = rng.standard_normal((n, d_in))

    g = from_edge_index(edge_index, n, self_loop_weight=self_loop,
                        edge_weighting=weighting, dtype=jnp.float64)
    cfg = FSWConfig(d_in=d_in, d_out=d_out, enable_bias=False)
    proj = rng.standard_normal((cfg.nSlices, d_in))
    proj /= np.linalg.norm(proj, axis=1, keepdims=True)
    freqs = np.abs(rng.standard_normal(cfg.nFreqs)) + 0.2

    ref = make_reference_embedding(d_in=d_in, d_out=d_out, enable_bias=False)
    sd = ref.state_dict()
    sd['projVecs'] = torch.from_numpy(proj)
    sd['freqs'] = torch.from_numpy(freqs)
    ref.load_state_dict(sd)
    W = _torch_sparse_from_graph(g)
    want = ref(torch.from_numpy(X), W, graph_mode=True).detach().numpy()

    from fsw_gnn_tpu import fsw_embed_graph
    got = fsw_embed_graph(jnp.asarray(X), g, jnp.asarray(proj),
                          jnp.asarray(freqs), cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-8, atol=1e-10)


def test_conv_forward_backward_shapes():
    rng = np.random.default_rng(1)
    n, d_in, d_out, d_edge = 30, 7, 5, 3
    edge_index = _random_graph(rng, n)
    E = edge_index.shape[1]
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    EF = rng.standard_normal((E, d_edge))
    g = from_edge_index(edge_index, n, edge_features=EF, dtype=jnp.float64)

    conv = FSWConv(in_channels=d_in, out_channels=d_out, edgefeat_dim=d_edge,
                   mlp_layers=3, minimize_slice_coherence=False,
                   dtype=jnp.float64)
    variables = conv.init(jax.random.PRNGKey(0), X, g)
    out = conv.apply(variables, X, g)
    assert out.shape == (n, d_out)
    assert np.all(np.isfinite(np.asarray(out)))

    def loss(params, X_):
        return jnp.sum(conv.apply({'params': params, **{k: v for k, v in
                                   variables.items() if k != 'params'}},
                                  X_, g) ** 2)

    grads = jax.grad(loss)(variables['params'], X)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    assert any(np.any(np.asarray(x) != 0) for x in flat)


def test_conv_homogeneity():
    """Reference metamorphic property (test_conv.py:57,70-74): with bias off,
    homog degree encoding and LeakyReLU, f(16 x) == 16 f(x)."""
    rng = np.random.default_rng(2)
    n, d_in, d_out = 24, 6, 4
    edge_index = _random_graph(rng, n)
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    g = from_edge_index(edge_index, n, dtype=jnp.float64)

    conv = FSWConv(in_channels=d_in, out_channels=d_out, bias=False,
                   homog_degree_encoding=True, mlp_layers=2,
                   minimize_slice_coherence=False, dtype=jnp.float64)
    variables = conv.init(jax.random.PRNGKey(3), X, g)
    out1 = conv.apply(variables, X, g)
    out2 = conv.apply(variables, 16.0 * X, g)
    np.testing.assert_allclose(np.asarray(out2), 16.0 * np.asarray(out1),
                               rtol=1e-9, atol=1e-11)


def test_conv_fixed_embedding_collection():
    """learnable_embedding=False puts embedding params in 'fsw_fixed'."""
    rng = np.random.default_rng(3)
    n, d_in, d_out = 12, 4, 3
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    g = from_edge_index(_random_graph(rng, n), n, dtype=jnp.float64)
    conv = FSWConv(in_channels=d_in, out_channels=d_out,
                   learnable_embedding=False, minimize_slice_coherence=False,
                   dtype=jnp.float64)
    variables = conv.init(jax.random.PRNGKey(0), X, g)
    assert 'fsw_fixed' in variables
    fixed = variables['fsw_fixed']['fsw_embed']
    assert 'proj_vecs' in fixed and 'freqs' in fixed
    out = conv.apply(variables, X, g)
    assert out.shape == (n, d_out)


def test_conv_mlp0_dim_reduct():
    """mlp_layers=0 + concat_self uses the coherence-minimized projection
    (fsw_conv.py:255-266)."""
    rng = np.random.default_rng(4)
    n, d_in, d_out = 10, 3, 4
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    g = from_edge_index(_random_graph(rng, n), n, dtype=jnp.float64)
    conv = FSWConv(in_channels=d_in, out_channels=d_out, mlp_layers=0,
                   minimize_slice_coherence=False, dtype=jnp.float64)
    variables = conv.init(jax.random.PRNGKey(0), X, g)
    assert variables['params']['head']['dim_reduct'].shape[0] == d_out
    out = conv.apply(variables, X, g)
    assert out.shape == (n, d_out)


def test_readout():
    rng = np.random.default_rng(5)
    n, d_in, d_out, batch = 20, 5, 6, 3
    graph_index = np.sort(rng.integers(0, batch, n))
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    pool_g = readout_graph(graph_index, n, batch, dtype=jnp.float64)
    ro = FSWReadout(in_channels=d_in, out_channels=d_out, concat_self=False,
                    minimize_slice_coherence=False, dtype=jnp.float64)
    variables = ro.init(jax.random.PRNGKey(0), X, pool_g)
    out = ro.apply(variables, X, pool_g)
    assert out.shape == (batch, d_out)
    assert np.all(np.isfinite(np.asarray(out)))


def test_readout_matches_multiset_embedding():
    """A single-graph readout's embedding equals the multiset embedding of
    all vertex features with unit weights (the bipartite-W construction)."""
    rng = np.random.default_rng(6)
    n, d_in, d_out = 15, 4, 7
    X = rng.standard_normal((n, d_in))
    cfg = FSWConfig(d_in=d_in, d_out=d_out, enable_bias=False)
    proj = rng.standard_normal((cfg.nSlices, d_in))
    proj /= np.linalg.norm(proj, axis=1, keepdims=True)
    freqs = np.abs(rng.standard_normal(cfg.nFreqs)) + 0.2

    from fsw_gnn_tpu import fsw_embed_graph, fsw_embed_multiset
    pool_g = readout_graph(np.zeros(n, np.int64), n, 1, dtype=jnp.float64)
    a = fsw_embed_graph(jnp.asarray(X), pool_g, jnp.asarray(proj),
                        jnp.asarray(freqs), cfg)
    b = fsw_embed_multiset(jnp.asarray(X)[None], None, jnp.asarray(proj),
                           jnp.asarray(freqs), cfg, w_mode='unit')
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10,
                               atol=1e-12)


def test_gnn_stack():
    rng = np.random.default_rng(7)
    n, d_in = 18, 5
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    g = from_edge_index(_random_graph(rng, n), n, dtype=jnp.float64)
    model = FSWGNN(in_channels=d_in, hidden_dims=(8, 8, 3),
                   minimize_slice_coherence=False, dtype=jnp.float64)
    variables = model.init(jax.random.PRNGKey(0), X, g)
    out = model.apply(variables, X, g)
    assert out.shape == (n, 3)

    def loss(params):
        return jnp.sum(model.apply({**variables, 'params': params}, X, g) ** 2)

    grads = jax.grad(loss)(variables['params'])
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(grads))


def test_conv_jit_and_coherence_init():
    """End-to-end with the real init path (coherence minimization on) and a
    jitted apply."""
    rng = np.random.default_rng(8)
    n, d_in, d_out = 16, 4, 5
    X = jnp.asarray(rng.standard_normal((n, d_in)), jnp.float32)
    g = from_edge_index(_random_graph(rng, n), n, dtype=jnp.float32)
    conv = FSWConv(in_channels=d_in, out_channels=d_out, mlp_layers=1)
    variables = conv.init(jax.random.PRNGKey(0), X, g)
    fast = jax.jit(lambda v, x: conv.apply(v, x, g))
    out = fast(variables, X)
    assert out.shape == (n, d_out)
    assert np.all(np.isfinite(np.asarray(out)))


def test_optimizer_loop_updates_degree_scale():
    """Reference test_conv.py:77-85: SGD steps move the learnable vertex-
    degree encoding scale and its gradient is nonzero."""
    import optax
    rng = np.random.default_rng(9)
    n, d_in, d_out = 20, 5, 4
    X = jnp.asarray(rng.standard_normal((n, d_in)), jnp.float64)
    g = from_edge_index(_random_graph(rng, n), n, dtype=jnp.float64)
    conv = FSWConv(in_channels=d_in, out_channels=d_out, mlp_layers=2,
                   learnable_vertex_degree_encoding_scale=True,
                   vertex_degree_encoding_function='log',
                   minimize_slice_coherence=False, dtype=jnp.float64)
    variables = conv.init(jax.random.PRNGKey(0), X, g)
    params = variables['params']
    fixed = {k: v for k, v in variables.items() if k != 'params'}
    assert 'total_mass_scale' in params['fsw_embed']

    def loss(p):
        return jnp.linalg.norm(conv.apply({'params': p, **fixed}, X, g))

    opt = optax.sgd(1e-2)
    state = opt.init(params)
    scale0 = float(params['fsw_embed']['total_mass_scale'])
    for _ in range(10):
        grads = jax.grad(loss)(params)
        gscale = float(grads['fsw_embed']['total_mass_scale'])
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert gscale != 0.0
    assert float(params['fsw_embed']['total_mass_scale']) != scale0
