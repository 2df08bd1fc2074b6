"""The docs/MIGRATION.md code snippets must actually run.

Each test mirrors a snippet from the migration guide (tiny shapes); if an
API referenced there drifts, this file fails before a user does.
"""
import jax
import jax.numpy as jnp
import numpy as np

from fsw_gnn_tpu import (FSWConfig, FSWConv, FSWEmbedding, FSWReadout,
                         auto_layout, from_edge_index, readout_graph)


def test_embedding_snippet():
    cfg = FSWConfig(d_in=3, d_out=8)
    emb = FSWEmbedding(cfg)
    X = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 3)),
                    jnp.float32)
    W = jnp.ones((2, 5), jnp.float32)
    params = emb.init(jax.random.key(0), X, W)
    Y = emb.apply(params, X, W)
    assert Y.shape == (2, 8)
    # dense adjacency graph mode: W (..., R, n)
    Wd = jnp.ones((2, 4, 5), jnp.float32)
    Yd = emb.apply(params, X, Wd, graph_mode=True)
    assert Yd.shape == (2, 4, 8)


def test_graph_and_conv_snippet():
    rng = np.random.default_rng(1)
    edge_index = rng.integers(0, 10, size=(2, 30))
    g = auto_layout(from_edge_index(edge_index, 10,
                                    edge_weighting='gcn',
                                    self_loop_weight=1.0))
    conv = FSWConv.from_config({'mlp_layers': 2}, in_channels=3,
                               out_channels=4)
    X = jnp.asarray(rng.standard_normal((10, 3)), jnp.float32)
    params = conv.init(jax.random.key(0), X, g)
    Y = conv.apply(params, X, g)
    assert Y.shape == (10, 4)
    # unknown config keys raise (reference config system contract)
    try:
        FSWConv.from_config({'no_such_arg': 1}, in_channels=3,
                            out_channels=4)
    except ValueError:
        pass
    else:
        raise AssertionError('unknown config key must raise')


def test_readout_snippet():
    rng = np.random.default_rng(2)
    graph_index = np.repeat(np.arange(3), 4)          # 3 graphs x 4 vertices
    pool = readout_graph(graph_index, 12, 3)
    ro = FSWReadout(in_channels=3, out_channels=6)
    X = jnp.asarray(rng.standard_normal((12, 3)), jnp.float32)
    p = ro.init(jax.random.key(0), X, pool)
    Z = ro.apply(p, X, pool)
    assert Z.shape == (3, 6)
