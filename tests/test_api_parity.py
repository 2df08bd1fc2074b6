"""Tests for the smaller reference-API-parity surfaces: registry, config
overrides, spread_freqs, mutual coherence getter, d_out=0."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from _reference import make_reference_embedding
from fsw_gnn_tpu import FSWConfig, FSWConv, from_edge_index
from fsw_gnn_tpu.modules import (FSWEmbedding, get_mutual_coherence,
                                 spread_freqs_at_interval)
from fsw_gnn_tpu.registry import (available_layers, available_poolings,
                                  get_layer, get_pooling)


def test_registry():
    assert 'fsw_conv' in available_layers()
    assert 'fsw_readout' in available_poolings()
    assert get_layer('fsw_conv') is FSWConv
    from fsw_gnn_tpu import FSWReadout
    assert get_pooling('fsw_readout') is FSWReadout


def test_config_override():
    conv = FSWConv.from_config({'in_channels': 10, 'mlp_layers': 2},
                               in_channels=5, out_channels=3)
    assert conv.in_channels == 10 and conv.mlp_layers == 2
    with pytest.raises(ValueError):
        FSWConv.from_config({'bogus_key': 1}, in_channels=5, out_channels=3)


def test_spread_freqs_matches_reference():
    ref = make_reference_embedding(d_in=4, d_out=9)
    ref.spread_freqs_at_interval(3.0, 1.5)
    want = ref.freqs.detach().numpy()
    got = spread_freqs_at_interval(jnp.zeros(9, jnp.float64), 3.0, 1.5)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)
    # degenerate radius
    got0 = spread_freqs_at_interval(jnp.zeros(9, jnp.float64), 2.0, 0.0)
    np.testing.assert_allclose(np.asarray(got0), 2.0)


def test_get_mutual_coherence_matches_reference():
    rng = np.random.default_rng(0)
    V = rng.standard_normal((8, 5))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    ref = make_reference_embedding(d_in=5, d_out=8)
    sd = ref.state_dict()
    sd['projVecs'] = torch.from_numpy(V)
    ref.load_state_dict(sd)
    want = float(ref.get_mutual_coherence())
    got = float(get_mutual_coherence(jnp.asarray(V)))
    assert abs(got - want) < 1e-12


def test_d_out_zero():
    rng = np.random.default_rng(1)
    cfg = FSWConfig(d_in=4, d_out=0)
    emb = FSWEmbedding(cfg, dtype=jnp.float64)
    X = jnp.asarray(rng.standard_normal((3, 7, 4)))
    W = jnp.abs(jnp.asarray(rng.standard_normal((3, 7))))
    variables = emb.init(jax.random.PRNGKey(0), X, W)
    out = emb.apply(variables, X, W)
    assert out.shape == (3, 0)

    g = from_edge_index(np.array([[0, 1], [1, 0]]), 5, dtype=jnp.float64)
    Xn = jnp.asarray(rng.standard_normal((5, 4)))
    out = emb.apply(variables, Xn, graph=g)
    assert out.shape == (5, 0)
