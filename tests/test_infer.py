"""Scalable evaluation (VERDICT r2 weak #3): exact memory-capped layer-wise
inference, and distributed evaluation that never unshards logits."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fsw_gnn_tpu import from_edge_index
from fsw_gnn_tpu.data import synthetic_planted_partition
from fsw_gnn_tpu.models.gnn import FSWGNN
from fsw_gnn_tpu.train import TrainConfig, Trainer
from fsw_gnn_tpu.train.infer import _chunk_graphs, layerwise_predict


@pytest.fixture(scope='module')
def data():
    return synthetic_planted_partition(num_nodes=300, num_classes=3,
                                       feat_dim=16, p_in=0.08, p_out=0.01,
                                       seed=0)


def _model_and_vars(data, **graph_kwargs):
    g = from_edge_index(data.edge_index, data.num_nodes, dtype=jnp.float32,
                        **graph_kwargs)
    X = jnp.asarray(data.features, jnp.float32)
    model = FSWGNN(in_channels=X.shape[1], hidden_dims=(8, data.num_classes),
                   minimize_slice_coherence=False)
    variables = model.init(jax.random.PRNGKey(0), X, g)
    return model, variables, X, g


@pytest.mark.parametrize('graph_kwargs', [
    {},                                               # unit weights
    {'self_loop_weight': 0.3, 'edge_weighting': 'gcn'},
])
def test_layerwise_predict_exact(data, graph_kwargs):
    """Chunked layer-wise inference equals the one-shot forward (same
    weights, same per-recipient edge sets), incl. self-loop/gcn weighting
    which rides the FULL graph's precomputed edge weights.  Tolerance is
    f32 reduction-order noise: the chunked path's segmented scans restart
    at chunk boundaries, so sums associate differently (~1e-5 abs on O(1)
    activations); a real weighting/masking bug shows up at O(1)."""
    model, variables, X, g = _model_and_vars(data, **graph_kwargs)
    want = np.asarray(model.apply(variables, X, g))
    got = layerwise_predict(model, variables, X, g, node_chunk=64)
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=2e-5)


def test_layerwise_memory_envelope(data):
    """The chunk envelope actually caps the per-step edge working set: the
    largest chunk's padded edge count (which bounds the (E, S) quadrature
    intermediates, the full-graph forward's memory hog) must sit far below
    the full edge list."""
    model, variables, X, g = _model_and_vars(data)
    chunks, bounds, e_cap = _chunk_graphs(g, node_chunk=32)
    assert e_cap * 4 <= g.padded_num_edges, (e_cap, g.padded_num_edges)
    # every chunk shares the envelope (one compile per layer)
    assert all(c.padded_num_edges == e_cap for c in chunks)
    assert all(c.num_recipients == 32 for c in chunks)


def test_trainer_eval_node_chunk_matches_full(data):
    full = Trainer(data, TrainConfig(hidden_dims=(8,), epochs=2,
                                     eval_every=10, seed=5))
    capped = Trainer(data, TrainConfig(hidden_dims=(8,), epochs=2,
                                       eval_every=10, seed=5,
                                       eval_node_chunk=50))
    for _ in range(2):
        full.train_epoch()
        capped.train_epoch()
    np.testing.assert_allclose(capped.predict(), full.predict(),
                               rtol=2e-5, atol=1e-6)
    a, b = full.evaluate(), capped.evaluate()
    assert a == b


@pytest.mark.slow
def test_distributed_eval_matches_single_and_stays_sharded(data):
    """The distributed evaluate() reduces split accuracies on-device from
    sharded logits; its numbers must match the single-device evaluate()."""
    cfg = dict(hidden_dims=(8,), epochs=2, eval_every=10, seed=7)
    tr1 = Trainer(data, TrainConfig(**cfg))
    tr8 = Trainer(data, TrainConfig(**cfg, num_devices=8))
    e1, e8 = tr1.evaluate(), tr8.evaluate()
    for k in e1:
        np.testing.assert_allclose(e1[k], e8[k], atol=1e-12), k
    # after a few steps too (params move in lockstep at rtol 5e-3; the
    # argmax-based accuracies should agree exactly at this scale)
    for _ in range(2):
        tr1.train_epoch()
        tr8.train_epoch()
    e1, e8 = tr1.evaluate(), tr8.evaluate()
    assert set(e1) == set(e8)
    for k in e1:
        assert abs(e1[k] - e8[k]) <= 0.05, (k, e1, e8)
