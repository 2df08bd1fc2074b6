"""Graph-level classification: FSWGNN stack + FSW readout pooling."""
import numpy as np
import jax
import jax.numpy as jnp

from fsw_gnn_tpu import FSWGraphClassifier, from_edge_index, readout_graph


def _batch_of_graphs(rng, n_graphs, nodes_per_graph, d, p):
    """A batch of disjoint random graphs packed into one node space."""
    edge_lists, graph_index, feats = [], [], []
    offset = 0
    labels = []
    for gi in range(n_graphs):
        n = nodes_per_graph
        # two classes: dense vs sparse connectivity
        cls = gi % 2
        prob = p * (3 if cls else 1)
        A = rng.random((n, n)) < prob
        np.fill_diagonal(A, False)
        s, t = np.nonzero(A)
        edge_lists.append(np.stack([s + offset, t + offset]))
        graph_index.extend([gi] * n)
        feats.append(rng.standard_normal((n, d)))
        labels.append(cls)
        offset += n
    edge_index = np.concatenate(edge_lists, axis=1)
    return (edge_index, np.asarray(graph_index),
            np.concatenate(feats).astype(np.float32), np.asarray(labels),
            offset)


def test_graph_classifier_forward_and_learning():
    rng = np.random.default_rng(0)
    n_graphs, npg, d = 12, 12, 6
    edge_index, graph_index, X, y, n_total = _batch_of_graphs(
        rng, n_graphs, npg, d, p=0.08)

    g = from_edge_index(edge_index, n_total)
    pool = readout_graph(graph_index, n_total, n_graphs)
    model = FSWGraphClassifier(in_channels=d, hidden_dims=(8,),
                               num_classes=2, minimize_slice_coherence=False)
    Xj = jnp.asarray(X)
    variables = model.init(jax.random.PRNGKey(0), Xj, g, pool)
    logits = model.apply(variables, Xj, g, pool)
    assert logits.shape == (n_graphs, 2)
    assert np.all(np.isfinite(np.asarray(logits)))

    # few steps of training must reduce the loss
    import optax
    params = variables['params']
    fixed = {k: v for k, v in variables.items() if k != 'params'}
    yj = jnp.asarray(y)

    def loss_fn(params):
        lg = model.apply({'params': params, **fixed}, Xj, g, pool)
        return optax.softmax_cross_entropy_with_integer_labels(lg, yj).mean()

    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = jax.jit(lambda p, s: _step(p, s, loss_fn, opt))

    def _step(p, s, loss_fn, opt):
        l, gr = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(gr, s, p)
        return optax.apply_updates(p, up), s, l

    losses = []
    for _ in range(25):
        params, state, l = step(params, state)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8, losses[::6]
