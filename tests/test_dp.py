"""Data-parallel minibatch step on the virtual mesh."""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import optax

from fsw_gnn_tpu import FSWGNN, from_edge_index
from fsw_gnn_tpu.data import NeighborSampler, synthetic_planted_partition
from fsw_gnn_tpu.parallel import (make_data_mesh, make_dp_train_step,
                                  stack_batches)
from fsw_gnn_tpu.parallel.dist import masked_softmax_cross_entropy


def _build_batches(data, sampler, seed_sets, max_nodes, max_edges):
    graphs, Xs, labels, masks = [], [], [], []
    for seeds in seed_sets:
        b = sampler.sample(seeds, labels=data.labels, max_nodes=max_nodes)
        g = from_edge_index(b.edge_index_local, max_nodes, pad_to=max_edges,
                            dtype=jnp.float32)
        g = dataclasses.replace(g, num_edges=max_edges)
        graphs.append(g)
        Xs.append(jnp.asarray(data.features[b.node_ids], jnp.float32))
        lab = np.zeros(max_nodes, np.int32)
        m = np.zeros(max_nodes, np.float32)
        lab[:b.num_seeds] = b.seed_labels
        m[:b.num_seeds] = 1.0
        labels.append(jnp.asarray(lab))
        masks.append(jnp.asarray(m))
    return stack_batches(graphs, Xs, labels, masks)


def test_dp_minibatch_step_matches_serial():
    data = synthetic_planted_partition(num_nodes=200, num_classes=3,
                                       feat_dim=8, p_in=0.1, p_out=0.02)
    sampler = NeighborSampler(data.edge_index, data.num_nodes, fanouts=(4,),
                              seed=0)
    D, bs = 4, 8
    max_nodes, max_edges = bs * 5, 128
    rng = np.random.default_rng(0)
    train_ids = np.nonzero(data.train_mask)[0]
    seed_sets = [rng.choice(train_ids, bs, replace=False) for _ in range(D)]
    gs, X, labels, mask = _build_batches(data, sampler, seed_sets,
                                         max_nodes, max_edges)

    model = FSWGNN(in_channels=8, hidden_dims=(8, 3),
                   minimize_slice_coherence=False)
    variables = model.init(jax.random.PRNGKey(0), X[0],
                           jax.tree_util.tree_map(
                               lambda a: a[0] if hasattr(a, 'ndim') else a,
                               gs))
    params = variables['params']
    fixed = {k: v for k, v in variables.items() if k != 'params'}

    mesh = make_data_mesh(D)
    opt = optax.sgd(1.0)
    step = make_dp_train_step(model, opt, gs, mesh, fixed_collections=fixed)
    p_in = jax.tree_util.tree_map(jnp.array, params)  # step donates params
    p_new, _, _, loss = step(p_in, opt.init(params), {}, gs, X, labels,
                             mask, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))

    # serial reference: mean loss over all 4 batches, one SGD step
    def serial_loss(params):
        tot_s, tot_c = 0.0, 0.0
        for d in range(D):
            g_d = jax.tree_util.tree_map(
                lambda a: a[d] if hasattr(a, 'ndim') else a, gs)
            logits = model.apply({'params': params, **fixed}, X[d], g_d)
            s, c = masked_softmax_cross_entropy(logits, labels[d], mask[d])
            tot_s, tot_c = tot_s + s, tot_c + c
        return tot_s / tot_c

    g_serial = jax.grad(serial_loss)(params)
    g_dp = jax.tree_util.tree_map(lambda a, b: a - b, params, p_new)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-6),
        g_serial, g_dp)
    np.testing.assert_allclose(float(loss), float(serial_loss(params)),
                               rtol=1e-5)
