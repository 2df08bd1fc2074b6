"""Training-mode semantics: dropout must actually drop, BatchNorm must
actually update running statistics, and eval must use them.

Reproduces the reference's MLP training behavior
(/root/reference/fsw_conv.py:268-310): Linear -> BatchNorm -> activation ->
Dropout, with dropout/batch-stats active during training and frozen running
stats at eval.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsw_gnn_tpu import FSWGNN, from_edge_index
from fsw_gnn_tpu.data import synthetic_planted_partition
from fsw_gnn_tpu.train import MinibatchTrainer, TrainConfig, Trainer


@pytest.fixture(scope='module')
def small_graph():
    rng = np.random.default_rng(0)
    n = 60
    A = rng.random((n, n)) < 0.15
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    g = from_edge_index(np.stack([src, dst]), n, dtype=jnp.float32)
    X = jnp.asarray(rng.standard_normal((n, 6)), jnp.float32)
    return g, X


@pytest.fixture(scope='module')
def data():
    return synthetic_planted_partition(num_nodes=240, num_classes=3,
                                       feat_dim=12, p_in=0.09, p_out=0.015,
                                       seed=1)


def test_dropout_changes_training_outputs(small_graph):
    g, X = small_graph
    model = FSWGNN(in_channels=6, hidden_dims=(8, 4), dropout=0.5,
                   mlp_layers=2, minimize_slice_coherence=False)
    variables = model.init(jax.random.PRNGKey(0), X, g)

    out_a = model.apply(variables, X, g, train=True,
                        rngs={'dropout': jax.random.PRNGKey(1)})
    out_b = model.apply(variables, X, g, train=True,
                        rngs={'dropout': jax.random.PRNGKey(2)})
    # different dropout masks -> different training outputs
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))

    # eval mode is deterministic and needs no rng
    out_e1 = model.apply(variables, X, g)
    out_e2 = model.apply(variables, X, g)
    np.testing.assert_array_equal(np.asarray(out_e1), np.asarray(out_e2))


def test_batchnorm_stats_update_and_eval_uses_them(small_graph):
    g, X = small_graph
    model = FSWGNN(in_channels=6, hidden_dims=(8, 4), batchnorm=True,
                   mlp_layers=2, minimize_slice_coherence=False)
    variables = model.init(jax.random.PRNGKey(0), X, g)
    assert 'batch_stats' in variables

    out, mutated = model.apply(variables, X, g, train=True,
                               rngs={'dropout': jax.random.PRNGKey(0)},
                               mutable=['batch_stats'])
    before = jax.tree_util.tree_leaves(variables['batch_stats'])
    after = jax.tree_util.tree_leaves(mutated['batch_stats'])
    # running stats moved away from the (0, 1) init
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))

    # eval with updated stats differs from eval with init stats -> the
    # running statistics are actually used at eval time
    eval_init = model.apply(variables, X, g)
    other = {k: v for k, v in variables.items()
             if k not in ('params', 'batch_stats')}
    eval_updated = model.apply(
        {'params': variables['params'], **other, **mutated}, X, g)
    assert not np.allclose(np.asarray(eval_init), np.asarray(eval_updated))


@pytest.mark.slow
def test_trainer_batchnorm_updates_running_stats(data):
    tr = Trainer(data, TrainConfig(hidden_dims=(8, 8, data.num_classes)[:2],
                                   epochs=3, eval_every=10, batchnorm=True,
                                   mlp_layers=2))
    assert tr.batch_stats, 'batchnorm=True must create batch_stats'
    init_stats = jax.tree_util.tree_map(np.asarray, tr.batch_stats)
    for _ in range(3):
        loss = tr.train_epoch()
        assert np.isfinite(loss)
    moved = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, np.asarray(b)), init_stats,
        tr.batch_stats)
    assert any(jax.tree_util.tree_leaves(moved))
    # evaluation runs in eval mode (running stats; no dropout rng needed)
    metrics = tr.evaluate()
    assert np.isfinite(metrics['train_acc'])


@pytest.mark.slow
def test_trainer_dropout_regularizes(data):
    cfg = dict(hidden_dims=(16,), epochs=40, eval_every=40,
               learning_rate=2e-2, mlp_layers=2, seed=3)
    tr_plain = Trainer(data, TrainConfig(**cfg))
    tr_drop = Trainer(data, TrainConfig(**cfg, dropout=0.5))
    out_plain = tr_plain.fit()
    out_drop = tr_drop.fit()
    # dropout must actually change the optimization trajectory...
    l_plain = [r['loss'] for r in tr_plain.history]
    l_drop = [r['loss'] for r in tr_drop.history]
    assert not np.allclose(l_plain, l_drop)
    # ...while the model still learns the easy synthetic task
    assert out_drop['final']['train_acc'] > 0.8, out_drop


@pytest.mark.slow
def test_distributed_trainer_with_dropout_and_batchnorm(data):
    tr = Trainer(data, TrainConfig(hidden_dims=(8,), epochs=4, eval_every=10,
                                   dropout=0.3, batchnorm=True, mlp_layers=2,
                                   num_devices=4))
    for _ in range(4):
        assert np.isfinite(tr.train_epoch())
    assert tr.batch_stats
    metrics = tr.evaluate()
    assert np.isfinite(metrics['train_acc'])


def test_minibatch_trainer_dropout_runs(data):
    tr = MinibatchTrainer(data, TrainConfig(hidden_dims=(8,), epochs=2,
                                            eval_every=10, dropout=0.4,
                                            mlp_layers=2),
                          batch_size=32, fanouts=(4,))
    loss = tr.train_epoch()
    assert np.isfinite(loss)
