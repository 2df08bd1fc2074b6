"""Minibatch (neighbor-sampled) training tests."""
import numpy as np
import pytest

from fsw_gnn_tpu.data import synthetic_planted_partition
from fsw_gnn_tpu.train import MinibatchTrainer, TrainConfig


@pytest.fixture(scope='module')
def data():
    return synthetic_planted_partition(num_nodes=400, num_classes=3,
                                       feat_dim=16, p_in=0.06, p_out=0.008,
                                       seed=1)


def test_minibatch_training_learns(data):
    tr = MinibatchTrainer(
        data, TrainConfig(hidden_dims=(16,), epochs=8, eval_every=4,
                          learning_rate=1e-2),
        batch_size=64, fanouts=(8, 8))
    out = tr.fit()
    assert np.isfinite(out['final']['train_acc'])
    assert out['final']['train_acc'] > 0.7, out


def test_minibatch_static_shapes_single_compile(data):
    """All batches must share one jit cache entry (static padded shapes)."""
    tr = MinibatchTrainer(
        data, TrainConfig(hidden_dims=(8,), epochs=1, eval_every=1),
        batch_size=32, fanouts=(4,))
    tr.train_epoch()
    # underlying jitted step was compiled exactly once
    assert tr._mb_step._cache_size() == 1
