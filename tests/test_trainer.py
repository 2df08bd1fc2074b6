"""End-to-end training tests: the FSW-GNN must actually learn the synthetic
planted-partition task, checkpoints must round-trip, and the distributed
trainer must work on the virtual mesh."""
import os

import numpy as np
import pytest

from fsw_gnn_tpu.data import synthetic_planted_partition
from fsw_gnn_tpu.train import TrainConfig, Trainer


@pytest.fixture(scope='module')
def data():
    return synthetic_planted_partition(num_nodes=300, num_classes=3,
                                       feat_dim=16, p_in=0.08, p_out=0.01,
                                       seed=0)


def test_training_learns(data):
    tr = Trainer(data, TrainConfig(hidden_dims=(16,), epochs=60,
                                   eval_every=10, learning_rate=2e-2))
    out = tr.fit()
    assert out['final']['train_acc'] > 0.9, out
    assert out['final']['test_acc'] > 0.75, out


def test_checkpoint_roundtrip(data, tmp_path):
    ckpt = str(tmp_path / 'ckpt')
    tr = Trainer(data, TrainConfig(hidden_dims=(8,), epochs=5, eval_every=5,
                                   checkpoint_dir=ckpt, checkpoint_every=5))
    tr.fit()
    tr.save_checkpoint()
    logits_before = tr.predict()

    tr2 = Trainer(data, TrainConfig(hidden_dims=(8,), epochs=5, eval_every=5,
                                    checkpoint_dir=ckpt, seed=123))
    step = tr2.restore_checkpoint()
    assert step == tr.step_count
    logits_after = tr2.predict()
    np.testing.assert_allclose(logits_before, logits_after, rtol=1e-6)


def test_distributed_trainer(data):
    tr = Trainer(data, TrainConfig(hidden_dims=(16,), epochs=30,
                                   eval_every=10, learning_rate=2e-2,
                                   num_devices=8))
    out = tr.fit()
    assert out['final']['train_acc'] > 0.8, out


def test_single_vs_distributed_losses_match(data):
    cfg = dict(hidden_dims=(8,), epochs=3, eval_every=10, seed=7)
    tr1 = Trainer(data, TrainConfig(**cfg))
    tr8 = Trainer(data, TrainConfig(**cfg, num_devices=8))
    l1 = [tr1.train_epoch() for _ in range(3)]
    l8 = [tr8.train_epoch() for _ in range(3)]
    np.testing.assert_allclose(l1, l8, rtol=5e-3)
