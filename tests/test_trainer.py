"""End-to-end training tests: the FSW-GNN must actually learn the synthetic
planted-partition task, checkpoints must round-trip, and the distributed
trainer must work on the virtual mesh."""
import os

import jax

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


def test_auto_resume_continues_preempted_run(data, tmp_path):
    """fit() restores the latest checkpoint and trains only the remaining
    epochs; the resumed run reaches the same state as an uninterrupted one
    (same per-epoch rng derivation: one optimizer step per epoch)."""
    ckpt = str(tmp_path / 'ckpt_resume')
    cfg = dict(hidden_dims=(8,), epochs=6, eval_every=3,
               checkpoint_dir=ckpt, checkpoint_every=3, dropout=0.0)

    # "preempted" run: killed after epoch 3's checkpoint
    tr1 = Trainer(data, TrainConfig(**{**cfg, 'epochs': 3}))
    tr1.fit()
    assert tr1.step_count == 3

    # resume into the full 6-epoch schedule
    tr2 = Trainer(data, TrainConfig(**cfg))
    out = tr2.fit()
    assert out['epochs_run'] == 3          # only epochs 4..6 ran
    assert tr2.step_count == 6
    assert tr2.history[0]['epoch'] == 4

    # a third fit() call is a no-op (already complete)
    tr3 = Trainer(data, TrainConfig(**cfg))
    out3 = tr3.fit()
    assert out3['epochs_run'] == 0


def test_metrics_jsonl_export(data, tmp_path):
    import json
    path = str(tmp_path / 'metrics.jsonl')
    tr = Trainer(data, TrainConfig(hidden_dims=(8,), epochs=4, eval_every=2,
                                   metrics_path=path))
    tr.fit()
    with open(path) as f:
        lines = [json.loads(l) for l in f]
    epochs = [l['epoch'] for l in lines if 'epoch' in l]
    assert epochs == [1, 2, 3, 4]
    assert all('loss' in l for l in lines if 'epoch' in l)
    assert 'val_acc' in lines[1]           # eval_every=2
    assert 'final' in lines[-1]


@pytest.mark.slow
def test_reused_checkpoint_dir_overwrites_stale_same_step(data, tmp_path):
    """A previous run's entry with the same step number must be replaced,
    not skipped: save_checkpoint's already-on-disk shortcut is tracked
    per-process, never inferred from latest_step()."""
    ckpt = str(tmp_path / 'ckpt_reuse')
    cfg = dict(hidden_dims=(8,), epochs=2, eval_every=10,
               checkpoint_dir=ckpt, dropout=0.0)

    tr_old = Trainer(data, TrainConfig(**cfg, seed=0))
    tr_old.train_epoch(); tr_old.train_epoch()
    tr_old.step_count = 2
    tr_old.save_checkpoint()

    # a NEW run reusing the directory, different seed -> different params
    tr_new = Trainer(data, TrainConfig(**cfg, seed=99))
    tr_new.train_epoch(); tr_new.train_epoch()
    tr_new.step_count = 2
    tr_new.save_checkpoint()          # must overwrite the stale step-2 entry

    tr_chk = Trainer(data, TrainConfig(**cfg, seed=99))
    tr_chk.restore_checkpoint()
    got = jax.tree_util.tree_leaves(tr_chk.params)[0]
    want = jax.tree_util.tree_leaves(tr_new.params)[0]
    stale = jax.tree_util.tree_leaves(tr_old.params)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert not np.array_equal(np.asarray(got), np.asarray(stale))


@pytest.mark.parametrize('num_devices', [None, 8])
@pytest.mark.slow
def test_restore_rebuilds_train_step_with_restored_fixed(data, tmp_path,
                                                         num_devices):
    """The compiled train step closes over the fixed collections
    (projections/freqs).  Restoring a checkpoint whose fixed differ from
    this process's init (different seed) must rebuild the step, so
    continued TRAINING -- not just predict() -- runs on the restored
    embedding geometry."""
    ckpt = str(tmp_path / f'ckpt_fixed_{num_devices}')
    cfg = dict(hidden_dims=(8,), epochs=4, eval_every=10, dropout=0.0,
               checkpoint_dir=ckpt, num_devices=num_devices)

    tr1 = Trainer(data, TrainConfig(**cfg, seed=0))
    l1a = tr1.train_epoch()
    tr1.step_count = 1
    tr1.save_checkpoint()
    l1b = tr1.train_epoch()           # uninterrupted epoch 2

    tr2 = Trainer(data, TrainConfig(**cfg, seed=123))  # different fixed
    tr2.restore_checkpoint()
    l2b = tr2.train_epoch()           # resumed epoch 2
    np.testing.assert_allclose(l2b, l1b, rtol=1e-5)


@pytest.mark.slow
def test_overlap_exchange_trainer_matches_all_gather(data):
    cfg = dict(hidden_dims=(8,), epochs=3, eval_every=10, seed=7,
               num_devices=8)
    tr_ag = Trainer(data, TrainConfig(**cfg, exchange='all_gather'))
    tr_ov = Trainer(data, TrainConfig(**cfg, exchange='overlap',
                                      overlap_chunks=3))
    la = [tr_ag.train_epoch() for _ in range(3)]
    lo = [tr_ov.train_epoch() for _ in range(3)]
    np.testing.assert_allclose(lo, la, rtol=1e-5)
    np.testing.assert_allclose(tr_ov.predict(), tr_ag.predict(),
                               rtol=1e-4, atol=1e-5)
