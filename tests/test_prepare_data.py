"""End-to-end test of the raw-dataset converters (scripts/prepare_data.py).

The build environment has no network egress, so the real Planetoid / OGB
raw files cannot be fetched; these tests synthesize byte-identical raw
layouts (Planetoid ind.<name>.* pickles, OGB csv.gz directory) and verify
parse -> npz schema -> datasets.load round trip, so the accuracy-parity
protocol (BASELINE.md) is runnable the moment real files are provisioned.
"""
import gzip
import importlib.util
import os
import pickle
import sys

import numpy as np
import pytest

_SPEC = importlib.util.spec_from_file_location(
    'prepare_data',
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 'scripts', 'prepare_data.py'))
prepare_data = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(prepare_data)


def _fake_planetoid(raw_dir, name='cora', n_train=8, n_val=500, n_test=10,
                    n_other=20, d=12, n_classes=3, seed=0):
    """Write a miniature Planetoid raw set with the real format's quirks:
    x/tx/allx feature matrices, y/ty/ally one-hot labels, graph adjacency
    dict, and a SHUFFLED test.index (the real files are unsorted)."""
    rng = np.random.default_rng(seed)
    n_known = n_train + n_val + n_other          # rows covered by allx
    N = n_known + n_test

    feats = rng.standard_normal((N, d)).astype(np.float32)
    labels = rng.integers(0, n_classes, N)
    onehot = np.eye(n_classes, dtype=np.float32)[labels]

    test_idx = np.arange(n_known, N)
    rng.shuffle(test_idx)

    parts = {
        'x': feats[:n_train],
        'y': onehot[:n_train],
        'tx': feats[test_idx],
        'ty': onehot[test_idx],
        'allx': feats[:n_known],
        'ally': onehot[:n_known],
        'graph': {i: [int(j) for j in
                      rng.choice(N, size=3, replace=False) if j != i]
                  for i in range(N)},
    }
    for part, val in parts.items():
        with open(os.path.join(raw_dir, f'ind.{name}.{part}'), 'wb') as f:
            pickle.dump(val, f)
    np.savetxt(os.path.join(raw_dir, f'ind.{name}.test.index'), test_idx,
               fmt='%d')
    return feats, labels, test_idx


def test_planetoid_roundtrip(tmp_path, monkeypatch):
    raw = tmp_path / 'raw'
    raw.mkdir()
    feats, labels, test_idx = _fake_planetoid(str(raw))
    out = tmp_path / 'data' / 'cora.npz'
    prepare_data.planetoid(str(raw), 'cora', str(out))

    z = np.load(out)
    N = feats.shape[0]
    assert z['features'].shape == (N, feats.shape[1])
    assert z['edge_index'].shape[0] == 2
    assert z['labels'].dtype == np.int64
    # test rows were written via the unsorted test.index permutation
    np.testing.assert_allclose(z['features'][np.sort(test_idx)],
                               feats[np.sort(test_idx)], rtol=1e-6)
    np.testing.assert_array_equal(z['labels'], labels)
    assert not (z['train_mask'] & z['test_mask']).any()
    assert z['test_mask'].sum() == len(test_idx)

    # datasets.load picks up the npz instead of the synthetic fallback
    monkeypatch.setenv('FSW_DATA_DIR', str(tmp_path / 'data'))
    from fsw_gnn_tpu.data import datasets
    ds = datasets.load('cora', allow_synthetic=False)
    assert ds.num_nodes == N
    assert ds.num_classes == labels.max() + 1


def test_ogb_roundtrip(tmp_path, monkeypatch):
    rng = np.random.default_rng(1)
    N, d, E = 30, 8, 90
    root = tmp_path / 'ogbn_arxiv'
    (root / 'raw').mkdir(parents=True)
    (root / 'split' / 'time').mkdir(parents=True)

    feats = rng.standard_normal((N, d)).astype(np.float32)
    labels = rng.integers(0, 5, N)
    edges = rng.integers(0, N, (E, 2))
    splits = np.split(rng.permutation(N), [20, 25])

    def write_gz(path, arr, fmt):
        with gzip.open(path, 'wt') as f:
            np.savetxt(f, arr, delimiter=',', fmt=fmt)

    write_gz(root / 'raw' / 'edge.csv.gz', edges, '%d')
    write_gz(root / 'raw' / 'node-feat.csv.gz', feats, '%.8f')
    write_gz(root / 'raw' / 'node-label.csv.gz', labels, '%d')
    for part, idx in zip(['train', 'valid', 'test'], splits):
        write_gz(root / 'split' / 'time' / f'{part}.csv.gz', idx, '%d')

    out = tmp_path / 'data' / 'ogbn-arxiv.npz'
    prepare_data.ogb(str(root), 'ogbn-arxiv', str(out))

    z = np.load(out)
    assert z['edge_index'].shape == (2, E)
    np.testing.assert_allclose(z['features'], feats, rtol=1e-5)
    np.testing.assert_array_equal(z['labels'], labels)
    assert z['train_mask'].sum() == 20
    assert z['val_mask'].sum() == 5
    assert z['test_mask'].sum() == 5
    masks = z['train_mask'] | z['val_mask'] | z['test_mask']
    assert masks.all()


def test_prepared_npz_trains(tmp_path, monkeypatch):
    """A converted npz flows through Trainer end to end (2 epochs)."""
    raw = tmp_path / 'raw'
    raw.mkdir()
    _fake_planetoid(str(raw), n_train=20, n_val=10, n_test=10, n_other=20)
    out = tmp_path / 'data' / 'cora.npz'
    prepare_data.planetoid(str(raw), 'cora', str(out))
    monkeypatch.setenv('FSW_DATA_DIR', str(tmp_path / 'data'))

    from fsw_gnn_tpu.data import datasets
    from fsw_gnn_tpu.train.trainer import Trainer, TrainConfig
    ds = datasets.load('cora', allow_synthetic=False)
    tr = Trainer(ds, TrainConfig(hidden_dims=(8,), epochs=2, eval_every=1))
    result = tr.fit()
    assert result['epochs_run'] >= 1
    assert np.isfinite(result['final']['test_acc'])
