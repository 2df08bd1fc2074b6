"""Convert raw dataset files into the framework's npz schema.

Usage (on a machine with the raw data / network):
    python scripts/prepare_data.py planetoid --raw-dir /path/to/planetoid \
        --name cora --out data/cora.npz
    python scripts/prepare_data.py ogb --raw-dir /path/to/ogbn_arxiv \
        --name ogbn-arxiv --out data/ogbn-arxiv.npz

npz schema (see fsw_gnn_tpu/data/datasets.py): edge_index (2, E) int64,
features (N, d) float32, labels (N,) int64, train_mask/val_mask/test_mask
(N,) bool.

The build environment has no network egress, so this script handles files
that were provisioned externally; every loader falls back to synthetic
planted-partition graphs when the npz is absent.
"""
import argparse
import os
import pickle
import sys

import numpy as np


def planetoid(raw_dir: str, name: str, out: str):
    """Parse the Planetoid pickle format (ind.<name>.{x,y,tx,ty,allx,ally,
    graph,test.index})."""
    def load(part):
        path = os.path.join(raw_dir, f'ind.{name}.{part}')
        with open(path, 'rb') as f:
            return pickle.load(f, encoding='latin1')

    x, y, tx, ty, allx, ally = (load(p) for p in
                                ['x', 'y', 'tx', 'ty', 'allx', 'ally'])
    graph = load('graph')
    test_idx = np.loadtxt(os.path.join(raw_dir, f'ind.{name}.test.index'),
                          dtype=np.int64)

    def dense(m):
        return np.asarray(m.todense()) if hasattr(m, 'todense') else \
            np.asarray(m)

    test_sorted = np.sort(test_idx)
    allx_d, tx_d = dense(allx), dense(tx)
    N = int(test_idx.max()) + 1
    d = allx_d.shape[1]
    features = np.zeros((N, d), np.float32)
    features[:allx_d.shape[0]] = allx_d
    features[test_sorted] = tx_d[np.argsort(test_idx)]

    ally_a, ty_a = np.asarray(ally), np.asarray(ty)
    labels_1hot = np.zeros((N, ally_a.shape[1]), np.float32)
    labels_1hot[:ally_a.shape[0]] = ally_a
    labels_1hot[test_sorted] = ty_a[np.argsort(test_idx)]
    labels = labels_1hot.argmax(1).astype(np.int64)

    src, dst = [], []
    for u, nbrs in graph.items():
        for v in nbrs:
            if u < N and v < N:
                src.append(u)
                dst.append(v)
    edge_index = np.stack([np.asarray(src, np.int64),
                           np.asarray(dst, np.int64)])

    train_mask = np.zeros(N, bool)
    val_mask = np.zeros(N, bool)
    test_mask = np.zeros(N, bool)
    n_train = np.asarray(y).shape[0]
    train_mask[:n_train] = True
    val_mask[n_train:n_train + 500] = True
    test_mask[test_idx] = True

    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    np.savez_compressed(out, edge_index=edge_index, features=features,
                        labels=labels, train_mask=train_mask,
                        val_mask=val_mask, test_mask=test_mask)
    print(f'wrote {out}: N={N} E={edge_index.shape[1]} d={d} '
          f'classes={labels.max() + 1}')


def ogb(raw_dir: str, name: str, out: str):
    """Parse an extracted OGB node-prediction dataset directory (csv.gz or
    npy layout as shipped by ogb's download)."""
    import gzip

    def read_csv_gz(path, dtype):
        with gzip.open(path, 'rt') as f:
            return np.loadtxt(f, delimiter=',', dtype=dtype)

    root = raw_dir
    edge = read_csv_gz(os.path.join(root, 'raw', 'edge.csv.gz'), np.int64)
    feat = read_csv_gz(os.path.join(root, 'raw', 'node-feat.csv.gz'),
                       np.float32)
    label = read_csv_gz(os.path.join(root, 'raw', 'node-label.csv.gz'),
                        np.int64).reshape(-1)
    split_dir = os.path.join(root, 'split', 'time')
    masks = {}
    N = feat.shape[0]
    for part in ['train', 'valid', 'test']:
        idx = read_csv_gz(os.path.join(split_dir, f'{part}.csv.gz'), np.int64)
        m = np.zeros(N, bool)
        m[idx] = True
        masks[part] = m
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    np.savez_compressed(out, edge_index=edge.T, features=feat, labels=label,
                        train_mask=masks['train'], val_mask=masks['valid'],
                        test_mask=masks['test'])
    print(f'wrote {out}: N={N} E={edge.shape[0]} d={feat.shape[1]}')


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest='fmt', required=True)
    for fmt in ['planetoid', 'ogb']:
        p = sub.add_parser(fmt)
        p.add_argument('--raw-dir', required=True)
        p.add_argument('--name', required=True)
        p.add_argument('--out', required=True)
    args = ap.parse_args()
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    if args.fmt == 'planetoid':
        planetoid(args.raw_dir, args.name, args.out)
    else:
        ogb(args.raw_dir, args.name, args.out)


if __name__ == '__main__':
    main()
