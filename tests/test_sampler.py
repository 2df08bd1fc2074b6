"""Tests for the neighbor sampler (numpy and native C++ backends) and the
synthetic datasets."""
import numpy as np
import pytest

from fsw_gnn_tpu.data import sampler as sampler_mod
from fsw_gnn_tpu.data.datasets import load, synthetic_planted_partition
from fsw_gnn_tpu.data.sampler import CSCGraph, NeighborSampler, _sample_one_hop


def _random_graph(rng, n, p=0.1):
    A = rng.random((n, n)) < p
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    return np.stack([src, dst]).astype(np.int64)


def test_csc_construction():
    rng = np.random.default_rng(0)
    ei = _random_graph(rng, 50)
    csc = CSCGraph.from_edge_index(ei, 50)
    for v in [0, 7, 49]:
        lo, hi = csc.row_ptr[v], csc.row_ptr[v + 1]
        got = sorted(csc.col_idx[lo:hi].tolist())
        want = sorted(ei[0][ei[1] == v].tolist())
        assert got == want


@pytest.mark.parametrize('use_native', [False, True])
def test_one_hop_sampling(use_native, monkeypatch):
    if use_native and sampler_mod._load_native() is None:
        pytest.skip('native library not built')
    if not use_native:
        monkeypatch.setattr(sampler_mod, '_LIB', None)
        monkeypatch.setattr(sampler_mod, '_LIB_TRIED', True)
    rng = np.random.default_rng(1)
    ei = _random_graph(rng, 40, p=0.3)
    csc = CSCGraph.from_edge_index(ei, 40)
    seeds = np.array([0, 5, 10], np.int64)
    fanout = 4
    src, dst = _sample_one_hop(csc, seeds, fanout, rng)
    assert len(src) == len(dst)
    for s, d in zip(src, dst):
        assert d in seeds
        # sampled edge must exist
        lo, hi = csc.row_ptr[d], csc.row_ptr[d + 1]
        assert s in csc.col_idx[lo:hi]
    # per-seed cap respected + no duplicate neighbors per seed
    for s in seeds:
        neigh = src[dst == s]
        deg = csc.row_ptr[s + 1] - csc.row_ptr[s]
        assert len(neigh) == min(fanout, deg)
        assert len(set(neigh.tolist())) == len(neigh)


def test_neighbor_sampler_batch():
    rng = np.random.default_rng(2)
    n = 80
    ei = _random_graph(rng, n, p=0.15)
    labels = rng.integers(0, 5, n)
    ns = NeighborSampler(ei, n, fanouts=(5, 5), seed=0)
    seeds = np.array([3, 17, 42, 60])
    batch = ns.sample(seeds, labels=labels, max_nodes=512)
    assert batch.num_seeds == 4
    assert batch.node_ids.shape == (512,)
    np.testing.assert_array_equal(batch.node_ids[:4], seeds)
    np.testing.assert_array_equal(batch.seed_labels, labels[seeds])
    # all local edges reference in-range nodes
    assert batch.edge_index_local.max() < batch.num_real_nodes
    # every sampled edge exists in the original graph (in global ids)
    gs = batch.node_ids[batch.edge_index_local[0]]
    gd = batch.node_ids[batch.edge_index_local[1]]
    edge_set = set(map(tuple, ei.T.tolist()))
    for e in zip(gs.tolist(), gd.tolist()):
        assert e in edge_set


def test_synthetic_dataset():
    data = synthetic_planted_partition(num_nodes=200, num_classes=3)
    assert data.num_nodes == 200
    assert data.num_classes == 3
    assert data.train_mask.sum() > 0
    assert not (data.train_mask & data.val_mask).any()
    assert not (data.train_mask & data.test_mask).any()


def test_load_fallback():
    data = load('cora')
    assert data.num_nodes == 2708
    assert data.num_classes == 7


def test_native_csr_builder():
    """fsw_build_csr (C++) vs the numpy coalescing in from_edge_index."""
    import ctypes
    lib = sampler_mod._load_native()
    if lib is None:
        pytest.skip('native library not built')
    rng = np.random.default_rng(7)
    n, E = 30, 200
    src = rng.integers(0, n, E).astype(np.int64)
    dst = rng.integers(0, n, E).astype(np.int64)
    w = rng.random(E)

    lib.fsw_build_csr.restype = ctypes.c_longlong
    out_src = np.zeros(E, np.int64)
    out_dst = np.zeros(E, np.int64)
    out_w = np.zeros(E, np.float64)
    row_ptr = np.zeros(n + 1, np.int64)
    ll = ctypes.POINTER(ctypes.c_longlong)
    dd = ctypes.POINTER(ctypes.c_double)
    n_uniq = lib.fsw_build_csr(
        src.ctypes.data_as(ll), dst.ctypes.data_as(ll),
        w.ctypes.data_as(dd), E, n, n,
        out_src.ctypes.data_as(ll), out_dst.ctypes.data_as(ll),
        out_w.ctypes.data_as(dd), row_ptr.ctypes.data_as(ll))

    # numpy reference coalescing
    import jax.numpy as jnp
    from fsw_gnn_tpu import from_edge_index
    g = from_edge_index(np.stack([src, dst]), n, edge_weight=w,
                        dtype=jnp.float64)
    Er = g.num_edges
    assert n_uniq == Er
    np.testing.assert_array_equal(out_src[:Er], np.asarray(g.src)[:Er])
    np.testing.assert_array_equal(out_dst[:Er], np.asarray(g.dst)[:Er])
    np.testing.assert_allclose(out_w[:Er], np.asarray(g.weight)[:Er],
                               rtol=1e-12)
    # from_edge_index's final row_ptr entry counts its zero-weight padding
    # edges; the native builder reports the unique-edge count
    np.testing.assert_array_equal(row_ptr[:-1], np.asarray(g.row_ptr)[:-1])
    assert row_ptr[-1] == Er
