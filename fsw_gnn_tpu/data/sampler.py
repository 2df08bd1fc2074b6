"""Host-side neighbor sampler for minibatch training (GraphSAGE-style).

New component per BASELINE.json config #4 (ogbn-arxiv with neighbor-sampled
minibatches); the reference has no sampler.  The sampler runs on the host
CPU and emits fixed-shape subgraph batches (static shapes for XLA): for a
seed-node batch it samples up to `fanout` in-neighbors per hop and builds a
padded CSR `Graph` whose recipients are [seeds, hop-1 frontier, ...] with
local ids, plus the feature/label gathers.

A C++ implementation with the same binary interface lives in
fsw_gnn_tpu/native (built via `make -C fsw_gnn_tpu/native`); this module
transparently uses it when the shared library is available and falls back to
pure numpy.
"""
from __future__ import annotations

import ctypes
import dataclasses
import os
from typing import List, Optional, Sequence

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        '..', 'native', 'libfswgraph.so')
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.fsw_sample_neighbors.restype = ctypes.c_longlong
        lib.fsw_sample_neighbors.argtypes = [
            ctypes.POINTER(ctypes.c_longlong),  # row_ptr (CSC by dst)
            ctypes.POINTER(ctypes.c_longlong),  # col_idx (senders)
            ctypes.POINTER(ctypes.c_longlong),  # seeds
            ctypes.c_longlong,                  # num_seeds
            ctypes.c_longlong,                  # fanout
            ctypes.c_ulonglong,                 # rng seed
            ctypes.POINTER(ctypes.c_longlong),  # out_src (num_seeds*fanout)
            ctypes.POINTER(ctypes.c_longlong),  # out_dst
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


@dataclasses.dataclass
class CSCGraph:
    """In-edge adjacency (CSC by destination) for host-side sampling."""
    row_ptr: np.ndarray   # (N+1,) int64, in-edges of node i at [ptr[i], ptr[i+1])
    col_idx: np.ndarray   # (E,) int64 sender of each in-edge
    num_nodes: int

    @staticmethod
    def from_edge_index(edge_index, num_nodes: int) -> 'CSCGraph':
        src = np.asarray(edge_index[0], np.int64)
        dst = np.asarray(edge_index[1], np.int64)
        order = np.argsort(dst, kind='stable')
        src, dst = src[order], dst[order]
        counts = np.bincount(dst, minlength=num_nodes)
        row_ptr = np.zeros(num_nodes + 1, np.int64)
        np.cumsum(counts, out=row_ptr[1:])
        return CSCGraph(row_ptr=row_ptr, col_idx=src, num_nodes=num_nodes)


def _sample_one_hop(csc: CSCGraph, seeds: np.ndarray, fanout: int,
                    rng: np.random.Generator):
    """Sample up to `fanout` in-neighbors per seed.  Returns (src, dst) local
    edge lists in *global* node ids; missing neighbors are dropped (not
    padded) -- padding happens at batch assembly."""
    lib = _load_native()
    if lib is not None:
        n_seeds = len(seeds)
        out_src = np.full(n_seeds * fanout, -1, np.int64)
        out_dst = np.full(n_seeds * fanout, -1, np.int64)
        seeds64 = np.ascontiguousarray(seeds, np.int64)
        n = lib.fsw_sample_neighbors(
            csc.row_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            csc.col_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            seeds64.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            n_seeds, fanout, int(rng.integers(0, 2**63 - 1)),
            out_src.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            out_dst.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)))
        return out_src[:n], out_dst[:n]
    srcs: List[np.ndarray] = []
    dsts: List[np.ndarray] = []
    for s in seeds:
        lo, hi = csc.row_ptr[s], csc.row_ptr[s + 1]
        neigh = csc.col_idx[lo:hi]
        if len(neigh) > fanout:
            neigh = rng.choice(neigh, size=fanout, replace=False)
        srcs.append(neigh)
        dsts.append(np.full(len(neigh), s, np.int64))
    if not srcs:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(srcs), np.concatenate(dsts)


@dataclasses.dataclass
class SampledBatch:
    """Fixed-shape minibatch subgraph.

    node_ids: (max_nodes,) global ids of the subgraph nodes (padded with 0);
    the first `num_seeds` entries are the seed nodes.
    graph: edge arrays in local ids suitable for `graph.from_edge_index`.
    """
    node_ids: np.ndarray
    num_real_nodes: int
    num_seeds: int
    edge_index_local: np.ndarray   # (2, E_real) local ids
    seed_labels: np.ndarray        # (num_seeds,)


class NeighborSampler:
    """Layered uniform neighbor sampler producing fixed-shape batches."""

    def __init__(self, edge_index, num_nodes: int,
                 fanouts: Sequence[int] = (10, 10), seed: int = 0):
        self.csc = CSCGraph.from_edge_index(edge_index, num_nodes)
        self.fanouts = tuple(fanouts)
        self.rng = np.random.default_rng(seed)

    def sample(self, seeds: np.ndarray, labels: Optional[np.ndarray] = None,
               max_nodes: Optional[int] = None) -> SampledBatch:
        seeds = np.asarray(seeds, np.int64)
        assert len(np.unique(seeds)) == len(seeds), 'seeds must be unique'
        frontier = seeds
        all_src, all_dst = [], []
        for fanout in self.fanouts:
            s, d = _sample_one_hop(self.csc, np.unique(frontier), fanout,
                                   self.rng)
            all_src.append(s)
            all_dst.append(d)
            frontier = s
        src = np.concatenate(all_src) if all_src else np.zeros(0, np.int64)
        dst = np.concatenate(all_dst) if all_dst else np.zeros(0, np.int64)

        # local id space: seeds first, then the rest in appearance order
        uniq = np.concatenate([seeds, src, dst])
        node_ids, inv = np.unique(uniq, return_inverse=True)
        # reorder so seeds come first
        seed_pos = inv[:len(seeds)]
        rest = np.setdiff1d(np.arange(len(node_ids)), seed_pos)
        order = np.concatenate([seed_pos, rest])
        remap = np.empty(len(node_ids), np.int64)
        remap[order] = np.arange(len(node_ids))
        node_ids = node_ids[order]
        src_l = remap[inv[len(seeds):len(seeds) + len(src)]]
        dst_l = remap[inv[len(seeds) + len(src):]]

        n_real = len(node_ids)
        if max_nodes is not None:
            assert n_real <= max_nodes, (n_real, max_nodes)
            node_ids = np.concatenate(
                [node_ids, np.zeros(max_nodes - n_real, np.int64)])

        return SampledBatch(
            node_ids=node_ids, num_real_nodes=n_real, num_seeds=len(seeds),
            edge_index_local=np.stack([src_l, dst_l]),
            seed_labels=(labels[seeds] if labels is not None
                         else np.zeros(len(seeds), np.int64)))
