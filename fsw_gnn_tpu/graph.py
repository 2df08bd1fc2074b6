"""Static CSR-segment graph container and host-side builders.

This replaces the reference's sparse-COO adjacency handling
(`FSW_conv.edge_index_to_adj`, /root/reference/fsw_conv.py:384-447, and the
coalescence machinery in fsw_embedding.py:2266-2774) with a TPU-native static
layout: a flat edge list sorted by destination, padded to a fixed size, with
CSR row pointers.  All shape-determining work (coalescing duplicates,
self-loops, sorting, padding) runs once on the host in numpy; everything on
device is static-shape gathers/scans.

Conventions (matching the reference):
  * `edge_index` has shape (2, E) with edge_index[0] = source (sender) and
    edge_index[1] = destination (recipient); adj[i, j] = weight of edge j->i
    (fsw_conv.py:384-398).
  * Padded edges carry weight 0 and therefore contribute exactly 0 to every
    segmented reduction in the FSW pipeline.  They point at segment
    `num_recipients - 1` (kept sorted) and sender 0.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Graph:
    """Edge-partitionable CSR-segment graph.

    Attributes
    ----------
    src : (E,) int32 -- sender node index per edge.
    dst : (E,) int32 -- recipient node index per edge, sorted non-decreasing.
    weight : (E,) float -- edge weight (0 for padding).
    row_ptr : (num_recipients + 1,) int32 -- CSR pointers into the edge list.
    edge_feat : (E, d_edge) float or None -- optional edge features.
    in_degrees : (num_recipients,) float -- sum of incoming *unit/self-loop*
        weights (before gcn normalization), matching fsw_conv.py:400-401.
    num_nodes / num_recipients : static ints (pytree aux data).
    num_edges : static int -- count of real (non-padding) edges.
    """
    src: jax.Array
    dst: jax.Array
    weight: jax.Array
    row_ptr: jax.Array
    in_degrees: jax.Array
    edge_feat: Optional[jax.Array] = None
    # host-precomputed sender ordering: src_order sorts edges by sender,
    # src_sorted = src[src_order].  Lets the sender-feature gather use a
    # segment-sum backward instead of an XLA scatter (ops.segment.rows_gather)
    src_order: Optional[jax.Array] = None
    src_sorted: Optional[jax.Array] = None
    num_nodes: int = struct.field(pytree_node=False, default=0)
    num_recipients: int = struct.field(pytree_node=False, default=0)
    num_edges: int = struct.field(pytree_node=False, default=0)

    @property
    def padded_num_edges(self) -> int:
        return self.src.shape[0]

    @property
    def d_edge(self) -> int:
        return 0 if self.edge_feat is None else self.edge_feat.shape[-1]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def from_edge_index(edge_index,
                    num_nodes: int,
                    edge_features=None,
                    *,
                    edge_weight=None,
                    self_loop_weight: float = 0.0,
                    edge_weighting: str = 'unit',
                    num_recipients: Optional[int] = None,
                    pad_to: Optional[int] = None,
                    pad_multiple: int = 128,
                    dtype=jnp.float32,
                    as_numpy: bool = False) -> Graph:
    """Build a padded CSR `Graph` from a (2, E) edge index on the host.

    Semantics mirror `FSW_conv.edge_index_to_adj` (fsw_conv.py:384-447):
    unit edge weights (or `edge_weight` if given), optional self-loops of
    weight `self_loop_weight`, duplicate-edge coalescing by summation,
    in-degree computation, and optional symmetric 'gcn' normalization
    D^{-1/2} A D^{-1/2} using in-degrees (fsw_conv.py:406-409).

    as_numpy=True keeps every array a host numpy array (no device
    transfer) -- the serving path builds request graphs host-side and
    ships them as two packed buffers instead of one transfer per leaf.
    """
    assert edge_weighting in ('unit', 'gcn')
    edge_index = np.asarray(edge_index)
    assert edge_index.ndim == 2 and edge_index.shape[0] == 2
    num_recipients = num_nodes if num_recipients is None else num_recipients
    src = edge_index[0].astype(np.int64)
    dst = edge_index[1].astype(np.int64)
    E = src.shape[0]
    w = (np.ones(E, np.float64) if edge_weight is None
         else np.asarray(edge_weight, np.float64))
    d_edge = 0
    ef = None
    if edge_features is not None:
        ef = np.asarray(edge_features, np.float64)
        if ef.ndim == 1:
            ef = ef[:, None]
        assert ef.shape[0] == E
        d_edge = ef.shape[1]

    if self_loop_weight > 0:
        loop = np.arange(num_nodes, dtype=np.int64)
        src = np.concatenate([src, loop])
        dst = np.concatenate([dst, loop])
        w = np.concatenate([w, np.full(num_nodes, self_loop_weight)])
        if ef is not None:
            ef = np.concatenate([ef, np.zeros((num_nodes, d_edge))], axis=0)

    # coalesce duplicates by (dst, src): sum weights; edge features of
    # duplicates are summed as well (torch coalesce() semantics,
    # fsw_conv.py:397-398, 443-444)
    key = dst * num_nodes + src
    order = np.argsort(key, kind='stable')
    key, src, dst, w = key[order], src[order], dst[order], w[order]
    if ef is not None:
        ef = ef[order]
    uniq, first_idx, inverse = np.unique(key, return_index=True,
                                         return_inverse=True)
    if uniq.shape[0] != key.shape[0]:
        w = np.bincount(inverse, weights=w, minlength=uniq.shape[0])
        if ef is not None:
            ef = np.stack([np.bincount(inverse, weights=ef[:, j],
                                       minlength=uniq.shape[0])
                           for j in range(d_edge)], axis=1)
        src, dst = src[first_idx], dst[first_idx]

    E_real = src.shape[0]
    in_deg = np.bincount(dst, weights=w, minlength=num_recipients)

    if edge_weighting == 'gcn':
        inv_sqrt = np.zeros(max(num_recipients, num_nodes))
        deg_all = np.bincount(dst, weights=w,
                              minlength=max(num_recipients, num_nodes))
        with np.errstate(divide='ignore'):
            inv_sqrt = 1.0 / np.sqrt(deg_all)
        inv_sqrt[~np.isfinite(inv_sqrt)] = 0.0
        w = w * inv_sqrt[dst] * inv_sqrt[src]

    E_pad = pad_to if pad_to is not None else max(
        _round_up(max(E_real, 1), pad_multiple), pad_multiple)
    assert E_pad >= E_real, f'pad_to={E_pad} < real edge count {E_real}'
    pad = E_pad - E_real
    pad_seg = max(num_recipients - 1, 0)
    src = np.concatenate([src, np.zeros(pad, np.int64)])
    dst = np.concatenate([dst, np.full(pad, pad_seg, np.int64)])
    w = np.concatenate([w, np.zeros(pad)])
    if ef is not None:
        ef = np.concatenate([ef, np.zeros((pad, d_edge))], axis=0)

    row_ptr = np.zeros(num_recipients + 1, np.int64)
    np.cumsum(np.bincount(dst, minlength=num_recipients), out=row_ptr[1:])

    src_order = np.argsort(src, kind='stable')

    if as_numpy:
        npdt = np.dtype(dtype)
        conv_i = lambda a: np.asarray(a, np.int32)      # noqa: E731
        conv_f = lambda a: np.asarray(a, npdt)          # noqa: E731
    else:
        conv_i = lambda a: jnp.asarray(a, jnp.int32)    # noqa: E731
        conv_f = lambda a: jnp.asarray(a, dtype)        # noqa: E731
    return Graph(
        src=conv_i(src),
        dst=conv_i(dst),
        weight=conv_f(w),
        row_ptr=conv_i(row_ptr),
        in_degrees=conv_f(in_deg),
        edge_feat=None if ef is None else conv_f(ef),
        src_order=conv_i(src_order),
        src_sorted=conv_i(src[src_order]),
        num_nodes=int(num_nodes),
        num_recipients=int(num_recipients),
        num_edges=int(E_real),
    )


@struct.dataclass
class NeighborTable:
    """Dense padded neighbor table: row r holds recipient r's in-edges.

    TPU-friendly alternative layout to the CSR edge list: per-neighborhood
    sort/cumsum become fixed-width (B-wide) batched ops -- ~log^2(B) bitonic
    passes instead of log^2(E) for a global segmented sort.  Padding entries
    have weight 0 (contribute exactly 0 through the FSW quadrature) and
    sender index 0.
    """
    idx: jax.Array       # (R, B) int32 sender ids (0 for padding)
    weight: jax.Array    # (R, B) float (0 for padding)
    in_degrees: jax.Array  # (R,)
    edge_feat: Optional[jax.Array] = None   # (R, B, d_edge)
    num_nodes: int = struct.field(pytree_node=False, default=0)
    num_recipients: int = struct.field(pytree_node=False, default=0)
    num_edges: int = struct.field(pytree_node=False, default=0)
    # True iff every REAL (nonzero-weight) entry of a row carries the same
    # positive weight (unit adjacency, weight-1 self-loops): the rank
    # kernel then computes the sin/cos(pi f w) chain once per ROW instead
    # of per entry (uniform_w fast path, ops/fsw_rank_pallas._trig).
    # Detected host-side at table build; False is always safe.  STALENESS:
    # this is static pytree metadata -- replacing `weight` afterwards
    # (dataclasses.replace) with non-row-constant values while uniform_w
    # stays True makes the kernel silently substitute each row's max
    # weight; re-detect (graph._detect_uniform_w) or set uniform_w=False
    # whenever weights are replaced outside the gradient path (the
    # weights_grad=True training case is already gated off this flag in
    # embedding.bucket_quadrature).
    uniform_w: bool = struct.field(pytree_node=False, default=False)

    @property
    def bucket_size(self) -> int:
        return self.idx.shape[1]

    @property
    def d_edge(self) -> int:
        return 0 if self.edge_feat is None else self.edge_feat.shape[-1]


def _detect_uniform_w(wt: np.ndarray) -> bool:
    """True iff every nonzero entry of each row equals that row's MAX
    weight (all positive row-constant weights; padding is exactly 0).
    Conservative: negative or mixed weights detect False, which only
    forfeits the fast path -- never correctness.  The kernel recovers the
    row constant as max_j wn[:, j], which is why positivity is part of
    the predicate."""
    if wt.size == 0:
        return True
    row_max = wt.max(axis=1, keepdims=True)
    return bool(np.all((wt == 0) | (wt == row_max)) and row_max.min() >= 0)


def to_neighbor_table(graph: Graph, bucket_size: Optional[int] = None,
                      pad_multiple: int = 8) -> NeighborTable:
    """Convert a CSR `Graph` to a dense `NeighborTable` (host-side).

    bucket_size defaults to max in-degree rounded up to `pad_multiple`.
    Requires bucket_size >= max degree (no edge dropping)."""
    row_ptr = np.asarray(graph.row_ptr, np.int64)
    src = np.asarray(graph.src)
    w = np.asarray(graph.weight)
    ef = None if graph.edge_feat is None else np.asarray(graph.edge_feat)
    R = graph.num_recipients
    # exclude zero-weight padding edges at the tail of the last segment
    E_real = graph.num_edges
    lo = np.minimum(row_ptr[:-1], E_real)
    hi = np.minimum(row_ptr[1:], E_real)
    deg = hi - lo
    max_deg = int(deg.max()) if R > 0 else 0
    B = bucket_size or max(_round_up(max(max_deg, 1), pad_multiple),
                           pad_multiple)
    assert B >= max_deg, f'bucket_size {B} < max degree {max_deg}'

    idx = np.zeros((R, B), np.int32)
    wt = np.zeros((R, B), w.dtype)
    eft = (np.zeros((R, B, ef.shape[-1]), ef.dtype)
           if ef is not None else None)
    e = np.arange(E_real)
    dst_e = np.asarray(graph.dst)[:E_real].astype(np.int64)
    pos_e = e - lo[dst_e]
    idx[dst_e, pos_e] = src[:E_real]
    wt[dst_e, pos_e] = w[:E_real]
    if eft is not None:
        eft[dst_e, pos_e] = ef[:E_real]
    return NeighborTable(
        idx=jnp.asarray(idx), weight=jnp.asarray(wt),
        in_degrees=graph.in_degrees,
        edge_feat=None if eft is None else jnp.asarray(eft),
        num_nodes=graph.num_nodes, num_recipients=R, num_edges=E_real,
        uniform_w=_detect_uniform_w(wt))


@struct.dataclass
class MultiTable:
    """Degree-bucketed collection of NeighborTables.

    Recipients are grouped by degree class (bucket sizes 8, 16, 32, ...):
    a row with degree d lands in the smallest class with B >= d, so most
    neighborhoods pay a log^2(B_small) bitonic instead of log^2(max_degree).
    `row_ids[c]` maps class-c table rows back to global recipient ids
    (padded rows point at the sentinel `num_recipients`, dropped at
    scatter).
    """
    tables: tuple
    row_ids: tuple
    in_degrees: jax.Array
    num_nodes: int = struct.field(pytree_node=False, default=0)
    num_recipients: int = struct.field(pytree_node=False, default=0)
    num_edges: int = struct.field(pytree_node=False, default=0)

    @property
    def d_edge(self) -> int:
        return self.tables[0].d_edge if self.tables else 0


def degree_classes(max_deg: int, min_bucket: int = 8) -> list:
    """Degree-class widths 8, 16, 24, 32, 48, 64, 96, ... (powers of two
    plus the 1.5x midpoints, all sublane multiples) covering max_deg.

    The midpoint classes cut the per-row padding waste from <2x to <1.5x,
    which the O(B)-per-entry rank kernel converts directly into time
    (measured at the headline shape: 16% of table entries were
    17..24-degree rows padded to 32; total entries 186k -> 160k)."""
    B = max(min_bucket, 8)
    classes = []
    while True:
        classes.append(B)
        if B >= max_deg:
            break
        mid = B + B // 2
        if mid % 8 == 0 and mid >= min_bucket:
            classes.append(mid)
            if mid >= max_deg:
                break
        B *= 2
    return classes


def to_multi_table(graph: Graph, min_bucket: int = 8,
                   row_pad_multiple: int = 8,
                   classes=None, class_rows=None,
                   as_numpy: bool = False) -> MultiTable:
    """Convert a CSR `Graph` into a degree-bucketed `MultiTable`
    (host-side).

    `classes` / `class_rows` force the class structure and per-class padded
    row counts (used by the distributed partitioner so every shard's tables
    stack into identical shapes).  as_numpy=True keeps host numpy arrays
    (no device transfer; see from_edge_index)."""
    row_ptr = np.asarray(graph.row_ptr, np.int64)
    src = np.asarray(graph.src)
    w = np.asarray(graph.weight)
    ef = None if graph.edge_feat is None else np.asarray(graph.edge_feat)
    R = graph.num_recipients
    E_real = graph.num_edges
    lo = np.minimum(row_ptr[:-1], E_real)
    hi = np.minimum(row_ptr[1:], E_real)
    deg = hi - lo

    if classes is None:
        classes = degree_classes(max(int(deg.max()) if R else 1, 1),
                                 min_bucket)
    else:
        classes = list(classes)
        assert (int(deg.max()) if R else 0) <= classes[-1]

    cls_of = np.zeros(R, np.int64)
    for ci, Bc in enumerate(classes):
        lo_deg = 0 if ci == 0 else classes[ci - 1]
        cls_of[(deg > lo_deg) & (deg <= Bc)] = ci
    cls_of[deg == 0] = 0

    # vectorized per-edge scatter into each class table
    dst_e = np.asarray(graph.dst)[:E_real].astype(np.int64)
    pos_e = np.arange(E_real) - lo[dst_e]
    tables, row_ids = [], []
    for ci, Bc in enumerate(classes):
        rows = np.nonzero(cls_of == ci)[0]
        if class_rows is not None:
            Rc = int(class_rows[ci])
            assert Rc >= len(rows)
        else:
            Rc = max(_round_up(max(len(rows), 1), row_pad_multiple),
                     row_pad_multiple)
        idx = np.zeros((Rc, Bc), np.int32)
        wt = np.zeros((Rc, Bc), w.dtype)
        eft = (np.zeros((Rc, Bc, ef.shape[-1]), ef.dtype)
               if ef is not None else None)
        ids = np.full(Rc, R, np.int64)  # sentinel for padding rows
        ids[:len(rows)] = rows
        rank = np.full(R, -1, np.int64)
        rank[rows] = np.arange(len(rows))
        sel = cls_of[dst_e] == ci
        lr = rank[dst_e[sel]]
        idx[lr, pos_e[sel]] = src[:E_real][sel]
        wt[lr, pos_e[sel]] = w[:E_real][sel]
        if eft is not None:
            eft[lr, pos_e[sel]] = ef[:E_real][sel]
        conv = (lambda a: a) if as_numpy else jnp.asarray
        tables.append(NeighborTable(
            idx=conv(idx), weight=conv(wt),
            in_degrees=conv(np.zeros(Rc, w.dtype)),
            edge_feat=None if eft is None else conv(eft),
            num_nodes=graph.num_nodes, num_recipients=Rc,
            num_edges=int(deg[rows].sum()),
            uniform_w=_detect_uniform_w(wt)))
        row_ids.append(ids.astype(np.int32) if as_numpy
                       else jnp.asarray(ids, jnp.int32))

    return MultiTable(tables=tuple(tables), row_ids=tuple(row_ids),
                      in_degrees=graph.in_degrees,
                      num_nodes=graph.num_nodes, num_recipients=R,
                      num_edges=E_real)


def auto_layout(graph: Graph, max_bucket: int = 4096):
    """Choose the fastest layout for this graph (host-side heuristic).

    Measured on v5e (round 1, with the sort-based-unsort VJPs):
      * bucketed NeighborTable ~2.3x faster than CSR (log^2(B) bitonic
        passes instead of log^2(E));
      * degree-bucketed MultiTable another ~1.8x on top (most rows sort at
        their own degree class's width).
    Degree classes bound padding to <2x per row, so MultiTable is the
    default; CSR remains for pathological max degrees (> max_bucket) and as
    the distributed-partitioning source layout.
    """
    row_ptr = np.asarray(graph.row_ptr)
    E_real = max(graph.num_edges, 1)
    lo = np.minimum(row_ptr[:-1], E_real)
    hi = np.minimum(row_ptr[1:], E_real)
    max_deg = int((hi - lo).max()) if graph.num_recipients > 0 else 0
    if max_deg > max_bucket:
        return graph
    mt = to_multi_table(graph)
    if len(mt.tables) == 1:
        return to_neighbor_table(graph)
    return mt


def stack_graphs(graphs) -> Graph:
    """Stack equally-shaped CSR `Graph`s into one batched Graph pytree
    (leading [G] axis on every array leaf).

    The TPU-native equivalent of the reference's batched sparse-W mode
    (fsw_embedding.py:598-757): consume with
    `embedding.fsw_embed_graph_batched` (vmapped CSR pipeline) or index a
    single graph out with `jax.tree_util.tree_map(lambda a: a[i], ...)`.
    All graphs must share padded shapes (use `pad_to=` in
    `from_edge_index`) and static metadata.
    """
    g0 = graphs[0]
    for g in graphs[1:]:
        assert g.src.shape == g0.src.shape, 'pad all graphs to equal shapes'
        assert g.num_nodes == g0.num_nodes
        assert g.num_recipients == g0.num_recipients
        assert (g.edge_feat is None) == (g0.edge_feat is None)
    return Graph(
        src=jnp.stack([g.src for g in graphs]),
        dst=jnp.stack([g.dst for g in graphs]),
        weight=jnp.stack([g.weight for g in graphs]),
        row_ptr=jnp.stack([g.row_ptr for g in graphs]),
        in_degrees=jnp.stack([g.in_degrees for g in graphs]),
        edge_feat=(None if g0.edge_feat is None else
                   jnp.stack([g.edge_feat for g in graphs])),
        src_order=jnp.stack([g.src_order for g in graphs]),
        src_sorted=jnp.stack([g.src_sorted for g in graphs]),
        num_nodes=g0.num_nodes, num_recipients=g0.num_recipients,
        num_edges=max(g.num_edges for g in graphs))


def readout_graph(graph_index, num_vertices: int,
                  batch_size: Optional[int] = None,
                  *, pad_multiple: int = 128, dtype=jnp.float32) -> Graph:
    """Bipartite all-vertices-to-graph-node graph for global pooling.

    Mirrors `FSW_readout.forward`'s adjacency construction
    (fsw_conv.py:453-504): an edge of weight 1 from every vertex to the
    global node of its graph; requires `graph_index` sorted non-decreasing.
    """
    gi = np.asarray(graph_index, np.int64)
    assert gi.shape == (num_vertices,)
    assert np.all(np.diff(gi) >= 0), 'graph_index must be monotone non-decreasing'
    batch_size = int(gi.max()) + 1 if batch_size is None else int(batch_size)
    src = np.arange(num_vertices, dtype=np.int64)
    edge_index = np.stack([src, gi])
    return from_edge_index(edge_index, num_nodes=num_vertices,
                           num_recipients=batch_size,
                           pad_multiple=pad_multiple, dtype=dtype)
