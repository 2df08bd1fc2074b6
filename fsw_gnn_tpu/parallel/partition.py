"""Edge partitioning of CSR graphs across a device mesh.

The reference has no distributed runtime (SURVEY.md section 2.3); this is the
new TPU-native component mandated by BASELINE.json: the graph is
edge-partitioned across chips/hosts, with each shard owning a contiguous
range of recipient (destination) nodes and *all* of their incoming edges.
Because the global edge list is sorted by destination, every shard's edges
are one contiguous slab -- the partition is a host-side slicing, no
regrouping.

Balancing: recipients are assigned greedily so each shard carries ~E/P
edges.  All shards are padded to identical (E_shard, R_shard) so they stack
into [P, ...] arrays consumable by shard_map.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..graph import Graph, _detect_uniform_w


@struct.dataclass
class GraphShards:
    """P stacked, identically-shaped local graphs (leading axis = shard).

    Node features live in the same padded per-shard layout as recipient
    ownership: shard p stores rows [recip_start[p], recip_start[p]+count)
    of the global feature matrix in a (R_shard, d) buffer (zero-padded), so
    the all-gathered sender matrix is the uniform (P*R_shard, d) stack.
    `src` is therefore in *padded-global* ids: owner*R_shard + local_row.
    dst is *local* (shard-relative) recipient ids.
    """
    src: jax.Array          # (P, E_shard) int32, padded-global sender ids
    dst: jax.Array          # (P, E_shard) int32, local recipient ids
    weight: jax.Array       # (P, E_shard)
    row_ptr: jax.Array      # (P, R_shard + 1) int32
    in_degrees: jax.Array   # (P, R_shard)
    recip_start: jax.Array  # (P,) int32 global id of local recipient 0
    recip_count: jax.Array  # (P,) int32 number of real recipients in shard
    src_order: jax.Array = None    # (P, E_shard) sender-sorting permutation
    src_sorted: jax.Array = None   # (P, E_shard) src[src_order]
    edge_feat: Optional[jax.Array] = None   # (P, E_shard, d_edge)
    # optional bucketed layout (layout='table'/'auto'): per-shard dense
    # neighbor tables -- the faster single-chip compute layout, see
    # graph.NeighborTable
    tbl_idx: Optional[jax.Array] = None     # (P, R_shard, B) int32
    tbl_w: Optional[jax.Array] = None       # (P, R_shard, B)
    # optional all-to-all boundary exchange (computed when
    # with_all_to_all=True): instead of all-gathering every node's features,
    # each device sends only the rows its peers actually reference.
    # a2a_send_idx[q, p, :] = local rows of shard q needed by shard p;
    # a2a_src / a2a_tbl_idx are the edge/table sender ids remapped into the
    # received compact buffer (P * a2a_rows rows).
    a2a_send_idx: Optional[jax.Array] = None   # (P, P, L) int32
    a2a_src: Optional[jax.Array] = None        # (P, E_shard) int32
    a2a_tbl_idx: Optional[jax.Array] = None    # (P, R_shard, B) int32
    a2a_rows: int = struct.field(pytree_node=False, default=0)
    # degree-bucketed per-shard MultiTables (preferred compute layout):
    # tuples over degree classes of (P, R_c, B_c) stacks + row-id maps
    mtbl_idx: Optional[tuple] = None
    mtbl_w: Optional[tuple] = None
    mtbl_rows: Optional[tuple] = None          # (P, R_c) local recipient ids
    mtbl_ef: Optional[tuple] = None            # (P, R_c, B_c, d_edge)
    a2a_mtbl_idx: Optional[tuple] = None
    # static row-constant-weight flags (graph._detect_uniform_w, AND over
    # shards): per degree class / for the single-bucket table layout
    mtbl_uniform: Optional[tuple] = struct.field(pytree_node=False,
                                                 default=None)
    tbl_uniform: bool = struct.field(pytree_node=False, default=False)
    num_nodes: int = struct.field(pytree_node=False, default=0)
    num_recipients: int = struct.field(pytree_node=False, default=0)
    num_shards: int = struct.field(pytree_node=False, default=1)
    shard_num_recipients: int = struct.field(pytree_node=False, default=0)

    @property
    def shard_num_edges(self) -> int:
        return self.src.shape[1]

    def local_graph(self, p_src, p_dst, p_weight, p_row_ptr, p_in_degrees,
                    p_edge_feat=None) -> Graph:
        """Assemble a local `Graph` from per-device slices (inside shard_map).

        num_nodes is the padded-global sender count (P * R_shard), matching
        the all-gathered feature matrix that `src` indexes into.
        """
        return Graph(src=p_src, dst=p_dst, weight=p_weight,
                     row_ptr=p_row_ptr, in_degrees=p_in_degrees,
                     edge_feat=p_edge_feat,
                     num_nodes=self.num_shards * self.shard_num_recipients,
                     num_recipients=self.shard_num_recipients,
                     num_edges=self.shard_num_edges)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def partition_graph(graph: Graph, num_shards: int,
                    pad_multiple: int = 128,
                    layout: str = 'auto',
                    with_all_to_all: bool = True) -> GraphShards:
    """Split a global CSR `Graph` into `num_shards` recipient-contiguous
    shards balanced by edge count (host-side).

    Requires a square graph (recipients == senders == nodes), the
    message-passing case; sender ids are remapped into the padded per-shard
    node layout (see GraphShards docstring)."""
    assert graph.num_recipients == graph.num_nodes, (
        'edge partitioning requires a square graph (num_recipients == '
        'num_nodes); distribute readout separately')
    row_ptr = np.asarray(graph.row_ptr, np.int64)
    src = np.asarray(graph.src)
    dst = np.asarray(graph.dst)
    w = np.asarray(graph.weight)
    indeg = np.asarray(graph.in_degrees)
    ef = None if graph.edge_feat is None else np.asarray(graph.edge_feat)
    R = graph.num_recipients
    E_real = graph.num_edges

    # greedy contiguous split of recipients targeting E_real/P edges/shard
    target = E_real / num_shards
    bounds = [0]
    for p in range(1, num_shards):
        # first recipient whose cumulative edge count exceeds p*target
        b = int(np.searchsorted(row_ptr[:R + 1], p * target, side='left'))
        b = max(bounds[-1], min(b, R))
        bounds.append(b)
    bounds.append(R)

    R_shard = max(_round_up(max(bounds[p + 1] - bounds[p]
                                for p in range(num_shards)), 8), 8)
    E_shard = max(_round_up(max(int(row_ptr[bounds[p + 1]] -
                                    row_ptr[bounds[p]])
                                for p in range(num_shards)), pad_multiple),
                  pad_multiple)

    d_edge = graph.d_edge
    P = num_shards
    o_src = np.zeros((P, E_shard), np.int32)
    o_dst = np.full((P, E_shard), R_shard - 1, np.int32)
    o_w = np.zeros((P, E_shard), w.dtype)
    o_rp = np.zeros((P, R_shard + 1), np.int32)
    o_deg = np.zeros((P, R_shard), indeg.dtype)
    o_ef = np.zeros((P, E_shard, d_edge), ef.dtype) if ef is not None else None
    starts = np.zeros(P, np.int32)
    counts = np.zeros(P, np.int32)

    # map each global node id to its padded-global id owner*R_shard + local
    bounds_arr = np.asarray(bounds[1:-1], np.int64)
    owner_of = np.searchsorted(bounds_arr, np.arange(R), side='right')
    padded_id = (owner_of * R_shard +
                 (np.arange(R) - np.asarray(bounds)[owner_of])).astype(np.int64)

    for p in range(P):
        r0, r1 = bounds[p], bounds[p + 1]
        e0, e1 = int(row_ptr[r0]), int(row_ptr[r1])
        ne, nr = e1 - e0, r1 - r0
        starts[p] = r0
        counts[p] = nr
        o_src[p, :ne] = padded_id[src[e0:e1]]
        o_dst[p, :ne] = dst[e0:e1] - r0
        o_w[p, :ne] = w[e0:e1]
        if ef is not None:
            o_ef[p, :ne] = ef[e0:e1]
        rp = row_ptr[r0:r1 + 1] - e0
        o_rp[p, :nr + 1] = rp
        o_rp[p, nr + 1:] = ne
        o_deg[p, :nr] = indeg[r0:r1]

    o_order = np.argsort(o_src, axis=1, kind='stable').astype(np.int32)
    o_src_sorted = np.take_along_axis(o_src, o_order, axis=1)

    # optional single-bucket table layout per shard (edge features stay
    # CSR-only; 'auto' prefers the degree-bucketed MultiTable below)
    tbl_idx = tbl_w = None
    if layout == 'table' and ef is None:
        max_deg = 0
        for p in range(P):
            ne = int(o_rp[p, R_shard])
            deg = np.diff(np.minimum(o_rp[p], ne))
            if deg.size:
                max_deg = max(max_deg, int(deg.max()))
        B = 2
        while B < max(max_deg, 2):
            B *= 2
        ok = (layout == 'table' or
              (B <= 512 and B * R_shard <= 8 * max(E_shard, 1)))
        if ok:
            tbl_idx = np.zeros((P, R_shard, B), np.int32)
            tbl_w = np.zeros((P, R_shard, B), w.dtype)
            for p in range(P):
                ne = int(o_rp[p, R_shard])
                lo = np.minimum(o_rp[p, :-1], ne)
                e = np.arange(ne)
                d_e = o_dst[p, :ne].astype(np.int64)
                pos_e = e - lo[d_e]
                tbl_idx[p, d_e, pos_e] = o_src[p, :ne]
                tbl_w[p, d_e, pos_e] = o_w[p, :ne]

    # degree-bucketed per-shard MultiTables with a GLOBAL class structure so
    # the per-class stacks share shapes across shards (edge features ride
    # along as (R_c, B_c, d_edge) table entries)
    mtbl_idx = mtbl_w = mtbl_rows = mtbl_ef = mtbl_uniform = None
    if layout in ('auto', 'multi'):
        from ..graph import to_multi_table as _tmt
        local_graphs = []
        for p in range(P):
            ne = int(o_rp[p, R_shard])
            local_graphs.append(Graph(
                src=o_src[p], dst=o_dst[p], weight=o_w[p],
                row_ptr=o_rp[p], in_degrees=o_deg[p],
                edge_feat=None if o_ef is None else o_ef[p],
                num_nodes=P * R_shard, num_recipients=R_shard,
                num_edges=ne))
        # global classes from the max degree over all shards
        gmax = 1
        for p in range(P):
            ne = int(o_rp[p, R_shard])
            d = np.diff(np.minimum(o_rp[p], ne))
            if d.size:
                gmax = max(gmax, int(d.max()))
        from ..graph import degree_classes
        classes = degree_classes(max(int(gmax), 1))
        # per-class max row count over shards
        cls_counts = np.zeros((P, len(classes)), np.int64)
        for p in range(P):
            ne = int(o_rp[p, R_shard])
            d = np.diff(np.minimum(o_rp[p], ne))
            for ci, Bc in enumerate(classes):
                lo_deg = 0 if ci == 0 else classes[ci - 1]
                cnt = int(np.sum((d > lo_deg) & (d <= Bc)))
                if ci == 0:
                    cnt += int(np.sum(d == 0))
                cls_counts[p, ci] = cnt
        class_rows = [max(_round_up(int(cls_counts[:, ci].max()), 8), 8)
                      for ci in range(len(classes))]
        mts = [_tmt(lg, classes=classes, class_rows=class_rows)
               for lg in local_graphs]
        mtbl_uniform = tuple(
            all(mt.tables[ci].uniform_w for mt in mts)
            for ci in range(len(classes)))
        mtbl_idx = tuple(
            jnp.asarray(np.stack([np.asarray(mt.tables[ci].idx)
                                  for mt in mts]))
            for ci in range(len(classes)))
        mtbl_w = tuple(
            jnp.asarray(np.stack([np.asarray(mt.tables[ci].weight)
                                  for mt in mts]))
            for ci in range(len(classes)))
        mtbl_rows = tuple(
            jnp.asarray(np.stack([np.asarray(mt.row_ids[ci])
                                  for mt in mts]))
            for ci in range(len(classes)))
        if o_ef is not None:
            mtbl_ef = tuple(
                jnp.asarray(np.stack([np.asarray(mt.tables[ci].edge_feat)
                                      for mt in mts]))
                for ci in range(len(classes)))

    # all-to-all exchange metadata: which of q's local rows does p need?
    a2a_send = a2a_src = a2a_tbl = a2a_mtbl = None
    L = 0
    if with_all_to_all:
        need = [[None] * P for _ in range(P)]
        for p in range(P):
            ne = int(o_rp[p, R_shard])
            uniq = np.unique(o_src[p, :ne]) if ne else np.zeros(0, np.int64)
            owners = uniq // R_shard
            for q in range(P):
                rows_q = uniq[owners == q] - q * R_shard
                need[p][q] = rows_q.astype(np.int64)
                L = max(L, len(rows_q))
        L = max(_round_up(max(L, 1), 8), 8)
        a2a_send = np.zeros((P, P, L), np.int32)
        # remap padded-global sender id -> compact id q*L + pos
        remap = {}
        for p in range(P):
            m = np.full(P * R_shard, 0, np.int32)
            for q in range(P):
                rows_q = need[p][q]
                a2a_send[q, p, :len(rows_q)] = rows_q
                m[q * R_shard + rows_q] = (q * L +
                                           np.arange(len(rows_q), dtype=np.int32))
            remap[p] = m
        a2a_src = np.zeros_like(o_src)
        for p in range(P):
            a2a_src[p] = remap[p][o_src[p]]
        if tbl_idx is not None:
            a2a_tbl = np.zeros_like(tbl_idx)
            for p in range(P):
                a2a_tbl[p] = remap[p][tbl_idx[p]]
        if mtbl_idx is not None:
            a2a_mtbl = tuple(
                jnp.asarray(np.stack([remap[p][np.asarray(cls_stack[p])]
                                      for p in range(P)]))
                for cls_stack in mtbl_idx)

    return GraphShards(
        src=jnp.asarray(o_src), dst=jnp.asarray(o_dst),
        weight=jnp.asarray(o_w), row_ptr=jnp.asarray(o_rp),
        in_degrees=jnp.asarray(o_deg),
        recip_start=jnp.asarray(starts), recip_count=jnp.asarray(counts),
        src_order=jnp.asarray(o_order), src_sorted=jnp.asarray(o_src_sorted),
        edge_feat=None if o_ef is None else jnp.asarray(o_ef),
        tbl_idx=None if tbl_idx is None else jnp.asarray(tbl_idx),
        tbl_w=None if tbl_w is None else jnp.asarray(tbl_w),
        a2a_send_idx=None if a2a_send is None else jnp.asarray(a2a_send),
        a2a_src=None if a2a_src is None else jnp.asarray(a2a_src),
        a2a_tbl_idx=None if a2a_tbl is None else jnp.asarray(a2a_tbl),
        a2a_rows=int(L),
        mtbl_idx=mtbl_idx, mtbl_w=mtbl_w, mtbl_rows=mtbl_rows,
        mtbl_ef=mtbl_ef, a2a_mtbl_idx=a2a_mtbl,
        mtbl_uniform=mtbl_uniform,
        tbl_uniform=(tbl_w is not None
                     and _detect_uniform_w(tbl_w.reshape(-1,
                                                         tbl_w.shape[-1]))),
        num_nodes=graph.num_nodes, num_recipients=R, num_shards=P,
        shard_num_recipients=R_shard)


def shard_node_features(X, shards: GraphShards) -> jax.Array:
    """Lay out global node features (N, d) into the padded per-shard stack
    (P, R_shard, d) matching `shards`' ownership (host-side)."""
    X = np.asarray(X)
    P, R_shard = shards.num_shards, shards.shard_num_recipients
    out = np.zeros((P, R_shard) + X.shape[1:], X.dtype)
    starts = np.asarray(shards.recip_start)
    counts = np.asarray(shards.recip_count)
    for p in range(P):
        out[p, :counts[p]] = X[starts[p]:starts[p] + counts[p]]
    return jnp.asarray(out)


def unshard_recipient_values(stacked, shards: GraphShards) -> np.ndarray:
    """Inverse of the per-shard layout: (P, R_shard, ...) -> (R, ...)."""
    stacked = np.asarray(jax.device_get(stacked))
    counts = np.asarray(shards.recip_count)
    parts = [stacked[p, :counts[p]] for p in range(shards.num_shards)]
    return np.concatenate(parts, axis=0)


def shard_recipient_labels(y, mask, shards: GraphShards):
    """Lay out labels (R,) and a float mask (R,) into (P, R_shard) stacks."""
    y = np.asarray(y)
    mask = np.asarray(mask, np.float32)
    P, R_shard = shards.num_shards, shards.shard_num_recipients
    labels = np.zeros((P, R_shard), np.int32)
    m = np.zeros((P, R_shard), np.float32)
    starts = np.asarray(shards.recip_start)
    counts = np.asarray(shards.recip_count)
    for p in range(P):
        c = counts[p]
        labels[p, :c] = y[starts[p]:starts[p] + c]
        m[p, :c] = mask[starts[p]:starts[p] + c]
    return jnp.asarray(labels), jnp.asarray(m)
