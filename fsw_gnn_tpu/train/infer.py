"""Exact memory-capped full-neighbor inference (layer-wise, chunked).

Full-graph `model.apply` materializes (E, S) quadrature intermediates for
the WHOLE edge list at once -- fine at Cora/arxiv scale, impossible at the
ogbn-products north star (BASELINE config #5).  This module evaluates the
same function exactly with device memory bounded by a recipient chunk:

  * layer activations live on the host as (N, d) numpy arrays (the GNN's
    layer outputs are the only O(N) state -- the standard GraphSAGE
    layer-wise inference layout);
  * each layer processes recipients in fixed `node_chunk` slices; a
    chunk's incoming edges are a CONTIGUOUS slice of the CSR edge list
    (dst-sorted), cut host-side and padded to one static envelope, so
    every chunk of every layer reuses one compiled apply per layer;
  * chunk subgraphs keep GLOBAL sender ids (num_nodes = N) and the full
    graph's edge weights, so self-loop / gcn weighting and the degree
    encoding are bit-identical to the full-graph forward.

Peak device working set per step: the (N, d_layer) sender matrix plus
O(E_chunk * S) quadrature intermediates, vs O(E * S) for the one-shot
forward.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import Graph
from ..models.gnn import FSWGNN, gnn_layer_conv


def _layer_vars(variables: dict, name: str) -> dict:
    """The per-layer slice of every variable collection ('conv_{i}')."""
    out = {}
    for col, tree in variables.items():
        if name in tree:
            out[col] = tree[name]
    return out


def _chunk_graphs(graph: Graph, node_chunk: int):
    """Cut the (square, dst-sorted) CSR graph into per-recipient-chunk
    subgraphs sharing one static edge envelope."""
    N = graph.num_recipients
    assert graph.num_nodes == N, 'layer-wise inference needs a square graph'
    src = np.asarray(graph.src)
    dst = np.asarray(graph.dst)
    weight = np.asarray(graph.weight)
    row_ptr = np.asarray(graph.row_ptr)
    in_deg = np.asarray(graph.in_degrees)
    ef = None if graph.edge_feat is None else np.asarray(graph.edge_feat)

    n_chunks = -(-N // node_chunk)
    bounds = [(k * node_chunk, min((k + 1) * node_chunk, N))
              for k in range(n_chunks)]
    # padded edges live in the LAST row's CSR range (graph.py pads with
    # dst = num_recipients - 1), so the final chunk's slice includes them;
    # they carry weight 0 and are exact through the quadrature
    edges = [(int(row_ptr[r0]), int(row_ptr[min(r1, N)]))
             for r0, r1 in bounds]
    e_cap = max(128, -(-max(e1 - e0 for e0, e1 in edges) // 128) * 128)

    chunks = []
    for (r0, r1), (e0, e1) in zip(bounds, edges):
        n_e = e1 - e0
        pad = e_cap - n_e
        rows = node_chunk
        src_c = np.concatenate([src[e0:e1], np.zeros(pad, src.dtype)])
        dst_c = np.concatenate([dst[e0:e1] - r0,
                                np.full(pad, rows - 1, dst.dtype)])
        w_c = np.concatenate([weight[e0:e1], np.zeros(pad, weight.dtype)])
        ef_c = None if ef is None else np.concatenate(
            [ef[e0:e1], np.zeros((pad,) + ef.shape[1:], ef.dtype)])
        rp = row_ptr[r0:min(r1, N) + 1].astype(np.int64) - e0
        if r1 > N or rp.shape[0] < rows + 1:      # final short chunk
            rp = np.concatenate(
                [rp, np.full(rows + 1 - rp.shape[0], rp[-1], rp.dtype)])
        rp[-1] = e_cap                             # padding joins last row
        deg_c = np.zeros(rows, in_deg.dtype)
        deg_c[:r1 - r0] = in_deg[r0:r1]
        so = np.argsort(src_c, kind='stable')
        chunks.append(Graph(
            src=jnp.asarray(src_c, jnp.int32),
            dst=jnp.asarray(dst_c, jnp.int32),
            weight=jnp.asarray(w_c, graph.weight.dtype),
            row_ptr=jnp.asarray(rp, jnp.int32),
            in_degrees=jnp.asarray(deg_c, graph.in_degrees.dtype),
            edge_feat=None if ef_c is None else jnp.asarray(
                ef_c, graph.edge_feat.dtype),
            src_order=jnp.asarray(so, jnp.int32),
            src_sorted=jnp.asarray(src_c[so], jnp.int32),
            num_nodes=N, num_recipients=rows, num_edges=e_cap))
    return chunks, bounds, e_cap


def layerwise_predict(model: FSWGNN, variables: dict, X, graph: Graph,
                      node_chunk: int,
                      slice_chunk: Optional[int] = None) -> np.ndarray:
    """Exact logits of `model.apply(variables, X, graph)` with device
    memory capped by `node_chunk` recipients per step.

    One jit per layer (all chunks share the static envelope).  Returns a
    host (N, num_classes) array.
    """
    chunks, bounds, _ = _chunk_graphs(graph, node_chunk)
    N = graph.num_recipients
    x_cur = np.asarray(X, np.float32)

    for i in range(len(model.hidden_dims)):
        conv = gnn_layer_conv(model, i)
        vars_i = _layer_vars(variables, f'conv_{i}')
        sc = slice_chunk if slice_chunk is not None else model.slice_chunk

        @jax.jit
        def layer_fn(v, x_full, g, recip, conv=conv, sc=sc):
            return conv.apply(v, x_full, g, train=False,
                              recipient_features=recip, slice_chunk=sc,
                              aggregate=model.aggregate)

        x_dev = jnp.asarray(x_cur)
        out = None
        for g_c, (r0, r1) in zip(chunks, bounds):
            recip = np.zeros((node_chunk, x_cur.shape[1]), np.float32)
            recip[:r1 - r0] = x_cur[r0:r1]
            res = layer_fn(vars_i, x_dev, g_c, jnp.asarray(recip))
            if out is None:
                out = np.empty((N, res.shape[-1]), np.float32)
            out[r0:r1] = np.asarray(res)[:r1 - r0]
        x_cur = out
    return x_cur
