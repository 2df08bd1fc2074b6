"""Stacked FSW-GNN models.

The reference exposes only the single layers (registered into GraphGym,
fsw_conv.py:54, 451) and leaves model assembly to user configs; these are the
standard assemblies the BASELINE configs call for: an N-layer node-classifier
(Cora/Citeseer/ogbn) and a graph-level classifier with FSW readout pooling.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..conv import FSWConv, FSWReadout, leaky_relu_02
from ..graph import Graph


class FSWGNN(nn.Module):
    """N-layer FSW-GNN for node-level prediction.

    hidden_dims: feature dims after each conv layer; the last entry is the
    output dim (e.g. num_classes for node classification).
    """
    in_channels: int
    hidden_dims: Sequence[int]
    edgefeat_dim: int = 0
    embed_dim: Optional[int] = None
    minimize_slice_coherence: bool = True
    encode_vertex_degrees: bool = True
    homog_degree_encoding: bool = False
    mlp_layers: int = 1
    bias: bool = True
    dropout: float = 0.0
    batchnorm: bool = False
    bn_axis_name: Optional[str] = None  # sync BatchNorm stats across this
                                        # mesh axis (set under shard_map)
    slice_chunk: Optional[int] = None   # serialize the slice axis (memory)
    aggregate: str = 'auto'             # table aggregation backend
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vertex_features, graph: Graph, *, train: bool = False,
                 gather_fn=None, proj_gather_fn=None,
                 exchange_chunks: int = 4):
        """gather_fn: assembles the full sender matrix from the local node
        features between layers (identity on a single device; an ICI
        all_gather under edge partitioning).  SPMD-transparent: the same
        module runs single-chip and inside shard_map.
        proj_gather_fn: the comm/compute-overlapped alternative -- raw
        features stay local and each layer's sender PROJECTIONS are
        exchanged slice-chunk by slice-chunk inside the embedding, so ICI
        transfers run behind the aggregation (parallel/overlap.py).
        Requires a (Multi)Table graph layout; edge features compose (their
        projections are shard-local, only sender projections ride the
        collective)."""
        if proj_gather_fn is not None:
            assert gather_fn is None, 'pass gather_fn OR proj_gather_fn'
        gather = gather_fn if gather_fn is not None else (lambda x: x)
        x_local = vertex_features
        for i, d_out in enumerate(self.hidden_dims):
            x_full = gather(x_local)
            x_local = gnn_layer_conv(self, i)(
                x_full, graph, train=train,
                slice_chunk=self.slice_chunk,
                recipient_features=x_local,
                aggregate=self.aggregate,
                proj_gather_fn=proj_gather_fn,
                exchange_chunks=exchange_chunks)
        return x_local


def gnn_layer_conv(model: 'FSWGNN', i: int) -> FSWConv:
    """The i-th layer's FSWConv of an FSWGNN (named 'conv_{i}').

    A FREE function, not a Module method: flax wraps module methods and
    pushes `self` onto the module context stack, so a method constructing
    the FSWConv outside apply() would capture an unbound parent and trip
    flax's scope assert.  Called from FSWGNN.__call__ (where the compact
    context parents it normally) AND from exact memory-capped layer-wise
    inference (train/infer.layerwise_predict), which applies each layer
    standalone with the matching 'conv_{i}' parameter subtree -- one
    construction site so the two paths can never drift."""
    d_in = (model.in_channels if i == 0 else model.hidden_dims[i - 1])
    is_last = i == len(model.hidden_dims) - 1
    return FSWConv(
        in_channels=d_in,
        out_channels=model.hidden_dims[i],
        edgefeat_dim=model.edgefeat_dim if i == 0 else 0,
        embed_dim=model.embed_dim,
        minimize_slice_coherence=model.minimize_slice_coherence,
        encode_vertex_degrees=model.encode_vertex_degrees,
        homog_degree_encoding=model.homog_degree_encoding,
        mlp_layers=model.mlp_layers,
        bias=model.bias,
        mlp_activation_final=None if is_last else leaky_relu_02,
        batchnorm_final=model.batchnorm and not is_last,
        dropout_final=0.0 if is_last else model.dropout,
        bn_axis_name=model.bn_axis_name,
        dtype=model.dtype,
        name=f'conv_{i}')


class FSWGraphClassifier(nn.Module):
    """Conv stack + FSW readout pooling + classification head."""
    in_channels: int
    hidden_dims: Sequence[int]
    num_classes: int
    readout_dim: Optional[int] = None
    minimize_slice_coherence: bool = True
    mlp_layers: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vertex_features, graph: Graph, pool_graph: Graph, *,
                 train: bool = False):
        x = FSWGNN(in_channels=self.in_channels,
                   hidden_dims=self.hidden_dims,
                   minimize_slice_coherence=self.minimize_slice_coherence,
                   mlp_layers=self.mlp_layers,
                   dtype=self.dtype, name='gnn')(vertex_features, graph,
                                                 train=train)
        rd = self.readout_dim or self.hidden_dims[-1]
        pooled = FSWReadout(
            in_channels=self.hidden_dims[-1],
            out_channels=rd,
            concat_self=False,
            minimize_slice_coherence=self.minimize_slice_coherence,
            mlp_layers=self.mlp_layers,
            dtype=self.dtype, name='readout')(x, pool_graph, train=train)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.dtype, name='cls_head')(pooled)
