"""Minimal FSW_conv example -- TPU-native equivalent of the reference's
demo_conv.py (/root/reference/demo_conv.py): one FSW graph-convolution layer
on a random Erdos-Renyi graph with vertex and edge features.

Run: python examples/demo_conv.py  (CPU or TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fsw_gnn_tpu import FSWConv, auto_layout, from_edge_index

num_nodes = 100
vertex_feature_dim = 50
edge_feature_dim = 11
out_dim = 35
edge_prob = 0.2

rng = np.random.default_rng(0)
A = rng.random((num_nodes, num_nodes)) < edge_prob
np.fill_diagonal(A, False)
src, dst = np.nonzero(A)
edge_index = np.stack([src, dst])
num_edges = edge_index.shape[1]

node_features = jnp.asarray(
    rng.standard_normal((num_nodes, vertex_feature_dim)), jnp.float32)
edge_features = rng.standard_normal((num_edges, edge_feature_dim))

# auto_layout picks the fastest device layout for this degree
# distribution (degree-bucketed neighbor tables here)
graph = auto_layout(
    from_edge_index(edge_index, num_nodes, edge_features=edge_features))

conv = FSWConv(in_channels=vertex_feature_dim, out_channels=out_dim,
               edgefeat_dim=edge_feature_dim, mlp_layers=3,
               learnable_embedding=True)

variables = conv.init(jax.random.PRNGKey(0), node_features, graph)
out = jax.jit(conv.apply)(variables, node_features, graph)

print(f'graph: {num_nodes} nodes, {num_edges} edges '
      f'(layout: {type(graph).__name__})')
print(f'input features: {node_features.shape}, edge features: '
      f'{edge_features.shape}')
print(f'output vertex features: {out.shape}  '
      f'(finite: {bool(jnp.all(jnp.isfinite(out)))})')
