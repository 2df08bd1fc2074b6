"""Data-parallel minibatch training over a device mesh.

The second parallelism axis (besides edge partitioning in dist.py): each
device processes its own neighbor-sampled subgraph batch; gradients are
psum-averaged.  Batches are stacked host-side into [D, ...] arrays (all
subgraphs share the same static padded shapes, so one compiled step serves
every batch wave).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..graph import Graph
from .dist import masked_softmax_cross_entropy


def make_data_mesh(num_devices: Optional[int] = None,
                   axis_name: str = 'data') -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    return jax.make_mesh((n,), (axis_name,), devices=devices[:n])


def stack_batches(graphs, Xs, labels, masks):
    """Stack D per-device batches (identical static shapes) host-side.

    graphs: list of Graph with equal shapes.  Returns (graph_stacked
    [D, ...] arrays inside a Graph-shaped pytree, X [D, n, d],
    labels [D, n], masks [D, n]).
    """
    g0 = graphs[0]
    stacked = Graph(
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
        num_edges=g0.num_edges)
    return (stacked, jnp.stack(Xs), jnp.stack(labels), jnp.stack(masks))


def _graph_specs(g: Graph) -> Graph:
    return Graph(src=P('data'), dst=P('data'), weight=P('data'),
                 row_ptr=P('data'), in_degrees=P('data'),
                 edge_feat=None if g.edge_feat is None else P('data'),
                 src_order=P('data'), src_sorted=P('data'),
                 num_nodes=g.num_nodes, num_recipients=g.num_recipients,
                 num_edges=g.num_edges)


def _local_graph(meta: Graph, local: Graph) -> Graph:
    ef = None if local.edge_feat is None else local.edge_feat[0]
    return Graph(src=local.src[0], dst=local.dst[0], weight=local.weight[0],
                 row_ptr=local.row_ptr[0], in_degrees=local.in_degrees[0],
                 edge_feat=ef, src_order=local.src_order[0],
                 src_sorted=local.src_sorted[0],
                 num_nodes=meta.num_nodes,
                 num_recipients=meta.num_recipients,
                 num_edges=meta.num_edges)


def make_dp_train_step(model, optimizer: optax.GradientTransformation,
                       graph_template: Graph, mesh: Mesh,
                       fixed_collections: Optional[dict] = None,
                       axis: str = 'data') -> Callable:
    """Jitted DP train step over stacked minibatches.

    Step signature:
        (params, opt_state, batch_stats, graphs_stacked, X, labels, mask, rng)
    -> (params, opt_state, batch_stats, loss); all leading [D] axes sharded
    over `axis`.  Runs the model with train=True (dropout active, BatchNorm
    updating); batch_stats is {} when the model has none.  params/opt_state
    buffers are donated.
    """
    fixed = dict(fixed_collections or {})
    fixed.pop('batch_stats', None)

    def local_loss(params, bstats, local_g, Xb, labels, mask, rng):
        g = _local_graph(graph_template, local_g)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        logits, mutated = model.apply(
            {'params': params, **bstats, **fixed}, Xb[0], g,
            train=True, rngs={'dropout': rng}, mutable=['batch_stats'])
        s, c = masked_softmax_cross_entropy(logits, labels[0], mask[0])
        c_total = jax.lax.psum(c, axis)
        return s / jnp.maximum(c_total, 1.0), mutated

    def step_impl(params, opt_state, bstats, gs, X, labels, mask, rng):
        (loss_local, mutated), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, bstats, gs, X, labels, mask,
                                      rng)
        loss = jax.lax.psum(loss_local, axis)
        grads = jax.lax.psum(grads, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        mutated = jax.lax.pmean(mutated, axis)
        return params, opt_state, mutated, loss

    spec = _graph_specs(graph_template)
    smapped = jax.shard_map(
        step_impl, mesh=mesh,
        in_specs=(P(), P(), P(), spec, P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)
    return jax.jit(smapped, donate_argnums=(0, 1))
