"""Distributed (multi-chip / multi-host) FSW-GNN execution.

New TPU-native subsystem (the reference is single-process, single-GPU --
SURVEY.md section 2.3).  Design per BASELINE.json north star:

  * the graph is edge-partitioned (`partition.partition_graph`): each device
    owns a contiguous recipient range and all its in-edges; node features
    are stored in the matching padded per-shard layout (P, R_shard, d);
  * before each message-passing layer the sender matrix is assembled over
    ICI with `lax.all_gather` (the boundary feature exchange; the
    all-to-all of only remotely-referenced rows slots in behind the same
    `gather_fn` hook later);
  * gradients are `psum`-reduced (the local loss is psum'd, so per-device
    autodiff yields local contributions); the optimizer step is replicated.

Everything is `jax.shard_map` over a 1-D mesh axis 'graph', composable under
jit.  Multi-host runs initialize with `jax.distributed.initialize()`; the
mesh then spans all processes and the same code runs unchanged (XLA routes
ICI within a slice, DCN across hosts).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from .partition import GraphShards


def make_graph_mesh(num_devices: Optional[int] = None,
                    axis_name: str = 'graph') -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    return jax.make_mesh((n,), (axis_name,), devices=devices[:n])


def _shard_specs(shards: GraphShards) -> GraphShards:
    """PartitionSpecs for the stacked [P, ...] shard arrays."""
    return GraphShards(
        src=P('graph'), dst=P('graph'), weight=P('graph'),
        row_ptr=P('graph'), in_degrees=P('graph'),
        recip_start=P('graph'), recip_count=P('graph'),
        src_order=P('graph'), src_sorted=P('graph'),
        edge_feat=None if shards.edge_feat is None else P('graph'),
        tbl_idx=None if shards.tbl_idx is None else P('graph'),
        tbl_w=None if shards.tbl_w is None else P('graph'),
        a2a_send_idx=None if shards.a2a_send_idx is None else P('graph'),
        a2a_src=None if shards.a2a_src is None else P('graph'),
        a2a_tbl_idx=None if shards.a2a_tbl_idx is None else P('graph'),
        a2a_rows=shards.a2a_rows,
        mtbl_idx=None if shards.mtbl_idx is None else
        tuple(P('graph') for _ in shards.mtbl_idx),
        mtbl_w=None if shards.mtbl_w is None else
        tuple(P('graph') for _ in shards.mtbl_w),
        mtbl_rows=None if shards.mtbl_rows is None else
        tuple(P('graph') for _ in shards.mtbl_rows),
        mtbl_ef=None if shards.mtbl_ef is None else
        tuple(P('graph') for _ in shards.mtbl_ef),
        a2a_mtbl_idx=None if shards.a2a_mtbl_idx is None else
        tuple(P('graph') for _ in shards.a2a_mtbl_idx),
        mtbl_uniform=shards.mtbl_uniform,
        tbl_uniform=shards.tbl_uniform,
        num_nodes=shards.num_nodes,
        num_recipients=shards.num_recipients,
        num_shards=shards.num_shards,
        shard_num_recipients=shards.shard_num_recipients)


def _local_graph(shards: GraphShards, local: GraphShards,
                 exchange: str = 'all_gather'):
    """Per-device local Graph inside shard_map (stacked axis is 1 on-device).

    Only *static* metadata is read from `shards` -- capturing its (sharded)
    arrays in the closure would trip shard_map's no-closed-over-sharded-
    inputs rule; all array data comes from `local`, the shard_map argument.

    Returns a NeighborTable when the shards carry the bucketed layout (the
    faster compute layout), else a CSR Graph.  With exchange='all_to_all'
    the sender ids index the compact received buffer (P * a2a_rows rows)
    instead of the padded-global all-gathered matrix.
    """
    from ..graph import Graph, MultiTable, NeighborTable
    a2a = exchange == 'all_to_all'
    if a2a:
        assert shards.a2a_src is not None, (
            'shards built without with_all_to_all=True')
        n_senders = shards.num_shards * shards.a2a_rows
    else:
        n_senders = shards.num_shards * shards.shard_num_recipients
    if local.mtbl_idx is not None:
        idx_stacks = local.a2a_mtbl_idx if a2a else local.mtbl_idx
        ef_stacks = (local.mtbl_ef if local.mtbl_ef is not None
                     else (None,) * len(idx_stacks))
        unif = (shards.mtbl_uniform
                if shards.mtbl_uniform is not None
                else (False,) * len(idx_stacks))
        tables = tuple(
            NeighborTable(
                idx=idx_c[0], weight=w_c[0],
                in_degrees=jnp.sum(w_c[0], axis=1),
                edge_feat=None if ef_c is None else ef_c[0],
                num_nodes=n_senders,
                num_recipients=idx_c.shape[1],
                num_edges=idx_c.shape[1] * idx_c.shape[2],
                uniform_w=u_c)
            for idx_c, w_c, ef_c, u_c in zip(idx_stacks, local.mtbl_w,
                                             ef_stacks, unif))
        return MultiTable(
            tables=tables,
            row_ids=tuple(r[0] for r in local.mtbl_rows),
            in_degrees=local.in_degrees[0],
            num_nodes=n_senders,
            num_recipients=shards.shard_num_recipients,
            num_edges=local.src.shape[1])
    if local.tbl_idx is not None:
        idx = local.a2a_tbl_idx[0] if a2a else local.tbl_idx[0]
        return NeighborTable(
            idx=idx, weight=local.tbl_w[0],
            in_degrees=local.in_degrees[0],
            num_nodes=n_senders,
            num_recipients=shards.shard_num_recipients,
            num_edges=local.src.shape[1],
            uniform_w=shards.tbl_uniform)
    ef = None if local.edge_feat is None else local.edge_feat[0]
    src = local.a2a_src[0] if a2a else local.src[0]
    # src_order/src_sorted are only valid for the padded-global ids; the
    # CSR fast-backward gather path is disabled under a2a (table layout is
    # the production path there)
    return Graph(src=src, dst=local.dst[0], weight=local.weight[0],
                 row_ptr=local.row_ptr[0], in_degrees=local.in_degrees[0],
                 edge_feat=ef,
                 src_order=None if a2a else local.src_order[0],
                 src_sorted=None if a2a else local.src_sorted[0],
                 num_nodes=n_senders,
                 num_recipients=shards.shard_num_recipients,
                 num_edges=local.src.shape[1])


def masked_softmax_cross_entropy(logits, labels, mask):
    """(sum of CE over masked rows, mask count) for psum-mean reduction."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return -jnp.sum(ll * mask), jnp.sum(mask)


def _gather_fn(axis):
    return lambda x: jax.lax.all_gather(x, axis, tiled=True)


def _a2a_gather_fn(axis, send_idx_local):
    """Boundary exchange: send each peer only the rows it references.

    send_idx_local: (P, L) -- MY local rows destined to each peer.  The
    received buffer's slot q holds the L rows I requested from q, matching
    the precomputed compact sender ids (partition.with_all_to_all).
    """
    def gather(x_local):
        S = jnp.take(x_local, send_idx_local, axis=0)        # (P, L, d)
        recv = jax.lax.all_to_all(S, axis, split_axis=0, concat_axis=0,
                                  tiled=True)
        return recv.reshape(-1, x_local.shape[-1])           # (P*L, d)
    return gather


def _model_exchange_kwargs(exchange: str, axis: str, local_shards,
                           overlap_chunks: int) -> dict:
    """model.apply kwargs for the chosen boundary exchange.

    'all_gather' / 'all_to_all': raw features are assembled up front via
    gather_fn.  'overlap': features stay local; the model exchanges each
    layer's sender projections slice-chunk by slice-chunk inside the
    embedding so ICI transfers overlap aggregation (parallel/overlap.py;
    the sender-id layout is the all_gather padded-global one).
    """
    if exchange == 'overlap':
        return {'proj_gather_fn': _gather_fn(axis),
                'exchange_chunks': overlap_chunks}
    if exchange == 'all_to_all':
        return {'gather_fn': _a2a_gather_fn(axis,
                                            local_shards.a2a_send_idx[0])}
    return {'gather_fn': _gather_fn(axis)}


def make_distributed_train_step(model, optimizer: optax.GradientTransformation,
                                shards: GraphShards, mesh: Mesh,
                                fixed_collections: Optional[dict] = None,
                                axis: str = 'graph',
                                exchange: str = 'all_gather',
                                overlap_chunks: int = 4) -> Callable:
    """Jitted full-graph node-classification train step.

    Step signature:
        (params, opt_state, batch_stats, X_stacked, shards, labels, mask, rng)
      X_stacked -- (P, R_shard, d_in) node features in shard layout,
      labels/mask -- (P, R_shard) per-shard labels and float masks,
      batch_stats -- BatchNorm running statistics ({} when the model has
      none); rng -- dropout PRNG key (folded with the device index so each
      shard draws independent masks).
    The model runs with train=True, reproducing the reference's training
    semantics (dropout active, BatchNorm in batch-stats mode,
    /root/reference/fsw_conv.py:268-310).  params and opt_state buffers are
    donated.
    exchange: 'all_gather' (assemble all senders over ICI) or 'all_to_all'
    (send each peer only the boundary rows it references -- less traffic
    when the partition has locality).
    Returns (params, opt_state, batch_stats, loss).
    """
    fixed = dict(fixed_collections or {})
    fixed.pop('batch_stats', None)   # mutable; rides as a step argument

    def local_loss(params, bstats, X_local, local_shards, labels, mask, rng):
        # returns this device's share of the global mean loss; the numerator
        # stays local (no psum!) because transpose(psum) is psum -- a psum'd
        # scalar would come back from autodiff carrying an extra factor P
        g = _local_graph(shards, local_shards,
                         'all_gather' if exchange == 'overlap' else exchange)
        ex_kwargs = _model_exchange_kwargs(exchange, axis, local_shards,
                                           overlap_chunks)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        logits, mutated = model.apply(
            {'params': params, **bstats, **fixed}, X_local[0], g,
            train=True, rngs={'dropout': rng},
            mutable=['batch_stats'], **ex_kwargs)
        loss_sum, cnt = masked_softmax_cross_entropy(
            logits, labels[0], mask[0])
        cnt_total = jax.lax.psum(cnt, axis)   # mask: no gradient
        return loss_sum / jnp.maximum(cnt_total, 1.0), mutated

    def step_impl(params, opt_state, bstats, X, shards_in, labels, mask, rng):
        (loss_local, mutated), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, bstats, X, shards_in, labels,
                                      mask, rng)
        loss = jax.lax.psum(loss_local, axis)
        grads = jax.lax.psum(grads, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # keep running stats replica-consistent: unless the model's BatchNorm
        # carries axis_name (cross-shard batch stats), each device updates
        # from its local rows -- average them
        mutated = jax.lax.pmean(mutated, axis)
        return params, opt_state, mutated, loss

    spec = _shard_specs(shards)
    smapped = jax.shard_map(
        step_impl, mesh=mesh,
        in_specs=(P(), P(), P(), P('graph'), spec, P('graph'), P('graph'),
                  P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)
    return jax.jit(smapped, donate_argnums=(0, 1))


def make_distributed_forward(model, shards: GraphShards, mesh: Mesh,
                             variables=None, axis: str = 'graph',
                             exchange: str = 'all_gather',
                             overlap_chunks: int = 4) -> Callable:
    """Jitted sharded inference over (P, R_shard, d) node features; returns
    stacked (P, R_shard, out) recipient values.

    Call as fwd(variables, X_stacked, shards) -- variables are a shard_map
    argument (replicated spec), never closed over: closure capture of arrays
    that previously flowed through a mesh-sharded jit is rejected by
    shard_map.  If `variables` is given here, the returned callable keeps the
    two-arg signature fwd(X_stacked, shards) for convenience.
    """
    def fwd(variables, X, local_shards):
        g = _local_graph(shards, local_shards,
                         'all_gather' if exchange == 'overlap' else exchange)
        ex_kwargs = _model_exchange_kwargs(exchange, axis, local_shards,
                                           overlap_chunks)
        out = model.apply(variables, X[0], g, **ex_kwargs)
        return out[None]

    spec = _shard_specs(shards)
    smapped = jax.jit(jax.shard_map(fwd, mesh=mesh,
                                    in_specs=(P(), P('graph'), spec),
                                    out_specs=P('graph'),
                                    check_vma=False))
    if variables is None:
        return smapped
    return lambda X, local_shards: smapped(variables, X, local_shards)
