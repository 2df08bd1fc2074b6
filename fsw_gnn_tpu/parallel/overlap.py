"""Comm/compute-overlapped distributed FSW aggregation.

BASELINE north star: "boundary node features exchanged via all-to-all and
overlapped with local aggregation".  Round-1 analysis showed FSW
aggregation is not edge-decomposable (the per-neighborhood rank couples all
of a recipient's edges), so overlap cannot come from splitting edges.  It
CAN come from the slice axis: the aggregation for slice block k needs only
the projection columns Xp[:, k].  This module exchanges projections
chunk-by-chunk, so the collective for chunk k+1 has no data dependency on
the aggregation of chunk k and XLA's latency-hiding scheduler can overlap
them (async collectives on real ICI; on the CPU virtual mesh this verifies
correctness and exposes the schedule).

Latency model (per layer, P shards, ICI bandwidth W, aggregation time T_c
per chunk, exchange time T_x per chunk, K chunks):
    serial:     K (T_x + T_c)
    pipelined:  T_x + K T_c + (stall if T_x > T_c per step)
              = T_x + max(K T_c, (K-1) T_x + T_c)
With K T_c >= (K-1) T_x the exchange is fully hidden: total ~ T_x + K T_c.
Exchanging projections costs N*S*4 bytes per layer (vs N*d_in*4 for raw
features); the overlap is profitable when T_x(chunk) <= T_c(chunk), i.e.
when aggregation intensity (B-step rank reduction, ~6*B flops/entry/slice)
exceeds ICI stream rate -- true for B >= ~16 on v5e ICI.

Production entry: `fsw_embed_local_overlap` (NeighborTable + MultiTable,
finalization, degree encoding, edge features, cartesian mode), reached
end-to-end via `make_distributed_train_step(..., exchange='overlap')` /
`FSWGNN(..., proj_gather_fn=...)` / `TrainConfig(exchange='overlap')`.
Edge projections are shard-local (recipient-owned edges); only sender
projections ride the collective.  `pipelined_table_embed` below is
the original raw-array prototype, kept for the shard_map-level test.
Verified against the single-device table path and the all_gather exchange
on the virtual mesh (tests/test_overlap.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..embedding import (FSWConfig, _finalize, _resolve_aggregate,
                         _sinc_diff, bucket_quadrature, lowclamp)
from ..graph import MultiTable, NeighborTable
from ..ops.segment import sort_pairs_fused


def fsw_embed_local_overlap(X_local: jax.Array,
                            graph,
                            proj: jax.Array,
                            freqs: jax.Array,
                            cfg: FSWConfig,
                            proj_gather_fn,
                            n_chunks: int = 4,
                            bias=None,
                            total_mass_scale=None,
                            aggregate: str = 'auto',
                            weights_grad: bool = True) -> jax.Array:
    """PRODUCTION comm/compute-overlapped table embedding (runs inside
    shard_map under edge partitioning).

    X_local (R_shard, d_in): this shard's node features; `graph`: the local
    NeighborTable or MultiTable whose sender ids index the padded-GLOBAL
    layout (owner * R_shard + row, the all_gather layout of
    parallel.dist._local_graph).  Instead of gathering raw features up
    front, each shard projects its OWN rows (P-fold less projection work)
    and the (N, S) projections are exchanged slice-chunk by slice-chunk:
    chunk k+1's all_gather has no data dependency on chunk k's aggregation,
    so XLA's scheduler runs the ICI transfers behind the rank/sort compute
    (latency model in the module docstring).

    proj_gather_fn: (R_shard, chunk) -> (N_padded_global, chunk), e.g.
    `lambda x: jax.lax.all_gather(x, axis, tiled=True)`.

    Edge features (cfg.d_edge > 0) compose with the chunked exchange for
    free: edges are RECIPIENT-owned under the edge partitioning, so each
    shard's `table.edge_feat` is local and its projection
    `edge_feat @ proj[:, d_in:].T` never rides the collective -- only the
    sender projections do (the reference's per-edge path,
    /root/reference/fsw_embedding.py:922-968, gathers sender + edge
    projections the same additive way).  Cartesian mode likewise rides
    the same slice-axis chunking (each chunk's quadrature is (R, chunk,
    F); frequencies are broadcast per slice exactly as in
    fsw_embed_table).  Under aggregate='auto' the shared lane-waste
    rule (embedding._resolve_aggregate with s_eff=chunk) decides per chunk
    width whether the rank kernel's 128-lane padding still pays off.
    """
    dt = X_local.dtype
    S = cfg.nSlices
    n_chunks = max(1, min(n_chunks, S))
    chunk = -(-S // n_chunks)
    n_chunks = -(-S // chunk)
    S_pad = chunk * n_chunks

    Xp_local = X_local @ proj[:, :cfg.d_in].T                  # (R_shard, S)
    Xp_local = jnp.pad(Xp_local, ((0, 0), (0, S_pad - S)))
    if cfg.cartesian_mode:
        slice_freqs = jnp.broadcast_to(freqs, (S,) + freqs.shape)  # (S, F)
    else:
        slice_freqs = freqs
    f_pad = jnp.pad(slice_freqs, ((0, S_pad - S),) +
                    ((0, 0),) * (slice_freqs.ndim - 1))
    V_edge = None
    if cfg.d_edge > 0:
        # shard-local edge projections: pad the slice axis to the chunk
        # grid (pad rows are zero vectors -> zero contribution, cut at
        # [:, :S] anyway)
        V_edge = jnp.pad(proj[:, cfg.d_in:], ((0, S_pad - S), (0, 0)))

    # issue every chunk's exchange up front (unrolled, NOT lax.map: a
    # sequential map would serialize the collectives behind the compute)
    gathered = [proj_gather_fn(Xp_local[:, k * chunk:(k + 1) * chunk])
                for k in range(n_chunks)]

    is_multi = isinstance(graph, MultiTable)
    tables = graph.tables if is_multi else (graph,)
    raws, wsums = [], []
    for t in tables:
        w = t.weight
        w_sum = jnp.sum(w, axis=-1)
        w_sum_padded = lowclamp(w_sum, cfg.total_mass_pad_thresh)
        pad_norm = (lowclamp(cfg.total_mass_pad_thresh - w_sum, 0.0)
                    / w_sum_padded)
        wn = w / w_sum_padded[:, None]
        # s_eff=chunk lets the shared lane-padding waste rule decide
        # whether the rank kernel pays off at this chunk width
        agg = _resolve_aggregate(aggregate, cfg, t.bucket_size,
                                 weights_grad, s_eff=chunk)
        cols = []
        for k in range(n_chunks):
            Pk = jnp.take(gathered[k], t.idx.reshape(-1), axis=0)
            Pk = Pk.reshape(t.idx.shape + (chunk,))            # (R, B, chunk)
            if cfg.d_edge > 0:
                assert t.edge_feat is not None, (
                    'cfg.d_edge > 0 but the graph shard has no edge '
                    'features')
                Pk = Pk + (t.edge_feat.astype(Pk.dtype)
                           @ V_edge[k * chunk:(k + 1) * chunk].T)
            cols.append(bucket_quadrature(
                Pk, wn, pad_norm, f_pad[k * chunk:(k + 1) * chunk], cfg,
                agg, weights_grad,
                uniform_w=bool(getattr(t, 'uniform_w', False))))
        raws.append(jnp.concatenate(cols, axis=1)[:, :S])
        wsums.append(w_sum)

    if not is_multi:
        return _finalize(raws[0].astype(dt), wsums[0].astype(dt), cfg,
                         bias, total_mass_scale)
    R = graph.num_recipients
    tail = ((cfg.nSlices, cfg.nFreqs) if cfg.cartesian_mode
            else (cfg.nSlices,))
    emb = jnp.zeros((R + 1,) + tail, dt)
    w_sum = jnp.zeros((R + 1,), dt)
    for ids, raw, ws in zip(graph.row_ids, raws, wsums):
        emb = emb.at[ids].set(raw.astype(dt))
        w_sum = w_sum.at[ids].set(ws.astype(dt))
    return _finalize(emb[:R], w_sum[:R], cfg, bias, total_mass_scale)


def _chunk_quadrature(Pk, wn, pad_norm, f_k):
    """XLA table-path quadrature for one slice chunk.

    Pk (R, B, Sk) gathered projections; wn (R, B); pad_norm (R,);
    f_k (Sk,).  Returns (R, Sk).
    """
    keysB = jnp.moveaxis(Pk, 1, 2)                       # (R, Sk, B)
    ps, ws = sort_pairs_fused(
        keysB, jnp.broadcast_to(wn[:, None, :], keysB.shape))
    c = jnp.cumsum(ws, axis=2) + pad_norm[:, None, None] * (ps > 0)
    sd = _sinc_diff(ws, c, f_k[None, :, None])
    return (1.0 + f_k) * jnp.sum(ps * sd, axis=2)


def pipelined_table_embed(X_local, tbl_idx, tbl_w, proj, freqs,
                          cfg: FSWConfig, axis: str, n_chunks: int = 4,
                          bias=None, total_mass_scale=None):
    """Distributed FSW table embedding with slice-chunked exchange overlap.

    Runs INSIDE shard_map over mesh axis `axis`:
      X_local (R_shard, d_in) -- this shard's node features;
      tbl_idx (R_shard, B) -- sender ids in padded-GLOBAL layout
      (owner * R_shard + row, as produced by partition_graph);
      tbl_w (R_shard, B) -- edge weights.

    Projections are computed locally (R_shard, S) -- each shard projects
    only its own rows, P times less projection work than gathering X and
    projecting everywhere -- then all-gathered chunk-by-chunk: the gather
    of chunk k+1 is independent of the aggregation of chunk k, letting XLA
    overlap ICI transfers with the rank/sort compute.
    """
    S = cfg.nSlices
    assert not cfg.cartesian_mode and cfg.d_edge == 0
    dt = X_local.dtype

    w_sum = jnp.sum(tbl_w, axis=-1)
    w_sum_padded = lowclamp(w_sum, cfg.total_mass_pad_thresh)
    pad_norm = (lowclamp(cfg.total_mass_pad_thresh - w_sum, 0.0)
                / w_sum_padded)
    wn = tbl_w / w_sum_padded[:, None]

    Xp_local = X_local @ proj[:, :cfg.d_in].T            # (R_shard, S)

    chunk = -(-S // n_chunks)
    S_pad = chunk * n_chunks
    Xp_local = jnp.pad(Xp_local, ((0, 0), (0, S_pad - S)))
    f_pad = jnp.pad(freqs, (0, S_pad - S))

    # start every chunk's all-gather up front: no data dependency on any
    # aggregation, so the scheduler is free to run them behind compute
    gathered = [
        jax.lax.all_gather(
            Xp_local[:, k * chunk:(k + 1) * chunk], axis, tiled=True)
        for k in range(n_chunks)]                        # (N_pad, chunk) each

    outs = []
    for k in range(n_chunks):
        Pk = jnp.take(gathered[k], tbl_idx.reshape(-1), axis=0)
        Pk = Pk.reshape(tbl_idx.shape + (chunk,))        # (R, B, chunk)
        outs.append(_chunk_quadrature(
            Pk, wn, pad_norm, f_pad[k * chunk:(k + 1) * chunk]))
    emb = jnp.concatenate(outs, axis=1)[:, :S]           # (R_shard, S)
    return _finalize(emb.astype(dt), w_sum, cfg, bias, total_mass_scale)


def make_overlapped_forward(shards, mesh: Mesh, cfg: FSWConfig, proj, freqs,
                            axis: str = 'graph', n_chunks: int = 4):
    """Jitted shard_map wrapper: (X_stacked [P, R_shard, d_in]) ->
    stacked embeddings [P, R_shard, d_out].  Uses the single-bucket table
    layout (build shards with partition_graph(..., layout='table'))."""
    assert shards.tbl_idx is not None, (
        "build shards with layout='table' for the overlap prototype")

    def fwd(X, idx, w):
        return pipelined_table_embed(
            X[0], idx[0], w[0], proj, freqs, cfg, axis,
            n_chunks=n_chunks)[None]

    smapped = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P('graph'), P('graph'), P('graph')),
        out_specs=P('graph'),
        check_vma=False)
    return jax.jit(lambda X: smapped(X, shards.tbl_idx, shards.tbl_w))
