"""Flax modules wrapping the functional FSW embedding core.

Parameter semantics follow the reference `FSW_embedding` nn.Module
(/root/reference/fsw_embedding.py:169-441): parameters `proj_vecs`, `freqs`,
optional `bias` and `total_mass_scale`.  Non-learnable parameters (the
reference's `requires_grad=False` nn.Parameters, py:397-409) live in the
'fsw_fixed' variable collection so optimizers never touch them, the idiomatic
flax equivalent.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .embedding import (FSWConfig, fsw_embed_graph, fsw_embed_graph_dense,
                        fsw_embed_multi_table, fsw_embed_multiset,
                        fsw_embed_table)
from .graph import MultiTable, NeighborTable
from .params import bias_shape, generate_freqs, generate_proj_vecs


def spread_freqs_at_interval(freqs: jax.Array, center: float,
                             radius: float) -> jax.Array:
    """Equispaced frequencies on [center-radius, center+radius].

    Functional analogue of `FSW_embedding.spread_freqs_at_interval`
    (fsw_embedding.py:568-582): returns the new freqs array to swap into the
    parameter pytree (params['freqs'] = spread_freqs_at_interval(...)).
    """
    assert radius >= 0
    nF = freqs.shape[0]
    if nF == 1 or radius == 0:
        return jnp.full_like(freqs, center)
    spread = 2 * (0.5 + jnp.arange(nF, dtype=freqs.dtype)) / nF - 1
    spread = spread / (1 - 1 / nF)
    return center + radius * spread


def get_mutual_coherence(proj_vecs: jax.Array) -> jax.Array:
    """Max |off-diagonal Gram entry| of the slice vectors
    (FSW_embedding.get_mutual_coherence, fsw_embedding.py:1116-1132)."""
    G = proj_vecs @ proj_vecs.T
    G = G - jnp.diag(jnp.diag(G))
    return jnp.max(jnp.abs(G))


class FSWEmbedding(nn.Module):
    """Fourier Sliced-Wasserstein embedding layer.

    `cfg` is the static configuration (see `FSWConfig`).  Call with either a
    dense multiset batch (X, W), a CSR `Graph` (graph mode), or a dense
    adjacency (graph_mode=True with W of shape (..., R, n)).
    """
    cfg: FSWConfig
    dtype: jnp.dtype = jnp.float32

    def _get(self, name, init_fn, learnable):
        if learnable:
            return self.param(name, init_fn)
        v = self.variable('fsw_fixed', name, init_fn, self.make_rng('params')
                          if self.is_initializing() else None)
        return v.value

    @nn.compact
    def __call__(self, X, W=None, *, graph=None, X_edge=None,
                 graph_mode: bool = False, w_mode: str = 'unit',
                 slice_chunk: Optional[int] = None,
                 aggregate: str = 'auto', weights_grad: bool = True,
                 proj_gather_fn=None, exchange_chunks: int = 4):
        cfg = self.cfg
        dt = self.dtype

        if cfg.out_dim == 0:
            # zero-dimensional output supported for compatibility
            # (fsw_embedding.py:833-835)
            if graph is not None:
                return jnp.zeros((graph.num_recipients, 0), dt)
            lead = (W.shape[:-1] if (graph_mode and W is not None)
                    else X.shape[:-2])
            return jnp.zeros(tuple(lead) + (0,), dt)

        proj = self._get('proj_vecs',
                         lambda key: generate_proj_vecs(key, cfg, dt),
                         cfg.learnable_slices)
        freqs = self._get('freqs',
                          lambda key: generate_freqs(key, cfg, dt),
                          cfg.learnable_freqs)
        bias = None
        if cfg.enable_bias:
            bias = self._get('bias',
                             lambda key: jnp.zeros(bias_shape(cfg), dt),
                             cfg.learnable_slices)
        tm_scale = None
        if cfg.encode_total_mass:
            tm_scale = self._get(
                'total_mass_scale',
                lambda key: jnp.asarray(cfg.total_mass_encoding_scale, dt),
                cfg.learnable_total_mass_encoding_scale)

        if graph is not None:
            if proj_gather_fn is not None:
                # distributed comm/compute overlap: X are the LOCAL shard's
                # node features; projections are exchanged slice-chunk by
                # slice-chunk inside the embedding (parallel/overlap.py)
                assert isinstance(graph, (MultiTable, NeighborTable)), (
                    'the overlap exchange needs a (Multi)Table layout')
                from .parallel.overlap import fsw_embed_local_overlap
                # the overlap's slice chunking IS slice serialization: honor
                # a tighter slice_chunk memory cap by raising n_chunks
                n_chunks = exchange_chunks
                if slice_chunk is not None:
                    n_chunks = max(n_chunks, -(-cfg.nSlices // slice_chunk))
                return fsw_embed_local_overlap(
                    X, graph, proj, freqs, cfg,
                    proj_gather_fn=proj_gather_fn,
                    n_chunks=n_chunks, bias=bias,
                    total_mass_scale=tm_scale, aggregate=aggregate,
                    weights_grad=weights_grad)
            if isinstance(graph, MultiTable):
                return fsw_embed_multi_table(X, graph, proj, freqs, cfg,
                                             bias=bias,
                                             total_mass_scale=tm_scale,
                                             slice_chunk=slice_chunk,
                                             aggregate=aggregate,
                                             weights_grad=weights_grad)
            if isinstance(graph, NeighborTable):
                return fsw_embed_table(X, graph, proj, freqs, cfg, bias=bias,
                                       total_mass_scale=tm_scale,
                                       slice_chunk=slice_chunk,
                                       aggregate=aggregate,
                                       weights_grad=weights_grad)
            return fsw_embed_graph(X, graph, proj, freqs, cfg, bias=bias,
                                   total_mass_scale=tm_scale,
                                   slice_chunk=slice_chunk)
        if graph_mode:
            return fsw_embed_graph_dense(X, W, proj, freqs, cfg,
                                         X_edge=X_edge, bias=bias,
                                         total_mass_scale=tm_scale,
                                         slice_chunk=slice_chunk)
        return fsw_embed_multiset(X, W, proj, freqs, cfg, bias=bias,
                                  total_mass_scale=tm_scale, w_mode=w_mode,
                                  slice_chunk=slice_chunk,
                                  aggregate=aggregate,
                                  weights_grad=weights_grad)
