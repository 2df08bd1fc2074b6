"""FSW graph convolution and readout layers (flax).

Reimplements `FSW_conv` and `FSW_readout` (/root/reference/fsw_conv.py:56-517)
on the static CSR `Graph` layout.  Adjacency construction (self-loops, gcn
weighting, coalescing) happens host-side in `graph.from_edge_index`; the
module consumes a prebuilt `Graph`, keeping the jitted path static-shape.

Defaults mirror the reference `init_helper` (fsw_conv.py:209-327):
  * embed_dim = 2*max(in, out) unless (mlp_layers==0 and not concat_self),
    which forces embed_dim = out_channels (py:231-234);
  * mlp_hidden_dim = max(in, out) (py:228-229);
  * the embedding has a bias only when no MLP follows (py:237);
  * degree encoding method 'homog' iff homog_degree_encoding (py:240);
  * the embedding always uses minimize_slice_coherence=True and
    freqs_init='spread' (py:321);
  * MLP layer order: Linear -> BatchNorm -> activation -> Dropout
    (py:268-310), LeakyReLU(0.2) activations by default;
  * mlp_layers==0 with concat_self uses a coherence-minimized random
    dimensionality-reduction projection instead of an MLP (py:255-266).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .embedding import FSWConfig
from .graph import Graph
from .modules import FSWEmbedding
from .ops.coherence import minimize_mutual_coherence
from .registry import register_layer, register_pooling


def leaky_relu_02(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def _torch_linear_init(scale_from_fan_in: bool = True):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) -- the torch nn.Linear default
    (kaiming_uniform(a=sqrt(5)) reduces to exactly this)."""
    def init(key, shape, dtype):
        fan_in = shape[0]
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _torch_bias_init(fan_in: int):
    """torch nn.Linear bias init: U(-1/sqrt(in_features), 1/sqrt(in_features)).

    The bound comes from the layer's *fan-in*, not the bias's own length --
    deriving it from the bias shape would give 1/sqrt(out_features) whenever
    in_dim != out_dim (init-distribution parity deviation vs torch)."""
    def init(key, shape, dtype):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


_MLP_INITS = {
    None: _torch_linear_init(),
    'xavier_uniform': nn.initializers.xavier_uniform(),
    'xavier_normal': nn.initializers.xavier_normal(),
    'kaiming_uniform': nn.initializers.kaiming_uniform(),
    'kaiming_normal': nn.initializers.kaiming_normal(),
}


class _MLPHead(nn.Module):
    """The post-aggregation head: MLP / dim-reduct / identity + batchnorm."""
    in_dim: int
    out_channels: int
    mlp_layers: int
    mlp_hidden_dim: int
    bias: bool
    mlp_init: Optional[str]
    activation_final: Optional[Callable]
    activation_hidden: Optional[Callable]
    batchnorm_final: bool
    batchnorm_hidden: bool
    dropout_final: float
    dropout_hidden: float
    concat_self: bool
    learnable_dim_reduct: bool
    bn_axis_name: Optional[str] = None   # sync BatchNorm stats over this
                                         # mesh axis inside shard_map
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.mlp_layers == 0:
            if self.concat_self:
                def dr_init(key):
                    w = jax.random.normal(
                        key, (self.out_channels, self.in_dim), self.dtype)
                    return minimize_mutual_coherence(w).astype(self.dtype)
                if self.learnable_dim_reduct:
                    dim_reduct = self.param('dim_reduct', dr_init)
                else:
                    dim_reduct = self.variable(
                        'fsw_fixed', 'dim_reduct', dr_init,
                        self.make_rng('params') if self.is_initializing()
                        else None).value
                x = x @ dim_reduct.T
            if self.batchnorm_final:
                x = nn.BatchNorm(use_running_average=not train,
                                 axis_name=self.bn_axis_name,
                                 dtype=self.dtype, param_dtype=self.dtype,
                                 name='bn_final')(x)
            return x

        in_d = self.in_dim
        for i in range(self.mlp_layers):
            is_final = i == self.mlp_layers - 1
            out_d = self.out_channels if is_final else self.mlp_hidden_dim
            x = nn.Dense(out_d, use_bias=self.bias,
                         kernel_init=_MLP_INITS[self.mlp_init],
                         param_dtype=self.dtype,
                         bias_init=(nn.initializers.zeros
                                    if self.mlp_init is not None
                                    else _torch_bias_init(in_d)),
                         dtype=self.dtype, name=f'dense_{i}')(x)
            in_d = out_d
            if (self.batchnorm_final if is_final else self.batchnorm_hidden):
                x = nn.BatchNorm(use_running_average=not train,
                                 axis_name=self.bn_axis_name,
                                 dtype=self.dtype, param_dtype=self.dtype,
                                 name=f'bn_{i}')(x)
            act = self.activation_final if is_final else self.activation_hidden
            if act is not None:
                x = act(x)
            p = self.dropout_final if is_final else self.dropout_hidden
            if p > 0:
                x = nn.Dropout(rate=p, deterministic=not train,
                               name=f'dropout_{i}')(x)
        return x


@register_layer('fsw_conv')
class FSWConv(nn.Module):
    """FSW message-passing layer over a CSR `Graph` (or `NeighborTable`).

    Call: `conv(vertex_features, graph)` with vertex_features (N, in_channels)
    and a `Graph` whose recipients are the N nodes.  Edge features (if
    edgefeat_dim > 0) ride in `graph.edge_feat`.
    """
    in_channels: int
    out_channels: int
    edgefeat_dim: int = 0
    embed_dim: Optional[int] = None
    learnable_embedding: bool = True
    encode_vertex_degrees: bool = True
    vertex_degree_encoding_function: str = 'identity'
    vertex_degree_encoding_scale: float = 1.0
    learnable_vertex_degree_encoding_scale: bool = False
    homog_degree_encoding: bool = False
    vertex_degree_pad_thresh: float = 1.0
    concat_self: bool = True
    message_weight_vs_self: float = 1.0
    bias: bool = True
    mlp_layers: int = 1
    mlp_hidden_dim: Optional[int] = None
    mlp_activation_final: Optional[Callable] = leaky_relu_02
    mlp_activation_hidden: Optional[Callable] = leaky_relu_02
    mlp_init: Optional[str] = None
    batchnorm_final: bool = False
    batchnorm_hidden: bool = False
    dropout_final: float = 0.0
    dropout_hidden: float = 0.0
    minimize_slice_coherence: bool = True
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_config(cls, config: Optional[dict] = None, **kwargs):
        """Construct with config-dict overrides, the reference's 'config
        system' (fsw_conv.py:192-205): any key in `config` overrides the
        matching constructor argument; unknown keys raise."""
        config = dict(config or {})
        valid = {f.name for f in dataclasses.fields(cls)}
        for key in config:
            if key not in valid:
                raise ValueError(f"Invalid argument '{key}' in config")
        kwargs.update(config)
        return cls(**kwargs)

    def _resolved_embed_dim(self) -> int:
        if self.mlp_layers == 0 and not self.concat_self:
            return self.out_channels
        if self.embed_dim is None:
            return 2 * max(self.in_channels, self.out_channels)
        return self.embed_dim

    def _embed_cfg(self) -> FSWConfig:
        embedding_bias = self.bias and self.mlp_layers == 0
        return FSWConfig(
            d_in=self.in_channels,
            d_out=self._resolved_embed_dim(),
            d_edge=self.edgefeat_dim,
            encode_total_mass=self.encode_vertex_degrees,
            total_mass_encoding_function=self.vertex_degree_encoding_function,
            total_mass_encoding_scale=self.vertex_degree_encoding_scale,
            total_mass_encoding_method=(
                'homog' if self.homog_degree_encoding else 'plain'),
            total_mass_pad_thresh=self.vertex_degree_pad_thresh,
            learnable_slices=self.learnable_embedding,
            learnable_freqs=self.learnable_embedding,
            learnable_total_mass_encoding_scale=(
                self.learnable_vertex_degree_encoding_scale),
            freqs_init='spread',
            minimize_slice_coherence=self.minimize_slice_coherence,
            enable_bias=embedding_bias,
        )

    @nn.compact
    def __call__(self, vertex_features, graph: Graph, *, train: bool = False,
                 slice_chunk: Optional[int] = None, recipient_features=None,
                 aggregate: str = 'auto', proj_gather_fn=None,
                 exchange_chunks: int = 4):
        """vertex_features: (N, d_in) sender features (N = graph.num_nodes).
        recipient_features: (R, d_in) the recipients' own features for the
        concat_self path; defaults to vertex_features (square graphs on one
        device).  Under edge partitioning the senders are the all-gathered
        padded-global matrix while recipients are the local shard.
        proj_gather_fn (distributed overlap exchange): when set,
        vertex_features are the LOCAL shard's rows and sender projections
        are exchanged slice-chunk by slice-chunk inside the embedding,
        overlapping ICI transfers with aggregation (parallel/overlap.py)."""
        mlp_hidden = (self.mlp_hidden_dim if self.mlp_hidden_dim is not None
                      else max(self.in_channels, self.out_channels))

        # weights_grad=False: the adjacency weights come from edge_index
        # (unit / gcn / self-loop values) -- data, never parameters -- so
        # the rank kernel can skip their cotangent loop
        emb = FSWEmbedding(self._embed_cfg(), dtype=self.dtype,
                           name='fsw_embed')(
            vertex_features, graph=graph, slice_chunk=slice_chunk,
            aggregate=aggregate, weights_grad=False,
            proj_gather_fn=proj_gather_fn, exchange_chunks=exchange_chunks)

        if self.concat_self:
            self_feats = (vertex_features if recipient_features is None
                          else recipient_features)
            emb = jnp.concatenate(
                [self.message_weight_vs_self * emb, self_feats], axis=-1)

        return _MLPHead(
            in_dim=emb.shape[-1],
            out_channels=self.out_channels,
            mlp_layers=self.mlp_layers,
            mlp_hidden_dim=mlp_hidden,
            bias=self.bias,
            mlp_init=self.mlp_init,
            activation_final=self.mlp_activation_final,
            activation_hidden=self.mlp_activation_hidden,
            batchnorm_final=self.batchnorm_final,
            batchnorm_hidden=self.batchnorm_hidden,
            dropout_final=self.dropout_final,
            dropout_hidden=self.dropout_hidden,
            concat_self=self.concat_self,
            learnable_dim_reduct=self.learnable_embedding,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name='head')(emb, train=train)


@register_pooling('fsw_readout')
class FSWReadout(FSWConv):
    """Global graph pooling as a bipartite FSW aggregation
    (fsw_conv.py:451-517).

    Call: `readout(vertex_features, pool_graph)` where `pool_graph` comes from
    `graph.readout_graph(graph_index, num_vertices, batch_size)` -- an edge of
    weight 1 from every vertex to its graph's global node.  Output shape
    (batch_size, out_channels).
    """

    @nn.compact
    def __call__(self, vertex_features, graph: Graph, *, train: bool = False,
                 slice_chunk: Optional[int] = None, aggregate: str = 'auto'):
        assert self.edgefeat_dim == 0, (
            'edgefeat_dim must be 0 in a global readout layer')

        # weights_grad=False: the adjacency weights come from edge_index
        # (unit / gcn / self-loop values) -- data, never parameters -- so
        # the rank kernel can skip their cotangent loop
        emb = FSWEmbedding(self._embed_cfg(), dtype=self.dtype,
                           name='fsw_embed')(
            vertex_features, graph=graph, slice_chunk=slice_chunk,
            aggregate=aggregate, weights_grad=False)

        # NOTE: the reference readout reuses FSW_conv.forward's tail but has
        # no per-recipient self features (recipients are graph-level nodes),
        # so concat_self applies only through dim_reduct sizing (py:507-515).
        return _MLPHead(
            in_dim=emb.shape[-1],
            out_channels=self.out_channels,
            mlp_layers=self.mlp_layers,
            mlp_hidden_dim=(self.mlp_hidden_dim if self.mlp_hidden_dim
                            is not None
                            else max(self.in_channels, self.out_channels)),
            bias=self.bias,
            mlp_init=self.mlp_init,
            activation_final=self.mlp_activation_final,
            activation_hidden=self.mlp_activation_hidden,
            batchnorm_final=self.batchnorm_final,
            batchnorm_hidden=self.batchnorm_hidden,
            dropout_final=self.dropout_final,
            dropout_hidden=self.dropout_hidden,
            concat_self=self.concat_self,
            learnable_dim_reduct=self.learnable_embedding,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name='head')(emb, train=train)
