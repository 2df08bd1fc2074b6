"""Model export / serving utilities.

Production-deployment surface:
  * `export_forward` / `load_forward`: compile a trained FSW-GNN's forward
    into a serialized ahead-of-time artifact (`jax.export` StableHLO) a
    serving process can run without Python model code.
  * `export_from_checkpoint`: orbax checkpoint directory -> artifact.
  * `GraphServer`: online inference on ARBITRARY request graphs with ONE
    compile -- the TPU-idiomatic serving pattern: fix a padded
    (max_nodes, max_edges) CSR envelope at startup, pad every request into
    it (zero-weight edges and isolated pad nodes are exact no-ops through
    the FSW quadrature), and reuse the single compiled executable.  With
    2-7 minute compiles through a remote-compile tunnel, per-request
    recompilation is not an option; with XLA anywhere it is still waste.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .graph import Graph, MultiTable, NeighborTable, from_edge_index


def export_forward(model, variables, X_spec, graph, *,
                   platform: Optional[str] = None) -> bytes:
    """Serialize the jitted forward (closed over variables and the static
    graph) to a portable StableHLO artifact.

    X_spec: jax.ShapeDtypeStruct for the node-feature input.
    platform: lowering platform ('tpu', 'cpu'); defaults to the current
    backend.
    """
    from jax import export as jexport

    def fwd(X):
        return model.apply(variables, X, graph)

    exp = jexport.export(
        jax.jit(fwd),
        platforms=[platform] if platform else None)(X_spec)
    return bytes(exp.serialize())


def load_forward(blob: bytes):
    """Deserialize an exported forward; returns a callable(X) -> logits."""
    from jax import export as jexport
    exp = jexport.deserialize(blob)
    return lambda X: exp.call(X)


def save_artifact(path: str, blob: bytes):
    with open(path, 'wb') as f:
        f.write(blob)


def load_artifact(path: str):
    with open(path, 'rb') as f:
        return load_forward(f.read())


def export_from_checkpoint(checkpoint_dir: str, model, variables_like,
                           X_spec, graph, *, step: Optional[int] = None,
                           platform: Optional[str] = None) -> bytes:
    """Restore the latest (or `step`) orbax checkpoint and export its
    forward.  `variables_like` supplies the pytree structure to restore
    into (e.g. `model.init(...)` output split the way Trainer stores it:
    {'params': ..., 'opt_state': ..., 'batch_stats': ..., 'fixed': ...});
    only the model collections are used for the export."""
    import orbax.checkpoint as ocp
    import os
    mgr = ocp.CheckpointManager(os.path.abspath(checkpoint_dir))
    step = step if step is not None else mgr.latest_step()
    restored = mgr.restore(step,
                           args=ocp.args.StandardRestore(variables_like))
    variables = {'params': restored['params'],
                 **(restored.get('batch_stats') or {}),
                 **restored['fixed']}
    return export_forward(model, variables, X_spec, graph,
                          platform=platform)


class GraphServer:
    """One-compile online inference over arbitrary request graphs.

    Uses the CSR path: unlike the degree-bucketed table layouts, the CSR
    layout's array shapes depend only on the (max_nodes, max_edges)
    envelope, never on a request's degree distribution, so every request
    hits the same compiled executable.  Requests are padded with isolated
    nodes (zero features, zero in-edges -> phantom-mass neighborhoods) and
    zero-weight edges, both exact no-ops for real outputs.
    """

    def __init__(self, model, variables, max_nodes: int, max_edges: int,
                 *, d_edge: int = 0, dtype=jnp.float32):
        self.model = model
        self.variables = variables
        self.max_nodes = int(max_nodes)
        self.max_edges = int(max_edges)
        self.d_edge = int(d_edge)
        self.dtype = dtype
        self._fwd = jax.jit(
            lambda variables, X, g: model.apply(variables, X, g))

    def _pad_graph(self, edge_index, edge_features=None) -> Graph:
        g = from_edge_index(edge_index, self.max_nodes,
                            edge_features=edge_features,
                            pad_to=self.max_edges, dtype=self.dtype)
        # num_edges is static pytree aux data; normalize it so every
        # request shares one jit cache entry
        return dataclasses.replace(g, num_edges=self.max_edges)

    def predict(self, edge_index, features, edge_features=None) -> np.ndarray:
        """edge_index (2, E), features (N, d_in); returns (N, out_dim)."""
        features = np.asarray(features)
        N = features.shape[0]
        E = np.asarray(edge_index).shape[1]
        if N > self.max_nodes:
            raise ValueError(f'{N} nodes > server envelope {self.max_nodes}')
        if E > self.max_edges:
            raise ValueError(f'{E} edges > server envelope {self.max_edges}')
        if (edge_features is None) != (self.d_edge == 0):
            raise ValueError('edge_features presence must match d_edge')
        Xp = np.zeros((self.max_nodes, features.shape[1]), np.float32)
        Xp[:N] = features
        g = self._pad_graph(edge_index, edge_features)
        out = self._fwd(self.variables, jnp.asarray(Xp, self.dtype), g)
        return np.asarray(out[:N])

    def num_compiles(self) -> int:
        """Compiled-executable count (1 after any number of requests)."""
        return int(self._fwd._cache_size())
