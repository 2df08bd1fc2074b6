"""Model export / serving utilities.

Production-deployment surface: compile a trained FSW-GNN's forward into a
serialized, ahead-of-time artifact (`jax.export` StableHLO) that a serving
process can load and run without Python model code, plus a checkpoint-to-
artifact convenience path.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .graph import Graph, MultiTable, NeighborTable


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
