"""Multi-host runtime initialization.

On a TPU pod slice, every host runs the same program; this wraps
`jax.distributed.initialize` (the TPU-native replacement for the reference's
nonexistent NCCL/MPI layer -- XLA owns ICI/DCN routing once the runtime is
up) and provides the standard "global mesh spanning all processes" entry.

Single-process usage is untouched: `ensure_distributed()` is a no-op unless
multi-host environment variables (or explicit arguments) are present.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def ensure_distributed(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed once, if a multi-process setup is
    requested (explicitly or via JAX_COORDINATOR_ADDRESS / cloud TPU env).
    Returns True when running multi-process."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        'JAX_COORDINATOR_ADDRESS')
    if coordinator_address is None and num_processes is None:
        # single process (or cloud TPU auto-detection handled by jax itself)
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return jax.process_count() > 1


def global_mesh(axis_name: str = 'graph'):
    """1-D mesh over every addressable device across all processes."""
    return jax.make_mesh((len(jax.devices()),), (axis_name,))


def make_global_array(x, mesh, spec):
    """Assemble a process-spanning jax.Array from host-replicated data.

    Every process holds the FULL `x` (the usual SPMD pattern for graph
    metadata built deterministically on each host); each fills in only the
    shards it can address.  `spec` is the PartitionSpec the jitted
    shard_map expects for this argument.
    """
    import numpy as np
    sharding = jax.sharding.NamedSharding(mesh, spec)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def distribute_tree(tree, spec_tree, mesh):
    """make_global_array over a pytree of (data, PartitionSpec) pairs.

    spec_tree mirrors `tree` (static/aux fields excluded automatically by
    tree_map); a leaf spec of P() replicates.  This is the multi-process
    analogue of letting single-process jit auto-device_put numpy inputs:
    with jax.process_count() > 1 the caller must construct global Arrays
    explicitly before invoking a mesh-spanning jit.
    """
    return jax.tree_util.tree_map(
        lambda x, s: make_global_array(x, mesh, s), tree, spec_tree)
