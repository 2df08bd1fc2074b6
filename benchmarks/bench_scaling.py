"""Edge-partitioned scaling benchmark (BASELINE metric #5 scaffold).

Measures distributed train-step throughput (edges/s) at each device count
available on this runtime.  On a multi-chip slice this produces the scaling
curve (target: >=80% linear 1 host -> v5p-16); on the single-chip dev
environment it exercises the plumbing at n=1, and on the virtual CPU mesh
(env: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
it validates multi-device functionally.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import readback  # hardened TPU timing protocol (CLAUDE.md)

import numpy as np

N_NODES = int(os.environ.get('FSW_SC_NODES', 4096))
AVG_DEG = int(os.environ.get('FSW_SC_DEG', 16))
D_IN = int(os.environ.get('FSW_SC_DIN', 32))
HIDDEN = int(os.environ.get('FSW_SC_HIDDEN', 32))
N_CLASSES = 8
ITERS = int(os.environ.get('FSW_SC_ITERS', 10))


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from fsw_gnn_tpu import FSWGNN, from_edge_index
    from fsw_gnn_tpu.parallel import (make_distributed_train_step,
                                      make_graph_mesh, partition_graph,
                                      shard_node_features,
                                      shard_recipient_labels)

    rng = np.random.default_rng(0)
    E0 = N_NODES * AVG_DEG
    src = rng.integers(0, N_NODES, E0)
    dst = rng.integers(0, N_NODES, E0)
    keep = src != dst
    g = from_edge_index(np.stack([src[keep], dst[keep]]), N_NODES,
                        dtype=jnp.float32)
    X = rng.standard_normal((N_NODES, D_IN)).astype(np.float32)
    y = rng.integers(0, N_CLASSES, N_NODES)
    E_real = g.num_edges

    model = FSWGNN(in_channels=D_IN, hidden_dims=(HIDDEN, N_CLASSES),
                   minimize_slice_coherence=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X), g)
    params0 = variables['params']
    fixed = {k: v for k, v in variables.items() if k != 'params'}
    opt = optax.adam(1e-3)

    n_avail = len(jax.devices())
    counts = [n for n in [1, 2, 4, 8, 16, 32] if n <= n_avail]
    results = []
    for n_dev in counts:
        mesh = make_graph_mesh(n_dev)
        shards = partition_graph(g, n_dev)
        Xs = shard_node_features(X, shards)
        labels, mask = shard_recipient_labels(y, np.ones(N_NODES), shards)
        step = make_distributed_train_step(model, opt, shards, mesh,
                                           fixed_collections=fixed)
        # the step donates params/opt_state; params0 is reused
        # across device counts, so hand in a copy
        p = jax.tree_util.tree_map(jnp.array, params0)
        s, b = opt.init(p), {}
        rng = jax.random.PRNGKey(0)
        p, s, b, loss = step(p, s, b, Xs, shards, labels, mask, rng)  # compile
        readback(loss)                    # drain the queue
        t0 = time.perf_counter()
        for _ in range(ITERS):
            p, s, b, loss = step(p, s, b, Xs, shards, labels, mask, rng)
        readback(loss)                    # readback barrier
        dt = (time.perf_counter() - t0) / ITERS
        eps = E_real / dt
        results.append((n_dev, eps))
        base = results[0][1]
        print(json.dumps({
            'devices': n_dev, 'ms_per_step': round(dt * 1e3, 2),
            'edges_per_s': round(eps),
            'scaling_efficiency': round(eps / (base * n_dev), 4),
        }), flush=True)


if __name__ == '__main__':
    main()
