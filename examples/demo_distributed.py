"""Distributed FSW-GNN training demo on an 8-device mesh.

Edge-partitions a random graph across the mesh, then runs one training
step with each boundary-exchange transport and verifies they agree:

  * all_gather -- assemble the full sender matrix over ICI;
  * all_to_all -- send each peer only the boundary rows it references;
  * overlap    -- keep raw features local and exchange each layer's sender
                  PROJECTIONS slice-chunk by slice-chunk inside the
                  embedding, so ICI transfers run behind the aggregation
                  (fsw_gnn_tpu/parallel/overlap.py).

Run on CPU with a virtual mesh (no TPU pod needed):

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/demo_distributed.py

On a real TPU slice the identical code runs over ICI; multi-host runs add
`jax.distributed.initialize()` (fsw_gnn_tpu/parallel/runtime.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import optax

from fsw_gnn_tpu import FSWGNN, from_edge_index
from fsw_gnn_tpu.parallel import (make_distributed_train_step,
                                  make_graph_mesh, partition_graph,
                                  shard_node_features,
                                  shard_recipient_labels)


def main():
    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    n, d_in, n_classes = 512, 16, 4
    E = n * 8
    src, dst = rng.integers(0, n, E), rng.integers(0, n, E)
    keep = src != dst
    g = from_edge_index(np.stack([src[keep], dst[keep]]), n,
                        dtype=jnp.float32)
    X = rng.standard_normal((n, d_in)).astype(np.float32)
    y = rng.integers(0, n_classes, n)

    model = FSWGNN(in_channels=d_in, hidden_dims=(32, n_classes),
                   minimize_slice_coherence=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X), g)
    params0 = variables['params']
    fixed = {k: v for k, v in variables.items() if k != 'params'}

    mesh = make_graph_mesh(n_dev)
    shards = partition_graph(g, n_dev)
    Xs = shard_node_features(X, shards)
    labels, mask = shard_recipient_labels(y, np.ones(n, np.float32), shards)

    opt = optax.adam(1e-2)
    print(f'{n} nodes / {g.num_edges} edges, {n_dev}-device mesh '
          f'({shards.shard_num_recipients} recipients per shard)')

    losses = {}
    for exchange in ('all_gather', 'all_to_all', 'overlap'):
        step = make_distributed_train_step(model, opt, shards, mesh,
                                           fixed_collections=fixed,
                                           exchange=exchange)
        params = jax.tree_util.tree_map(jnp.array, params0)  # step donates
        opt_state = opt.init(params)
        loss = None
        for i in range(5):
            params, opt_state, _, loss = step(
                params, opt_state, {}, Xs, shards, labels, mask,
                jax.random.PRNGKey(i))
        losses[exchange] = float(loss)
        print(f'  exchange={exchange:<11} 5-step loss {float(loss):.6f}')

    base = losses['all_gather']
    for k, v in losses.items():
        assert abs(v - base) < 1e-4 * max(1.0, abs(base)), (k, v, base)
    print('all three exchanges agree.')


if __name__ == '__main__':
    main()
