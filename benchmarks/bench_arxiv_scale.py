"""ogbn-arxiv-scale stress benchmark: full-graph FSW-GNN train step at
169k nodes / ~1.2M edges on one chip (BASELINE config #4 scale, full-graph
variant; the minibatch path covers the sampled variant).

Uses slice chunking to bound the (E, S) working set.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import readback  # hardened TPU timing protocol (CLAUDE.md)

import numpy as np

N_NODES = int(os.environ.get('FSW_AX_NODES', 169_343))
AVG_DEG = int(os.environ.get('FSW_AX_DEG', 7))
D_IN = int(os.environ.get('FSW_AX_DIN', 128))
HIDDEN = int(os.environ.get('FSW_AX_HIDDEN', 64))
N_CLASSES = 40
EMBED = int(os.environ.get('FSW_AX_EMBED', 65))
STEPS = int(os.environ.get('FSW_AX_STEPS', 5))


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from fsw_gnn_tpu import FSWGNN, auto_layout, from_edge_index
    from fsw_gnn_tpu.parallel.dist import masked_softmax_cross_entropy

    rng = np.random.default_rng(0)
    E0 = N_NODES * AVG_DEG
    src = rng.integers(0, N_NODES, E0)
    dst = rng.integers(0, N_NODES, E0)
    keep = src != dst
    g = from_edge_index(np.stack([src[keep], dst[keep]]), N_NODES,
                        dtype=jnp.float32)
    E_real = g.num_edges
    gl = auto_layout(g)
    layout = type(gl).__name__
    X = jnp.asarray(rng.standard_normal((N_NODES, D_IN)), jnp.float32)
    y = jnp.asarray(rng.integers(0, N_CLASSES, N_NODES))
    mask = jnp.ones(N_NODES, jnp.float32)

    model = FSWGNN(in_channels=D_IN, hidden_dims=(HIDDEN, N_CLASSES),
                   embed_dim=EMBED, minimize_slice_coherence=False)
    variables = model.init(jax.random.PRNGKey(0), X, gl)
    params = variables['params']
    fixed = {k: v for k, v in variables.items() if k != 'params'}
    opt = optax.adam(1e-3)

    def loss_fn(params, X):
        logits = model.apply({'params': params, **fixed}, X, gl)
        s, c = masked_softmax_cross_entropy(logits, y, mask)
        return s / c

    def one_step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, X)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def run(params, opt_state):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), None, length=STEPS)
        return params, opt_state, losses

    p, s = params, opt.init(params)
    t0 = time.perf_counter()
    p, s, losses = run(p, s)
    readback(losses)                      # compile + drain the queue
    compile_and_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    p, s, losses = run(p, s)
    readback(losses)                      # readback barrier
    dt = (time.perf_counter() - t0) / STEPS
    print(json.dumps({
        'nodes': N_NODES, 'edges': E_real, 'layout': layout,
        'compile_s': round(compile_and_first, 1),
        'ms_per_step': round(dt * 1e3, 1),
        'edges_per_s': round(E_real / dt),
        'final_loss': float(np.asarray(losses)[-1]),
    }))


if __name__ == '__main__':
    main()
