"""Ablation: fwd+bwd time of the CSR embedding per vjp_mode.

Modes: legacy (XLA scatter adjoints), rows (scatter-free sender gather),
perm (scatter-free sort gathers), both.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_NODES = int(os.environ.get('FSW_BD_NODES', 8192))
AVG_DEG = int(os.environ.get('FSW_BD_DEG', 16))
D_IN = int(os.environ.get('FSW_BD_DIN', 64))
EMBED = int(os.environ.get('FSW_BD_EMBED', 128))
ITERS = int(os.environ.get('FSW_BD_ITERS', 10))
MODES = os.environ.get('FSW_BD_MODES', 'legacy,rows,perm,both').split(',')


def main():
    import jax
    import jax.numpy as jnp
    from fsw_gnn_tpu import FSWConfig, from_edge_index, fsw_embed_graph

    rng = np.random.default_rng(0)
    E = N_NODES * AVG_DEG
    src = rng.integers(0, N_NODES, E)
    dst = rng.integers(0, N_NODES, E)
    keep = src != dst
    g = from_edge_index(np.stack([src[keep], dst[keep]]), N_NODES,
                        dtype=jnp.float32)
    X = jnp.asarray(rng.standard_normal((N_NODES, D_IN)), jnp.float32)
    cfg = FSWConfig(d_in=D_IN, d_out=EMBED, enable_bias=False)
    proj = jnp.asarray(rng.standard_normal((cfg.nSlices, D_IN)), jnp.float32)
    freqs = jnp.abs(jnp.asarray(rng.standard_normal(cfg.nFreqs),
                                jnp.float32)) + 0.1
    E_real = g.num_edges

    for mode in MODES:
        def fwd_bwd(X, proj):
            return jax.grad(lambda x, p: fsw_embed_graph(
                x, g, p, freqs, cfg, vjp_mode=mode).sum(), argnums=(0, 1))(
                    X, proj)
        f = jax.jit(fwd_bwd)
        jax.block_until_ready(f(X, proj))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            jax.block_until_ready(f(X, proj))
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({'mode': mode, 'ms': round(dt * 1e3, 2),
                          'edges_per_s': round(E_real / dt)}), flush=True)


if __name__ == '__main__':
    main()
