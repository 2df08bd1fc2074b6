"""Stage breakdown of the CSR FSW_conv step on TPU: where does time go?

Times, with one jit each: (a) projection+gather only, (b) + segmented sort,
(c) full embedding forward, (d) embedding fwd+bwd.  Run on TPU; each variant
costs one remote compile.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import readback  # hardened TPU timing protocol (CLAUDE.md)

import numpy as np

N_NODES = int(os.environ.get('FSW_BD_NODES', 8192))
AVG_DEG = int(os.environ.get('FSW_BD_DEG', 16))
D_IN = int(os.environ.get('FSW_BD_DIN', 64))
EMBED = int(os.environ.get('FSW_BD_EMBED', 128))
ITERS = int(os.environ.get('FSW_BD_ITERS', 10))


def main():
    import jax
    import jax.numpy as jnp
    from fsw_gnn_tpu import FSWConfig, from_edge_index, fsw_embed_graph
    from fsw_gnn_tpu.ops.segment import segment_sort, segment_cumsum

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

    def proj_gather(X):
        Xp = X @ proj.T
        return jnp.take(Xp, g.src, axis=0)

    def proj_gather_sort(X):
        P = proj_gather(X)
        wn = g.weight
        def one(p):
            return segment_sort(p, wn, segment_ids=g.dst)
        ps, ws = jax.vmap(one, in_axes=1)(P)
        return ps.sum() + ws.sum()

    def embed_fwd(X):
        return fsw_embed_graph(X, g, proj, freqs, cfg).sum()

    def embed_fwd_bwd(X):
        return jax.grad(lambda x: fsw_embed_graph(x, g, proj, freqs,
                                                  cfg).sum())(X)

    E_real = g.num_edges
    for name, fn in [('proj_gather', proj_gather),
                     ('proj_gather_sort', proj_gather_sort),
                     ('embed_fwd', embed_fwd),
                     ('embed_fwd_bwd', embed_fwd_bwd)]:
        f = jax.jit(fn)
        readback(f(X))                    # compile + drain the queue
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = f(X)
        readback(out)                     # readback barrier
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({'stage': name, 'ms': round(dt * 1e3, 2),
                          'edges_per_s': round(E_real / dt)}), flush=True)


if __name__ == '__main__':
    main()
