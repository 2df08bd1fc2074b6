"""TPU benchmark of the fused Pallas table kernel vs the XLA CSR path
(forward only -- the fused backward kernel comes after the forward is
validated on hardware)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import readback  # hardened TPU timing protocol (CLAUDE.md)

import numpy as np

N_NODES = int(os.environ.get('FSW_FT_NODES', 8192))
AVG_DEG = int(os.environ.get('FSW_FT_DEG', 16))
D_IN = int(os.environ.get('FSW_FT_DIN', 64))
EMBED = int(os.environ.get('FSW_FT_EMBED', 129))  # nSlices = 128
TILE_R = int(os.environ.get('FSW_FT_TILE_R', 16))
TILE_S = int(os.environ.get('FSW_FT_TILE_S', 128))
ITERS = int(os.environ.get('FSW_FT_ITERS', 20))
INTERPRET = os.environ.get('FSW_FT_INTERPRET', '0') == '1'


def main():
    import jax
    import jax.numpy as jnp
    from fsw_gnn_tpu import (FSWConfig, from_edge_index, fsw_embed_graph,
                             to_neighbor_table)
    from fsw_gnn_tpu.embedding import lowclamp
    from attic.fsw_table_pallas import fsw_table_forward

    rng = np.random.default_rng(0)
    E0 = N_NODES * AVG_DEG
    src = rng.integers(0, N_NODES, E0)
    dst = rng.integers(0, N_NODES, E0)
    keep = src != dst
    g = from_edge_index(np.stack([src[keep], dst[keep]]), N_NODES,
                        dtype=jnp.float32)
    max_deg = int(np.diff(np.asarray(g.row_ptr)).max())
    B = 2
    while B < max_deg:
        B *= 2
    t = to_neighbor_table(g, bucket_size=B)
    print(json.dumps({'bucket_size': B, 'R': t.num_recipients,
                      'E_real': g.num_edges}), flush=True)

    X = jnp.asarray(rng.standard_normal((N_NODES, D_IN)), jnp.float32)
    cfg = FSWConfig(d_in=D_IN, d_out=EMBED, enable_bias=False)
    S = cfg.nSlices
    proj = jnp.asarray(rng.standard_normal((S, D_IN)), jnp.float32)
    freqs = jnp.abs(jnp.asarray(rng.standard_normal(S), jnp.float32)) + 0.1

    w_sum = t.weight.sum(axis=1)
    w_sum_padded = lowclamp(w_sum, 1.0)
    pad_norm = lowclamp(1.0 - w_sum, 0.0) / w_sum_padded
    wn = t.weight / w_sum_padded[:, None]

    E_real = g.num_edges

    @jax.jit
    def fused(X):
        Xp = X @ proj.T
        return fsw_table_forward(t.idx, wn, pad_norm, Xp, freqs,
                                 tile_r=TILE_R, tile_s=TILE_S,
                                 interpret=INTERPRET)

    @jax.jit
    def xla_csr(X):
        return fsw_embed_graph(X, g, proj, freqs, cfg)

    for name, f in [('fused_pallas_fwd', fused), ('xla_csr_fwd', xla_csr)]:
        readback(f(X))                    # compile + drain the queue
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = f(X)
        readback(out)                     # readback barrier
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({'case': name, 'ms': round(dt * 1e3, 2),
                          'edges_per_s': round(E_real / dt)}), flush=True)

    from fsw_gnn_tpu import fsw_embed_table

    @jax.jit
    def xla_table(X):
        return fsw_embed_table(X, t, proj, freqs, cfg)

    a = np.asarray(fused(X))
    b = np.asarray(xla_csr(X))
    c = np.asarray(xla_table(X))
    print(json.dumps({'fused_vs_csr': float(np.max(np.abs(a - b))),
                      'fused_vs_xla_table': float(np.max(np.abs(a - c))),
                      'xla_table_vs_csr': float(np.max(np.abs(c - b)))}),
          flush=True)


if __name__ == '__main__':
    main()
