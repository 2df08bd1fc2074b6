"""fwd+bwd: CSR path vs bucketed table path (both with sort-unsort VJPs)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import readback  # hardened TPU timing protocol (CLAUDE.md)
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from fsw_gnn_tpu import (FSWConfig, from_edge_index, fsw_embed_graph,
                             fsw_embed_table, to_neighbor_table)
    rng = np.random.default_rng(0)
    N = 8192
    E0 = N * 16
    src = rng.integers(0, N, E0); dst = rng.integers(0, N, E0)
    keep = src != dst
    g = from_edge_index(np.stack([src[keep], dst[keep]]), N, dtype=jnp.float32)
    t = to_neighbor_table(g)
    X = jnp.asarray(rng.standard_normal((N, 64)), jnp.float32)
    cfg = FSWConfig(d_in=64, d_out=128, enable_bias=False)
    proj = jnp.asarray(rng.standard_normal((cfg.nSlices, 64)), jnp.float32)
    freqs = jnp.abs(jnp.asarray(rng.standard_normal(cfg.nFreqs), jnp.float32)) + 0.1
    E_real = g.num_edges
    from fsw_gnn_tpu import fsw_embed_multi_table, to_multi_table
    mt = to_multi_table(g)
    print(json.dumps({'multi_classes': [int(tb.bucket_size)
                                        for tb in mt.tables],
                      'rows': [int(tb.num_recipients) for tb in mt.tables]}),
          flush=True)
    cases = {
        'table_fwd_bwd': lambda X, p: jax.grad(lambda x, pp: fsw_embed_table(
            x, t, pp, freqs, cfg).sum(), argnums=(0, 1))(X, p),
        'multi_table_fwd_bwd': lambda X, p: jax.grad(
            lambda x, pp: fsw_embed_multi_table(
                x, mt, pp, freqs, cfg).sum(), argnums=(0, 1))(X, p),
    }
    for name, fn in cases.items():
        f = jax.jit(fn)
        readback(f(X, proj))              # compile + drain the queue
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(X, proj)
        readback(out)                     # readback barrier
        dt = (time.perf_counter() - t0) / 10
        print(json.dumps({'case': name, 'ms': round(dt*1e3, 2),
                          'edges_per_s': round(E_real/dt)}), flush=True)

if __name__ == '__main__':
    main()

# appended: multi-table variant (run via FSW_BENCH_MULTI=1)
