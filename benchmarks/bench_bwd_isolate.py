"""Isolate the backward-pass cost of the CSR FSW embedding.

Times on TPU: fwd_bwd for vjp_mode in {legacy, fused}; a remat variant;
and raw scatter/gather microbenches matching the adjoint shapes.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_NODES = 8192
AVG_DEG = 16
D_IN = 64
EMBED = 128
ITERS = 10


def timed(name, f, *args):
    import jax
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        jax.block_until_ready(f(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({'case': name, 'ms': round(dt * 1e3, 2)}), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from fsw_gnn_tpu import FSWConfig, from_edge_index, fsw_embed_graph

    rng = np.random.default_rng(0)
    E0 = N_NODES * AVG_DEG
    src = rng.integers(0, N_NODES, E0)
    dst = rng.integers(0, N_NODES, E0)
    keep = src != dst
    g = from_edge_index(np.stack([src[keep], dst[keep]]), N_NODES,
                        dtype=jnp.float32)
    X = jnp.asarray(rng.standard_normal((N_NODES, D_IN)), jnp.float32)
    cfg = FSWConfig(d_in=D_IN, d_out=EMBED, enable_bias=False)
    S = cfg.nSlices
    proj = jnp.asarray(rng.standard_normal((S, D_IN)), jnp.float32)
    freqs = jnp.abs(jnp.asarray(rng.standard_normal(cfg.nFreqs),
                                jnp.float32)) + 0.1
    E = g.padded_num_edges

    for mode in ['legacy', 'fused']:
        f = jax.jit(lambda X, p, m=mode: jax.grad(
            lambda x, pp: fsw_embed_graph(x, g, pp, freqs, cfg,
                                          vjp_mode=m).sum(),
            argnums=(0, 1))(X, p))
        timed(f'fwd_bwd_{mode}', f, X, proj)

    # remat: recompute the slice pipeline in backward instead of saving
    f = jax.jit(lambda X, p: jax.grad(
        lambda x, pp: jax.checkpoint(
            lambda a, b: fsw_embed_graph(a, g, b, freqs, cfg,
                                         vjp_mode='fused'))(x, pp).sum(),
        argnums=(0, 1))(X, proj))
    timed('fwd_bwd_fused_remat', f, X, proj)

    # raw adjoint-shaped microbenches
    ct = jnp.asarray(rng.standard_normal((E, S)), jnp.float32)
    srcj = g.src

    def scatter_rows(ct):
        return jnp.zeros((N_NODES, S), jnp.float32).at[srcj].add(ct)
    timed('scatter_add_E_S_to_N_S', jax.jit(scatter_rows), ct)

    perm = jnp.stack([jnp.asarray(rng.permutation(E), jnp.int32)
                      for _ in range(4)])  # (4, E) sample perms

    cts = jnp.asarray(rng.standard_normal((S, E)), jnp.float32)
    permS = jnp.asarray(np.stack([rng.permutation(E) for _ in range(S)]),
                        jnp.int32)

    def scatter_perm(cts):
        return jnp.zeros((S, E), jnp.float32).at[
            jnp.arange(S)[:, None], permS].add(cts)
    timed('scatter_perm_S_E', jax.jit(scatter_perm), cts)

    def gather_perm(cts):
        return jnp.take_along_axis(cts, permS, axis=1)
    timed('gather_perm_S_E', jax.jit(gather_perm), cts)

    def sort_int(cts):
        out = jax.lax.sort((permS, cts), dimension=1, num_keys=1)
        return out[1]
    timed('intsort_S_E', jax.jit(sort_int), cts)


if __name__ == '__main__':
    main()
