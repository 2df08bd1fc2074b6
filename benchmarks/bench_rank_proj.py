"""TPU benchmark: fused-projection rank kernel vs gather-projections+kernel.

Measures the FULL pipeline both ways, including the gather and its
scatter-add adjoint (grad wrt X), which is what the fused variant targets:

  unfused: Xp = X @ V; P = take(Xp, idx) (T, S); kernel(P)      [S-wide IO]
  fused:   Z = take(X, idx) (T, D); kernel(Z, V) (MXU project)  [D-wide IO]

Headline shape: N=8192 nodes, R=8192, B=32, D=64, S=128 (D < S is where
fused should win).  Run: python benchmarks/bench_rank_proj.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import readback  # hardened TPU timing protocol (CLAUDE.md)

import numpy as np

N = int(os.environ.get('BRP_N', 8192))
R = int(os.environ.get('BRP_R', 8192))
B = int(os.environ.get('BRP_B', 32))
D = int(os.environ.get('BRP_D', 64))
S = int(os.environ.get('BRP_S', 128))
STEPS = int(os.environ.get('BRP_STEPS', 20))
CALLS = int(os.environ.get('BRP_CALLS', 3))


def main():
    import jax
    import jax.numpy as jnp
    from fsw_gnn_tpu.ops.fsw_rank_pallas import (fsw_rank_aggregate,
                                                 fsw_rank_aggregate_proj)

    print('devices:', jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    V = jnp.asarray(rng.standard_normal((D, S)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (R, B)))
    w = np.abs(rng.standard_normal((R, B))).astype(np.float32)
    w_sum = w.sum(1)
    wn = jnp.asarray(w / np.maximum(w_sum, 1.0)[:, None])
    pad = jnp.asarray(np.maximum(1.0 - w_sum, 0.0) / np.maximum(w_sum, 1.0))
    freqs = jnp.asarray(np.abs(rng.standard_normal(S)) + 0.1, jnp.float32)
    G = jnp.asarray(rng.standard_normal((R, S)), jnp.float32)

    def unfused(X, V):
        Xp = X @ V
        P = jnp.take(Xp, idx.reshape(-1), axis=0).reshape(R, B, S)
        return fsw_rank_aggregate(P, wn, pad, freqs, None, False)

    def fused(X, V):
        Z = jnp.take(X, idx.reshape(-1), axis=0).reshape(R, B, D)
        return fsw_rank_aggregate_proj(Z, wn, pad, freqs, V, None, False)

    # numeric cross-check first (one un-amortized call each)
    a = jax.jit(unfused)(X, V)
    b = jax.jit(fused)(X, V)
    print('fwd max abs diff fused vs unfused:',
          float(jnp.max(jnp.abs(a - b))), flush=True)

    results = {}

    def timed(name, fn, grad):
        if grad:
            def loss(X, V):
                return jnp.sum(fn(X, V) * G)
            gfn = jax.grad(loss, argnums=(0, 1))

            @jax.jit
            def run(X, V):
                def body(carry, _):
                    dX, dV = gfn(X + carry * 1e-30, V)
                    return jnp.sum(dX[0, :1]) + jnp.sum(dV[0, :1]), None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=STEPS)
                return c
        else:
            @jax.jit
            def run(X, V):
                def body(carry, _):
                    return jnp.sum(fn(X + carry * 1e-30, V)[0, :1]), None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=STEPS)
                return c
        t0 = time.time()
        readback(run(X, V))               # compile + drain the queue
        print(f'{name}: compile {time.time() - t0:.1f}s', flush=True)
        t0 = time.time()
        for _ in range(CALLS):
            out = run(X, V)
        readback(out)                     # readback barrier
        ms = (time.time() - t0) / (CALLS * STEPS) * 1e3
        results[name] = ms
        print(f'{name}: {ms:.3f} ms/step', flush=True)

    timed('unfused_fwd', unfused, False)
    timed('fused_fwd', fused, False)
    timed('unfused_fwd_bwd', unfused, True)
    timed('fused_fwd_bwd', fused, True)

    print(f'\nsummary (N={N} R={R} B={B} D={D} S={S}, '
          f'{R * B} entries):')
    for k, v in results.items():
        print(f'  {k:18s} {v:7.3f} ms')


if __name__ == '__main__':
    main()
