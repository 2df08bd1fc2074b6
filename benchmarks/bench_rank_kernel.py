"""TPU benchmark: fused rank-based Pallas aggregation vs the XLA table path.

Workload matches bench.py's embedding core: R=8192 recipients, bucket B=32,
S=128 slices, f32, on pre-gathered projections (R, B, S) -- isolating the
aggregation (sort/cumsum/quadrature + backward), which is where the XLA
path spends its time.

Three jits (one compile each through the tunnel): kernel fwd, kernel
fwd+bwd, XLA fwd+bwd; steps looped inside jit via lax.scan with a data
dependency so nothing is hoisted.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import readback  # hardened TPU timing protocol (CLAUDE.md)

import numpy as np

R = int(os.environ.get('BRK_R', 8192))
B = int(os.environ.get('BRK_B', 32))
S = int(os.environ.get('BRK_S', 128))
STEPS = int(os.environ.get('BRK_STEPS', 20))
CALLS = int(os.environ.get('BRK_CALLS', 3))
TILE = os.environ.get('BRK_TILE')
TILE = int(TILE) if TILE else None
# BRK_DW=0: grads only wrt (P, freqs), kernel with with_dw=False -- the
# GNN-adjacency case FSWConv uses in production
WITH_DW = os.environ.get('BRK_DW', '1') != '0'


def main():
    import jax
    import jax.numpy as jnp
    from fsw_gnn_tpu.ops.fsw_rank_pallas import fsw_rank_aggregate
    from fsw_gnn_tpu.ops.segment import sort_pairs_fused

    print('devices:', jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.standard_normal((R, B, S)), jnp.float32)
    w = np.abs(rng.standard_normal((R, B))).astype(np.float32)
    w_sum = w.sum(1)
    wn = jnp.asarray(w / np.maximum(w_sum, 1.0)[:, None])
    pad = jnp.asarray(np.maximum(1.0 - w_sum, 0.0) / np.maximum(w_sum, 1.0))
    freqs = jnp.asarray(np.abs(rng.standard_normal(S)) + 0.1, jnp.float32)
    V = jnp.asarray(rng.standard_normal((R, S)), jnp.float32)

    def xla_fwd(P, wn, pad, freqs):
        keysB = jnp.moveaxis(P, 1, 2)
        ps, ws = sort_pairs_fused(
            keysB, jnp.broadcast_to(wn[:, None, :], keysB.shape))
        c = jnp.cumsum(ws, axis=2) + pad[:, None, None] * (ps > 0)
        sd = 2.0 * ws * jnp.sinc(freqs[None, :, None] * ws) * jnp.cos(
            jnp.pi * freqs[None, :, None] * (2.0 * c - ws))
        return (1.0 + freqs) * jnp.sum(ps * sd, axis=2)

    def krn_fwd(P, wn, pad, freqs):
        return fsw_rank_aggregate(P, wn, pad, freqs, TILE, False, WITH_DW)

    def make_loop(fn, grad):
        # all arrays enter as jit ARGUMENTS: a closed-over P would be baked
        # into the serialized module as a constant (128 MB at B=32, 256 MB
        # at B=64 -- the remote-compile service rejects bodies that big
        # with HTTP 413)
        if grad:
            def loss(P, wn, pad, freqs):
                return jnp.sum(fn(P, wn, pad, freqs) * V)
            argnums = (0, 1, 2, 3) if WITH_DW else (0, 3)
            gfn = jax.grad(loss, argnums=argnums)

            @jax.jit
            def run(P, wn, pad, freqs):
                def body(carry, _):
                    gs = gfn(P + carry * 1e-30, wn, pad, freqs)
                    dP, df = gs[0], gs[-1]
                    return jnp.sum(dP[0, 0, :1]) + jnp.sum(df[:1]), None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=STEPS)
                return c
        else:
            @jax.jit
            def run(P, wn, pad, freqs):
                def body(carry, _):
                    out = fn(P + carry * 1e-30, wn, pad, freqs)
                    return jnp.sum(out[0, :1]), None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=STEPS)
                return c
        return lambda: run(P, wn, pad, freqs)

    # on-device parity first (reuses the fwd compiles)
    t0 = time.time()
    a = jax.jit(krn_fwd)(P, wn, pad, freqs)
    readback(a)
    print(f'kernel fwd compile+run: {time.time()-t0:.1f}s', flush=True)
    t0 = time.time()
    b = jax.jit(xla_fwd)(P, wn, pad, freqs)
    readback(b)
    print(f'xla fwd compile+run: {time.time()-t0:.1f}s', flush=True)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f'fwd max abs diff kernel vs xla: {err:.3e}', flush=True)

    results = {}
    for name, fn, grad in [('kernel_fwd', krn_fwd, False),
                           ('kernel_fwd_bwd', krn_fwd, True),
                           ('xla_fwd', xla_fwd, False),
                           ('xla_fwd_bwd', xla_fwd, True)]:
        run = make_loop(fn, grad)
        t0 = time.time()
        readback(run())                   # compile + drain the queue
        print(f'{name}: compile {time.time()-t0:.1f}s', flush=True)
        t0 = time.time()
        for _ in range(CALLS):
            out = run()
        readback(out)                     # readback barrier
        dt = (time.time() - t0) / (CALLS * STEPS)
        results[name] = dt * 1e3
        print(f'{name}: {dt*1e3:.3f} ms/step', flush=True)

    edges = R * B
    print('\nsummary (R=%d B=%d S=%d, %d entries, with_dw=%s):'
          % (R, B, S, edges, WITH_DW))
    for k, v in results.items():
        print(f'  {k:16s} {v:8.3f} ms  ({edges/v*1e3/1e6:.1f}M entries/s)')


if __name__ == '__main__':
    main()
