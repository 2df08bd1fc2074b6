"""Cartesian-mode aggregation: fused rank kernel vs XLA sort path (HW).

The cartesian kernel (ops/fsw_rank_pallas.fsw_rank_aggregate_cart) runs the
B-step rank loop ONCE and shares it across all F frequencies; the sort path
pays the (R, S, B) bitonic sort plus an (R, S, B, F) trig einsum.  This
bench locates the crossover that decides whether aggregate='auto' should
route cartesian configs to the kernel.

Steps are looped inside one jit (lax.scan); timed regions start from a
drained queue and end with a value readback (CLAUDE.md timing protocol).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import readback  # hardened TPU timing protocol (CLAUDE.md)

import numpy as np


def _env_int(name, default):
    return int(os.environ.get(name, default))


R = _env_int('CART_R', 8192)
B = _env_int('CART_B', 32)
STEPS = _env_int('CART_STEPS', 20)
CALLS = _env_int('CART_CALLS', 3)
CONFIGS = [(16, 8), (16, 16), (32, 8)]      # (S, F)


def main():
    import jax
    import jax.numpy as jnp
    from fsw_gnn_tpu.embedding import bucket_quadrature, FSWConfig
    from fsw_gnn_tpu.ops.fsw_rank_pallas import fsw_rank_aggregate_cart

    rng = np.random.default_rng(0)
    results = {}
    for S, F in CONFIGS:
        P = jnp.asarray(rng.standard_normal((R, B, S)), jnp.float32)
        w = np.abs(rng.standard_normal((R, B))).astype(np.float32)
        w *= rng.random((R, B)) < 0.8
        ws = w.sum(1)
        wsp = np.maximum(ws, 1.0)
        wn = jnp.asarray(w / wsp[:, None])
        pad = jnp.asarray(np.maximum(1.0 - ws, 0.0) / wsp)
        freqs = jnp.asarray(
            np.abs(rng.standard_normal((S, F))).astype(np.float32) + 0.1)
        cfg = FSWConfig(d_in=4, n_slices=S, n_freqs=F, enable_bias=False)

        def krn(P, freqs):
            return fsw_rank_aggregate_cart(P, wn, pad, freqs)

        def srt(P, freqs):
            return bucket_quadrature(P, wn, pad, freqs, cfg, 'sort')

        for name, fn in [('rank', krn), ('sort', srt)]:
            def make_loop(fn=fn, P=P, freqs=freqs):
                def body(carry, _):
                    Pc, fc = carry
                    out = fn(Pc, fc)
                    g = jax.grad(lambda p, f: jnp.sum(
                        jnp.sin(fn(p, f))))(Pc, fc)
                    # chain the FULL outputs through the carry so nothing
                    # is dead-code eliminated
                    Pc = Pc + 1e-12 * g + 1e-12 * jnp.sum(out)
                    return (Pc, fc), None

                @jax.jit
                def run():
                    (Pc, _), _ = jax.lax.scan(body, (P, freqs), None,
                                              length=STEPS)
                    return jnp.sum(Pc)
                return run

            run = make_loop()
            t0 = time.time()
            readback(run())
            print(f'S={S} F={F} {name}: compile {time.time()-t0:.1f}s',
                  flush=True)
            t0 = time.time()
            for _ in range(CALLS):
                out = run()
            readback(out)
            ms = (time.time() - t0) / (CALLS * STEPS) * 1e3
            results[(S, F, name)] = ms
            print(json.dumps({'S': S, 'F': F, 'impl': name,
                              'fwd_bwd_ms': round(ms, 3)}), flush=True)

    for S, F in CONFIGS:
        a, b = results[(S, F, 'rank')], results[(S, F, 'sort')]
        print(json.dumps({'S': S, 'F': F,
                          'speedup_rank_vs_sort': round(b / a, 3)}),
              flush=True)


if __name__ == '__main__':
    main()
