"""Cartesian kernel-vs-sort crossover over the slice-axis lane waste.

Protocol caveat (review finding, round 4): the timing below is
UN-differenced -- ~2-3 ms/step of tunnel dispatch+readback RTT rides on
every variant (STEPS=10 per call), so the kernel-vs-sort ratios are
systematically COMPRESSED (the faster variant carries more relative
overhead).  The waste_cart rule derived from these numbers is therefore
conservative -- the true margins are higher -- which is the safe
direction for an auto rule; an N-vs-1 differenced rep (bench.py's
protocol) would sharpen it.

The round-2 rule (waste_cart=1.2, i.e. kernel only near full 128 lanes)
predates the round-3/4 trig campaign; bench_cart_dw.py (round 4) measured
the kernel 7.2x over sort at S=128 INCLUDING weight grads, so the waste
threshold needs re-fitting: the kernel's cost is ~S-independent below one
lane tile (everything pads to 128) while the sort path scales with S.
This script times kernel (with_dw True/False) vs sort at S in {16, 48}
(waste 8.0 / 2.67) to place the crossover; together with the S=128 point
from bench_cart_dw.py the rule's waste_cart is interpolated.

Run on TPU:  python benchmarks/bench_cart_waste.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import readback

import numpy as np

R = int(os.environ.get('CART_R', 8192))
B = int(os.environ.get('CART_B', 32))
F = int(os.environ.get('CART_F', 8))
STEPS = int(os.environ.get('CART_STEPS', 10))
CALLS = int(os.environ.get('CART_CALLS', 3))
S_LIST = [int(s) for s in os.environ.get('CART_S_LIST', '16,48').split(',')]


def _args(rng, R, B, S, F):
    import jax.numpy as jnp
    P = jnp.asarray(rng.standard_normal((R, B, S)), jnp.float32)
    w = np.abs(rng.standard_normal((R, B))).astype(np.float32)
    w *= rng.random((R, B)) < 0.8
    ws = w.sum(1)
    wsp = np.maximum(ws, 1.0)
    wn = jnp.asarray(w / wsp[:, None])
    pad = jnp.asarray(np.maximum(1.0 - ws, 0.0) / wsp)
    freqs = jnp.asarray(
        np.abs(rng.standard_normal((S, F))).astype(np.float32) + 0.1)
    return P, wn, pad, freqs


def main():
    import jax
    import jax.numpy as jnp
    from fsw_gnn_tpu.embedding import bucket_quadrature, FSWConfig
    from fsw_gnn_tpu.ops.fsw_rank_pallas import fsw_rank_aggregate_cart

    rng = np.random.default_rng(0)
    for S in S_LIST:
        cfg = FSWConfig(d_in=4, n_slices=S, n_freqs=F, enable_bias=False)
        P, wn, pad, freqs = _args(rng, R, B, S, F)

        def loss_dw(P, wn, pad, fq):
            return jnp.sum(jnp.sin(
                fsw_rank_aggregate_cart(P, wn, pad, fq, None, False, True)))

        def loss_nodw(P, wn, pad, fq):
            return jnp.sum(jnp.sin(
                fsw_rank_aggregate_cart(P, wn, pad, fq, None, False,
                                        False)))

        def loss_sort(P, wn, pad, fq):
            return jnp.sum(jnp.sin(
                bucket_quadrature(P, wn, pad, fq, cfg, 'sort')))

        variants = [
            ('kernel dw', loss_dw, (0, 1, 2, 3)),
            ('kernel nodw', loss_nodw, (0, 3)),
            ('sort', loss_sort, (0, 1, 2, 3)),
        ]
        for name, loss, argnums in variants:
            grad = jax.grad(loss, argnums=argnums)

            def make_loop(grad=grad, argnums=argnums):
                def body(carry, _):
                    Pc, wnc, padc, fqc = carry
                    g = grad(Pc, wnc, padc, fqc)
                    Pc = Pc + 1e-12 * g[0]
                    fqc = fqc + 1e-12 * g[-1]
                    if len(argnums) == 4:
                        wnc = wnc + 1e-12 * g[1]
                        padc = padc + 1e-12 * g[2]
                    return (Pc, wnc, padc, fqc), None

                @jax.jit
                def run():
                    (Pc, _, _, _), _ = jax.lax.scan(
                        body, (P, wn, pad, freqs), None, length=STEPS)
                    return jnp.ravel(Pc)[0]
                return run

            run = make_loop()
            t0 = time.time()
            readback(run())
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(CALLS):
                out = run()
            readback(out)
            ms = (time.time() - t0) / (CALLS * STEPS) * 1e3
            rec = {'S': S, 'waste': round(128 / S, 2), 'variant': name,
                   'compile_s': round(compile_s, 1),
                   'fwd_bwd_ms': round(ms, 3)}
            if os.environ.get('CART_DIFF') == '1':
                # N-vs-1 differencing cancels the per-call dispatch RTT
                # (the review-noted conservative bias of the raw number)
                import types
                run1 = make_loop()
                # rebuild with length=1: cheapest is a second jit whose
                # scan length is 1
                def make_loop1(grad=grad, argnums=argnums):
                    def body(carry, _):
                        Pc, wnc, padc, fqc = carry
                        g2 = grad(Pc, wnc, padc, fqc)
                        Pc = Pc + 1e-12 * g2[0]
                        fqc = fqc + 1e-12 * g2[-1]
                        if len(argnums) == 4:
                            wnc = wnc + 1e-12 * g2[1]
                            padc = padc + 1e-12 * g2[2]
                        return (Pc, wnc, padc, fqc), None

                    @jax.jit
                    def run1():
                        (Pc, _, _, _), _ = jax.lax.scan(
                            body, (P, wn, pad, freqs), None, length=1)
                        return jnp.ravel(Pc)[0]
                    return run1
                run1 = make_loop1()
                readback(run1())                 # compile + drain
                best = float('inf')
                for _ in range(3):
                    t0 = time.time()
                    for _ in range(CALLS):
                        out = run()
                    readback(out)
                    tn = time.time() - t0
                    t0 = time.time()
                    for _ in range(CALLS):
                        out = run1()
                    readback(out)
                    t1 = time.time() - t0
                    best = min(best, (tn - t1) / (CALLS * (STEPS - 1)))
                rec['fwd_bwd_ms_differenced'] = round(best * 1e3, 3)
            print(json.dumps(rec), flush=True)


if __name__ == '__main__':
    main()
