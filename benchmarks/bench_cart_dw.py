"""Cartesian with_dw=True backward: the two-kernel split on hardware.

Round-2 finding: the per-frequency trig loop + transposed-mask loop in ONE
kernel is compile-pathological (>40 min through the remote Mosaic pipeline).
Round-3 fix: _fswc_bwd runs TWO pallas_calls (dc producer, mask consumer)
at the cost of one (R, B, S) HBM round-trip.  This script is the HW
done-criterion: (1) the split backward COMPILES in minutes, (2) its grads
match the XLA sort path on-device, (3) fwd+bwd timings vs with_dw=False and
vs the sort path, to decide the aggregate='auto' rule.

Protocol caveat: timings are UN-differenced (~2-3 ms/step dispatch RTT on
every variant), so kernel-vs-sort ratios are COMPRESSED -- conservative
for rule-fitting; see bench_cart_waste.py's caveat note.

Run on TPU:  python benchmarks/bench_cart_dw.py
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
S = _env_int('CART_S', 128)
F = _env_int('CART_F', 8)
STEPS = _env_int('CART_STEPS', 10)
CALLS = _env_int('CART_CALLS', 3)


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

    # ---- 1+2) compile + on-device parity at a small shape --------------
    Ps, wns, pads, fqs = _args(rng, 64, 16, 8, 4)
    cfg = FSWConfig(d_in=4, n_slices=8, n_freqs=4, enable_bias=False)

    def loss_k(P, wn, pad, fq):
        return jnp.sum(jnp.sin(fsw_rank_aggregate_cart(P, wn, pad, fq)))

    def loss_s(P, wn, pad, fq):
        return jnp.sum(jnp.sin(
            bucket_quadrature(P, wn, pad, fq, cfg, 'sort')))

    t0 = time.time()
    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3)))(Ps, wns, pads, fqs)
    readback(gk)
    print(json.dumps({'stage': 'small-shape with_dw compile+run',
                      'seconds': round(time.time() - t0, 1)}), flush=True)
    gs = jax.jit(jax.grad(loss_s, argnums=(0, 1, 2, 3)))(Ps, wns, pads, fqs)
    names = ['dP', 'dwn', 'dpad', 'dfreqs']
    for n, a, b in zip(names, gk, gs):
        err = float(jnp.max(jnp.abs(a - b)) /
                    (1e-6 + jnp.max(jnp.abs(b))))
        print(json.dumps({'grad': n, 'rel_err_vs_sort': f'{err:.2e}',
                          'ok': err < 1e-4}), flush=True)
        assert err < 1e-4, f'{n} mismatch'

    # ---- 3) timing at the production shape ------------------------------
    P, wn, pad, freqs = _args(rng, R, B, S, F)

    def loss_dw(P, wn, pad, fq):
        return jnp.sum(jnp.sin(
            fsw_rank_aggregate_cart(P, wn, pad, fq, None, False, True)))

    def loss_nodw(P, wn, pad, fq):
        return jnp.sum(jnp.sin(
            fsw_rank_aggregate_cart(P, wn, pad, fq, None, False, False)))

    def loss_sort(P, wn, pad, fq):
        return jnp.sum(jnp.sin(
            bucket_quadrature(P, wn, pad, fq, cfg, 'sort')))

    variants = [
        ('kernel with_dw=True (split bwd)', loss_dw, (0, 1, 2, 3)),
        ('kernel with_dw=False', loss_nodw, (0, 3)),
        ('sort path (all grads)', loss_sort, (0, 1, 2, 3)),
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
        print(json.dumps({'variant': name, 'compile_s': round(compile_s, 1),
                          'fwd_bwd_ms': round(ms, 3)}), flush=True)


if __name__ == '__main__':
    main()
