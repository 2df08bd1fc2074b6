"""Probe the cartesian with_dw compile frontier at B=48/64 (VERDICT r5
item 6).

The aggregate='auto' rule caps cartesian with_dw routing at B=32 because
only that bucket's compile was ever timed (~95 s); B=48/64 were
EXTRAPOLATED into the >40 min / HTTP-413 compile-pathology class without
a measurement.  This probe times `jit(grad(loss)).lower().compile()` for
the two-kernel split backward at each width under a bounded wall clock,
then (on success) one un-differenced fwd+bwd step estimate vs the sort
path, so the cap can cite a measurement either way.

Each attempt runs in its own interpreter via fork so a hung remote
compile cannot wedge the probe: the parent enforces PROBE_TIMEOUT_S and
kills the child by exact PID.

Run on TPU:  python benchmarks/probe_cart_dw_frontier.py
"""
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

R = int(os.environ.get('CART_R', 8192))
S = int(os.environ.get('CART_S', 128))
F = int(os.environ.get('CART_F', 8))
BUCKETS = [int(b) for b in os.environ.get('CART_BS', '48,64').split(',')]
PROBE_TIMEOUT_S = float(os.environ.get('PROBE_TIMEOUT_S', 1200))
STEPS = int(os.environ.get('CART_STEPS', 10))


def attempt(B, q):
    import jax
    import jax.numpy as jnp
    from fsw_gnn_tpu.ops.fsw_rank_pallas import fsw_rank_aggregate_cart
    from fsw_gnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.standard_normal((R, B, S)), jnp.float32)
    w = np.abs(rng.standard_normal((R, B))).astype(np.float32)
    w *= rng.random((R, B)) < 0.8
    ws = np.maximum(w.sum(1), 1.0)
    wn = jnp.asarray(w / ws[:, None])
    pad = jnp.asarray(np.maximum(1.0 - w.sum(1), 0.0) / ws)
    fq = jnp.asarray(np.abs(rng.standard_normal((S, F))) + 0.1, jnp.float32)

    def loss(P, wn, pad, fq):
        return jnp.sum(jnp.sin(
            fsw_rank_aggregate_cart(P, wn, pad, fq, None, False, True)))

    grad = jax.grad(loss, argnums=(0, 1, 2, 3))

    def body(carry, _):
        Pc, wnc, padc, fqc = carry
        g = grad(Pc, wnc, padc, fqc)
        return (Pc + 1e-12 * g[0], wnc + 1e-12 * g[1],
                padc + 1e-12 * g[2], fqc + 1e-12 * g[3]), None

    def run_fn():
        (Pc, _, _, _), _ = jax.lax.scan(body, (P, wn, pad, fq), None,
                                        length=STEPS)
        return jnp.ravel(Pc)[0]

    t0 = time.time()
    exe = jax.jit(run_fn).lower().compile()
    compile_s = time.time() - t0
    q.put({'B': B, 'stage': 'compiled', 'compile_s': round(compile_s, 1)})
    float(exe())                                    # drain
    t0 = time.perf_counter()
    float(exe())
    step_ms = (time.perf_counter() - t0) / STEPS * 1e3
    q.put({'B': B, 'stage': 'ran',
           'step_ms_undifferenced': round(step_ms, 2)})


def main():
    for B in BUCKETS:
        q = mp.Queue()
        p = mp.Process(target=attempt, args=(B, q))
        t0 = time.time()
        p.start()
        deadline = t0 + PROBE_TIMEOUT_S
        done = False
        while time.time() < deadline:
            if not q.empty():
                msg = q.get()
                print(json.dumps(msg), flush=True)
                if msg.get('stage') == 'ran':
                    done = True
                    break
            if not p.is_alive():
                break
            time.sleep(2)
        if not done and p.is_alive():
            p.kill()                               # exact PID, own child
            print(json.dumps({'B': B, 'stage': 'TIMEOUT',
                              'bound_s': PROBE_TIMEOUT_S}), flush=True)
        p.join()
        while not q.empty():
            print(json.dumps(q.get()), flush=True)


if __name__ == '__main__':
    main()
