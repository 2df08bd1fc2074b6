"""Point-cloud FSW embedding benchmark (BASELINE config #1,
demo_fsw_embedding-equivalent): batched multiset embed fwd and fwd+bwd.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import readback  # hardened TPU timing protocol (CLAUDE.md)

import numpy as np

BATCH = int(os.environ.get('FSW_MS_BATCH', 64))
N = int(os.environ.get('FSW_MS_N', 256))
D = int(os.environ.get('FSW_MS_D', 32))
EMBED = int(os.environ.get('FSW_MS_EMBED', 512))
ITERS = int(os.environ.get('FSW_MS_ITERS', 20))
AGG = os.environ.get('FSW_MS_AGG', 'auto')      # auto | sort | rank
UNIT_W = os.environ.get('FSW_MS_UNITW', '0') == '1'  # W=None (unit weights)


def main():
    import jax
    import jax.numpy as jnp
    from fsw_gnn_tpu import FSWConfig, fsw_embed_multiset

    rng = np.random.default_rng(0)
    cfg = FSWConfig(d_in=D, d_out=EMBED, enable_bias=False)
    X = jnp.asarray(rng.standard_normal((BATCH, N, D)), jnp.float32)
    W = jnp.asarray(np.abs(rng.standard_normal((BATCH, N))) + 0.1,
                    jnp.float32)
    proj = jnp.asarray(rng.standard_normal((cfg.nSlices, D)), jnp.float32)
    freqs = jnp.abs(jnp.asarray(rng.standard_normal(cfg.nFreqs),
                                jnp.float32)) + 0.1

    points = BATCH * N

    if UNIT_W:
        W = None

    def fwd(X, _):
        return jnp.sum(fsw_embed_multiset(X, W, proj, freqs, cfg,
                                          aggregate=AGG))

    def fwd_bwd(X, _):
        if UNIT_W:
            gx = jax.grad(lambda x: fsw_embed_multiset(
                x, None, proj, freqs, cfg, aggregate=AGG).sum())(X)
            return jnp.sum(gx)
        gx, gw = jax.grad(lambda x, w: fsw_embed_multiset(
            x, w, proj, freqs, cfg, aggregate=AGG).sum(),
            argnums=(0, 1))(X, W)
        return jnp.sum(gx) + jnp.sum(gw)

    # steps loop inside one jit (lax.scan); each step's INPUT depends on
    # the previous step's output (Xc += 1e-20*v), otherwise XLA hoists the
    # loop-invariant embed out of the scan and the timing is garbage
    # (observed: 0.236 ms/step = a hoisted single evaluation)
    def make_run(f, length):
        def body(carry, _):
            Xc, acc = carry
            v = f(Xc, W)
            return (Xc + 1e-20 * v, acc + v), None

        @jax.jit
        def run(X):
            (_, acc), _ = jax.lax.scan(body, (X, 0.0), None, length=length)
            return acc
        return run

    for name, f in [('multiset_fwd', fwd), ('multiset_fwd_bwd', fwd_bwd)]:
        run_n, run_1 = make_run(f, ITERS), make_run(f, 1)
        readback(run_n(X)), readback(run_1(X))   # compile + drain
        t0 = time.perf_counter()
        out = run_n(X)
        readback(out)
        dt_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        readback(run_1(X))
        dt_1 = time.perf_counter() - t0          # dispatch differencing
        dt = max(dt_n - dt_1, 1e-9) / max(ITERS - 1, 1)
        print(json.dumps({'case': name, 'ms': round(dt * 1e3, 3),
                          'points_per_s': round(points / dt),
                          'embeddings_per_s': round(BATCH / dt)}), flush=True)


if __name__ == '__main__':
    main()
