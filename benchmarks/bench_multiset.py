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

    @jax.jit
    def fwd(X, W):
        return fsw_embed_multiset(X, W, proj, freqs, cfg)

    @jax.jit
    def fwd_bwd(X, W):
        return jax.grad(lambda x, w: fsw_embed_multiset(
            x, w, proj, freqs, cfg).sum(), argnums=(0, 1))(X, W)

    for name, f in [('multiset_fwd', fwd), ('multiset_fwd_bwd', fwd_bwd)]:
        readback(f(X, W))                 # compile + drain the queue
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = f(X, W)
        readback(out)                     # readback barrier
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({'case': name, 'ms': round(dt * 1e3, 2),
                          'points_per_s': round(points / dt),
                          'embeddings_per_s': round(BATCH / dt)}), flush=True)


if __name__ == '__main__':
    main()
