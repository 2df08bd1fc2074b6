"""HW probe: which dot_general shapes lower inside a Mosaic kernel.

The fused-projection rank kernel needs three in-kernel contractions:
  fwd : P   = Xr (TR,B,D) . V (D,S)        -> (TR,B,S)   (rank-3 x rank-2)
  bwd : dXr = dP (TR,B,S) . V^T            -> (TR,B,D)
  bwd : dV  = Xr (TR,B,D) x dP (TR,B,S) contracting (TR,B) -> (D,S)

Each probe is its own tiny pallas_call so one failure doesn't mask the
others.  Run on TPU: python benchmarks/probe_kernel_matmul.py
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TR, B, D, S = 16, 32, 64, 128
    rng = np.random.default_rng(0)
    Xr = jnp.asarray(rng.standard_normal((TR, B, D)), jnp.float32)
    V = jnp.asarray(rng.standard_normal((D, S)), jnp.float32)
    dP = jnp.asarray(rng.standard_normal((TR, B, S)), jnp.float32)

    def run(name, kernel, ins, out_shape, expect):
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            )(*ins)
            err = float(jnp.max(jnp.abs(out - expect)))
            print(f'{name}: OK max_abs_err={err:.2e}', flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:200]
            print(f'{name}: FAIL {type(e).__name__}: {msg}', flush=True)

    # 1. rank-3 x rank-2 forward projection
    def k_fwd(x_ref, v_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], v_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    run('fwd  (TR,B,D)@(D,S)', k_fwd, (Xr, V), (TR, B, S),
        jnp.einsum('rbd,ds->rbs', Xr, V))

    # 2. rank-3 x rank-2 with transposed rhs contraction (dXr)
    def k_dxr(g_ref, v_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            g_ref[:], v_ref[:], (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    run('dXr  (TR,B,S)@(D,S)^T', k_dxr, (dP, V), (TR, B, D),
        jnp.einsum('rbs,ds->rbd', dP, V))

    # 3. rank-3 x rank-3 double contraction (dV)
    def k_dv(x_ref, g_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], g_ref[:], (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)

    run('dV   contract (TR,B)', k_dv, (Xr, dP), (D, S),
        jnp.einsum('rbd,rbs->ds', Xr, dP))

    # 3b. fallback: per-B-column accumulation of (D,TR)@(TR,S)
    def k_dv_loop(x_ref, g_ref, o_ref):
        acc = jnp.zeros((D, S), jnp.float32)
        for j in range(B):
            xj = x_ref[:, j, :]
            gj = g_ref[:, j, :]
            acc = acc + jax.lax.dot_general(
                xj, gj, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = acc

    run('dV   B-loop (D,TR)@(TR,S)', k_dv_loop, (Xr, dP), (D, S),
        jnp.einsum('rbd,rbs->ds', Xr, dP))

    # 4. leading-dims collapse reshape + rank-2 matmul
    def k_flat(x_ref, v_ref, o_ref):
        x2 = x_ref[:].reshape(TR * B, D)
        o_ref[:] = jnp.dot(x2, v_ref[:],
                           preferred_element_type=jnp.float32).reshape(
                               TR, B, S)

    run('fwd  reshape-collapse', k_flat, (Xr, V), (TR, B, S),
        jnp.einsum('rbd,ds->rbs', Xr, V))


if __name__ == '__main__':
    try:
        main()
    except Exception:
        traceback.print_exc()
