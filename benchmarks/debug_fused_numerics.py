"""Locate the hardware numerical divergence in the fused table kernel:
compare per-stage kernel outputs (sorted ps/ws, cumsum) against XLA."""
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fsw_gnn_tpu.ops.fsw_table_pallas import (_cumsum_along_b,
                                              _sort_pairs_along_b)

TR, B, TS = 16, 64, 128
R, S = 256, 128


def k_sort_ps(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P = p_ref[:]
    ws = jnp.broadcast_to(wn_ref[:][:, :, None], P.shape)
    ps, ws2 = _sort_pairs_along_b(P, ws, b_axis=1)
    out_ref[:] = ps


def k_sort_ws(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P = p_ref[:]
    ws = jnp.broadcast_to(wn_ref[:][:, :, None], P.shape)
    ps, ws2 = _sort_pairs_along_b(P, ws, b_axis=1)
    out_ref[:] = ws2


def k_cumsum(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P = p_ref[:]
    ws = jnp.broadcast_to(wn_ref[:][:, :, None], P.shape)
    ps, ws2 = _sort_pairs_along_b(P, ws, b_axis=1)
    out_ref[:] = _cumsum_along_b(ws2, b_axis=1)


def run3d(kern, P, wn, pad, freq):
    return pl.pallas_call(
        kern,
        grid=(R // TR, S // TS),
        in_specs=[
            pl.BlockSpec((TR, B, TS), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, B), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, B, TS), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, B, S), jnp.float32),
    )(P, wn, pad, freq)


def main():
    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.standard_normal((R, B, S)), jnp.float32)
    wn = jnp.asarray(np.abs(rng.standard_normal((R, B))), jnp.float32)
    pad = jnp.asarray(np.abs(rng.standard_normal((R, 1))), jnp.float32)
    freq = jnp.asarray(np.abs(rng.standard_normal((1, S))), jnp.float32)

    # XLA references
    order = jnp.argsort(P, axis=1)
    ps_x = jnp.take_along_axis(P, order, axis=1)
    ws_b = jnp.broadcast_to(wn[:, :, None], P.shape)
    ws_x = jnp.take_along_axis(ws_b, order, axis=1)
    c_x = jnp.cumsum(ws_x, axis=1)

    for name, kern, ref in [('sorted_ps', k_sort_ps, ps_x),
                            ('sorted_ws', k_sort_ws, ws_x),
                            ('cumsum', k_cumsum, c_x)]:
        try:
            got = run3d(kern, P, wn, pad, freq)
            diff = float(jnp.max(jnp.abs(got - ref)))
            # where does it first diverge?
            bad = np.argwhere(np.abs(np.asarray(got - ref)) > 1e-4)
            loc = bad[0].tolist() if len(bad) else None
            print(json.dumps({'stage': name, 'max_abs_diff': diff,
                              'n_bad': int(len(bad)), 'first_bad': loc}),
                  flush=True)
        except Exception as e:
            print(json.dumps({'stage': name,
                              'err': str(e).split(chr(10))[0][:150]}),
                  flush=True)


if __name__ == '__main__':
    main()
