"""Compile-bisect the fused table kernel on TPU: which stage breaks Mosaic?"""
import functools
import json
import sys
import os
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fsw_gnn_tpu.ops.fsw_table_pallas import (_cumsum_along_b,
                                              _sort_pairs_along_b)

TR, B, TS = 64, 64, 128
R, S = 512, 128


def make_kernel(stage):
    def kernel(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
        P = p_ref[:]
        wn = wn_ref[:]
        ws = jnp.broadcast_to(wn[:, :, None], P.shape)
        ps = P
        if stage >= 1:
            ps, ws = _sort_pairs_along_b(P, ws, b_axis=1)
        if stage >= 2:
            c = _cumsum_along_b(ws, b_axis=1)
        else:
            c = ws
        if stage >= 3:
            pad_b = jnp.broadcast_to(pad_ref[:][:, None, :], c.shape)
            c = c + jnp.where(ps > 0, pad_b, jnp.zeros_like(c))
        f = freq_ref[:][None, :, :]
        sd = 2.0 * ws * jnp.sinc(f * ws) * jnp.cos(jnp.pi * f * (2.0 * c - ws))
        out_ref[:] = (1.0 + freq_ref[:]) * jnp.sum(ps * sd, axis=1)
    return kernel


def main():
    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.standard_normal((R, B, S)), jnp.float32)
    wn = jnp.asarray(np.abs(rng.standard_normal((R, B))), jnp.float32)
    pad = jnp.asarray(np.abs(rng.standard_normal((R, 1))), jnp.float32)
    freq = jnp.asarray(np.abs(rng.standard_normal((1, S))), jnp.float32)

    for stage in [0, 1, 2, 3]:
        try:
            out = pl.pallas_call(
                make_kernel(stage),
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
                out_specs=pl.BlockSpec((TR, TS), lambda i, j: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, S), jnp.float32),
            )(P, wn, pad, freq)
            jax.block_until_ready(out)
            print(json.dumps({'stage': stage, 'ok': True}), flush=True)
        except Exception as e:
            msg = str(e).split('\n')[0][:200]
            print(json.dumps({'stage': stage, 'ok': False, 'err': msg}),
                  flush=True)


if __name__ == '__main__':
    main()
