"""Finer compile-bisect of rank-3 Pallas ops on this TPU backend."""
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR, B, TS = 64, 64, 128
R, S = 128, 128

KERNELS = {}


def reg(name):
    def deco(f):
        KERNELS[name] = f
        return f
    return deco


@reg('sum3d')
def k_sum(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    out_ref[:] = jnp.sum(p_ref[:], axis=1)


@reg('bcast_mul')
def k_bcast(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P = p_ref[:]
    ws = jnp.broadcast_to(wn_ref[:][:, :, None], P.shape)
    out_ref[:] = jnp.sum(P * ws, axis=1)


@reg('freq_bcast')
def k_freq(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P = p_ref[:]
    f = freq_ref[:][None, :, :]
    out_ref[:] = jnp.sum(P * f, axis=1)


@reg('trig')
def k_trig(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P = p_ref[:]
    out_ref[:] = jnp.sum(jnp.cos(jnp.pi * P), axis=1)


@reg('sinc')
def k_sinc(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P = p_ref[:]
    out_ref[:] = jnp.sum(jnp.sinc(P), axis=1)


@reg('roll')
def k_roll(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P = p_ref[:]
    out_ref[:] = jnp.sum(P + jnp.roll(P, 1, axis=1), axis=1)


@reg('iota_mask')
def k_iota(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P = p_ref[:]
    pos = jax.lax.broadcasted_iota(jnp.int32, P.shape, 1)
    out_ref[:] = jnp.sum(jnp.where((pos & 4) == 0, P, -P), axis=1)


@reg('cmp_select')
def k_cmp(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P = p_ref[:]
    Q = jnp.roll(P, 1, axis=1)
    out_ref[:] = jnp.sum(jnp.where(P > Q, P, Q), axis=1)


def main():
    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.standard_normal((R, B, S)), jnp.float32)
    wn = jnp.asarray(np.abs(rng.standard_normal((R, B))), jnp.float32)
    pad = jnp.asarray(np.abs(rng.standard_normal((R, 1))), jnp.float32)
    freq = jnp.asarray(np.abs(rng.standard_normal((1, S))), jnp.float32)

    for name, kern in KERNELS.items():
        try:
            out = pl.pallas_call(
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
                out_specs=pl.BlockSpec((TR, TS), lambda i, j: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, S), jnp.float32),
            )(P, wn, pad, freq)
            jax.block_until_ready(out)
            print(json.dumps({'kernel': name, 'ok': True}), flush=True)
        except Exception as e:
            lines = [l for l in str(e).split('\n')
                     if ('Mosaic' in l or 'rror' in l or 'ERROR' in l)][:3]
            print(json.dumps({'kernel': name, 'ok': False, 'err': lines}),
                  flush=True)


if __name__ == '__main__':
    main()
