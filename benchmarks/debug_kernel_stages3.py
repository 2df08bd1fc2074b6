"""Bisect the exact stage-0 quadrature composition."""
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
R, S = 512, 128

KERNELS = {}


def reg(name):
    def deco(f):
        KERNELS[name] = f
        return f
    return deco


@reg('sinc_f_ws')
def k1(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P = p_ref[:]
    ws = jnp.broadcast_to(wn_ref[:][:, :, None], P.shape)
    f = freq_ref[:][None, :, :]
    out_ref[:] = jnp.sum(jnp.sinc(f * ws), axis=1)


@reg('cos_term')
def k2(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P = p_ref[:]
    ws = jnp.broadcast_to(wn_ref[:][:, :, None], P.shape)
    f = freq_ref[:][None, :, :]
    out_ref[:] = jnp.sum(jnp.cos(jnp.pi * f * (2.0 * ws - ws)), axis=1)


@reg('full_sd_no_sinc')
def k3(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P = p_ref[:]
    ws = jnp.broadcast_to(wn_ref[:][:, :, None], P.shape)
    f = freq_ref[:][None, :, :]
    sd = 2.0 * ws * jnp.cos(jnp.pi * f * (2.0 * ws - ws))
    out_ref[:] = (1.0 + freq_ref[:]) * jnp.sum(P * sd, axis=1)


@reg('full_sd')
def k4(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P = p_ref[:]
    ws = jnp.broadcast_to(wn_ref[:][:, :, None], P.shape)
    f = freq_ref[:][None, :, :]
    sd = 2.0 * ws * jnp.sinc(f * ws) * jnp.cos(jnp.pi * f * (2.0 * ws - ws))
    out_ref[:] = (1.0 + freq_ref[:]) * jnp.sum(P * sd, axis=1)


@reg('one_plus_f')
def k5(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P = p_ref[:]
    out_ref[:] = (1.0 + freq_ref[:]) * jnp.sum(P, axis=1)


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
                     if ('osaic' in l or 'rror' in l)][:3]
            print(json.dumps({'kernel': name, 'ok': False, 'err': lines}),
                  flush=True)


if __name__ == '__main__':
    main()
