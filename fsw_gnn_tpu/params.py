"""Embedding parameter generation.

Mirrors `FSW_embedding.generate_embedding_parameters`
(/root/reference/fsw_embedding.py:445-559): projection vectors are sampled
N(0,1) and row-normalized (optionally coherence-minimized), frequencies
follow one of four init schemes, bias starts at zero.  The reference always
generates in float64 then casts; here we generate in float64 when x64 is
enabled (tests) and float32 otherwise (TPU default).
"""
from __future__ import annotations

import numbers
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .embedding import FSWConfig
from .ops.coherence import minimize_mutual_coherence


def _init_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def generate_proj_vecs(key, cfg: FSWConfig, dtype=None) -> jax.Array:
    """Row-normalized random slice vectors, optionally coherence-minimized
    (fsw_embedding.py:455-489)."""
    gen_dt = _init_dtype()
    V = jax.random.normal(key, (cfg.nSlices, cfg.proj_dim), gen_dt)
    V = V / jnp.linalg.norm(V, axis=1, keepdims=True)
    if cfg.minimize_slice_coherence and cfg.nSlices > 1 and cfg.proj_dim > 0:
        V = minimize_mutual_coherence(V)
    return V.astype(dtype or gen_dt)


def generate_freqs(key, cfg: FSWConfig, dtype=None) -> jax.Array:
    """Frequency initialization, four schemes (fsw_embedding.py:492-535)."""
    gen_dt = _init_dtype()
    nF = cfg.nFreqs
    fi = cfg.freqs_init
    if nF == 0:
        freqs = jnp.zeros((0,), gen_dt)
    elif isinstance(fi, numbers.Real) and not isinstance(fi, bool):
        freqs = jnp.full((nF,), float(fi), gen_dt)
    elif isinstance(fi, tuple):
        a, b = float(fi[0]), float(fi[1])
        assert a <= b
        if nF == 1:
            freqs = jnp.full((1,), a + (b - a) / 2, gen_dt)
        else:
            freqs = a + (b - a) * (jnp.arange(nF, dtype=gen_dt) / (nF - 1))
    elif fi == 'random':
        # i.i.d. with density 1/(1+x)^2 on x >= 0, sorted ascending
        u = jnp.sort(jax.random.uniform(key, (nF,), gen_dt))
        freqs = u / (1 - u)
    elif fi == 'spread':
        # equi-probability quantiles of the same density
        u = (0.5 + jnp.arange(nF, dtype=gen_dt)) / nF
        freqs = u / (1 - u)
    else:
        raise ValueError(f'invalid freqs_init {fi!r}')
    return freqs.astype(dtype or gen_dt)


def bias_shape(cfg: FSWConfig) -> Tuple[int, ...]:
    """fsw_embedding.py:542-550 (+ collapse reshape at py:403-405)."""
    if cfg.cartesian_mode and not cfg.collapse_freqs:
        return (cfg.nSlices, cfg.nFreqs)
    if cfg.cartesian_mode and cfg.collapse_freqs:
        return (cfg.nSlices * cfg.nFreqs + cfg.total_mass_dim,)
    return (cfg.nSlices + cfg.total_mass_dim,)


def generate_params(key, cfg: FSWConfig, dtype=jnp.float32) -> dict:
    """Full parameter pytree for one FSW embedding."""
    k_proj, k_freq = jax.random.split(key)
    params = {
        'proj_vecs': generate_proj_vecs(k_proj, cfg, dtype),
        'freqs': generate_freqs(k_freq, cfg, dtype),
    }
    if cfg.enable_bias:
        params['bias'] = jnp.zeros(bias_shape(cfg), dtype)
    if cfg.encode_total_mass:
        params['total_mass_scale'] = jnp.asarray(
            cfg.total_mass_encoding_scale, dtype)
    return params
