"""Persistent compilation cache helper."""
import os

import jax
import jax.numpy as jnp

from fsw_gnn_tpu.utils import enable_compilation_cache


def test_compilation_cache_persists_entries(tmp_path):
    d = enable_compilation_cache(str(tmp_path / 'xla'),
                                 min_compile_time_secs=0.0)
    try:
        @jax.jit
        def f(x):
            return jnp.sin(x) @ jnp.cos(x).T

        f(jnp.ones((64, 64))).block_until_ready()
        entries = os.listdir(d)
        assert entries, 'no cache entries written'
    finally:
        jax.config.update('jax_compilation_cache_dir', None)
