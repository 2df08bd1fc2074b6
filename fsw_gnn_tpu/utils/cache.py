"""Persistent XLA compilation cache.

TPU compiles of the FSW kernels take minutes (the fused rank kernels'
unrolled loops are large Mosaic modules; through a remote-compile tunnel,
2-7 minutes per jit).  JAX can persist compiled executables on disk so
every process after the first pays ~nothing for an identical
(shape, dtype, config) program.  This helper turns that on with sane
defaults; it is also exposed as `fsw-gnn-tpu --compilation-cache DIR` and
`TrainConfig(compilation_cache=...)`.

Equivalent environment knob: JAX_COMPILATION_CACHE_DIR=<dir>.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = '~/.cache/fsw_gnn_tpu_xla',
                             min_compile_time_secs: float = 1.0) -> str:
    """Enable JAX's persistent compilation cache at `path` (created if
    missing).  Only programs whose compile took >= `min_compile_time_secs`
    are persisted (skips trivially recompilable ops).  Returns the
    resolved path."""
    import jax

    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      float(min_compile_time_secs))
    # cache everything above the time threshold, not only "expensive" ops
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    return path
