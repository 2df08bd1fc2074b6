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


class CountingJit:
    """jit wrapper with a DETERMINISTIC, monotone compile counter.

    `jax.jit(fn)._cache_size()` introspects the GLOBAL pjit cache, which
    any other code in the process can clear (`jax.clear_caches()`, cache
    eviction) -- under pytest-xdist process sharing it was observed to
    read 0 after successful jitted calls, making the "am I recompiling
    per request/batch?" observable unreliable.  This wrapper owns its
    cache: each distinct (treedef, shapes/dtypes) key is lowered +
    compiled exactly once via `jit(fn, **jit_kwargs).lower(*args)
    .compile()` and the executable is kept here, so `num_compiles`
    counts real XLA compiles and only ever increments (on a key miss).

    (The exact invalidation path behind the observed 0 was not
    reproduced in isolation -- config.update toggles and 5000-function
    global-cache pressure both left `_cache_size()` intact -- which is
    itself the argument for this wrapper: the introspective counter
    depends on internals with multiple opaque invalidation paths, the
    owned counter on none.)

    jit kwargs (e.g. donate_argnums) are forwarded; donation semantics
    are preserved by the compiled executable.
    """

    def __init__(self, fn, **jit_kwargs):
        import threading
        self._fn = fn
        self._jit_kwargs = jit_kwargs
        self._cache = {}
        self.num_compiles = 0       # monotone; += 1 per real compile
        # multithreaded serving: two threads racing a cold key must not
        # both compile (double-counts AND doubles a minutes-long remote
        # compile); executions themselves run outside the lock
        self._lock = threading.Lock()

    @staticmethod
    def _key(args):
        import jax
        leaves, treedef = jax.tree_util.tree_flatten(args)
        # full aval key incl. weak_type: a Python scalar and a
        # strong-typed jnp scalar of the same shape/dtype compile to
        # DIFFERENT executables; colliding them on one cached executable
        # would raise instead of recompiling
        def aval_key(leaf):
            a = jax.core.get_aval(leaf)
            return (a.shape, a.dtype.name, bool(a.weak_type))
        return treedef, tuple(aval_key(leaf) for leaf in leaves)

    def __call__(self, *args):
        import jax
        key = self._key(args)
        exe = self._cache.get(key)
        if exe is None:
            with self._lock:
                exe = self._cache.get(key)
                if exe is None:
                    exe = jax.jit(
                        self._fn,
                        **self._jit_kwargs).lower(*args).compile()
                    self._cache[key] = exe
                    self.num_compiles += 1
        return exe(*args)


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
