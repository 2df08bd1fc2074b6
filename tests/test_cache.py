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


def test_counting_jit_monotone_and_deterministic():
    """CountingJit: one real compile per distinct (treedef, shapes/dtypes)
    key; repeat calls hit the owned executable cache; donation preserved."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fsw_gnn_tpu.utils.cache import CountingJit

    f = CountingJit(lambda x, y: x + y)
    a = jnp.ones((4,))
    assert f.num_compiles == 0
    out = f(a, a)
    assert f.num_compiles == 1
    np.testing.assert_allclose(np.asarray(out), 2.0)
    f(a + 1, a)                      # same shapes -> cache hit
    assert f.num_compiles == 1
    f(jnp.ones((8,)), jnp.ones((8,)))   # new shape -> one more compile
    assert f.num_compiles == 2
    # different treedef (static structure) -> new key
    g = CountingJit(lambda t: t[0] + t[1])
    g((a, a))
    g((a, a))
    assert g.num_compiles == 1

    # donation is forwarded to the compiled executable
    h = CountingJit(lambda x: x * 2, donate_argnums=(0,))
    x = jnp.ones((16,))
    h(x)
    assert h.num_compiles == 1 and x.is_deleted()


def test_counting_jit_thread_safe_cold_key():
    """Two threads racing a cold key compile ONCE (double-checked lock):
    a second compile would double-count and, in production, double a
    minutes-long remote compile."""
    import threading
    import jax.numpy as jnp
    from fsw_gnn_tpu.utils.cache import CountingJit

    def slow_fn(x):
        return x * 2.0

    cj = CountingJit(slow_fn)
    xs = jnp.arange(8, dtype=jnp.float32)
    barrier = threading.Barrier(4)
    outs = [None] * 4

    def worker(i):
        barrier.wait()
        outs[i] = cj(xs)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert cj.num_compiles == 1
    for o in outs:
        assert float(o[3]) == 6.0
