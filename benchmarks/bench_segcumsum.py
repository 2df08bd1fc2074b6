"""Microbenchmark: segmented cumsum throughput vs the HBM roofline.

BASELINE.json metric #2.  Compares the Pallas kernel against the XLA
cumsum-minus-base formulation.  Roofline model: segcumsum reads values +
segment ids and writes results -- 3 * 4 bytes/element minimum traffic.

Run on TPU:  python benchmarks/bench_segcumsum.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get('FSW_SEGBENCH_N', 1 << 24))        # 16M elements
AVG_SEG = int(os.environ.get('FSW_SEGBENCH_SEG', 32))
ITERS = int(os.environ.get('FSW_SEGBENCH_ITERS', 20))


def main():
    import jax
    import jax.numpy as jnp
    from fsw_gnn_tpu.ops.segment import segment_cumsum
    from fsw_gnn_tpu.ops.segcumsum_pallas import segcumsum_pallas

    rng = np.random.default_rng(0)
    ids = np.sort(rng.integers(0, N // AVG_SEG, N)).astype(np.int32)
    vals = rng.standard_normal(N).astype(np.float32)
    v = jnp.asarray(vals)
    s = jnp.asarray(ids)

    def timed(fn, name):
        # steps loop INSIDE one jit with a data dependency: repeated
        # identical calls are served from a cache by the remote-execution
        # layer (observed "4353 GB/s", 5x over HBM peak), so per-call
        # timing lies
        @jax.jit
        def run(v, s):
            def body(carry, _):
                out = fn(v + carry * jnp.float32(1e-30), s)
                return jnp.sum(out[:1]), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return c
        jax.block_until_ready(run(v, s))              # compile
        t0 = time.perf_counter()
        jax.block_until_ready(run(v, s))
        dt = (time.perf_counter() - t0) / ITERS
        gbps = 3 * 4 * N / dt / 1e9
        print(json.dumps({'kernel': name, 'n': N, 'ms': round(dt * 1e3, 3),
                          'GB_s': round(gbps, 1)}))
        return jax.jit(fn)(v, s), gbps

    # method='global' IS cumsum-minus-base (the label); the default
    # 'restart' associative_scan takes pathologically long to compile at
    # 16M elements through the remote-compile tunnel (observed >65 min,
    # never finished)
    out_x, _ = timed(lambda v, s: segment_cumsum(v, s, method='global'),
                     'xla_cumsum_minus_base')
    rows_list = [int(r) for r in
                 os.environ.get('FSW_SEGBENCH_ROWS', '64').split(',')]
    out_p = None
    for rows in rows_list:
        out_p, _ = timed(lambda v, s, r=rows: segcumsum_pallas(
            v, s, rows_per_block=r), f'pallas_segscan_rows{rows}')
    err = float(jnp.max(jnp.abs(out_x - out_p)) /
                (1e-6 + float(jnp.max(jnp.abs(out_p)))))
    print(json.dumps({'max_rel_disagreement': err}))


if __name__ == '__main__':
    main()
