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
        # Timing protocol (hard-won, round 2): (1) steps looped INSIDE one
        # jit (25 ms dispatch per call) with the FULL output chained as the
        # scan carry (anything less can be simplified away); (2) every
        # timed region starts from a DRAINED queue and ends with a VALUE
        # READBACK (float(...)): under a non-empty remote pipeline
        # block_until_ready returns immediately (observed "22 TB/s"), so a
        # readback is the only trustworthy completion barrier; (3) never
        # run two TPU processes at once -- contention produces silent
        # garbage timings, not queuing.  Dispatch overhead (~25 ms) is
        # removed by differencing a 1-step call.
        # The 3e-2 rescale keeps ITERS self-applications of cumsum finite.
        def make(iters):
            @jax.jit
            def run(v, s):
                def body(carry, _):
                    return fn(carry, s) * jnp.float32(3e-2), None
                c, _ = jax.lax.scan(body, v, None, length=iters)
                return jnp.sum(c[:1])
            return run
        run_n, run_1 = make(ITERS), make(1)

        def measure(run):
            float(run(v, s))                       # compile + drain
            best = float('inf')
            for _ in range(2):
                t0 = time.perf_counter()
                float(run(v, s))                   # readback barrier
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (measure(run_n) - measure(run_1)) / (ITERS - 1)
        gbps = 3 * 4 * N / dt / 1e9
        print(json.dumps({'kernel': name, 'n': N, 'ms': round(dt * 1e3, 3),
                          'GB_s': round(gbps, 1)}))
        return jax.jit(fn)(v, s), gbps

    # method='global' IS cumsum-minus-base (the label); the default
    # 'restart' associative_scan takes pathologically long to compile at
    # 16M elements through the remote-compile tunnel (observed >65 min,
    # never finished).  FSW_SEGBENCH_SKIP_XLA=1 skips the control (kernel
    # ladder runs only; disagreement check vs the first pallas variant).
    skip_xla = os.environ.get('FSW_SEGBENCH_SKIP_XLA') == '1'
    out_x = None
    if not skip_xla:
        out_x, _ = timed(lambda v, s: segment_cumsum(v, s, method='global'),
                         'xla_cumsum_minus_base')
    rows_list = [int(r) for r in
                 os.environ.get('FSW_SEGBENCH_ROWS', '1024').split(',')]
    # honest static bound on the longest segment (the reference computes the
    # same bound from the data when absent, fsw_embedding.py:2812-2820)
    max_seg = int(np.max(np.bincount(ids)))
    print(json.dumps({'max_seg_size': max_seg}))
    out_p = None
    # FSW_SEGBENCH_VARIANTS: comma-set from {scan, scan_capped, matmul,
    # matmul_nonneg, matmul_capped}; matmul_* are the one-pass MXU
    # formulation (triangular matmul + fill-forward), _nonneg the
    # running-max fill (values are abs()'d by the harness for honesty).
    variants = os.environ.get(
        'FSW_SEGBENCH_VARIANTS', 'scan,scan_capped').split(',')
    for rows in rows_list:
        if 'scan' in variants:
            out_p, _ = timed(lambda v, s, r=rows: segcumsum_pallas(
                v, s, rows_per_block=r), f'pallas_segscan_rows{rows}')
        if 'scan_capped' in variants:
            out_p, _ = timed(lambda v, s, r=rows: segcumsum_pallas(
                v, s, rows_per_block=r, max_seg_size=max_seg),
                f'pallas_segscan_rows{rows}_capped')
        if 'matmul' in variants:
            out_p, _ = timed(lambda v, s, r=rows: segcumsum_pallas(
                v, s, rows_per_block=r, method='matmul'),
                f'pallas_matmul_rows{rows}')
        if 'matmul_capped' in variants:
            out_p, _ = timed(lambda v, s, r=rows: segcumsum_pallas(
                v, s, rows_per_block=r, method='matmul',
                max_seg_size=max_seg), f'pallas_matmul_rows{rows}_capped')
        if 'matmul_nonneg' in variants:
            v = jnp.abs(v)                  # honesty: the fill is max-based
            out_p, _ = timed(lambda v, s, r=rows: segcumsum_pallas(
                v, s, rows_per_block=r, method='matmul', nonnegative=True),
                f'pallas_matmul_nonneg_rows{rows}')
            if not skip_xla:
                out_x, _ = timed(
                    lambda v, s: segment_cumsum(v, s, method='global'),
                    'xla_cumsum_minus_base_nonneg')
        if 'mask' in variants:
            # round-4 boundary-mask kernel: the int8 is_end mask is
            # STATIC segment structure, precomputed outside the timed
            # region (the production contract -- see segcumsum_pallas)
            from fsw_gnn_tpu.ops.segcumsum_pallas import segment_boundaries
            v = jnp.abs(v)
            m = segment_boundaries(s)
            prec = os.environ.get('FSW_SEGBENCH_PRECISION', 'highest')
            out_p, _ = timed(lambda v, s, r=rows, m=m: segcumsum_pallas(
                v, None, rows_per_block=r, nonnegative=True, boundaries=m,
                precision=prec),
                f'pallas_mask_rows{rows}_{prec}')
    if out_x is None:                        # kernel-only run: cross-check
        out_x = jax.jit(lambda v, s: segcumsum_pallas(v, s))(v, s)
    err = float(jnp.max(jnp.abs(out_x - out_p)) /
                (1e-6 + float(jnp.max(jnp.abs(out_p)))))
    print(json.dumps({'max_rel_disagreement': err}))


if __name__ == '__main__':
    main()
