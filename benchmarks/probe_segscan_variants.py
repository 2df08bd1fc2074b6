"""Probe: alternative inner loops for the segcumsum Pallas kernel.

Hypotheses for why the shipped roll-based doubling scan retires at ~10% of
VPU peak (BENCH.md segcumsum section):
  H1 grid-step overhead (tested separately by sweeping rows_per_block);
  H2 jnp.roll's wraparound lane-rotate lowers expensively -> variant
     'shift' uses concat-shift with pad values instead (no wrap, and the
     pad value makes the static lane-iota mask unnecessary);
  H3 where-select chains -> variant 'fma' folds the segment-equality mask
     into a float multiply-add.

Each variant is checked against the O(n) oracle on a small input before
timing.  Timing follows the CLAUDE.md protocol: in-jit scan chaining the
full output, value-readback barriers, N-vs-1-step differencing.

Run on TPU:  python benchmarks/probe_segscan_variants.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get('FSW_SEGBENCH_N', 1 << 24))
AVG_SEG = int(os.environ.get('FSW_SEGBENCH_SEG', 32))
ITERS = int(os.environ.get('FSW_SEGBENCH_ITERS', 20))
ROWS = int(os.environ.get('FSW_SEGBENCH_ROWS', 256))
VARIANTS = os.environ.get('FSW_SEGBENCH_VARIANTS', 'roll,shift,fma').split(',')
# emulate the production max_seg_size cap: < LANES kills the row-carry scan
MAXSEG = int(os.environ.get('FSW_SEGBENCH_MAXSEG', 0))

LANES = 128


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # --- inner-loop variants -------------------------------------------
    def row_segscan_roll(vals, segs):
        lane = jax.lax.broadcasted_iota(jnp.int32, vals.shape, vals.ndim - 1)
        stride = 1
        while stride < LANES:
            shifted_v = jnp.roll(vals, stride, axis=-1)
            shifted_s = jnp.roll(segs, stride, axis=-1)
            ok = jnp.logical_and(lane >= stride, shifted_s == segs)
            vals = vals + jnp.where(ok, shifted_v, jnp.zeros_like(vals))
            stride *= 2
        return vals

    def _shift(x, stride, fill):
        pad = jnp.full(x.shape[:-1] + (stride,), fill, x.dtype)
        return jnp.concatenate([pad, x[..., :-stride]], axis=-1)

    def row_segscan_shift(vals, segs):
        stride = 1
        while stride < LANES:
            shifted_v = _shift(vals, stride, jnp.zeros((), vals.dtype))
            shifted_s = _shift(segs, stride, jnp.int32(-2))
            ok = shifted_s == segs
            vals = vals + jnp.where(ok, shifted_v, jnp.zeros_like(vals))
            stride *= 2
        return vals

    def row_segscan_fma(vals, segs):
        stride = 1
        while stride < LANES:
            shifted_v = _shift(vals, stride, jnp.zeros((), vals.dtype))
            shifted_s = _shift(segs, stride, jnp.int32(-2))
            ok = (shifted_s == segs).astype(vals.dtype)
            vals = vals + shifted_v * ok
            stride *= 2
        return vals

    SCANS = {'roll': row_segscan_roll, 'shift': row_segscan_shift,
             'fma': row_segscan_fma}

    # --- kernel shell (carry logic identical to production) ------------
    def kernel(v_ref, s_ref, out_ref, carry_v, carry_s, *, scan):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_v[0] = jnp.zeros((), v_ref.dtype)
            carry_s[0] = jnp.full((), -1, jnp.int32)

        vals = v_ref[:]
        segs = s_ref[:]
        rows = vals.shape[0]
        scanned = scan(vals, segs)

        t = scanned[:, LANES - 1:LANES]
        first_s = segs[:, 0:1]
        last_s = segs[:, LANES - 1:LANES]
        prev_last_s = jnp.roll(last_s, 1, axis=0)
        prev_t = jnp.roll(t, 1, axis=0)
        prev_single = jnp.roll(
            jnp.where(first_s == last_s, jnp.ones_like(t),
                      jnp.zeros_like(t)), 1, axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        is_row0 = pos == 0
        prev_last_s = jnp.where(is_row0,
                                jnp.full_like(prev_last_s, carry_s[0]),
                                prev_last_s)
        prev_t = jnp.where(is_row0, jnp.full_like(prev_t, carry_v[0]),
                           prev_t)
        prev_single = jnp.where(is_row0, jnp.zeros_like(prev_single),
                                prev_single)
        g = jnp.where(first_s == prev_last_s, jnp.ones_like(t),
                      jnp.zeros_like(t))
        a = g * prev_t
        b = g * prev_single
        posr = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
        stride = 1
        max_depth = (MAXSEG // LANES) if MAXSEG else rows - 1
        while stride <= min(max_depth, rows - 1):
            a_sh = jnp.roll(a, stride, axis=0)
            b_sh = jnp.roll(b, stride, axis=0)
            valid = posr >= stride
            a = a + jnp.where(valid, b * a_sh, jnp.zeros_like(a))
            b = b * jnp.where(valid, b_sh, jnp.zeros_like(b))
            stride *= 2
        scanned = scanned + jnp.where(segs == first_s, a,
                                      jnp.zeros_like(scanned))
        out_ref[:] = scanned
        carry_v[0] = scanned[rows - 1, LANES - 1]
        carry_s[0] = segs[rows - 1, LANES - 1]

    @functools.partial(jax.jit, static_argnames=('scan_name', 'rows'))
    def segcumsum(values, segment_ids, scan_name, rows=ROWS):
        n = values.shape[0]
        block = rows * LANES
        n_pad = -(-max(n, 1) // block) * block
        v = jnp.pad(values, (0, n_pad - n))
        s = jnp.pad(segment_ids.astype(jnp.int32), (0, n_pad - n),
                    constant_values=jnp.iinfo(jnp.int32).max)
        v2 = v.reshape(-1, LANES)
        s2 = s.reshape(-1, LANES)
        n_blocks = v2.shape[0] // rows
        out = pl.pallas_call(
            functools.partial(kernel, scan=SCANS[scan_name]),
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(v2.shape, values.dtype),
            scratch_shapes=[pltpu.SMEM((1,), values.dtype),
                            pltpu.SMEM((1,), jnp.int32)],
        )(v2, s2)
        return out.reshape(-1)[:n]

    # --- correctness on a small case (CPU-free: run on device) ---------
    rng = np.random.default_rng(0)
    n_small = 40000
    ids_small = np.sort(rng.integers(0, n_small // 29, n_small)).astype(np.int32)
    vals_small = rng.standard_normal(n_small).astype(np.float32)
    seg_bounds = np.flatnonzero(np.diff(ids_small)) + 1
    want = np.concatenate(
        [np.cumsum(c) for c in np.split(vals_small.astype(np.float64),
                                        seg_bounds)])

    # --- timing ---------------------------------------------------------
    ids = np.sort(rng.integers(0, N // AVG_SEG, N)).astype(np.int32)
    vals = rng.standard_normal(N).astype(np.float32)
    v = jnp.asarray(vals)
    s = jnp.asarray(ids)

    for name in VARIANTS:
        got = segcumsum(jnp.asarray(vals_small), jnp.asarray(ids_small), name)
        err = float(np.max(np.abs(np.asarray(got) - want)))
        ok = err < 1e-3
        print(json.dumps({'variant': name, 'check_max_abs_err': err,
                          'ok': ok}), flush=True)
        if not ok:
            continue

        def make(iters):
            @jax.jit
            def run(v, s):
                def body(carry, _):
                    return segcumsum(carry, s, name) * jnp.float32(3e-2), None
                c, _ = jax.lax.scan(body, v, None, length=iters)
                return jnp.sum(c[:1])
            return run
        run_n, run_1 = make(ITERS), make(1)

        def measure(run):
            float(run(v, s))
            best = float('inf')
            for _ in range(2):
                t0 = time.perf_counter()
                float(run(v, s))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (measure(run_n) - measure(run_1)) / (ITERS - 1)
        gbps = 3 * 4 * N / dt / 1e9
        print(json.dumps({'variant': name, 'rows': ROWS, 'n': N,
                          'ms': round(dt * 1e3, 3),
                          'GB_s': round(gbps, 1)}), flush=True)


if __name__ == '__main__':
    main()
