"""Probe: segcumsum matmul-method variants in the UNCAPPED regime.

RETRACTION (round 4, after cross-checking against bench_segcumsum's
differenced protocol): this probe's TIMING numbers do not reproduce --
its ids-variant measured 2.35 ms where bench_segcumsum measures the same
kernel at 0.63-0.73 ms, so the "mask 3x over ids" ratio reported from
here is void (the honest mask advantage is 1.10-1.19x at long segments;
see BENCH.md "Segmented cumsum" round-4).  The probe's CORRECTNESS
results stand (they arbitrate against an f64 oracle and caught the MXU
default-precision bf16 decomposition); keep it for accuracy checks, use
bench_segcumsum for timing.

Round-3 left the matmul formulation at 476 GB/s = 58% of HBM on 16M
elements with segments > 128 (BENCH.md "Segmented cumsum"); the round-3
verdict asked for the round-3 tail lessons to be applied back here.  Input
streams per element: f32 value (4B) + int32 segment id (4B) in, f32 out
(4B) = 12 B/element -> 0.234 ms floor at 819 GB/s.

Variants measured here (all method='matmul', nonnegative fill):
  ids       the production kernel (segment ids, is_end computed in-kernel)
  mask8     int8 is_end boundary mask instead of ids: 9 B/element
            (floor 0.176 ms) and the is_end compare/first/last logic
            drops out of the kernel
  packed    boundary flag in the VALUE's sign bit (values >= 0 so the
            sign bit is free): ONE f32 stream in, 8 B/element (floor
            0.156 ms).  Kernel recovers is_end = (in < 0) | (in == -0.0)
            via an integer-view sign test and v = |in|.
The packing/mask production cost is NOT in the timed region (a fused
producer gets it free; the standalone converter is one elementwise pass)
-- reported numbers are kernel-only, like the ids baseline.

Timing: CLAUDE.md protocol (in-scan chaining, one-scalar readback,
N-vs-1 differencing).

Run on TPU:  python benchmarks/probe_segcumsum_fill.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import readback

import numpy as np

N = int(os.environ.get('SEG_N', 1 << 24))
AVG_SEG = int(os.environ.get('SEG_AVG', 256))
MAX_SEG = int(os.environ.get('SEG_MAX', 2048))
ROWS = int(os.environ.get('SEG_ROWS', 1024))
ITERS = int(os.environ.get('SEG_ITERS', 20))
INTERP = os.environ.get('SEG_INTERPRET') == '1'   # CPU correctness check
LANES = 128


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fsw_gnn_tpu.ops.segcumsum_pallas import (
        _affine_carry_scan, _row_segscan_matmul, _shift_in, segcumsum_pallas)

    rng = np.random.default_rng(0)
    # segment lengths ~ Exp(avg) clipped to MAX_SEG, all > 0
    lens = np.minimum(rng.geometric(1.0 / AVG_SEG, N // 8) + 1, MAX_SEG)
    seg_ids = np.repeat(np.arange(lens.size), lens)[:N].astype(np.int32)
    if seg_ids.size < N:
        extra = np.arange(seg_ids[-1] + 1,
                          seg_ids[-1] + 1 + N - seg_ids.size)
        seg_ids = np.concatenate([seg_ids, extra.astype(np.int32)])
    vals = np.abs(rng.standard_normal(N)).astype(np.float32)

    is_end = np.empty(N, np.bool_)
    is_end[:-1] = seg_ids[1:] != seg_ids[:-1]
    is_end[-1] = True

    v_j = jnp.asarray(vals)
    s_j = jnp.asarray(seg_ids)
    m_j = jnp.asarray(is_end.astype(np.int8))
    packed = np.where(is_end, -vals, vals).astype(np.float32)
    # -0.0 for zero values at boundaries (sign bit survives)
    packed[is_end & (vals == 0.0)] = np.float32(-0.0)
    p_j = jnp.asarray(packed)

    # oracle
    want = np.empty(N, np.float64)
    acc = 0.0
    prev = -1
    v64 = vals.astype(np.float64)
    # vectorized oracle: global cumsum minus segment-start base
    cs = np.cumsum(v64)
    starts = np.zeros(N, np.int64)
    starts[1:] = np.where(seg_ids[1:] != seg_ids[:-1],
                          np.arange(1, N), 0)
    np.maximum.accumulate(starts, out=starts)
    base = np.where(starts > 0, cs[starts - 1], 0.0)
    want = cs - base

    max_stride = min(MAX_SEG, LANES)
    carry_depth = min(MAX_SEG // LANES, ROWS - 1)

    # ---------------- mask8 / packed kernel (boundary-mask driven) -------
    def _fill_base(p_full, is_end_f):
        ends = jnp.where(is_end_f > 0, p_full, jnp.zeros_like(p_full))
        base = _shift_in(ends, 1, jnp.zeros((), p_full.dtype))
        stride = 1
        while stride < max_stride:
            base = jnp.maximum(
                base, _shift_in(base, stride, jnp.zeros((), base.dtype)))
            stride *= 2
        return base

    def mask_kernel(packed_mode, v_ref, m_ref, out_ref, carry_v, carry_m):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_v[0] = jnp.zeros((), jnp.float32)
            carry_m[0] = jnp.int32(1)          # nothing chains into tile 0

        if packed_mode:
            raw = v_ref[:]
            bits = jax.lax.bitcast_convert_type(raw, jnp.int32)
            is_end_f = jnp.where(bits < 0, jnp.ones_like(raw),
                                 jnp.zeros_like(raw))
            vals = jnp.abs(raw)
        else:
            vals = v_ref[:]
            is_end_f = m_ref[:].astype(jnp.float32)
        rows = vals.shape[0]

        # full in-row prefix on the MXU.  precision='highest': the MXU's
        # DEFAULT f32 matmul is bf16-pass decomposed (measured 3.9e-3 rel
        # err on this very probe -- the round-4 finding)
        jj = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        ii = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        tri = jnp.where(jj <= ii, jnp.ones((), vals.dtype),
                        jnp.zeros((), vals.dtype))
        p_full = jax.lax.dot_general(
            vals, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=vals.dtype, precision='highest')
        # end-count prefix rides the same triangle (MXU): leading-segment
        # mask = no end strictly before the lane.  DEFAULT precision is
        # EXACT here: 0/1 inputs, integer sums <= 128 are bf16-product /
        # f32-accumulate exact
        cnt_incl = jax.lax.dot_general(
            is_end_f, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=vals.dtype)
        cnt_strict = cnt_incl - is_end_f

        base = _fill_base(p_full, is_end_f)
        scanned = p_full - base

        # inter-row carries from boundary info only:
        # g_r = no end at row r-1's last lane; m_r-1 = no end in its lanes
        # 0..126 (cnt_strict at lane 127 == 0)
        last_end = is_end_f[:, LANES - 1:LANES]
        inner_ends = cnt_strict[:, LANES - 1:LANES]
        t = scanned[:, LANES - 1:LANES]
        prev_last_end = jnp.roll(last_end, 1, axis=0)
        prev_t = jnp.roll(t, 1, axis=0)
        prev_single = jnp.roll(
            jnp.where(inner_ends == 0, jnp.ones_like(t),
                      jnp.zeros_like(t)), 1, axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        is_row0 = pos == 0
        prev_last_end = jnp.where(
            is_row0, jnp.full_like(prev_last_end,
                                   carry_m[0].astype(jnp.float32)),
            prev_last_end)
        prev_t = jnp.where(is_row0, jnp.full_like(prev_t, carry_v[0]),
                           prev_t)
        prev_single = jnp.where(is_row0, jnp.zeros_like(prev_single),
                                prev_single)
        g = 1.0 - prev_last_end
        a = g * prev_t
        b = g * prev_single
        C = _affine_carry_scan(a, b, carry_depth)
        scanned = scanned + jnp.where(cnt_strict == 0, C,
                                      jnp.zeros_like(scanned))
        out_ref[:] = scanned
        carry_v[0] = scanned[rows - 1, LANES - 1]
        carry_m[0] = is_end_f[rows - 1, LANES - 1].astype(jnp.int32)

    def run_mask(v2, m2, packed_mode):
        n_blocks = v2.shape[0] // ROWS
        return pl.pallas_call(
            functools.partial(mask_kernel, packed_mode),
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(v2.shape, jnp.float32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.float32),
                            pltpu.SMEM((1,), jnp.int32)],
            interpret=INTERP,
        )(v2, m2)

    block = ROWS * LANES
    n_pad = -(-N // block) * block
    pad = n_pad - N
    v2 = jnp.pad(v_j, (0, pad)).reshape(-1, LANES)
    m_np = np.pad(is_end.astype(np.int8), (0, pad), constant_values=1)
    m2 = jnp.asarray(m_np).reshape(-1, LANES)
    pk_np = np.pad(packed, (0, pad))
    # pad lanes are their own segments: value 0 marked as ends (-0.0)
    pk_np[N:] = np.float32(-0.0)
    p2 = jnp.asarray(pk_np).reshape(-1, LANES)

    def timed(fn, *args):
        def make(iters):
            @jax.jit
            def run(a0, *rest):
                def step(carry, _):
                    out = fn(carry, *rest)
                    return carry + 1e-30 * out, out
                c, outs = jax.lax.scan(step, a0, None, length=iters)
                return jnp.ravel(c)[0] + jnp.ravel(outs)[0]
            return run
        rn, r1 = make(ITERS), make(1)
        readback(rn(*args)); readback(r1(*args))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter(); readback(rn(*args))
            tn = time.perf_counter() - t0
            t0 = time.perf_counter(); readback(r1(*args))
            t1 = time.perf_counter() - t0
            best = min(best, (tn - t1) / (ITERS - 1))
        return best

    # correctness first (one call each).  ids at DEFAULT precision is
    # reported but not asserted: the MXU's default f32 matmul is
    # bf16-pass decomposed (the round-4 finding -- this probe originally
    # asserted it and failed at 3.9e-3)
    out_ids = np.asarray(segcumsum_pallas(
        v_j, s_j, rows_per_block=ROWS, max_seg_size=MAX_SEG,
        method='matmul', nonnegative=True, interpret=INTERP,
        precision='highest'))
    out_m = np.asarray(run_mask(v2, m2, False)).reshape(-1)[:N]
    out_p = np.asarray(run_mask(p2, m2, True)).reshape(-1)[:N]
    scale = np.maximum(1.0, np.abs(want))
    for name, got in [('ids', out_ids), ('mask8', out_m),
                      ('packed', out_p)]:
        err = float(np.max(np.abs(got - want) / scale))
        print(json.dumps({'variant': name, 'max_rel_err': f'{err:.2e}',
                          'ok': err < 1e-4}), flush=True)
        assert err < 1e-4, name
    if not INTERP:
        out_d = np.asarray(segcumsum_pallas(
            v_j, s_j, rows_per_block=ROWS, max_seg_size=MAX_SEG,
            method='matmul', nonnegative=True, precision='default'))
        err = float(np.max(np.abs(out_d - want) / scale))
        print(json.dumps({'variant': 'ids(default-precision)',
                          'max_rel_err': f'{err:.2e}',
                          'note': 'bf16-pass MXU decomposition'}),
              flush=True)

    if INTERP:
        print(json.dumps({'note': 'interpret mode: correctness only'}),
              flush=True)
        return

    results = {}
    for prec in ('default', 'highest'):
        t = timed(lambda v, p=prec: segcumsum_pallas(
            v, s_j, rows_per_block=ROWS, max_seg_size=MAX_SEG,
            method='matmul', nonnegative=True, precision=p), v_j)
        results[f'ids({prec})'] = (t, 12)
    t = timed(lambda v: segcumsum_pallas(
        v, s_j, rows_per_block=ROWS, max_seg_size=MAX_SEG,
        method='scan'), v_j)
    results['ids(scan)'] = (t, 12)
    t = timed(lambda v2_: run_mask(v2_, m2, False), v2)
    results['mask8'] = (t, 9)
    t = timed(lambda p2_: run_mask(p2_, m2, True), p2)
    results['packed'] = (t, 8)

    for name, (t, bytes_el) in results.items():
        gbs = N * bytes_el / t / 1e9
        print(json.dumps({
            'variant': name, 'ms': round(t * 1e3, 3),
            'bytes_per_el': bytes_el,
            'GBps': round(gbs, 1),
            'pct_of_hbm': round(100 * gbs / 819.0, 1),
        }), flush=True)


if __name__ == '__main__':
    main()
