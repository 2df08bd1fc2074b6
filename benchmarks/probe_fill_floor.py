"""Probe: where does the boundary-mask segcumsum's time actually go?

Round-5 closure of the "70% of HBM" segcumsum target (VERDICT r4 item 4).
The GPU decoupled-lookback structure does not transplant: its entire
purpose is to break inter-BLOCK serialization on a parallel grid, and the
TPU kernel's grid is already sequential on one core with the cross-tile
carry resolved for free in SMEM -- there is no inter-tile latency to
hide, so a two-kernel totals-then-lookback split only ADDS an 8 B/el
HBM round-trip for the published totals.  What remains in-tile is the
question: is the wall the lane-shift fill/carry chain (communication),
the 'highest'-precision MXU triangle (compute), or the stream (DMA)?

This probe ablates the mask kernel into nested subsets, all at the
production tile (rows_per_block=1024, 16M elements):

  io        in->out copy through VMEM (v + mask)       : DMA floor
  mxu_only  io + both triangular matmuls               : + MXU cost
  nofill    mxu_only + carry scan + selects (base=0)   : + carry cost
  full      the real kernel (fill-forward included)    : + fill cost
  fill1/fill7  pure k-pass shift+max ladders           : per-pass price

The pairwise differences price each stage; the sum of the stage floors is
the honest speed-of-light for THIS formulation, replacing the bandwidth-
only 70% framing.  Results land in BENCH.md.

Run on TPU:  python benchmarks/probe_fill_floor.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get('FSW_SEGBENCH_N', 1 << 24))
AVG_SEG = int(os.environ.get('FSW_SEGBENCH_SEG', 4096))
ITERS = int(os.environ.get('FSW_SEGBENCH_ITERS', 20))
ROWS = int(os.environ.get('FSW_SEGBENCH_ROWS', 1024))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fsw_gnn_tpu.ops.segcumsum_pallas import (
        LANES, _affine_carry_scan, _fill_base_ends, segment_boundaries)
    from fsw_gnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    ids = np.sort(rng.integers(0, N // AVG_SEG, N)).astype(np.int32)
    vals = np.abs(rng.standard_normal(N)).astype(np.float32)
    max_seg = int(np.max(np.bincount(ids)))
    print(json.dumps({'n': N, 'avg_seg': AVG_SEG, 'max_seg': max_seg,
                      'rows': ROWS}), flush=True)

    v = jnp.asarray(vals).reshape(-1, LANES)
    m = np.asarray(segment_boundaries(jnp.asarray(ids))).reshape(-1, LANES)
    m = jnp.asarray(m)
    n_blocks = v.shape[0] // ROWS

    def kernel(v_ref, m_ref, out_ref, carry_v, carry_m, *, ablate,
               max_seg_size, fill_passes=0, precision='highest'):
        """Ablatable copy of ops.segcumsum_pallas._segcumsum_mask_kernel
        (probe harness only -- the library kernel is the source of
        truth; this copy exists so stages can be cut without polluting
        the production code path)."""
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_v[0] = jnp.zeros((), v_ref.dtype)
            carry_m[0] = jnp.int32(1)

        vals = v_ref[:]
        is_end_f = m_ref[:].astype(vals.dtype)
        rows = vals.shape[0]
        if ablate == 'io':
            out_ref[:] = vals + is_end_f
            carry_v[0] = vals[rows - 1, LANES - 1]
            return
        if ablate.startswith('fill'):
            # pure shift+max ladder: fill_passes passes over the tile
            base = vals
            stride = 1
            for _ in range(fill_passes):
                pad = jnp.zeros(base.shape[:-1] + (stride,), base.dtype)
                base = jnp.maximum(
                    base, jnp.concatenate([pad, base[..., :-stride]],
                                          axis=-1))
                stride *= 2
            out_ref[:] = base + is_end_f
            carry_v[0] = base[rows - 1, LANES - 1]
            return
        max_stride = min(max_seg_size, LANES)
        jj = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        ii = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        tri = jnp.where(jj <= ii, jnp.ones((), vals.dtype),
                        jnp.zeros((), vals.dtype))
        if precision == 'bf16x3':
            # the tri operand is EXACTLY bf16-representable (0/1), so a
            # 3-term lossless bf16 split of vals (8+8+8 mantissa bits
            # >= f32's 24) gives the full product in 3 native MXU
            # passes instead of 'highest''s 6; per-pass f32
            # accumulation, same error class as 'highest' (eps x
            # in-row prefix).  Mosaic rejects precision=HIGH, hence
            # the manual decomposition.
            tri_b = tri.astype(jnp.bfloat16)
            b0 = vals.astype(jnp.bfloat16)
            r1 = vals - b0.astype(vals.dtype)
            b1 = r1.astype(jnp.bfloat16)
            b2 = (r1 - b1.astype(vals.dtype)).astype(jnp.bfloat16)
            dims = (((1,), (0,)), ((), ()))
            p_full = (jax.lax.dot_general(
                b0, tri_b, dims, preferred_element_type=vals.dtype)
                + jax.lax.dot_general(
                    b1, tri_b, dims, preferred_element_type=vals.dtype)
                + jax.lax.dot_general(
                    b2, tri_b, dims, preferred_element_type=vals.dtype))
        else:
            p_full = jax.lax.dot_general(
                vals, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=vals.dtype, precision=precision)
        cnt_incl = jax.lax.dot_general(
            is_end_f, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=vals.dtype)
        cnt_strict = cnt_incl - is_end_f
        if ablate == 'mxu_only':
            out_ref[:] = p_full + cnt_strict
            carry_v[0] = p_full[rows - 1, LANES - 1]
            return
        if ablate == 'full':
            scanned = p_full - _fill_base_ends(p_full, is_end_f, max_stride)
        else:                                   # 'nofill': base = 0
            scanned = p_full
        last_end = is_end_f[:, LANES - 1:LANES]
        inner_ends = cnt_strict[:, LANES - 1:LANES]
        t = scanned[:, LANES - 1:LANES]
        prev_last_end = jnp.roll(last_end, 1, axis=0)
        prev_t = jnp.roll(t, 1, axis=0)
        prev_single = jnp.roll(
            jnp.where(inner_ends == 0, jnp.ones_like(t), jnp.zeros_like(t)),
            1, axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        is_row0 = pos == 0
        prev_last_end = jnp.where(
            is_row0, jnp.full_like(prev_last_end,
                                   carry_m[0].astype(vals.dtype)),
            prev_last_end)
        prev_t = jnp.where(is_row0, jnp.full_like(prev_t, carry_v[0]),
                           prev_t)
        prev_single = jnp.where(is_row0, jnp.zeros_like(prev_single),
                                prev_single)
        g = 1.0 - prev_last_end
        C = _affine_carry_scan(g * prev_t, g * prev_single,
                               min(max_seg_size // LANES, rows - 1))
        scanned = scanned + jnp.where(cnt_strict == 0, C,
                                      jnp.zeros_like(scanned))
        out_ref[:] = scanned
        carry_v[0] = scanned[rows - 1, LANES - 1]
        carry_m[0] = is_end_f[rows - 1, LANES - 1].astype(jnp.int32)

    def build(ablate, fill_passes=0, rows=ROWS, precision='highest'):
        return pl.pallas_call(
            functools.partial(kernel, ablate=ablate,
                              max_seg_size=max_seg,
                              fill_passes=fill_passes,
                              precision=precision),
            grid=(v.shape[0] // rows,),
            in_specs=[pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            scratch_shapes=[pltpu.SMEM((1,), v.dtype),
                            pltpu.SMEM((1,), jnp.int32)],
            interpret=os.environ.get('FSW_PROBE_INTERPRET') == '1',
        )

    def timed(fn, name):
        def make(iters):
            @jax.jit
            def run(v, m):
                def body(carry, _):
                    return fn(carry, m) * jnp.float32(3e-2), None
                c, _ = jax.lax.scan(body, v, None, length=iters)
                return jnp.sum(c[:1, :1])
            return run
        run_n, run_1 = make(ITERS), make(1)

        def measure(run):
            float(run(v, m))
            best = float('inf')
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(v, m))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (measure(run_n) - measure(run_1)) / (ITERS - 1)
        print(json.dumps({'ablate': name, 'ms': round(dt * 1e3, 3),
                          'GB_s_9B': round(9 * N / dt / 1e9, 1)}),
              flush=True)
        return dt

    results = {}
    if os.environ.get('FSW_PROBE_PHASE', '1') == '1':
        for name, fp in [('io', 0), ('fill1', 1), ('fill7', 7),
                         ('mxu_only', 0), ('nofill', 0), ('full', 0)]:
            results[name] = timed(build(name, fp), name)
    else:
        # phase 2: (a) precision='high' (3-pass bf16) for the value
        # triangle -- the tri operand is EXACTLY bf16-representable
        # (0/1), so fewer passes may already be f32-exact; verified
        # ON HW against the 'highest' result, never in interpret mode
        # (the round-4 MXU trap); (b) rows ladder for DMA/compute
        # overlap (stage costs measured ADDITIVE at rows=1024).
        full_hi = build('full', 0, ROWS, 'highest')
        full_h = build('full', 0, ROWS, 'bf16x3')
        a = full_hi(v, m)
        b = full_h(v, m)
        err = float(jnp.max(jnp.abs(a - b)))
        rel = float(jnp.max(jnp.abs(a - b) / (1.0 + jnp.abs(a))))
        print(json.dumps({'bf16x3_vs_highest_max_abs': err,
                          'max_rel': rel, 'exact': err == 0.0}),
              flush=True)
        results['full_highest'] = timed(full_hi, 'full_highest')
        results['full_bf16x3'] = timed(full_h, 'full_bf16x3')
        for rows in (256, 512):
            results[f'full_rows{rows}'] = timed(
                build('full', 0, rows), f'full_rows{rows}')
            results[f'io_rows{rows}'] = timed(
                build('io', 0, rows), f'io_rows{rows}')
        print(json.dumps({k: round(t * 1e3, 3)
                          for k, t in results.items()}), flush=True)
        return

    d = {k: results[k] * 1e3 for k in results}
    print(json.dumps({
        'stage_ms': {
            'dma_io': round(d['io'], 3),
            'mxu_triangles': round(d['mxu_only'] - d['io'], 3),
            'carry_selects': round(d['nofill'] - d['mxu_only'], 3),
            'fill_forward': round(d['full'] - d['nofill'], 3),
            'per_shiftmax_pass': round((d['fill7'] - d['fill1']) / 6, 4),
        },
        'full_ms': round(d['full'], 3),
        'hbm_floor_ms': round(9 * N / 819e9 * 1e3, 3),
    }, indent=1), flush=True)


if __name__ == '__main__':
    main()
