"""Probe: explicit pltpu.emit_pipeline vs the implicit pallas_call grid
pipeline on the headline rank-kernel FORWARD.

Motivation (BENCH.md round-5 re-read): the headline step sits at ~99% of
the ADDITIVE floor t_vpu + t_hbm -- the remaining ~16% vs the max() roofline
is un-overlapped kernel IO.  The implicit Mosaic grid pipeline measured
additive (probe_fill_floor) and the parallel-grid knob was neutral.  This
probe asks whether an explicit emit_pipeline inner pipeline (which drives
its own double-buffered async copies from ANY/HBM refs) overlaps where the
implicit one does not.

Protocol: both variants jitted in ONE process, ABA-interleaved reps
(run-to-run variance on ~ms kernels is +-10-20%; same-process interleaving
is the only honest A/B -- CLAUDE.md round-5).  Steps looped inside jit with
a data dependency; one-scalar readback barriers.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import readback

import numpy as np

R = int(os.environ.get('BRK_R', 8192))
B = int(os.environ.get('BRK_B', 32))
S = int(os.environ.get('BRK_S', 128))
STEPS = int(os.environ.get('BRK_STEPS', 60))
REPS = int(os.environ.get('BRK_REPS', 5))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fsw_gnn_tpu.ops import fsw_rank_pallas as frp

    print('devices:', jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.standard_normal((R, B, S)), jnp.float32)
    w = np.abs(rng.standard_normal((R, B))).astype(np.float32)
    w_sum = w.sum(1)
    wn = jnp.asarray(w / np.maximum(w_sum, 1.0)[:, None])
    pad = jnp.asarray(np.maximum(1.0 - w_sum, 0.0) / np.maximum(w_sum, 1.0))
    freqs = jnp.asarray(np.abs(rng.standard_normal(S)) + 0.1, jnp.float32)

    S_pad = -(-S // 128) * 128
    tr = frp._pick_tile_r(B, S_pad)
    Pp, wnp, padp, freqp = frp._pad_args(P, wn, pad, freqs, tr)
    R_pad, B_pad, S_pad = Pp.shape
    print(f'tr={tr} R_pad={R_pad} B_pad={B_pad} S_pad={S_pad}', flush=True)

    # --- A: current implicit grid pipeline ---------------------------------
    def fwd_implicit(Pp, wnp, padp, freqp):
        return pl.pallas_call(
            functools.partial(frp._fwd_kernel, False),
            grid=(R_pad // tr,),
            in_specs=frp._block_specs(tr, B_pad, S_pad),
            out_specs=pl.BlockSpec((tr, S_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R_pad, S_pad), jnp.float32),
            compiler_params=frp._compiler_params(),
        )(Pp, wnp, padp, freqp)

    # --- B: explicit emit_pipeline from ANY refs ---------------------------
    # emit_pipeline's DMA slicing requires every block's lane dim to be
    # 128-aligned (Mosaic: "Slice shape along dimension 1 must be aligned
    # to tiling (128)"), so the (tr, B_pad) wn and (tr, 1) pad blocks ride
    # in 128-wide buffers and are value-sliced back inside the kernel.
    wn128 = jnp.pad(wnp, ((0, 0), (0, 128 - B_pad)))
    pad128 = jnp.pad(padp, ((0, 0), (0, 127)))

    class _Shim:
        """Ref wrapper whose reads are value-sliced to the logical width."""
        def __init__(self, ref, width):
            self.ref, self.width = ref, width

        def __getitem__(self, idx):
            return self.ref[idx][:, :self.width]

    def _inner(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
        frp._fwd_kernel(False, p_ref, _Shim(wn_ref, B_pad),
                        _Shim(pad_ref, 1), freq_ref, out_ref)

    def _outer(p_hbm, wn_hbm, pad_hbm, freq_hbm, out_hbm):
        pltpu.emit_pipeline(
            _inner,
            grid=(R_pad // tr,),
            in_specs=[
                pl.BlockSpec((tr, B_pad, S_pad), lambda i: (i, 0, 0)),
                pl.BlockSpec((tr, 128), lambda i: (i, 0)),
                pl.BlockSpec((tr, 128), lambda i: (i, 0)),
                pl.BlockSpec((1, S_pad), lambda i: (0, 0)),
            ],
            out_specs=[pl.BlockSpec((tr, S_pad), lambda i: (i, 0))],
        )(p_hbm, wn_hbm, pad_hbm, freq_hbm, out_hbm)

    def fwd_emit(Pp, wnp, padp, freqp):
        del wnp, padp
        return pl.pallas_call(
            _outer,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((R_pad, S_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=frp._vmem_limit()),
        )(Pp, wn128, pad128, freqp)

    def make_loop(fn):
        @jax.jit
        def run(Pp, wnp, padp, freqp):
            def body(carry, _):
                out = fn(Pp + carry * 1e-30, wnp, padp, freqp)
                return jnp.sum(out[0, :1]), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=STEPS)
            return c
        return run

    run_a = make_loop(fwd_implicit)
    run_b = make_loop(fwd_emit)

    # correctness first (one step each)
    oa = fwd_implicit(Pp, wnp, padp, freqp)
    ob = jax.jit(fwd_emit)(Pp, wnp, padp, freqp)
    err = float(jnp.max(jnp.abs(oa - ob)) / (jnp.max(jnp.abs(oa)) + 1e-30))
    print(f'rel err emit vs implicit: {err:.3e}', flush=True)

    for name, run in (('implicit', run_a), ('emit', run_b)):
        t0 = time.perf_counter()
        readback(run(Pp, wnp, padp, freqp))
        print(f'{name}: compile+first {time.perf_counter() - t0:.1f} s',
              flush=True)

    times = {'implicit': [], 'emit': []}
    for rep in range(REPS):
        for name, run in (('implicit', run_a), ('emit', run_b)):
            readback(run(Pp, wnp, padp, freqp))   # drain
            t0 = time.perf_counter()
            out = run(Pp, wnp, padp, freqp)
            readback(out)
            dt = (time.perf_counter() - t0) / STEPS * 1e3
            times[name].append(dt)
            print(f'rep {rep} {name}: {dt:.3f} ms/step', flush=True)

    for name, ts in times.items():
        ts = sorted(ts)
        print(f'{name}: median {ts[len(ts) // 2]:.3f} ms  all '
              f'{[round(t, 3) for t in ts]}', flush=True)


if __name__ == '__main__':
    main()
