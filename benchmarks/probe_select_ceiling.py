"""Probe: the REAL VPU ceiling for the rank kernel's masked select+add mix.

BENCH.md's speed-of-light model prices the rank loop at the 3.95 Tops f32
FMA bound and concludes the headline runs at ~42% of roofline, asserting
(not measuring) that "the op model overstates attainable select
throughput".  This probe measures it: kernels that are NOTHING but the
loop-body op mixes, on VMEM-resident blocks at the headline bucket shape,
so the measured time is pure VPU retirement.

Variants (per element per loop step):
  fma_anchor  acc += P * s_j                      (2 ops: the FMA peak check)
  select_add  acc += where(P < p_j, w_j, 0)       (3 ops: cmp, select, add)
  rank        exact production _rank_c loop body  (6 ops modeled: 2 cmp,
              and, or, select, add)
  fwd_tail    the forward's NON-loop math (_trig + quadrature), once per
              element (B loop steps equivalent = 1): the op model prices
              this at 25 ops, but sin/cos/round are multi-op on the VPU
  bwd_tail    the backward's non-loop math (trig + dp/dc/df chains),
              modeled at 60 ops

Each kernel repeats its loop REP times with a data dependency between
repeats (acc folded into the next repeat's operand) so XLA/Mosaic cannot
CSE them and HBM traffic is amortized to noise.  Timing per the CLAUDE.md
protocol: in-jit scan with loop-carried dependency, one-scalar readback,
N-vs-1 differencing.

Run on TPU:  python benchmarks/probe_select_ceiling.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

R = int(os.environ.get('FSW_PROBE_R', 8192))
B = int(os.environ.get('FSW_PROBE_B', 32))
S = int(os.environ.get('FSW_PROBE_S', 128))
REP = int(os.environ.get('FSW_PROBE_REP', 4))
ITERS = int(os.environ.get('FSW_PROBE_ITERS', 10))
TILE_R = int(os.environ.get('FSW_PROBE_TILE', 64))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def body_rank(P, wn, pos):
        """Exact production loop (ops/fsw_rank_pallas._rank_c)."""
        c = jnp.zeros(P.shape, P.dtype)
        for j in range(B):
            pj = P[:, j:j + 1, :]
            wj = wn[:, j:j + 1][:, :, None]
            cond = jnp.logical_or(
                pj < P, jnp.logical_and(pj == P, pos >= j))
            c = c + jnp.where(cond, wj, jnp.zeros_like(P))
        return c

    def body_select_add(P, wn, pos):
        """Minimal select chain: cmp, select, add."""
        c = jnp.zeros(P.shape, P.dtype)
        for j in range(B):
            pj = P[:, j:j + 1, :]
            wj = wn[:, j:j + 1][:, :, None]
            c = c + jnp.where(pj < P, wj, jnp.zeros_like(P))
        return c

    def body_fma_anchor(P, wn, pos):
        """Pure multiply-add chain -- should retire near the 3.95 Tops
        FMA bound if the hardware model holds."""
        c = jnp.zeros(P.shape, P.dtype)
        for j in range(B):
            wj = wn[:, j:j + 1][:, :, None]
            c = c + P * wj
        return c

    from fsw_gnn_tpu.ops.fsw_rank_pallas import TWO_PI

    def _trig_r2(ws, c, f):
        """FROZEN round-2 production trig (jnp.sin/cos + jnp.round range
        reduction, per-element sinc divide).  The live _trig has since
        changed shape AND return convention (now (sin_fw, cos_fw, sin_t,
        cos_t), no sinc) -- importing it here would silently time garbled
        math, so the old baseline is pinned locally, like _trig_poly /
        _trig_poly_magic below.  Returns (sinc_t, cos_t, sin_t, cos_fw)."""
        u_cos = 0.5 * f * (2.0 * c - ws)
        u_cos = u_cos - jnp.round(u_cos)
        ang = TWO_PI * u_cos
        sin_t, cos_t = jnp.sin(ang), jnp.cos(ang)
        x = f * ws
        u_sin = 0.5 * x
        u_sin = u_sin - jnp.round(u_sin)
        ang2 = TWO_PI * u_sin
        sin_fw, cos_fw = jnp.sin(ang2), jnp.cos(ang2)
        safe = jnp.where(x == 0.0, jnp.ones_like(x), x)
        sinc_t = jnp.where(x == 0.0, jnp.ones_like(x),
                           sin_fw / (jnp.pi * safe))
        return sinc_t, cos_t, sin_t, cos_fw

    def body_fwd_tail(P, wn, pos):
        """The forward's non-loop math: trig + quadrature (uses a fake c of
        the right shape/value class; the real c comes from the loop)."""
        ws = jnp.broadcast_to(wn[:, :, None], P.shape)
        c = 0.3 * P + ws                             # stand-in rank
        # int32 iota + astype: a float-dtype tpu.iota fails Mosaic
        # verification ('result must be vector of integer values')
        f = 0.7 + 0.001 * jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, S), 2).astype(jnp.float32)
        sinc_t, cos_t, _, _ = _trig_r2(ws, c, f)
        return (1.0 + f) * (P * (2.0 * ws * sinc_t * cos_t))

    def body_bwd_tail(P, wn, pos):
        """The backward's non-loop math: full trig + dp/dc/df chains."""
        ws = jnp.broadcast_to(wn[:, :, None], P.shape)
        c = 0.3 * P + ws
        # int32 iota + astype: a float-dtype tpu.iota fails Mosaic
        # verification ('result must be vector of integer values')
        f = 0.7 + 0.001 * jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, S), 2).astype(jnp.float32)
        g1 = 1.0 + f
        sinc_t, cos_t, sin_t, cos_fw = _trig_r2(ws, c, f)
        sd = 2.0 * ws * sinc_t * cos_t
        dp = g1 * sd
        dc = g1 * P * (-2.0 * TWO_PI) * f * ws * sinc_t * sin_t
        fsafe = jnp.where(f == 0.0, jnp.ones_like(f), f)
        phi_f = 2.0 * ws * (
            jnp.where(f == 0.0, jnp.zeros_like(f), (cos_fw - sinc_t) / fsafe)
            * cos_t
            - jnp.pi * (2.0 * c - ws) * sinc_t * sin_t)
        return dp + dc + P * sd + P * phi_f

    # ---- polynomial sincos: the trig tails measure ~7x the op model, so
    # the transcendentals are the named cost.  Hand-rolled alternative:
    # we already range-reduce to u in [-0.5, 0.5] (u -= round(u)); fold to
    # a quarter period with cheap selects (measured near-free) and apply a
    # degree-13 odd Taylor polynomial for sin(2*pi*t), t in [0, 0.25]
    # (truncation error ~9e-11 at the quarter-period edge, far under f32
    # eps; 6 FMAs + 2 muls in Horner form).
    import math
    S_COEF = tuple((-1.0) ** k * (2 * math.pi) ** (2 * k + 1)
                   / math.factorial(2 * k + 1) for k in range(7))

    def _sin2pi(u):
        """sin(2*pi*u) for u in [-0.5, 0.5] via quarter-period folding +
        odd polynomial (Horner in t^2)."""
        a = jnp.abs(u)
        t = jnp.minimum(a, 0.5 - a)          # fold: sin(2pi a)=sin(2pi t)
        t2 = t * t
        p = jnp.full_like(u, S_COEF[-1])
        for coef in S_COEF[-2::-1]:
            p = p * t2 + coef
        return jnp.sign(u) * (p * t)

    def _sincos_poly(u):
        """(sin, cos) of 2*pi*u, u already wrapped to [-0.5, 0.5]."""
        s = _sin2pi(u)
        uc = u + 0.25
        uc = uc - jnp.round(uc)
        return s, _sin2pi(uc)

    def _trig_poly(ws, c, f):
        u_cos = 0.5 * f * (2.0 * c - ws)
        u_cos = u_cos - jnp.round(u_cos)
        sin_t, cos_t = _sincos_poly(u_cos)
        x = f * ws
        u_sin = 0.5 * x
        u_sin = u_sin - jnp.round(u_sin)
        sin_fw, cos_fw = _sincos_poly(u_sin)
        safe = jnp.where(x == 0.0, jnp.ones_like(x), x)
        sinc_t = jnp.where(x == 0.0, jnp.ones_like(x),
                           sin_fw / (jnp.pi * safe))
        return sinc_t, cos_t, sin_t, cos_fw

    def body_fwd_tail_poly(P, wn, pos):
        ws = jnp.broadcast_to(wn[:, :, None], P.shape)
        c = 0.3 * P + ws
        f = 0.7 + 0.001 * jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, S), 2).astype(jnp.float32)
        sinc_t, cos_t, _, _ = _trig_poly(ws, c, f)
        return (1.0 + f) * (P * (2.0 * ws * sinc_t * cos_t))

    def body_bwd_tail_poly(P, wn, pos):
        ws = jnp.broadcast_to(wn[:, :, None], P.shape)
        c = 0.3 * P + ws
        f = 0.7 + 0.001 * jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, S), 2).astype(jnp.float32)
        g1 = 1.0 + f
        sinc_t, cos_t, sin_t, cos_fw = _trig_poly(ws, c, f)
        sd = 2.0 * ws * sinc_t * cos_t
        dp = g1 * sd
        dc = g1 * P * (-2.0 * TWO_PI) * f * ws * sinc_t * sin_t
        fsafe = jnp.where(f == 0.0, jnp.ones_like(f), f)
        phi_f = 2.0 * ws * (
            jnp.where(f == 0.0, jnp.zeros_like(f), (cos_fw - sinc_t) / fsafe)
            * cos_t
            - jnp.pi * (2.0 * c - ws) * sinc_t * sin_t)
        return dp + dc + P * sd + P * phi_f

    def body_sin_only(P, wn, pos):
        return jnp.sin(P)

    # round-to-nearest via the f32 magic constant: (x + 1.5*2^23) - 1.5*2^23
    # forces the mantissa to integer precision (valid for |x| < ~2^22,
    # round-half-to-even).  jnp.round measures ~27 FMA-equivalents on the
    # VPU; this is 2 adds.  NB a python float, NOT jnp.float32: a concrete
    # jnp scalar becomes a captured constant, which pallas_call rejects.
    MAGIC = float(1.5 * 2 ** 23)

    def _wrap_magic(u):
        return u - ((u + MAGIC) - MAGIC)

    def body_magic_round_only(P, wn, pos):
        return _wrap_magic(P)

    def _sincos_poly_magic(u):
        """(sin, cos) of 2*pi*u, u in [-0.5, 0.5], cos via one extra
        magic-wrap of u + 0.25."""
        s = _sin2pi(u)
        return s, _sin2pi(_wrap_magic(u + 0.25))

    def _trig_poly_magic(ws, c, f):
        u_cos = _wrap_magic(0.5 * f * (2.0 * c - ws))
        sin_t, cos_t = _sincos_poly_magic(u_cos)
        x = f * ws
        u_sin = _wrap_magic(0.5 * x)
        sin_fw, cos_fw = _sincos_poly_magic(u_sin)
        safe = jnp.where(x == 0.0, jnp.ones_like(x), x)
        sinc_t = jnp.where(x == 0.0, jnp.ones_like(x),
                           sin_fw / (jnp.pi * safe))
        return sinc_t, cos_t, sin_t, cos_fw

    def body_fwd_tail_poly2(P, wn, pos):
        ws = jnp.broadcast_to(wn[:, :, None], P.shape)
        c = 0.3 * P + ws
        f = 0.7 + 0.001 * jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, S), 2).astype(jnp.float32)
        sinc_t, cos_t, _, _ = _trig_poly_magic(ws, c, f)
        return (1.0 + f) * (P * (2.0 * ws * sinc_t * cos_t))

    def body_bwd_tail_poly2(P, wn, pos):
        ws = jnp.broadcast_to(wn[:, :, None], P.shape)
        c = 0.3 * P + ws
        f = 0.7 + 0.001 * jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, S), 2).astype(jnp.float32)
        g1 = 1.0 + f
        sinc_t, cos_t, sin_t, cos_fw = _trig_poly_magic(ws, c, f)
        sd = 2.0 * ws * sinc_t * cos_t
        dp = g1 * sd
        dc = g1 * P * (-2.0 * TWO_PI) * f * ws * sinc_t * sin_t
        fsafe = jnp.where(f == 0.0, jnp.ones_like(f), f)
        phi_f = 2.0 * ws * (
            jnp.where(f == 0.0, jnp.zeros_like(f), (cos_fw - sinc_t) / fsafe)
            * cos_t
            - jnp.pi * (2.0 * c - ws) * sinc_t * sin_t)
        return dp + dc + P * sd + P * phi_f

    # ---- round-3 second pass: the PRODUCTION tails (divide-free sinc
    # algebra + shared-fold sincos), imported from the kernel module so the
    # probe measures exactly what ships.
    from fsw_gnn_tpu.ops.fsw_rank_pallas import (
        _trig as _trig_prod, _freq_consts as _fc_prod, _sd as _sd_prod)

    def body_fwd_tail_new(P, wn, pos):
        ws = jnp.broadcast_to(wn[:, :, None], P.shape)
        c = 0.3 * P + ws
        f = 0.7 + 0.001 * jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, S), 2).astype(jnp.float32)
        sin_fw, _, _, cos_t = _trig_prod(ws, c, f)
        fz, c2f, _, _ = _fc_prod(f)
        sd = _sd_prod(fz, c2f, ws, sin_fw, cos_t)
        return (1.0 + f) * (P * sd)

    def body_bwd_tail_new(P, wn, pos):
        ws = jnp.broadcast_to(wn[:, :, None], P.shape)
        c = 0.3 * P + ws
        f = 0.7 + 0.001 * jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, S), 2).astype(jnp.float32)
        g1 = 1.0 + f
        sin_fw, cos_fw, sin_t, cos_t = _trig_prod(ws, c, f)
        fz, c2f, inv2f, inv_pf = _fc_prod(f)
        sd = _sd_prod(fz, c2f, ws, sin_fw, cos_t)
        dp = g1 * sd
        dc = g1 * P * (-4.0) * sin_fw * sin_t
        phi_f = inv2f * (ws * cos_fw * cos_t
                         - inv_pf * sin_fw * cos_t
                         - (2.0 * c - ws) * sin_fw * sin_t)
        return dp + dc + P * sd + P * phi_f

    # ---- round-4: the uniform_w (row-constant weight) production tails.
    # The u_sin wrap+poly chain runs once per ROW on a (TR, 1, S) operand
    # (cost / B) + a 2-op select per element.
    from fsw_gnn_tpu.ops.fsw_rank_pallas import _trig_unif as _trig_unif_prod

    def body_fwd_tail_unif(P, wn, pos):
        ws = jnp.broadcast_to(wn[:, :, None], P.shape)
        c = 0.3 * P + ws
        f = 0.7 + 0.001 * jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, S), 2).astype(jnp.float32)
        sin_fw, _, _, cos_t = _trig_unif_prod(ws, wn, c, f)
        fz, c2f, _, _ = _fc_prod(f)
        sd = _sd_prod(fz, c2f, ws, sin_fw, cos_t)
        return (1.0 + f) * (P * sd)

    def body_bwd_tail_unif(P, wn, pos):
        ws = jnp.broadcast_to(wn[:, :, None], P.shape)
        c = 0.3 * P + ws
        f = 0.7 + 0.001 * jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, S), 2).astype(jnp.float32)
        g1 = 1.0 + f
        sin_fw, cos_fw, sin_t, cos_t = _trig_unif_prod(ws, wn, c, f)
        fz, c2f, inv2f, inv_pf = _fc_prod(f)
        sd = _sd_prod(fz, c2f, ws, sin_fw, cos_t)
        dp = g1 * sd
        dc = g1 * P * (-4.0) * sin_fw * sin_t
        phi_f = inv2f * (ws * cos_fw * cos_t
                         - inv_pf * sin_fw * cos_t
                         - (2.0 * c - ws) * sin_fw * sin_t)
        return dp + dc + P * sd + P * phi_f

    def body_round_only(P, wn, pos):
        return P - jnp.round(P)

    def body_floor_only(P, wn, pos):
        return P - jnp.floor(P)

    def body_cast_round_only(P, wn, pos):
        """The PRODUCTION int-cast round (_round_wrap f32 path) isolated."""
        half = jnp.where(P >= 0, 0.5, -0.5)
        return P - (P + half).astype(jnp.int32).astype(jnp.float32)

    def body_floor_wrap_only(P, wn, pos):
        """Candidate cheaper wrap: u - floor(u + 0.5) (round-half-up)."""
        return P - jnp.floor(P + 0.5)

    def body_sincos_poly_only(P, wn, pos):
        """Just the two poly sincos pairs of the trig (incl. their wraps)."""
        u = P * 0.37
        u = u - jnp.round(u)
        s1, c1 = _sincos_poly(u)
        v = P * 0.11 + 0.05
        v = v - jnp.round(v)
        s2, c2 = _sincos_poly(v)
        return s1 * c2 + c1 * s2

    def body_bwd_arith_only(P, wn, pos):
        """The backward tail's arithmetic body with the four trig values
        replaced by cheap linear stand-ins -- isolates the non-trig cost."""
        ws = jnp.broadcast_to(wn[:, :, None], P.shape)
        c = 0.3 * P + ws
        f = 0.7 + 0.001 * jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, S), 2).astype(jnp.float32)
        g1 = 1.0 + f
        sinc_t = 0.2 * c + 0.1
        cos_t = 0.3 * c - 0.2
        sin_t = 0.1 * c + 0.4
        cos_fw = 0.25 * c
        sd = 2.0 * ws * sinc_t * cos_t
        dp = g1 * sd
        dc = g1 * P * (-2.0 * TWO_PI) * f * ws * sinc_t * sin_t
        fsafe = jnp.where(f == 0.0, jnp.ones_like(f), f)
        phi_f = 2.0 * ws * (
            jnp.where(f == 0.0, jnp.zeros_like(f), (cos_fw - sinc_t) / fsafe)
            * cos_t
            - jnp.pi * (2.0 * c - ws) * sinc_t * sin_t)
        return dp + dc + P * sd + P * phi_f

    # name -> (body, modeled ops per element-step, loop steps per element)
    BODIES = {'fma_anchor': (body_fma_anchor, 2, B),
              'select_add': (body_select_add, 3, B),
              'rank': (body_rank, 6, B),
              'fwd_tail': (body_fwd_tail, 25, 1),
              'bwd_tail': (body_bwd_tail, 60, 1),
              'sin_only': (body_sin_only, 1, 1),
              'round_only': (body_round_only, 2, 1),
              'floor_only': (body_floor_only, 2, 1),
              'sincos_poly_only': (body_sincos_poly_only, 40, 1),
              'bwd_arith_only': (body_bwd_arith_only, 35, 1),
              'fwd_tail_poly': (body_fwd_tail_poly, 25, 1),
              'bwd_tail_poly': (body_bwd_tail_poly, 60, 1),
              'magic_round_only': (body_magic_round_only, 3, 1),
              'fwd_tail_poly2': (body_fwd_tail_poly2, 25, 1),
              'bwd_tail_poly2': (body_bwd_tail_poly2, 60, 1),
              'fwd_tail_new': (body_fwd_tail_new, 20, 1),
              'bwd_tail_new': (body_bwd_tail_new, 45, 1),
              'fwd_tail_unif': (body_fwd_tail_unif, 12, 1),
              'bwd_tail_unif': (body_bwd_tail_unif, 37, 1),
              'cast_round_only': (body_cast_round_only, 5, 1),
              'floor_wrap_only': (body_floor_wrap_only, 3, 1)}
    only = os.environ.get('FSW_PROBE_ONLY')
    if only:
        BODIES = {k: v for k, v in BODIES.items()
                  if k in only.split(',')}

    # numeric check of the polynomial against f64 numpy on the host
    uu = np.linspace(-0.5, 0.5, 100001).astype(np.float32)
    tt = np.minimum(np.abs(uu), 0.5 - np.abs(uu)).astype(np.float32)
    p = np.full_like(tt, np.float32(S_COEF[-1]))
    for coef in S_COEF[-2::-1]:
        p = p * (tt * tt) + np.float32(coef)
    approx = np.sign(uu) * p * tt
    err = np.max(np.abs(approx - np.sin(2 * np.pi * uu.astype(np.float64))))
    print(json.dumps({'poly_sin_max_abs_err_f32': f'{err:.2e}'}), flush=True)

    def make_kernel(body):
        def kernel(p_ref, wn_ref, out_ref):
            P = p_ref[:]
            wn = wn_ref[:]
            TR = P.shape[0]
            pos = jax.lax.broadcasted_iota(jnp.int32, (TR, B, S), 1)
            acc = jnp.zeros((TR, S), P.dtype)
            for r in range(REP):
                c = body(P, wn, pos)
                acc = acc + jnp.sum(c, axis=1)
                # data dependency so repeats cannot be CSE'd; the scale
                # keeps P's compare outcomes unchanged in practice
                P = P + 1e-30 * c
            out_ref[:] = acc
        return kernel

    @functools.partial(jax.jit, static_argnames=('name',))
    def run_probe(P, wn, name):
        body = BODIES[name][0]
        return pl.pallas_call(
            make_kernel(body),
            grid=(R // TILE_R,),
            in_specs=[
                pl.BlockSpec((TILE_R, B, S), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_R, B), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_R, S), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, S), P.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(P, wn)

    rng = np.random.default_rng(0)
    P0 = jnp.asarray(rng.standard_normal((R, B, S)), jnp.float32)
    wn0 = jnp.asarray(rng.random((R, B)), jnp.float32)

    results = {}
    for name, (body, ops_per, steps_per_el) in BODIES.items():
        def make(iters):
            @jax.jit
            def run(P, wn):
                def step(carry, _):
                    out = run_probe(carry, wn, name)
                    # chain the output into the next step's input
                    return carry + 1e-30 * out[:, None, :], out
                c, outs = jax.lax.scan(step, P, None, length=iters)
                return jnp.ravel(c)[0] + jnp.ravel(outs)[0]
            return run
        run_n, run_1 = make(ITERS), make(1)

        def measure(run):
            float(run(P0, wn0))               # compile + drain
            best = float('inf')
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(P0, wn0))           # readback barrier
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (measure(run_n) - measure(run_1)) / (ITERS - 1)
        el_steps = R * B * S * steps_per_el * REP   # element-steps per call
        ops = el_steps * ops_per
        tops = ops / dt / 1e12
        el_steps_per_s = el_steps / dt
        results[name] = el_steps_per_s
        print(json.dumps({
            'variant': name, 'ms': round(dt * 1e3, 3),
            'modeled_ops_per_el_step': ops_per,
            'tops_at_model': round(tops, 3),
            'el_loop_steps_per_s': f'{el_steps_per_s:.3e}',
            'pct_of_fma_bound': round(100 * tops / 3.95, 1),
        }), flush=True)

    if 'rank' in results:
        print(json.dumps({
            'summary': 'measured rank-loop retirement',
            'rank_el_steps_per_s': f'{results["rank"]:.4e}',
            'note': 'bench.py MEASURED_RANK_STEPS_PER_S should equal '
                    'rank_el_steps_per_s',
        }), flush=True)


if __name__ == '__main__':
    main()
