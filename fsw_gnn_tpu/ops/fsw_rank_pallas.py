"""Fused FSW neighborhood aggregation via weighted ranks (Pallas TPU).

The TPU-native replacement for the reference's native hot primitive (the
CUDA segmented scan driving its sort/cumsum pipeline,
/root/reference/fsw_embedding.cu:35-117 + fsw_embedding.py:1005-1110).

Key reformulation: the FSW quadrature needs, per table entry i of a
neighborhood, only the *inclusive weighted rank*

    c_i = sum_j wn_j * M_ij,
    M_ij = 1[p_j < p_i  or  (p_j == p_i and j <= i)]

which equals the inclusive cumsum of weights in (stable-)sorted projection
order -- WITHOUT materializing the sort.  The aggregation is then order-free:

    out[r, s] = (1 + f_s) * sum_i p_i * phi(wn_i, c_i + pad_r * 1[p_i > 0])
    phi(w, c) = 2 w sinc(f w) cos(pi f (2c - w))

Forward and backward are both B-step masked reductions over the bucket axis
(B = neighbor-table width), fully VMEM-resident: HBM traffic is one read of
the gathered projections (R, B, S) + tiny side arrays, one write of (R, S).
No sort, no unsort-by-sort, no scatters -- the round-1 bottlenecks.

Analytic backward (same loop with the transposed mask):
    dp_i   = g (1+f) phi_i                      (mask constant a.e.)
    dc_i   = g (1+f) p_i phi_c(w_i, c_i),  phi_c = -4 pi f w sinc(fw) sinA
    dwn_j  = g (1+f) p_j phi_w(w_j, c_j) + sum_i dc_i M_ij
             phi_w = 2 cos(pi f w) cosA + 2 pi f w sinc(fw) sinA
    dpad_r = sum_{i,s} dc_i 1[p_i > 0]
    df_s   = sum_r g [ q + (1+f) sum_i p_i phi_f ],   q = sum_i p_i phi_i
             phi_f = 2w [ (cos(pi f w) - sinc(fw)) / f cosA
                          - pi (2c - w) sinc(fw) sinA ]        (0 at f = 0)
    with A = pi f (2c - w).

Grid: 1-D over recipient tiles, the full (padded) slice axis in lanes, so
dwn/dpad are per-tile outputs and df accumulates over consecutive grid
steps (Pallas output-revisiting needs consecutive visits).

Mosaic notes (round-1 hard-won): rank-3 f32 operands OK; static middle-axis
slicing OK; boolean conditions fine via i1 logical ops, but SELECT branches
must be float (no bool-valued rank-3 where); explicit mod-1 range reduction
before sin/cos (VPU transcendentals lose accuracy at large arguments); iota
via broadcasted_iota.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


TWO_PI = 2.0 * jnp.pi


def _masked(P, pj, pos, j, val):
    """where(M_ij, val, 0) with M_ij = 1[p_j < p_i or (p_j == p_i and
    j <= i)].  Folding the payload into the select (instead of forming the
    0/1 mask and multiplying) saves one VPU multiply per element per loop
    step -- the loop body is the kernel's op-count floor."""
    cond = jnp.logical_or(
        pj < P, jnp.logical_and(pj == P, pos >= j))
    return jnp.where(cond, val, jnp.zeros_like(P))


def _rank_c(P, wn, pos):
    """c[:, i, :] = sum_j wn_j * M_ij via a static B-step loop."""
    B = P.shape[1]
    c = jnp.zeros(P.shape, P.dtype)
    for j in range(B):
        pj = P[:, j:j + 1, :]                        # (TR, 1, S) static slice
        # NOTE: two-step indexing, NOT wn[:, j:j+1, None] -- mixing a slice
        # with None takes jnp's advanced-indexing path and emits a GATHER,
        # which Mosaic's lowering rejects (hit on HW)
        wj = wn[:, j:j + 1][:, :, None]              # (TR, 1, 1)
        c = c + _masked(P, pj, pos, j, wj)
    return c


# ---- f32 fast trig (measured, benchmarks/probe_select_ceiling.py) ----
# The VPU's jnp.sin/cos/round are multi-op sequences: sin measures ~120
# FMA-equivalents, round ~27.  Since we already range-reduce to one period,
# both are replaceable by cheap exact-shape primitives:
#   * round-to-nearest via floor(u + 0.5) (measured wrap ladder in
#     _round_wrap's docstring: 1.43x the int-cast form, ~equal to bare
#     floor).  NOT the classic magic-constant trick
#     (u + 1.5*2^23) - 1.5*2^23: XLA's algebraic simplifier folds that to
#     u under jit (measured -- eager correct, jit returns u), so it
#     silently breaks everywhere outside the Mosaic lowering (and it
#     measured no faster than the int round anyway).  Ties round half-up
#     (vs jnp.round's half-even); immaterial here because a tie puts the
#     wrapped argument at exactly +/-0.5 period where sin2pi is 0 from
#     both directions.
#   * sin(2*pi*u), u in [-0.5, 0.5]: fold to the quarter period with
#     |.|/min/sign (near-free selects) + a degree-13 odd Taylor polynomial
#     in Horner form (6 FMA + 2 mul; max abs err 1.95e-7 ~ 1.6 f32 ulp,
#     checked against f64 numpy in the probe and tests).
# f64 (interpret-mode parity tests) keeps the exact jnp path: the poly's
# truncation error (~9e-11) would break the machine-eps oracle tests, and
# f64 never runs on the TPU hot path.
_SIN_COEF = tuple(
    (-1.0) ** k * (2.0 * math.pi) ** (2 * k + 1)
    / float(math.factorial(2 * k + 1)) for k in range(7))


def _round_wrap(u):
    """u - round-to-nearest(u); the f32 path uses floor(u + 0.5).

    Probe ladder for the wrap alone (probe_select_ceiling, 134M elements):
    int-cast round (select/add/fptosi/sitofp) 1.23 ms; floor-based 0.86 ms
    (1.43x); bare floor 0.74 ms; jnp.round and the magic-constant trick
    both ~0.90 ms.  floor(u + 0.5) also drops the int32 |u| < 2^30
    validity limit and, unlike the magic-constant form, survives XLA's
    algebraic simplifier (floor is not algebraically removable), so the
    same expression is correct under jit/interpret AND Mosaic.  Ties round
    half-UP (vs the old half-away): immaterial, a tie puts the wrapped
    argument at exactly -/+0.5 period where sin2pi is 0 from both sides.
    """
    if u.dtype == jnp.float32:
        return u - jnp.floor(u + 0.5)
    return u - jnp.round(u)


def _poly_quarter(t):
    """sin(2*pi*t) for t already in [-0.25, 0.25]: bare odd Horner poly
    (no fold -- the callers' shift identities land the argument here)."""
    t2 = t * t
    p = jnp.full_like(t, _SIN_COEF[-1])
    for coef in _SIN_COEF[-2::-1]:
        p = p * t2 + coef
    return p * t


def _sin2pi_poly(u):
    """sin(2*pi*u) for u in [-0.5, 0.5]: quarter-period fold + odd poly."""
    a = jnp.abs(u)
    return jnp.sign(u) * _poly_quarter(jnp.minimum(a, 0.5 - a))


def _sincos2pi(u):
    """(sin, cos) of 2*pi*u with u already wrapped to [-0.5, 0.5].

    f32 shares ONE |u| between both branches and never re-wraps:
      cos(2*pi*u) = sin(2*pi*(1/4 - |u|)),        1/4 - |u| in [-1/4, 1/4]
      sin(2*pi*u) = sgn(u) sin(2*pi*(1/4 - ||u| - 1/4|))
    (shift identities; both arguments land in the poly's quarter period
    directly).  This drops the cos path's extra _round_wrap -- including
    its int32 round-trip -- and the min/sign fold of the old
    double-_sin2pi_poly formulation; exact zeros at u in {0, +/-1/2} (sin)
    and +/-1/4 (cos) are preserved by construction (t is exactly 0 there).
    Accuracy caveat: the shared fold t = 1/4 - ||u| - 1/4| quantizes tiny
    arguments to ulp(0.25) (|u| below ~2^-27 is absorbed entirely), so
    sin's RELATIVE accuracy holds only down to |u| ~ 1e-7; below that the
    error is absolute, ~ulp(0.25)*2pi ~ 5e-8 (the old min(a, 0.5-a) fold
    was exactly relative there).  Immaterial for normalized edge weights
    and for sd = (2/(pi f)) sin_fw at production f ranges; exact zeros
    still map to exact zeros.
    Either half is independently dead-code-eliminable when a kernel only
    consumes one of the pair."""
    if u.dtype == jnp.float32:
        a = jnp.abs(u)
        cos = _poly_quarter(0.25 - a)
        sin_mag = _poly_quarter(0.25 - jnp.abs(a - 0.25))
        sin = jnp.where(u < 0.0, -sin_mag, sin_mag)
        return sin, cos
    ang = TWO_PI * u
    return jnp.sin(ang), jnp.cos(ang)


def _trig(ws, c, f):
    """Range-reduced raw trig pieces shared by fwd/bwd.

    Returns (sin_fw, cos_fw, sin_t, cos_t):
      sin_fw = sin(pi f w); cos_fw = cos(pi f w); sin_t = sin A;
      cos_t = cos A, with A = pi f (2c - w).

    No sinc and no per-element divide: every sinc occurrence in the FSW
    quadrature carries a factor that cancels the 1/(pi f w) denominator --
      phi      = 2 w sinc(f w) cos A       = (2/(pi f)) sin(pi f w) cos A
      dphi/dc  = -4 pi f w sinc(f w) sin A = -4 sin(pi f w) sin A
      dphi/dw  = 2 cos(pi f w) cos A + 2 pi f w sinc(f w) sin A
               = 2 (cos_fw cos_t + sin_fw sin_t)        [= 2 cos(A - pi f w)]
    so the divide reduces to the per-SLICE constants of _freq_consts
    (the probe measured the old divide/select tail at ~20-24% of FMA
    retirement; the surviving tail is polys + wraps only).
    """
    u_cos = _round_wrap(0.5 * f * (2.0 * c - ws))
    sin_t, cos_t = _sincos2pi(u_cos)
    u_sin = _round_wrap(0.5 * f * ws)
    sin_fw, cos_fw = _sincos2pi(u_sin)
    return sin_fw, cos_fw, sin_t, cos_t


def _trig_unif(ws, wn, c, f):
    """_trig specialized to ROW-CONSTANT weights (uniform_w fast path).

    When every real entry of a row carries the same weight (unit
    adjacency, weight-1 self-loops -- graph._detect_uniform_w), the whole
    u_sin chain (wrap + shared-fold sincos, ~20 VPU ops/element) collapses
    to one evaluation per (row, slice) on a (TR, 1, S) operand -- its
    per-element cost drops by the bucket factor B -- plus a 2-op
    compare/select that restores the exact sin(pi f 0) = 0 at padded
    entries (load-bearing: sd = c2f sin_fw cos_t must vanish there even
    when the gathered projection is nonzero).  The row constant is
    recovered in-kernel as max_j wn (padding is 0; positivity is part of
    the host-side predicate).

    CAVEAT: cos_fw at PADDED entries is the row value, not cos(0) = 1 --
    exact only where cos_fw is multiplied by ws (the phi_f df term) or
    when weight cotangents are skipped, hence the bwd kernels only take
    this path under with_dw=False.  Within that scope the per-element
    math is identical to _trig (same input bits -> same poly bits; f64
    outputs are bit-identical, f32 may drift 1-2 ulp because XLA fuses
    the structurally different compiled graphs differently -- tested in
    tests/test_fsw_rank_pallas.py::test_uniform_w_bit_identical).
    """
    u_cos = _round_wrap(0.5 * f * (2.0 * c - ws))
    sin_t, cos_t = _sincos2pi(u_cos)
    wr = jnp.max(wn, axis=1, keepdims=True)[:, None, :]    # (TR, 1, 1)
    u_sin = _round_wrap(0.5 * f * wr)                      # (TR, 1, S)
    sin_r, cos_r = _sincos2pi(u_sin)
    sin_fw = jnp.where(ws == 0.0, jnp.zeros_like(ws),
                       jnp.broadcast_to(sin_r, ws.shape))
    cos_fw = jnp.broadcast_to(cos_r, ws.shape)
    return sin_fw, cos_fw, sin_t, cos_t


def _trig_maybe_unif(uniform_w, ws, wn, c, f):
    return _trig_unif(ws, wn, c, f) if uniform_w else _trig(ws, c, f)


def _freq_consts(f):
    """Per-slice broadcast constants replacing the per-element sinc divide.

    Computed on the small (1, S) / (1, 1, S) frequency array, so the cost
    is one row of VPU work per kernel invocation.  f == 0 (padded slices,
    or a learnable frequency passing through zero) routes sd through the
    exact 2*ws limit via `fz`; the gradient formulas vanish at f = 0 on
    their own (every term carries sin_fw or sin_t, both 0 there).
    Returns (fz, c2f, inv2f, inv_pf):
      fz = (f == 0); c2f = 2/(pi f); inv2f = 2/f; inv_pf = 1/(pi f)
    (all zeroed at fz so padded slices contribute exact zeros downstream
    instead of inf * 0 NaNs).
    """
    fz = f == 0.0
    fsafe = jnp.where(fz, jnp.ones_like(f), f)
    zero = jnp.zeros_like(f)
    inv_f = jnp.where(fz, zero, 1.0 / fsafe)
    return fz, (2.0 / jnp.pi) * inv_f, 2.0 * inv_f, (1.0 / jnp.pi) * inv_f


def _sd(fz, c2f, ws, sin_fw, cos_t):
    """phi = 2 w sinc(f w) cos A as (2/(pi f)) sin(pi f w) cos A, with the
    exact f == 0 limit 2 w cos A selected by the broadcast mask."""
    return jnp.where(fz, 2.0 * ws, c2f * sin_fw) * cos_t


# The B-step loops are PYTHON-UNROLLED with static middle-axis slices
# P[:, j:j+1, :].  Measured alternatives all lose (BENCH.md ablation):
# fori_loop + dynamic ref slices fails Mosaic alignment checks on tiled
# dims; fori_loop + a transposed second input indexed on its untiled
# leading dim compiles but runs 2.4-2.6x slower; incremental-roll shifts
# 2.3x slower.  Module size is NOT a concern: an earlier HTTP 413 from the
# remote-compile service was traced to benchmark arrays baked in as
# constants, not to the unrolled code (B=128 unrolled compiles fine).


def _common(p_ref, wn_ref, pad_ref, freq_ref):
    P = p_ref[:]                                     # (TR, B, S)
    wn = wn_ref[:]                                   # (TR, B)
    TR, B, S = P.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (TR, B, S), 1)
    c = _rank_c(P, wn, pos)
    pad_b = jnp.broadcast_to(pad_ref[:][:, None, :], c.shape)
    c = c + jnp.where(P > 0, pad_b, jnp.zeros_like(c))
    ws = jnp.broadcast_to(wn[:, :, None], (TR, B, S))
    f = freq_ref[:][None, :, :]                      # (1, 1, S)
    return P, wn, ws, c, f, pos


def _fwd_kernel(uniform_w, p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    P, wn, ws, c, f, pos = _common(p_ref, wn_ref, pad_ref, freq_ref)
    sin_fw, _, _, cos_t = _trig_maybe_unif(uniform_w, ws, wn, c, f)
    fz, c2f, _, _ = _freq_consts(f)
    sd = _sd(fz, c2f, ws, sin_fw, cos_t)
    out_ref[:] = (1.0 + freq_ref[:]) * jnp.sum(P * sd, axis=1)


def _bwd_kernel(with_dw, uniform_w, p_ref, wn_ref, pad_ref, freq_ref,
                g_ref, *out_refs):
    if with_dw:
        dp_ref, dwn_ref, dpad_ref, df_ref = out_refs
    else:
        # weights are non-differentiated data (the GNN adjacency case):
        # skip the transposed-mask loop and the dpad sum -- about half the
        # backward kernel's mask-loop cost
        dp_ref, df_ref = out_refs
    P, wn, ws, c, f, pos = _common(p_ref, wn_ref, pad_ref, freq_ref)
    g = g_ref[:]
    freq = freq_ref[:]
    # uniform_w only without dw: the fast cos_fw is the row value at
    # padded entries, wrong for their dwn term (see _trig_unif)
    sin_fw, cos_fw, sin_t, cos_t = _trig_maybe_unif(
        uniform_w and not with_dw, ws, wn, c, f)
    fz, c2f, inv2f, inv_pf = _freq_consts(f)
    sd = _sd(fz, c2f, ws, sin_fw, cos_t)             # phi

    g1 = ((1.0 + freq) * g)[:, None, :]              # g*(1+f), (TR, 1, S)

    # dp: direct quadrature term
    dp_ref[:] = g1 * sd

    # dc = g (1+f) p phi_c; phi_c = -4 pi f w sinc sin A = -4 sin_fw sin_t
    dc = g1 * P * (-4.0) * sin_fw * sin_t

    if with_dw:
        # dpad = sum_{i, s} dc 1[p > 0].  Two-stage sum keeps every
        # intermediate rank >= 2: Mosaic's layout inference crashes on
        # rank-1 reshapes (VectorLayoutInferer::inferReshape, hit on HW).
        dpad_ref[:] = jnp.sum(
            jnp.sum(jnp.where(P > 0, dc, jnp.zeros_like(dc)), axis=2),
            axis=1, keepdims=True)

        # dwn: explicit phi_w term + transposed-mask rank term
        dphi_dw = 2.0 * (cos_fw * cos_t + sin_fw * sin_t)
        dwn = jnp.sum(g1 * P * dphi_dw, axis=2)      # (TR, B)
        cols = []
        for j in range(P.shape[1]):
            pj = P[:, j:j + 1, :]
            md = _masked(P, pj, pos, j, dc)
            cols.append(jnp.sum(jnp.sum(md, axis=2), axis=1,
                                keepdims=True))
        dwn_ref[:] = dwn + jnp.concatenate(cols, axis=1)

    # df_s = sum_r g [ q + (1+f) sum_i p phi_f ], with
    # phi_f = (2/f) [w cos_fw cos_t - sin_fw cos_t/(pi f)
    #                - (2c - w) sin_fw sin_t]   (0 at f = 0, its limit)
    phi_f = inv2f * (ws * cos_fw * cos_t
                     - inv_pf * sin_fw * cos_t
                     - (2.0 * c - ws) * sin_fw * sin_t)
    q = jnp.sum(P * sd, axis=1)                      # (TR, S)
    df_tile = jnp.sum(
        g * (q + (1.0 + freq) * jnp.sum(P * phi_f, axis=1)),
        axis=0, keepdims=True)                       # (1, S), no rank-1

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        df_ref[:] = jnp.zeros_like(df_ref)

    df_ref[:] += df_tile


def _pad_args(P, wn, pad_norm, freqs, tile_r, lane=128):
    R, B, S = P.shape
    R_pad = -(-R // tile_r) * tile_r
    B_pad = -(-B // 8) * 8          # f32 sublane multiple for the (B, S) tile
    S_pad = -(-S // lane) * lane
    if R_pad != R:
        P = jnp.pad(P, ((0, R_pad - R), (0, 0), (0, 0)))
        wn = jnp.pad(wn, ((0, R_pad - R), (0, 0)))
        pad_norm = jnp.pad(pad_norm, (0, R_pad - R))
    if B_pad != B:
        # zero-weight entries contribute exactly 0 to ranks, quadrature, and
        # all gradients (phi(0, c) = 0), so bucket padding is exact
        P = jnp.pad(P, ((0, 0), (0, B_pad - B), (0, 0)))
        wn = jnp.pad(wn, ((0, 0), (0, B_pad - B)))
    if S_pad != S:
        P = jnp.pad(P, ((0, 0), (0, 0), (0, S_pad - S)))
        freqs = jnp.pad(freqs, (0, S_pad - S))
    return P, wn, pad_norm.reshape(R_pad, 1), freqs.reshape(1, S_pad)


# Scoped-VMEM ceiling handed to Mosaic (default is 16 MB; v5e has 128 MB
# VMEM total).  The backward's unrolled mask loop keeps ~100 live
# (TR, B, S) temporaries on the kernel stack (measured: 26.8 MB at
# tr=16/B=32, 17.8 MB at tr=8/B=64), so wide buckets need the higher
# ceiling; 96 MB leaves room for the streamed in/out blocks.  96 MB is
# validated on v5e; the v4/v5/v6 families share the 128 MB-VMEM core
# design (public specs) so they get the same ceiling; unknown kinds use a
# conservative 64 MB (tile pickers shrink TR to fit).  Override with
# FSW_VMEM_LIMIT_MB.
VMEM_LIMIT_BYTES = 96 * 1024 * 1024          # the validated v5e value
_128MB_VMEM_KINDS = ('v4', 'v5 lite', 'v5e', 'v5p', 'v5', 'v6 lite',
                     'v6e', 'v6')


def _vmem_limit() -> int:
    import os
    env = os.environ.get('FSW_VMEM_LIMIT_MB')
    if env:
        return int(env) * 1024 * 1024
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return VMEM_LIMIT_BYTES
    if any(k in kind for k in _128MB_VMEM_KINDS):
        return VMEM_LIMIT_BYTES
    return 64 * 1024 * 1024


def _pick_tile_r(B, S_pad, arrays=8, budget_bytes=4 * 1024 * 1024):
    """Largest power-of-two row tile keeping ~`arrays` live (TR, B, S) f32
    arrays within the VMEM budget.  TR is the leading (untiled) dim.
    Floor 8: tr is also the sublane dim of the rank-2 (tr, B) blocks,
    which Mosaic requires divisible by 8 (HW error at tr=4)."""
    tr = 256
    while tr > 8 and tr * B * S_pad * 4 * arrays > budget_bytes:
        tr //= 2
    return tr


def _pick_tile_bwd(B, S_pad):
    """Backward row tile: the measured scoped-VMEM model is ~105 live
    (TR, B, S_pad) f32 arrays; keep the stack under ~70% of
    VMEM_LIMIT_BYTES."""
    budget = int(0.7 * _vmem_limit())
    tr = 64
    while tr > 8 and tr * B * S_pad * 4 * 105 > budget:
        tr //= 2
    return tr


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fsw_rank_aggregate(P, wn, pad_norm, freqs,
                       tile_r: int | None = None,
                       interpret: bool = False,
                       with_dw: bool = True,
                       uniform_w: bool = False):
    """Fused FSW aggregation over a dense neighbor-table class.

    P (R, B, S): per-entry projections (gathered sender rows + optional edge
    projections, built XLA-side where gathers are fast);
    wn (R, B): normalized weights; pad_norm (R,): phantom-mass shift;
    freqs (S,).  Returns out (R, S): per-slice embedding INCLUDING the
    (1 + f) factor, BEFORE total-mass finalization (which stays in XLA).

    Differentiable in P, wn, pad_norm, freqs (analytic fused backward).
    with_dw=False returns ZERO cotangents for wn and pad_norm and skips
    their (transposed-mask-loop) computation -- use only when the weights
    are non-differentiated data, e.g. a GNN adjacency built from
    edge_index.  uniform_w=True declares every real entry of a row to
    carry the same positive weight (graph.NeighborTable.uniform_w): the
    sin/cos(pi f w) chain then runs once per row instead of per entry
    (_trig_unif; same per-element math, f64 bit-identical / f32 within
    1-2 ulp; the bwd applies it only when with_dw=False).
    """
    return _fwd_call(P, wn, pad_norm, freqs, tile_r, interpret, uniform_w)


def _block_specs(tr, B_pad, S_pad):
    """Input BlockSpecs for (P, wn, pad, freqs)."""
    return [
        pl.BlockSpec((tr, B_pad, S_pad), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, B_pad), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _compiler_params():
    import os
    if os.environ.get('FSW_RANK_PARALLEL_GRID') == '1':
        # experiment knob: declare the row-tile grid parallel (it is --
        # no cross-tile carry).  On single-core v5e this changes Mosaic
        # scheduling hints only; measured neutral on the headline
        # (see BENCH.md round-5), kept as a knob for multi-core parts.
        return pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            dimension_semantics=('parallel',))
    return pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit())


def _fwd_call(P, wn, pad_norm, freqs, tile_r, interpret,
              uniform_w=False):
    R, B, S = P.shape
    S_pad = -(-S // 128) * 128
    tr = tile_r or _pick_tile_r(B, S_pad)
    tr = min(tr, -(-max(8, R) // 8) * 8)  # sublane multiple (Mosaic req.)
    Pp, wnp, padp, freqp = _pad_args(P, wn, pad_norm, freqs, tr)
    R_pad, B_pad, S_pad = Pp.shape
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, uniform_w),
        grid=(R_pad // tr,),
        in_specs=_block_specs(tr, B_pad, S_pad),
        out_specs=pl.BlockSpec((tr, S_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad, S_pad), P.dtype),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(Pp, wnp, padp, freqp)
    return out[:R, :S]


def _fsw_fwd(P, wn, pad_norm, freqs, tile_r, interpret, with_dw,
             uniform_w):
    out = _fwd_call(P, wn, pad_norm, freqs, tile_r, interpret, uniform_w)
    return out, (P, wn, pad_norm, freqs)


def _fsw_bwd(tile_r, interpret, with_dw, uniform_w, res, g):
    P, wn, pad_norm, freqs = res
    R, B, S = P.shape
    S_pad = -(-S // 128) * 128
    tr = tile_r or _pick_tile_bwd(B, S_pad)
    tr = min(tr, -(-max(8, R) // 8) * 8)  # sublane multiple (Mosaic req.)
    Pp, wnp, padp, freqp = _pad_args(P, wn, pad_norm, freqs, tr)
    R_pad, B_pad, S_pad = Pp.shape
    gp = g
    if (R_pad, S_pad) != (R, S):
        gp = jnp.pad(g, ((0, R_pad - R), (0, S_pad - S)))
    in_specs = _block_specs(tr, B_pad, S_pad)
    in_specs.append(pl.BlockSpec((tr, S_pad), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    dp_spec = pl.BlockSpec((tr, B_pad, S_pad), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    dwn_spec = pl.BlockSpec((tr, B_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    dpad_spec = pl.BlockSpec((tr, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    # df accumulates across the (consecutive) R grid steps; the kernel
    # zero-initializes at i == 0
    df_spec = pl.BlockSpec((1, S_pad), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    dp_shape = jax.ShapeDtypeStruct((R_pad, B_pad, S_pad), P.dtype)
    dwn_shape = jax.ShapeDtypeStruct((R_pad, B_pad), P.dtype)
    dpad_shape = jax.ShapeDtypeStruct((R_pad, 1), P.dtype)
    df_shape = jax.ShapeDtypeStruct((1, S_pad), P.dtype)
    kern = functools.partial(_bwd_kernel, with_dw, uniform_w)
    if with_dw:
        dp, dwn, dpad, df = pl.pallas_call(
            kern,
            grid=(R_pad // tr,),
            in_specs=in_specs,
            out_specs=(dp_spec, dwn_spec, dpad_spec, df_spec),
            out_shape=(dp_shape, dwn_shape, dpad_shape, df_shape),
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(Pp, wnp, padp, freqp, gp)
        return dp[:R, :B, :S], dwn[:R, :B], dpad[:R, 0], df[0, :S]
    dp, df = pl.pallas_call(
        kern,
        grid=(R_pad // tr,),
        in_specs=in_specs,
        out_specs=(dp_spec, df_spec),
        out_shape=(dp_shape, df_shape),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(Pp, wnp, padp, freqp, gp)
    return (dp[:R, :B, :S], jnp.zeros_like(wn),
            jnp.zeros_like(pad_norm), df[0, :S])


fsw_rank_aggregate.defvjp(_fsw_fwd, _fsw_bwd)


# ---------------------------------------------------------------------------
# Fused-projection variant: the kernel takes gathered sender FEATURE rows
# Z (R, B, D) plus the projection matrix V (D, S) and computes the
# per-entry projections P = Z @ V on the MXU inside VMEM.  When D < S this
# halves the HBM traffic of the XLA-side gather (write (T, D) instead of
# (T, S)) and of the backward (dZ (T, D) written + scatter-added instead of
# dP (T, S)); the matmuls are MXU-cheap (T*D*S MACs ~ 0.2 ms at the
# headline scale vs the multi-ms gather/scatter they remove).  dV is
# accumulated in-kernel across the (consecutive) recipient grid steps, like
# df.  Probe results (benchmarks/probe_kernel_matmul.py, on HW): rank-3 x
# rank-2 dot_general and leading-dims collapse reshapes lower fine; only
# the rank-3 x rank-3 double contraction does not (hence the reshape
# formulation for dV).
# ---------------------------------------------------------------------------


def _project(z_ref, v_ref):
    Z = z_ref[:]
    return jax.lax.dot_general(
        Z, v_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=Z.dtype)


def _fwdp_kernel(uniform_w, z_ref, wn_ref, pad_ref, freq_ref, v_ref,
                 out_ref):
    P = _project(z_ref, v_ref)                       # (TR, B, S) via MXU
    wn = wn_ref[:]
    TR, B, S = P.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (TR, B, S), 1)
    c = _rank_c(P, wn, pos)
    pad_b = jnp.broadcast_to(pad_ref[:][:, None, :], c.shape)
    c = c + jnp.where(P > 0, pad_b, jnp.zeros_like(c))
    ws = jnp.broadcast_to(wn[:, :, None], (TR, B, S))
    f = freq_ref[:][None, :, :]
    sin_fw, _, _, cos_t = _trig_maybe_unif(uniform_w, ws, wn, c, f)
    fz, c2f, _, _ = _freq_consts(f)
    sd = _sd(fz, c2f, ws, sin_fw, cos_t)
    out_ref[:] = (1.0 + freq_ref[:]) * jnp.sum(P * sd, axis=1)


def _bwdp_kernel(with_dw, uniform_w, z_ref, wn_ref, pad_ref, freq_ref,
                 v_ref, g_ref, *out_refs):
    if with_dw:
        dz_ref, dwn_ref, dpad_ref, df_ref, dv_ref = out_refs
    else:
        dz_ref, df_ref, dv_ref = out_refs
    Z = z_ref[:]                                     # (TR, B, D)
    V = v_ref[:]                                     # (D, S)
    P = jax.lax.dot_general(Z, V, (((2,), (0,)), ((), ())),
                            preferred_element_type=Z.dtype)
    wn = wn_ref[:]
    TR, B, S = P.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (TR, B, S), 1)
    c = _rank_c(P, wn, pos)
    pad_b = jnp.broadcast_to(pad_ref[:][:, None, :], c.shape)
    c = c + jnp.where(P > 0, pad_b, jnp.zeros_like(c))
    ws = jnp.broadcast_to(wn[:, :, None], (TR, B, S))
    f = freq_ref[:][None, :, :]
    g = g_ref[:]
    freq = freq_ref[:]
    # uniform_w only without dw (see _trig_unif's cos_fw caveat)
    sin_fw, cos_fw, sin_t, cos_t = _trig_maybe_unif(
        uniform_w and not with_dw, ws, wn, c, f)
    fz, c2f, inv2f, inv_pf = _freq_consts(f)
    sd = _sd(fz, c2f, ws, sin_fw, cos_t)             # phi

    g1 = ((1.0 + freq) * g)[:, None, :]              # (TR, 1, S)

    dp = g1 * sd                                     # stays in VMEM
    dc = g1 * P * (-4.0) * sin_fw * sin_t

    if with_dw:
        dpad_ref[:] = jnp.sum(
            jnp.sum(jnp.where(P > 0, dc, jnp.zeros_like(dc)), axis=2),
            axis=1, keepdims=True)

        dphi_dw = 2.0 * (cos_fw * cos_t + sin_fw * sin_t)
        dwn = jnp.sum(g1 * P * dphi_dw, axis=2)      # (TR, B)
        cols = []
        for j in range(B):
            pj = P[:, j:j + 1, :]
            md = _masked(P, pj, pos, j, dc)
            cols.append(jnp.sum(jnp.sum(md, axis=2), axis=1,
                                keepdims=True))
        dwn_ref[:] = dwn + jnp.concatenate(cols, axis=1)

    phi_f = inv2f * (ws * cos_fw * cos_t
                     - inv_pf * sin_fw * cos_t
                     - (2.0 * c - ws) * sin_fw * sin_t)
    q = jnp.sum(P * sd, axis=1)                      # (TR, S)
    df_tile = jnp.sum(
        g * (q + (1.0 + freq) * jnp.sum(P * phi_f, axis=1)),
        axis=0, keepdims=True)

    # dZ = dP . V^T  (MXU); dV = Z^T . dP collapsed over (TR, B), MXU via
    # leading-dims reshape (the rank-3 x rank-3 contraction doesn't lower)
    dz_ref[:] = jax.lax.dot_general(
        dp, V, (((2,), (1,)), ((), ())),
        preferred_element_type=Z.dtype)
    D = Z.shape[2]
    dv_tile = jax.lax.dot_general(
        Z.reshape(TR * B, D), dp.reshape(TR * B, S),
        (((0,), (0,)), ((), ())), preferred_element_type=Z.dtype)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        df_ref[:] = jnp.zeros_like(df_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    df_ref[:] += df_tile
    dv_ref[:] += dv_tile


def _pad_proj_args(Z, wn, pad_norm, freqs, V, tile_r):
    R, B, D = Z.shape
    S = V.shape[1]
    R_pad = -(-R // tile_r) * tile_r
    B_pad = -(-B // 8) * 8
    S_pad = -(-S // 128) * 128
    D_pad = -(-D // 8) * 8        # sublane multiple for V's leading dim
    if R_pad != R:
        Z = jnp.pad(Z, ((0, R_pad - R), (0, 0), (0, 0)))
        wn = jnp.pad(wn, ((0, R_pad - R), (0, 0)))
        pad_norm = jnp.pad(pad_norm, (0, R_pad - R))
    if B_pad != B:
        Z = jnp.pad(Z, ((0, 0), (0, B_pad - B), (0, 0)))
        wn = jnp.pad(wn, ((0, 0), (0, B_pad - B)))
    if D_pad != D:
        Z = jnp.pad(Z, ((0, 0), (0, 0), (0, D_pad - D)))
        V = jnp.pad(V, ((0, D_pad - D), (0, 0)))
    if S_pad != S:
        V = jnp.pad(V, ((0, 0), (0, S_pad - S)))
        freqs = jnp.pad(freqs, (0, S_pad - S))
    return (Z, wn, pad_norm.reshape(R_pad, 1), freqs.reshape(1, S_pad), V)


def _proj_block_specs(tr, B_pad, D_pad, S_pad):
    return [
        pl.BlockSpec((tr, B_pad, D_pad), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, B_pad), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((D_pad, S_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fsw_rank_aggregate_proj(Z, wn, pad_norm, freqs, V,
                            tile_r: int | None = None,
                            interpret: bool = False,
                            with_dw: bool = True,
                            uniform_w: bool = False):
    """Fused FSW aggregation with in-kernel projection.

    Z (R, B, D): gathered sender feature rows (columns may include edge
    features -- concatenate them and stack V accordingly); V (D, S): slice
    projection matrix (P = Z @ V computed on the MXU in VMEM); wn (R, B)
    normalized weights; pad_norm (R,); freqs (S,).  Returns (R, S) as
    `fsw_rank_aggregate`.  Wins over the unfused kernel when D < S: the
    XLA-side gather and the backward scatter-add move (T, D) arrays
    instead of (T, S).

    Differentiable in Z, wn, pad_norm, freqs, V.  with_dw=False returns
    ZERO cotangents for wn and pad_norm and skips their computation;
    uniform_w=True enables the row-constant-weight trig fast path (see
    `fsw_rank_aggregate`).
    """
    return _fwdp_call(Z, wn, pad_norm, freqs, V, tile_r, interpret,
                      uniform_w)


def _fwdp_call(Z, wn, pad_norm, freqs, V, tile_r, interpret,
               uniform_w=False):
    R, B, D = Z.shape
    S = V.shape[1]
    S_pad = -(-S // 128) * 128
    tr = tile_r or _pick_tile_r(B, S_pad)
    tr = min(tr, -(-max(8, R) // 8) * 8)  # sublane multiple (Mosaic req.)
    Zp, wnp, padp, freqp, Vp = _pad_proj_args(Z, wn, pad_norm, freqs, V,
                                              tr)
    R_pad, B_pad, D_pad = Zp.shape
    S_pad = Vp.shape[1]
    out = pl.pallas_call(
        functools.partial(_fwdp_kernel, uniform_w),
        grid=(R_pad // tr,),
        in_specs=_proj_block_specs(tr, B_pad, D_pad, S_pad),
        out_specs=pl.BlockSpec((tr, S_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad, S_pad), Z.dtype),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(Zp, wnp, padp, freqp, Vp)
    return out[:R, :S]


def _fswp_fwd(Z, wn, pad_norm, freqs, V, tile_r, interpret, with_dw,
              uniform_w):
    out = _fwdp_call(Z, wn, pad_norm, freqs, V, tile_r, interpret,
                     uniform_w)
    return out, (Z, wn, pad_norm, freqs, V)


def _fswp_bwd(tile_r, interpret, with_dw, uniform_w, res, g):
    Z, wn, pad_norm, freqs, V = res
    R, B, D = Z.shape
    S = V.shape[1]
    S_pad = -(-S // 128) * 128
    tr = tile_r or _pick_tile_bwd(B, S_pad)
    tr = min(tr, -(-max(8, R) // 8) * 8)  # sublane multiple (Mosaic req.)
    Zp, wnp, padp, freqp, Vp = _pad_proj_args(Z, wn, pad_norm, freqs, V,
                                              tr)
    R_pad, B_pad, D_pad = Zp.shape
    S_pad = Vp.shape[1]
    gp = g
    if (R_pad, S_pad) != (R, S):
        gp = jnp.pad(g, ((0, R_pad - R), (0, S_pad - S)))
    in_specs = _proj_block_specs(tr, B_pad, D_pad, S_pad)
    in_specs.append(pl.BlockSpec((tr, S_pad), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    dz_spec = pl.BlockSpec((tr, B_pad, D_pad), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    dwn_spec = pl.BlockSpec((tr, B_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    dpad_spec = pl.BlockSpec((tr, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    df_spec = pl.BlockSpec((1, S_pad), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    dv_spec = pl.BlockSpec((D_pad, S_pad), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    dz_shape = jax.ShapeDtypeStruct((R_pad, B_pad, D_pad), Z.dtype)
    dwn_shape = jax.ShapeDtypeStruct((R_pad, B_pad), wn.dtype)
    dpad_shape = jax.ShapeDtypeStruct((R_pad, 1), pad_norm.dtype)
    df_shape = jax.ShapeDtypeStruct((1, S_pad), freqs.dtype)
    dv_shape = jax.ShapeDtypeStruct((D_pad, S_pad), V.dtype)
    kern = functools.partial(_bwdp_kernel, with_dw, uniform_w)
    if with_dw:
        dz, dwn, dpad, df, dv = pl.pallas_call(
            kern,
            grid=(R_pad // tr,),
            in_specs=in_specs,
            out_specs=(dz_spec, dwn_spec, dpad_spec, df_spec, dv_spec),
            out_shape=(dz_shape, dwn_shape, dpad_shape, df_shape,
                       dv_shape),
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(Zp, wnp, padp, freqp, Vp, gp)
        return (dz[:R, :B, :D], dwn[:R, :B], dpad[:R, 0],
                df[0, :S], dv[:D, :S])
    dz, df, dv = pl.pallas_call(
        kern,
        grid=(R_pad // tr,),
        in_specs=in_specs,
        out_specs=(dz_spec, df_spec, dv_spec),
        out_shape=(dz_shape, df_shape, dv_shape),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(Zp, wnp, padp, freqp, Vp, gp)
    return (dz[:R, :B, :D], jnp.zeros_like(wn), jnp.zeros_like(pad_norm),
            df[0, :S], dv[:D, :S])


fsw_rank_aggregate_proj.defvjp(_fswp_fwd, _fswp_bwd)


# ---------------------------------------------------------------------------
# Cartesian-mode variant: out[r, s, f] = (1 + F[s, f]) * sum_b P phi(w, c, F)
# with a full nSlices x nFreqs frequency grid (the reference's cartesian
# product mode, fsw_embedding.py:257, 999-1004).  The B-step rank loop runs
# ONCE and is amortized over all F frequencies -- the kernel's relative
# advantage over the sort path grows with F.  Frequencies ride as a (S, F)
# matrix (rows usually identical) so per-slice frequency grids also work.
#
# Measured on v5e (R=8192, B=32, F=8, fwd+bwd in-scan):
#   * S=128: kernel 45.1 ms vs sort 57.3 ms (1.27x) -- wins at full lanes;
#   * S=16:  kernel 45.5 ms vs sort 12.1 ms -- the 128-lane padding of the
#     slice axis makes the kernel cost S-independent below a lane tile, so
#     narrow-S cartesian configs should use the sort path;
#   * COMPILE PATHOLOGY (fixed by splitting): the per-freq trig loop and
#     the transposed-mask loop in ONE kernel take >40 min through the
#     remote Mosaic pipeline (each alone compiles in minutes), so the
#     with_dw=True backward runs as TWO pallas_calls -- stage 1 (trig
#     loop) emits dc, stage 2 (_mask_consume_kernel) turns it into
#     dwn/dpad -- at the cost of one (R, B, S) HBM round-trip for dc.
# ---------------------------------------------------------------------------


def _cart_row(freqT, j, S):
    """Row j of the transposed (F_pad, S_pad) frequency matrix as a
    broadcastable (1, 1, S_pad) value.  Two-step: value slice then reshape
    (mixing a slice with None emits a Mosaic-rejected gather; reshape that
    only inserts a unit dim keeps the lane dim intact)."""
    return freqT[j:j + 1, :].reshape(1, 1, S)


def _cart_common(p_ref, wn_ref, pad_ref):
    P = p_ref[:]                                     # (TR, B, S)
    wn = wn_ref[:]                                   # (TR, B)
    TR, B, S = P.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (TR, B, S), 1)
    c = _rank_c(P, wn, pos)
    pad_b = jnp.broadcast_to(pad_ref[:][:, None, :], c.shape)
    c = c + jnp.where(P > 0, pad_b, jnp.zeros_like(c))
    ws = jnp.broadcast_to(wn[:, :, None], (TR, B, S))
    return P, wn, ws, c, pos


def _fwdc_kernel(n_freqs, uniform_w, p_ref, wn_ref, pad_ref, freq_ref,
                 out_ref):
    P, wn, ws, c, pos = _cart_common(p_ref, wn_ref, pad_ref)
    TR, B, S = P.shape
    F_pad = out_ref.shape[1]
    rows = []
    for j in range(F_pad):
        if j >= n_freqs:
            rows.append(jnp.zeros((TR, 1, S), P.dtype))
            continue
        f = _cart_row(freq_ref, j, S)                # (1, 1, S)
        sin_fw, _, _, cos_t = _trig_maybe_unif(uniform_w, ws, wn, c, f)
        fz, c2f, _, _ = _freq_consts(f)
        sd = _sd(fz, c2f, ws, sin_fw, cos_t)
        q = jnp.sum(P * sd, axis=1, keepdims=True)   # (TR, 1, S)
        rows.append((1.0 + f) * q)
    out_ref[:] = jnp.concatenate(rows, axis=1)       # (TR, F_pad, S)


def _bwdc_kernel(n_freqs, with_dw, uniform_w, p_ref, wn_ref, pad_ref,
                 freq_ref, g_ref, *out_refs):
    """Cartesian backward, stage 1: the per-frequency trig loop.

    with_dw=True emits dc (TR, B, S) and the DIRECT dwn term as extra
    outputs for the stage-2 mask kernel instead of running the
    transposed-mask loop here: the combination of the statically unrolled
    per-frequency trig loop and the B-step transposed-mask loop in ONE
    kernel is compile-pathological on TPU (>40 min through the remote
    Mosaic pipeline; each loop alone compiles in minutes -- BENCH.md).
    The split costs one (R, B, S) HBM round-trip for dc.
    """
    if with_dw:
        dp_ref, dc_ref, dwn_dir_ref, df_ref = out_refs
    else:
        dp_ref, df_ref = out_refs
    P, wn, ws, c, pos = _cart_common(p_ref, wn_ref, pad_ref)
    TR, B, S = P.shape
    g = g_ref[:]                                     # (TR, F_pad, S)
    F_pad = g.shape[1]

    dp = jnp.zeros((TR, B, S), P.dtype)
    dc = jnp.zeros((TR, B, S), P.dtype)
    dwn_direct = None
    df_rows = []
    for j in range(F_pad):
        if j >= n_freqs:
            df_rows.append(jnp.zeros((1, S), P.dtype))
            continue
        f = _cart_row(freq_ref, j, S)                # (1, 1, S)
        g_j = g[:, j:j + 1, :]                       # (TR, 1, S)
        # uniform_w only without dw (see _trig_unif's cos_fw caveat)
        sin_fw, cos_fw, sin_t, cos_t = _trig_maybe_unif(
            uniform_w and not with_dw, ws, wn, c, f)
        fz, c2f, inv2f, inv_pf = _freq_consts(f)
        sd = _sd(fz, c2f, ws, sin_fw, cos_t)         # phi
        g1 = (1.0 + f) * g_j
        dp = dp + g1 * sd
        dc = dc + g1 * P * (-4.0) * sin_fw * sin_t
        if with_dw:
            dphi_dw = 2.0 * (cos_fw * cos_t + sin_fw * sin_t)
            term = jnp.sum(g1 * P * dphi_dw, axis=2)  # (TR, B)
            dwn_direct = term if dwn_direct is None else dwn_direct + term
        # df[j, s] = sum_r g [ q + (1+f) sum_b P phi_f ]
        phi_f = inv2f * (ws * cos_fw * cos_t
                         - inv_pf * sin_fw * cos_t
                         - (2.0 * c - ws) * sin_fw * sin_t)
        q = jnp.sum(P * sd, axis=1, keepdims=True)   # (TR, 1, S)
        inner = (g_j * (q + (1.0 + f) *
                        jnp.sum(P * phi_f, axis=1, keepdims=True)))
        df_rows.append(jnp.sum(inner, axis=0))       # (1, S)

    dp_ref[:] = dp

    if with_dw:
        dc_ref[:] = dc
        dwn_dir_ref[:] = dwn_direct

    df_tile = jnp.concatenate(df_rows, axis=0)       # (F_pad, S)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        df_ref[:] = jnp.zeros_like(df_ref)

    df_ref[:] += df_tile


def _mask_consume_kernel(p_ref, dc_ref, dwn_ref, dpad_ref):
    """Cartesian backward, stage 2: the transposed-mask dwn/dpad loop,
    consuming the dc produced by stage 1 (plus the ORIGINAL projections
    for the mask).  Frequency-free, so the kernel is exactly the non-cart
    backward's mask loop -- which compiles fine alone."""
    P = p_ref[:]                                     # (TR, B, S)
    dc = dc_ref[:]
    TR, B, S = P.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (TR, B, S), 1)
    dpad_ref[:] = jnp.sum(
        jnp.sum(jnp.where(P > 0, dc, jnp.zeros_like(dc)), axis=2),
        axis=1, keepdims=True)
    cols = []
    for j in range(B):
        pj = P[:, j:j + 1, :]
        md = _masked(P, pj, pos, j, dc)
        cols.append(jnp.sum(jnp.sum(md, axis=2), axis=1, keepdims=True))
    dwn_ref[:] = jnp.concatenate(cols, axis=1)


def _pad_cart_args(P, wn, pad_norm, freqs, tile_r, lane=128):
    """freqs: (S, F) per-slice frequency matrix -> transposed, padded
    (F_pad, S_pad) for lane alignment."""
    R, B, S = P.shape
    F = freqs.shape[1]
    R_pad = -(-R // tile_r) * tile_r
    B_pad = -(-B // 8) * 8
    S_pad = -(-S // lane) * lane
    F_pad = -(-F // 8) * 8
    if R_pad != R:
        P = jnp.pad(P, ((0, R_pad - R), (0, 0), (0, 0)))
        wn = jnp.pad(wn, ((0, R_pad - R), (0, 0)))
        pad_norm = jnp.pad(pad_norm, (0, R_pad - R))
    if B_pad != B:
        P = jnp.pad(P, ((0, 0), (0, B_pad - B), (0, 0)))
        wn = jnp.pad(wn, ((0, 0), (0, B_pad - B)))
    if S_pad != S:
        P = jnp.pad(P, ((0, 0), (0, 0), (0, S_pad - S)))
    freqT = jnp.pad(freqs.T, ((0, F_pad - F), (0, S_pad - S)))
    return P, wn, pad_norm.reshape(R_pad, 1), freqT


def _pick_tile_cart(B, S_pad, F_pad, bwd: bool,
                    with_dw: bool = False, budget_bytes=None):
    """Row tile for the cartesian kernel: live VMEM ~ (rank arrays +
    per-freq temporaries + the (TR, F, S) output/cotangent block).
    Backward array model 26: the round-3 value (14, "validated" at B=32)
    was an artifact of both models picking the SAME tile at B=32 -- the
    round-4 autotune run OOM'd the no-dw backward at B=64/tile 128 with
    a measured 104.65 MB scoped stack = ~25 live (TR, B, S) f32 arrays
    (104.65e6 / (128*64*128*4)); 26 = measured + 1 safety.  The with_dw
    stage-1 backward streams dc/dp/dwn_direct on top -- same bucket, the
    B=32 tile is unchanged under either count."""
    arrays = 26 if bwd else 8
    budget = budget_bytes or (int(0.7 * _vmem_limit()) if bwd
                              else 8 * 1024 * 1024)
    tr = 256
    while tr > 8 and tr * S_pad * 4 * (arrays * B + 2 * F_pad) > budget:
        tr //= 2
    return tr


def _pick_tile_mask(B, S_pad):
    """Row tile for the stage-2 mask kernel: P + dc inputs, the unrolled
    mask loop's temporaries -- ~12 live (TR, B, S) arrays measured-class
    (same loop as the non-cart backward minus all trig temporaries)."""
    budget = int(0.7 * _vmem_limit())
    tr = 128
    while tr > 8 and tr * B * S_pad * 4 * 12 > budget:
        tr //= 2
    return tr


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fsw_rank_aggregate_cart(P, wn, pad_norm, freqs,
                            tile_r: int | None = None,
                            interpret: bool = False,
                            with_dw: bool = True,
                            uniform_w: bool = False):
    """Fused cartesian-mode FSW aggregation over a neighbor-table class.

    P (R, B, S): per-entry projections; wn (R, B): normalized weights;
    pad_norm (R,): phantom-mass shift; freqs (S, F): per-slice frequency
    rows (usually identical -- the broadcast cartesian grid).  Returns
    out (R, S, F) INCLUDING the (1 + f) factor, BEFORE collapse/total-mass
    finalization.  The B-step rank loop runs once and is shared by all F
    frequencies.  Differentiable in P, wn, pad_norm, freqs; with_dw=False
    and uniform_w as in `fsw_rank_aggregate` (in cartesian mode the
    uniform-weight saving multiplies by F: the u_sin chain drops out of
    every frequency iteration).
    """
    return _fwdc_call(P, wn, pad_norm, freqs, tile_r, interpret,
                      uniform_w)


def _fwdc_call(P, wn, pad_norm, freqs, tile_r, interpret,
               uniform_w=False):
    R, B, S = P.shape
    F = freqs.shape[1]
    S_pad = -(-S // 128) * 128
    F_pad = -(-F // 8) * 8
    tr = tile_r or _pick_tile_cart(B, S_pad, F_pad, bwd=False)
    tr = min(tr, -(-max(8, R) // 8) * 8)  # sublane multiple (Mosaic req.)
    Pp, wnp, padp, freqT = _pad_cart_args(P, wn, pad_norm, freqs, tr)
    R_pad, B_pad, S_pad = Pp.shape
    F_pad = freqT.shape[0]
    in_specs = [
        pl.BlockSpec((tr, B_pad, S_pad), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, B_pad), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((F_pad, S_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        functools.partial(_fwdc_kernel, F, uniform_w),
        grid=(R_pad // tr,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tr, F_pad, S_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad, F_pad, S_pad), P.dtype),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(Pp, wnp, padp, freqT)
    # kernel layout (R, F, S) -> API layout (R, S, F)
    return jnp.moveaxis(out[:R, :F, :S], 1, 2)


def _fswc_fwd(P, wn, pad_norm, freqs, tile_r, interpret, with_dw,
              uniform_w):
    out = _fwdc_call(P, wn, pad_norm, freqs, tile_r, interpret, uniform_w)
    return out, (P, wn, pad_norm, freqs)


def _fswc_bwd(tile_r, interpret, with_dw, uniform_w, res, g):
    P, wn, pad_norm, freqs = res
    R, B, S = P.shape
    F = freqs.shape[1]
    S_pad = -(-S // 128) * 128
    F_pad = -(-F // 8) * 8
    tr = tile_r or _pick_tile_cart(B, S_pad, F_pad, bwd=True,
                                   with_dw=with_dw)
    tr = min(tr, -(-max(8, R) // 8) * 8)  # sublane multiple (Mosaic req.)
    Pp, wnp, padp, freqT = _pad_cart_args(P, wn, pad_norm, freqs, tr)
    R_pad, B_pad, S_pad = Pp.shape
    F_pad = freqT.shape[0]
    # cotangent to kernel layout (R_pad, F_pad, S_pad)
    gk = jnp.moveaxis(g, 2, 1)
    gk = jnp.pad(gk, ((0, R_pad - R), (0, F_pad - F), (0, S_pad - S)))
    in_specs = [
        pl.BlockSpec((tr, B_pad, S_pad), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, B_pad), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((F_pad, S_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, F_pad, S_pad), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    dp_spec = pl.BlockSpec((tr, B_pad, S_pad), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    dwn_spec = pl.BlockSpec((tr, B_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    dpad_spec = pl.BlockSpec((tr, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    df_spec = pl.BlockSpec((F_pad, S_pad), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    dp_shape = jax.ShapeDtypeStruct((R_pad, B_pad, S_pad), P.dtype)
    dwn_shape = jax.ShapeDtypeStruct((R_pad, B_pad), P.dtype)
    dpad_shape = jax.ShapeDtypeStruct((R_pad, 1), P.dtype)
    df_shape = jax.ShapeDtypeStruct((F_pad, S_pad), P.dtype)
    kern = functools.partial(_bwdc_kernel, F, with_dw, uniform_w)
    if with_dw:
        # stage 1: trig loop -> dp, dc, dwn_direct, df
        dc_spec = pl.BlockSpec((tr, B_pad, S_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        dc_shape = jax.ShapeDtypeStruct((R_pad, B_pad, S_pad), P.dtype)
        dp, dc, dwn_dir, dfT = pl.pallas_call(
            kern,
            grid=(R_pad // tr,),
            in_specs=in_specs,
            out_specs=(dp_spec, dc_spec, dwn_spec, df_spec),
            out_shape=(dp_shape, dc_shape, dwn_shape, df_shape),
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(Pp, wnp, padp, freqT, gk)
        # stage 2: transposed-mask loop consuming dc (one extra (R, B, S)
        # HBM round-trip; see _bwdc_kernel docstring)
        tm = _pick_tile_mask(B_pad, S_pad)
        tm = min(tm, -(-max(8, R) // 8) * 8)
        if R_pad % tm:
            tm = tr                     # fall back to the stage-1 tile
        dwn_rank, dpad = pl.pallas_call(
            _mask_consume_kernel,
            grid=(R_pad // tm,),
            in_specs=[
                pl.BlockSpec((tm, B_pad, S_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, B_pad, S_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tm, B_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(jax.ShapeDtypeStruct((R_pad, B_pad), P.dtype),
                       jax.ShapeDtypeStruct((R_pad, 1), P.dtype)),
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(Pp, dc)
        return (dp[:R, :B, :S], (dwn_dir + dwn_rank)[:R, :B],
                dpad[:R, 0], dfT[:F, :S].T)
    dp, dfT = pl.pallas_call(
        kern,
        grid=(R_pad // tr,),
        in_specs=in_specs,
        out_specs=(dp_spec, df_spec),
        out_shape=(dp_shape, df_shape),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(Pp, wnp, padp, freqT, gk)
    return (dp[:R, :B, :S], jnp.zeros_like(wn), jnp.zeros_like(pad_norm),
            dfT[:F, :S].T)


fsw_rank_aggregate_cart.defvjp(_fswc_fwd, _fswc_bwd)
