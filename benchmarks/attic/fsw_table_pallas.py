"""Fused Pallas kernel for the FSW neighborhood aggregation (table layout).

Computes, for every recipient r and slice s of a dense NeighborTable:

    out[r, s] = (1 + f_s) * sum_b ps * 2*ws*sinc(f_s*ws)*cos(pi*f_s*(2c - ws))

where (ps, ws) are the bucket entries sorted by projection value and c is
the within-bucket inclusive weight cumsum plus the phantom-mass shift
pad_norm[r] * 1[ps > 0] (see embedding.py for the math derivation from the
reference, /root/reference/fsw_embedding.py:999-1110).

Fusion rationale (measured on v5e, round 1): the XLA CSR path materializes
~5 (E, S) arrays in HBM and pays log^2(E) bitonic merge passes in lax.sort
(~30 ms forward) plus a 186 ms scatter-dominated backward.  Here the entire
chain runs on VMEM tiles: per grid step we gather a (TR, B, TS) projection
tile from the VMEM-resident Xp block, run a width-B bitonic network
(log^2(B) compare-exchanges on VPU registers), cumsum along B, apply the
quadrature and reduce.  HBM traffic drops to reading idx/w/Xp once and
writing (R, S) once.

Scope (round 1): non-cartesian mode, no edge features; f32.  The XLA paths
remain the general fallback.

STATUS: EXPERIMENTAL but CORRECT on hardware (v5e): agrees with the XLA
table path to 5e-5 (benchmarks/bench_fused_table.py; the earlier apparent
~0.1 divergence was the CSR fallback path's own f32 cumsum-minus-base error
at scale, not this kernel).  Not wired into the default path because it is
currently ~2-3x SLOWER than the XLA table path (the rank-3 roll-based
bitonic does not reach VMEM speed; Mosaic workarounds used: no flips, no
bool-valued selects, tile_r=16 for the 16MB VMEM stack limit, explicit trig
range reduction).  Next step if revisited: 2-D (B on sublane, S on lane)
tiles with per-recipient grid, or await Mosaic gather support.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _partner_exchange(x, j, pos):
    """Values of each position's bitonic partner (i ^ j) along axis 1.

    i ^ j = i + j when bit j of i is clear, i - j when set; expressed as two
    rolls and a select (Mosaic-lowerable: no gathers, no flips, no captured
    index constants).  Rolled-in values from other blocks are never selected.
    """
    down = jnp.roll(x, -j, axis=1)    # x[i + j]
    up = jnp.roll(x, j, axis=1)       # x[i - j]
    return jnp.where((pos & j) == 0, down, up)


def _sort_pairs_along_b(ps, ws, b_axis=1):
    """Bitonic-sort (ps ascending) carrying ws, along axis 1 of a 3-D array.

    Both lanes of a pair evaluate the same pair-level swap predicate
    (lower > upper for ascending blocks), so payloads are exchanged
    consistently and ties never duplicate entries.
    """
    assert b_axis == 1 and ps.ndim == 3
    B = ps.shape[1]
    assert B & (B - 1) == 0, 'bucket size must be a power of two'
    pos = jax.lax.broadcasted_iota(jnp.int32, ps.shape, 1)
    n_exp = int(math.log2(B))
    for k_exp in range(1, n_exp + 1):
        k = 1 << k_exp
        asc = (pos & k) == 0          # all-True on the final merge (k == B)
        for j_exp in range(k_exp - 1, -1, -1):
            j = 1 << j_exp
            low = (pos & j) == 0
            pp = _partner_exchange(ps, j, pos)
            wp = _partner_exchange(ws, j, pos)
            lower_val = jnp.where(low, ps, pp)
            upper_val = jnp.where(low, pp, ps)
            # swap iff (lower > upper) == ascending; expressed with i1
            # logical ops -- a bool-valued jnp.where lowers to an i8 select
            # + unsupported rank-3 i8->i1 truncation in Mosaic.  The only
            # behavioral difference vs the two-branch form is that ties in
            # descending blocks swap (p equal, w exchanged): multiset of
            # (p, w) pairs is preserved either way.
            swap = jnp.logical_not(
                jnp.logical_xor(lower_val > upper_val, asc))
            ps = jnp.where(swap, pp, ps)
            ws = jnp.where(swap, wp, ws)
    return ps, ws


def _cumsum_along_b(x, b_axis):
    """Inclusive cumsum along static axis via log-stride doubling (roll +
    positional mask -- jnp.cumsum is fine too, but this keeps the op set
    minimal for Mosaic)."""
    B = x.shape[b_axis]
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, b_axis)
    stride = 1
    while stride < B:
        shifted = jnp.roll(x, stride, axis=b_axis)
        x = x + jnp.where(pos >= stride, shifted, jnp.zeros_like(x))
        stride *= 2
    return x


def _fsw_table_kernel(p_ref, wn_ref, pad_ref, freq_ref, out_ref):
    """One (TR, TS) output tile.

    p_ref: (TR, B, TS) f32 projections (gathered outside by XLA -- Mosaic's
    gather lowering does not cover arbitrary row gathers in-kernel);
    wn_ref: (TR, B) f32; pad_ref: (TR, 1) f32; freq_ref: (1, TS);
    out_ref: (TR, TS).
    """
    P = p_ref[:]                                       # (TR, B, TS)
    TR, B, TS = P.shape

    wn = wn_ref[:]                                     # (TR, B)
    ws = jnp.broadcast_to(wn[:, :, None], (TR, B, TS))
    ps, ws = _sort_pairs_along_b(P, ws, b_axis=1)

    c = _cumsum_along_b(ws, b_axis=1)
    pad_b = jnp.broadcast_to(pad_ref[:][:, None, :], c.shape)
    c = c + jnp.where(ps > 0, pad_b, jnp.zeros_like(c))

    f = freq_ref[:][None, :, :]                        # (1, 1, TS)
    # explicit mod-1 range reduction before the trig calls: the VPU's
    # transcendental approximations lose accuracy at large arguments
    # (measured ~0.1 abs divergence vs XLA without this)
    u_cos = 0.5 * f * (2.0 * c - ws)
    u_cos = u_cos - jnp.round(u_cos)
    cos_t = jnp.cos((2.0 * jnp.pi) * u_cos)
    x = f * ws
    u_sin = 0.5 * x
    u_sin = u_sin - jnp.round(u_sin)
    sin_t = jnp.sin((2.0 * jnp.pi) * u_sin)
    sinc_t = jnp.where(x == 0.0, jnp.ones_like(x),
                       sin_t / (jnp.pi * x + jnp.where(x == 0.0,
                                                       jnp.ones_like(x),
                                                       jnp.zeros_like(x))))
    sd = 2.0 * ws * sinc_t * cos_t
    out_ref[:] = (1.0 + freq_ref[:]) * jnp.sum(ps * sd, axis=1)


@functools.partial(jax.jit,
                   static_argnames=('tile_r', 'tile_s', 'interpret'))
def fsw_table_forward(idx: jax.Array, wn: jax.Array, pad_norm: jax.Array,
                      Xp: jax.Array, freqs: jax.Array,
                      tile_r: int = 16, tile_s: int = 128,
                      interpret: bool = False) -> jax.Array:
    """out (R, S): fused FSW aggregation over a dense neighbor table.

    idx (R, B) int32; wn (R, B) normalized weights; pad_norm (R,);
    Xp (N, S) projections; freqs (S,).
    """
    R, B = idx.shape
    N, S = Xp.shape
    assert B & (B - 1) == 0, 'bucket size must be a power of two'
    # row gather by XLA (fast); sort/cumsum/quadrature fused in the kernel
    P = jnp.take(Xp, idx.reshape(-1), axis=0).reshape(R, B, S)
    return _fsw_table_call(P, wn, pad_norm, freqs, tile_r=tile_r,
                           tile_s=tile_s, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=('tile_r', 'tile_s', 'interpret'))
def _fsw_table_call(P: jax.Array, wn: jax.Array, pad_norm: jax.Array,
                    freqs: jax.Array, tile_r: int = 16, tile_s: int = 128,
                    interpret: bool = False) -> jax.Array:
    R, B, S = P.shape
    tile_r = min(tile_r, R)
    tile_s = min(tile_s, S)

    # pad R and S up to tile multiples (padded rows/slices are computed on
    # zeros and sliced away)
    R_pad = -(-R // tile_r) * tile_r
    S_pad = -(-S // tile_s) * tile_s
    if R_pad != R:
        P = jnp.pad(P, ((0, R_pad - R), (0, 0), (0, 0)))
        wn = jnp.pad(wn, ((0, R_pad - R), (0, 0)))
        pad_norm = jnp.pad(pad_norm, (0, R_pad - R))
    if S_pad != S:
        P = jnp.pad(P, ((0, 0), (0, 0), (0, S_pad - S)))
        freqs = jnp.pad(freqs, (0, S_pad - S))

    pad2 = pad_norm.reshape(R_pad, 1)
    freq2 = freqs.reshape(1, S_pad)

    grid = (R_pad // tile_r, S_pad // tile_s)
    out = pl.pallas_call(
        _fsw_table_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_r, B, tile_s), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, B), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_s), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, tile_s), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad, S_pad), P.dtype),
        interpret=interpret,
    )(P, wn, pad2, freq2)
    return out[:R, :S]
