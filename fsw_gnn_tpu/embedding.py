"""Fourier Sliced-Wasserstein embedding -- TPU-native functional core.

Reimplements the mathematics of the reference `FSW_embedding`
(/root/reference/fsw_embedding.py:169-1144) in pure JAX with static shapes.

The embedding of a weighted multiset {(x_j, w_j)} for slice vector v_k and
frequency xi is (fsw_embedding.py:999-1004, 1047-1075, 1109):

    emb_k = (1 + xi) * sum_j p_(j) * [ g(c_j) - g(c_{j-1}) ]
    g(c)  = 2 c sinc(2 xi c) = sin(2 pi xi c) / (pi xi)

where p_(j) = <x_(j), v_k> are the projections sorted ascending, and c_j is
the inclusive cumsum of the normalized weights in sorted order.  We use the
sum-to-product identity (the reference's sparse-path formulation,
fsw_embedding.py:1047-1075):

    g(c_j) - g(c_j - w_j) = 2 w_j sinc(xi w_j) cos(pi xi (2 c_j - w_j))

which needs no neighbor-difference over the (possibly segmented) structure.

Total-mass padding (fsw_embedding.py:787-829): a multiset whose total mass
falls below `total_mass_pad_thresh` is padded with a phantom point at the
origin carrying the deficit.  TPU-native reformulation: the phantom's
projection is exactly 0, so its direct contribution p * sincdiff vanishes;
its only effect is (a) the normalization by max(W_sum, thresh) and (b)
shifting the weight-cumsum of all elements with positive projection by the
normalized deficit.  Hence no ragged insertion is ever materialized:

    c_j  <-  c_j + pad_norm * 1[p_(j) > 0]

This is exact (the phantom sorts at 0, after all negative and zero
projections -- the reference appends it last, so stable sort places real
zero-projection points before it).
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .ops.segment import (rows_gather, segment_cumsum, segment_sort_fused,
                          segment_sum, sort_keys_fused, sort_pairs_fused)


# Bucket-width bounds for the fused rank kernel under aggregate='auto',
# KEYED BY TPU GENERATION.  The kernel's weighted-rank pass is O(B^2) per
# entry (ops/fsw_rank_pallas.py), the XLA sort path O(B log^2 B), so there
# is a width crossover -- but it depends on whether weight cotangents are
# needed.  Measured on v5e (fwd+bwd per entry, vs sort):
#   weights_grad=True  (two mask loops): B=32 1.59x, B=64 1.13x,
#     B=128 0.73x -> cap 64.
#   weights_grad=False (one mask loop, the GNN-adjacency case): B=32 2.6x,
#     B=64 2.3x, B=128 2.3x, B=256 1.10x fwd+bwd (fwd alone 0.71x -- the
#     O(B^2) rank loop finally overtakes the O(B log^2 B) sort) -> the
#     crossover endpoint is ~B=256; cap 128 keeps a 2x margin.
# Waste thresholds: the kernel pads the slice axis to the 128-lane tile,
# so its cost is flat below one tile while the sort path scales with the
# true S; the kernel wins iff margin_at_full_lanes * S / S_pad > 1 (~10%
# safety baked in).  Empirical anchor: embed_dim=64 (S=63, waste 2.03x)
# measured 1.7x FASTER on the rank kernel at arxiv scale -- a flat 1.6x
# waste cutoff regressed that config to the sort path (325 vs 192
# ms/step).
_RANK_RULES_BY_KIND = {
    # v5e: every number above measured on this generation.
    # waste_cart=8.6: round-4 re-measurement AFTER the trig campaign
    # (benchmarks/bench_cart_waste.py + bench_cart_dw.py, R=8192 B=32
    # F=8): the cartesian kernel beats sort at EVERY measured waste --
    # S=128: 14.6/11.1 vs 105.6 ms (dw/nodw vs sort); S=48: 14.9/11.5 vs
    # 49.0; S=16 (waste 8.0): 14.9/11.8 vs 19.4 -- overturning the
    # round-2 "sort below full lanes" rule (the kernel's per-element trig
    # cost has since dropped ~4x).  8.6 = full-lane margin 9.5 / SAFETY
    # (the autotune derivation formula, validated by the S=16 point: at
    # waste 8.0 the kernel still wins 1.65x); sort keeps shrinking with S
    # while the kernel is flat below one lane tile, so tinier S could
    # still flip.
    'tpu v5 lite': dict(cap_dw=64, cap_nodw=128, waste_cart=8.6,
                        waste_nodw=2.2, waste_dw_narrow=1.4,
                        waste_dw_wide=1.05),
}
# other generations ride the same VPU/Mosaic design, so the v5e crossover
# *shape* transfers even if the exact caps shift; until measured, unknown
# kinds fall back to the sort path (correct everywhere) unless an
# autotune cache entry exists (utils/autotune.py) or FSW_ASSUME_V5E_RULES=1
# opts into the v5e numbers.

# kept as module constants for introspection/back-compat (the v5e values)
RANK_AGGREGATE_MAX_BUCKET = 64
RANK_AGGREGATE_MAX_BUCKET_NO_DW = 128


def _device_kind() -> str:
    """Normalized accelerator kind string ('' when unavailable)."""
    try:
        return jax.devices()[0].device_kind.lower()
    except Exception:
        return ''


def _rank_rules() -> Optional[dict]:
    """Crossover rules for the current device: the hand-measured table
    first, then the autotune cache (utils/autotune.py, opt-in one-shot
    measurement), then the FSW_ASSUME_V5E_RULES escape hatch; None = no
    rules known -> 'auto' stays on the sort path.

    Precedence (round 4): the measured TABLE beats the autotune cache on
    known generations -- the first end-to-end HW autotune produced
    systematically conservative margins (its single-compile timing
    includes per-call dispatch, compressing every ratio; e.g. cart B=32
    measured 2.43x vs the dedicated differenced benchmark's 9.5x), so on
    a kind we've benchmarked properly the cache would only ever WITHDRAW
    kernels that are measured wins.  Autotune remains the path for
    unknown generations, where a conservative crossover is the right
    failure mode."""
    import os
    kind = _device_kind()
    for known, rules in _RANK_RULES_BY_KIND.items():
        if known in kind:
            return rules
    from .utils.autotune import cached_rules
    cached = cached_rules(kind)
    if cached is not None:
        return cached
    if os.environ.get('FSW_ASSUME_V5E_RULES') == '1':
        return _RANK_RULES_BY_KIND['tpu v5 lite']
    return None


def _resolve_aggregate(aggregate: str, cfg, bucket_size: int,
                       weights_grad: bool = True,
                       s_eff: Optional[int] = None) -> str:
    """Pick the table-path aggregation backend.

    'sort': XLA bitonic sort + cumsum (works everywhere, any dtype/mode).
    'rank': fused Pallas weighted-rank kernel (TPU; f32 compute; cartesian
            mode via fsw_rank_aggregate_cart, which shares the rank loop
            across all frequencies).  On CPU it runs in interpret mode
            (tests).
    'auto': 'rank' for tables whose bucket_size and lane-padding waste sit
            inside the current DEVICE GENERATION's measured crossover
            rules (_rank_rules: v5e-measured table, autotune cache, or the
            FSW_ASSUME_V5E_RULES opt-in); 'sort' on CPU, on unknown
            hardware, and beyond the caps.
            Cartesian (round-4 re-measurement on v5e, R=8192 B=32 F=8,
            post-trig-campaign): the kernel wins at every measured lane
            waste, INCLUDING weight grads via the split backward --
            S=128: 7.2x (dw) / 9.5x (nodw) over sort; S=16 (waste 8.0):
            1.3x / 1.65x.  with_dw routes through the two-kernel split
            (compiles in ~95 s on HW, grads parity-ok on device).
    """
    if aggregate not in ('auto', 'sort', 'rank'):
        raise ValueError(f"aggregate must be 'auto'|'sort'|'rank', "
                         f"got {aggregate!r}")
    if aggregate != 'auto':
        return aggregate
    if jax.default_backend() == 'cpu':
        return 'sort'
    rules = _rank_rules()
    if rules is None:
        return 'sort'
    # Lane-padding waste rule (shared with the distributed overlap path,
    # which passes s_eff=chunk); see the rules-table comment above.
    s = s_eff if s_eff is not None else cfg.nSlices
    waste = (-(-s // 128) * 128) / max(s, 1)
    if cfg.cartesian_mode:
        # weights_grad=True is allowed through the split with_dw backward
        # (round-4 HW evidence: compiles in minutes, 7.2x over sort at
        # S=128).  Compile frontier MEASURED round 5
        # (benchmarks/probe_cart_dw_frontier.py, R=8192 S=128 F=8):
        # B=48 compiles in 172 s and runs 25.9 ms/step un-differenced
        # (sort is ~100+ ms at this shape); B=64's Mosaic payload
        # exceeds the remote-compile tunnel's hard limit (HTTP 413) --
        # the cap is 48, a measurement, not an extrapolated fear
        cap = rules['cap_nodw'] if not weights_grad else min(
            rules['cap_dw'], 48)
        if bucket_size <= cap and waste <= rules['waste_cart']:
            return 'rank'
        return 'sort'
    if not weights_grad:
        if (bucket_size <= rules['cap_nodw']
                and waste <= rules['waste_nodw']):
            return 'rank'
        return 'sort'
    if bucket_size > rules['cap_dw']:
        return 'sort'
    if waste > (rules['waste_dw_narrow'] if bucket_size <= 32
                else rules['waste_dw_wide']):
        return 'sort'
    return 'rank'


# ---------------------------------------------------------------------------
# Configuration
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FSWConfig:
    """Static configuration of an FSW embedding.

    Mirrors the constructor surface of the reference `FSW_embedding.__init__`
    (fsw_embedding.py:172-337).  Exactly one of `d_out` or
    (`n_slices`, `n_freqs`) must be given; the latter selects cartesian mode.
    """
    d_in: int
    d_out: Optional[int] = None
    n_slices: Optional[int] = None
    n_freqs: Optional[int] = None
    collapse_freqs: bool = False
    d_edge: int = 0
    encode_total_mass: bool = False
    total_mass_encoding_function: str = 'identity'   # identity | sqrt | log
    total_mass_encoding_scale: float = 1.0
    total_mass_encoding_method: str = 'plain'        # plain | homog | homog_alt
    total_mass_pad_thresh: float = 1.0
    learnable_slices: bool = False
    learnable_freqs: bool = False
    learnable_total_mass_encoding_scale: bool = False
    freqs_init: Union[float, int, str, Tuple[float, float]] = 'random'
    minimize_slice_coherence: bool = False
    enable_bias: bool = True

    def __post_init__(self):
        assert self.d_in >= 0 and self.d_edge >= 0
        assert self.total_mass_encoding_method in ('plain', 'homog', 'homog_alt')
        assert self.total_mass_encoding_function in ('identity', 'sqrt', 'log')
        assert self.total_mass_pad_thresh > 0
        if self.d_out is not None and self.n_slices is None and self.n_freqs is None:
            pass
        elif self.d_out is None and self.n_slices is not None and self.n_freqs is not None:
            # cartesian mode; encode_total_mass needs a flat output axis
            assert self.collapse_freqs or not self.encode_total_mass, (
                'Cartesian mode with collapse_freqs=False does not support '
                'encode_total_mass=True')
        else:
            raise ValueError('Give exactly one of d_out or (n_slices, n_freqs)')
        if self.d_out == 0:
            object.__setattr__(self, 'encode_total_mass', False)

    # --- resolved sizes (fsw_embedding.py:242-267) ---
    @property
    def cartesian_mode(self) -> bool:
        return self.d_out is None

    @property
    def total_mass_dim(self) -> int:
        return 1 if self.encode_total_mass else 0

    @property
    def nSlices(self) -> int:
        if self.cartesian_mode:
            return self.n_slices
        return self.d_out - self.total_mass_dim

    @property
    def nFreqs(self) -> int:
        if self.cartesian_mode:
            return self.n_freqs
        return self.d_out - self.total_mass_dim

    @property
    def out_dim(self) -> int:
        if self.cartesian_mode:
            return self.n_slices * self.n_freqs + self.total_mass_dim
        return self.d_out

    @property
    def proj_dim(self) -> int:
        return self.d_in + self.d_edge


# ---------------------------------------------------------------------------
# Custom-gradient clamp
# ---------------------------------------------------------------------------

@partial(jax.custom_jvp, nondiff_argnums=(1,))
def lowclamp(x, thresh: float):
    """`max(x, thresh)` whose gradient is 1 *at* the threshold boundary.

    Matches `ag.custom_lowclamp` (fsw_embedding.py:1735-1744): active set is
    `x >= thresh`, so points exactly on the boundary pass gradient through.
    """
    return jnp.maximum(x, thresh)


@lowclamp.defjvp
def _lowclamp_jvp(thresh, primals, tangents):
    (x,), (dx,) = primals, tangents
    return jnp.maximum(x, thresh), jnp.where(x >= thresh, dx, jnp.zeros_like(dx))


# ---------------------------------------------------------------------------
# Quadrature core (shared by all paths)
# ---------------------------------------------------------------------------

def _sinc_diff(ws, c, freqs):
    """2 w sinc(xi w) cos(pi xi (2c - w)) for broadcastable ws, c, freqs."""
    return 2.0 * ws * jnp.sinc(freqs * ws) * jnp.cos(
        jnp.pi * freqs * (2.0 * c - ws))


def _total_mass_value(w_sum, cfg: FSWConfig):
    """f(total mass) per `total_mass_encoding_function` (fsw_embedding.py:856-869)."""
    if cfg.total_mass_encoding_function == 'identity':
        return w_sum
    if cfg.total_mass_encoding_function == 'sqrt':
        # numerically-safe sqrt(1+x)-1 (reference comment at py:861-864)
        return 2.0 * (w_sum / (jnp.sqrt(w_sum + 1.0) + 1.0))
    return jnp.log1p(w_sum)


def _homog_alt_part1(tm):
    """fsw_embedding.py:1137-1139."""
    return jnp.where(tm <= 1, tm * (2 - tm), jnp.ones_like(tm))


def _homog_alt_part2(tm):
    """fsw_embedding.py:1141-1144."""
    return jnp.where(tm <= 1, jnp.square(tm), 2 * tm - 1)


def _append_total_mass(emb, w_sum, scale, cfg: FSWConfig):
    """Prepend the encoded total mass along the last axis (py:856-884)."""
    tm = _total_mass_value(w_sum, cfg) * scale
    tm = tm[..., None]
    if cfg.total_mass_encoding_method == 'plain':
        return jnp.concatenate([tm, emb], axis=-1)
    emb_norm = jnp.mean(jnp.abs(emb), axis=-1, keepdims=True)
    if cfg.total_mass_encoding_method == 'homog':
        return jnp.concatenate([tm * emb_norm, emb], axis=-1)
    return jnp.concatenate([_homog_alt_part1(tm) * emb_norm,
                            _homog_alt_part2(tm) * emb], axis=-1)


# ---------------------------------------------------------------------------
# Dense multiset path  (reference dense branch, fsw_embedding.py:983-1004)
# ---------------------------------------------------------------------------

def fsw_embed_multiset(X: jax.Array,
                       W: Optional[jax.Array],
                       projVecs: jax.Array,
                       freqs: jax.Array,
                       cfg: FSWConfig,
                       bias: Optional[jax.Array] = None,
                       total_mass_scale: Optional[jax.Array] = None,
                       w_mode: str = 'unit',
                       slice_chunk: Optional[int] = None,
                       aggregate: str = 'auto',
                       weights_grad: bool = True) -> jax.Array:
    """Embed batched weighted multisets.

    X: (..., n, d_in); W: (..., n) nonnegative, or None with
    w_mode in {'unit','uniform'} (fsw_embedding.py:726-732).
    Returns (..., d_out) -- or (..., nSlices, nFreqs) in non-collapsed
    cartesian mode.  `slice_chunk` serializes the slice axis to cap peak
    memory (the reference's serialize_num_slices, fsw_embedding.py:839-851).

    `aggregate`: each multiset is one full-width "neighborhood" of n
    entries, so small multisets (n within the rank-kernel bucket caps) can
    aggregate via the fused Pallas rank kernel instead of the sort -- same
    crossover rules as the table path (`_resolve_aggregate`, bucket=n).
    When W is None the synthesized weights are constants and the kernel's
    weight-cotangent loop is skipped automatically.
    """
    n = X.shape[-2]
    dt = X.dtype
    unif = W is None           # synthesized weights are row-constant
    if W is None:
        W = jnp.ones(X.shape[:-1], dt) if w_mode == 'unit' else \
            jnp.full(X.shape[:-1], 1.0 / n, dt)
        weights_grad = False   # synthesized constants: never differentiated
        # static-grid quadrature constants (see the grid branch below):
        # with every weight the SAME static scalar, the normalized weight
        # and the phantom-mass shift are Python floats, and the cumulative
        # weight after sorting is the static grid c_j = (j+1) * wc
        T = float(cfg.total_mass_pad_thresh)
        ws_total = float(n) if w_mode == 'unit' else 1.0
        wsp_c = max(ws_total, T)
        wc = (1.0 / wsp_c) if w_mode == 'unit' else 1.0 / (n * wsp_c)
        padc = max(T - ws_total, 0.0) / wsp_c

    s_eff = cfg.nSlices if slice_chunk is None else min(slice_chunk,
                                                        cfg.nSlices)
    agg = _resolve_aggregate(aggregate, cfg, n, weights_grad, s_eff=s_eff)

    w_sum = jnp.sum(W, axis=-1)                                   # (...,)
    w_sum_padded = lowclamp(w_sum, cfg.total_mass_pad_thresh)
    pad_norm = lowclamp(cfg.total_mass_pad_thresh - w_sum, 0.0) / w_sum_padded
    wn = W / w_sum_padded[..., None]                              # (..., n)

    def slices_block(V_block, f_block):
        """V_block: (S_blk, d_in) slice vectors; f_block: (S_blk,) or (F,)."""
        Xp = jnp.einsum('...nd,sd->...ns', X, V_block)             # (..., n, Sb)
        if agg == 'rank':
            lead = Xp.shape[:-2]
            P = Xp.reshape((-1, n, Xp.shape[-1]))                  # (R, n, Sb)
            fb = f_block
            if cfg.cartesian_mode and fb.ndim == 1:
                # quadrature expects the (S_blk, F) broadcast grid
                fb = jnp.broadcast_to(fb, (Xp.shape[-1],) + fb.shape)
            out = bucket_quadrature(
                P, wn.reshape(-1, n), pad_norm.reshape(-1), fb,
                cfg, 'rank', weights_grad, uniform_w=unif)
            return out.reshape(lead + out.shape[1:])   # (..., Sb[, F])
        if unif and not cfg.cartesian_mode:
            # STATIC-GRID quadrature (round 4, the large-multiset path):
            # with synthesized weights, the sorted cumulative weight is the
            # static grid c_j = (j+1)*wc (+ padc above zero), so the whole
            # per-element trig collapses into a precomputed (S_blk, n)
            # matrix and the aggregation is sort + contraction.  vs the
            # generic path this (a) sorts KEYS ONLY (half the sort
            # payload), (b) does n-fold less trig (once per (slice, rank)
            # instead of per (row, slice, rank)), and (c) is MORE accurate
            # (the grid replaces a rounding-accumulating cumsum).
            ps = sort_keys_fused(jnp.moveaxis(Xp, -2, -1))   # (..., Sb, n)
            fb = f_block[..., :, None]                       # (Sb, 1)
            c0 = (jnp.arange(1, n + 1, dtype=ps.dtype) * ps.dtype.type(wc)
                  )[None, :]                                 # (1, n)
            phi0 = (1.0 + f_block)[..., :, None] * _sinc_diff(
                ps.dtype.type(wc), c0, fb)                   # (Sb, n)
            if padc != 0.0:
                phi1 = (1.0 + f_block)[..., :, None] * _sinc_diff(
                    ps.dtype.type(wc), c0 + ps.dtype.type(padc), fb)
                return jnp.sum(ps * jnp.where(ps > 0, phi1, phi0),
                               axis=-1)
            return jnp.einsum('...sn,sn->...s', ps, phi0)
        keys = jnp.moveaxis(Xp, -2, -1)                            # (..., Sb, n)
        ps, ws = sort_pairs_fused(
            keys, jnp.broadcast_to(wn[..., None, :], keys.shape))
        c = jnp.cumsum(ws, axis=-1) + pad_norm[..., None, None] * (ps > 0)
        if cfg.cartesian_mode:
            sd = _sinc_diff(ws[..., None], c[..., None], f_block)  # (...,Sb,n,F)
            emb = jnp.einsum('...sn,...snf->...sf', ps, sd)
            return (1.0 + f_block) * emb                           # (..., Sb, F)
        sd = _sinc_diff(ws, c, f_block[..., :, None])              # (..., Sb, n)
        emb = jnp.sum(ps * sd, axis=-1)
        return (1.0 + f_block) * emb                               # (..., Sb)

    S = cfg.nSlices
    V = projVecs[:, :cfg.d_in]
    if slice_chunk is None or slice_chunk >= S:
        emb = slices_block(V, freqs)
    else:
        n_chunks = -(-S // slice_chunk)
        S_pad = n_chunks * slice_chunk
        V_pad = jnp.pad(V, ((0, S_pad - S), (0, 0)))
        if cfg.cartesian_mode:
            emb = jax.lax.map(lambda v: slices_block(v, freqs),
                              V_pad.reshape(n_chunks, slice_chunk, -1))
            emb = jnp.moveaxis(emb, 0, -3)
            emb = emb.reshape(emb.shape[:-3] + (S_pad,) + emb.shape[-1:])
            emb = emb[..., :S, :]
        else:
            f_pad = jnp.pad(freqs, (0, S_pad - S))
            emb = jax.lax.map(
                lambda vf: slices_block(vf[0], vf[1]),
                (V_pad.reshape(n_chunks, slice_chunk, -1),
                 f_pad.reshape(n_chunks, slice_chunk)))
            emb = jnp.moveaxis(emb, 0, -2)
            emb = emb.reshape(emb.shape[:-2] + (S_pad,))[..., :S]

    return _finalize(emb, w_sum, cfg, bias, total_mass_scale)


def _finalize(emb, w_sum, cfg: FSWConfig, bias, total_mass_scale):
    """Collapse, total-mass augmentation, bias (fsw_embedding.py:853-888)."""
    if cfg.cartesian_mode and cfg.collapse_freqs:
        emb = emb.reshape(emb.shape[:-2] + (emb.shape[-2] * emb.shape[-1],))
    if cfg.encode_total_mass:
        scale = total_mass_scale if total_mass_scale is not None else \
            jnp.asarray(cfg.total_mass_encoding_scale, emb.dtype)
        emb = _append_total_mass(emb, w_sum, scale, cfg)
    if cfg.enable_bias and bias is not None:
        emb = emb + bias
    return emb


# ---------------------------------------------------------------------------
# CSR-segment graph path  (reference sparse branch, fsw_embedding.py:1005-1110)
# ---------------------------------------------------------------------------

def fsw_embed_graph(X: jax.Array,
                    graph,
                    projVecs: jax.Array,
                    freqs: jax.Array,
                    cfg: FSWConfig,
                    bias: Optional[jax.Array] = None,
                    total_mass_scale: Optional[jax.Array] = None,
                    slice_chunk: Optional[int] = None) -> jax.Array:
    """Embed every recipient's in-neighborhood of a CSR `Graph`.

    X: (num_nodes, d_in) sender features.  Returns (num_recipients, d_out)
    (or (R, nSlices, nFreqs) in non-collapsed cartesian mode).

    `slice_chunk` serializes the slice axis in chunks to cap peak memory,
    the analogue of the reference's `serialize_num_slices`
    (fsw_embedding.py:620-623, 839-851).
    """
    R = graph.num_recipients
    dst = graph.dst
    w = graph.weight
    dt = X.dtype

    w_sum = segment_sum(w, dst, R)                                 # (R,)
    w_sum_padded = lowclamp(w_sum, cfg.total_mass_pad_thresh)
    pad_norm = lowclamp(cfg.total_mass_pad_thresh - w_sum, 0.0) / w_sum_padded
    wn = w / jnp.take(w_sum_padded, dst)                           # (E,)
    pad_norm_e = jnp.take(pad_norm, dst)                           # (E,)

    with jax.named_scope('fsw_project'):
        Xp = X @ projVecs[:, :cfg.d_in].T                          # (N, S)
    if graph.src_order is not None:
        # scatter-free backward: adjoint is a sorted segment-sum
        P = rows_gather(graph.num_nodes, Xp, graph.src, graph.src_order,
                        graph.src_sorted)                          # (E, S)
    else:
        P = jnp.take(Xp, graph.src, axis=0)
    if cfg.d_edge > 0:
        assert graph.edge_feat is not None, 'graph has no edge features'
        P = P + graph.edge_feat @ projVecs[:, cfg.d_in:].T

    def one_slice(p_k, f_k):
        """p_k: (E,) projections for one slice; f_k: () or (F,) freqs."""
        # one forward sort (payloads + permutation); backward unsorts
        # the cotangents with one sort keyed on the permutation -- no
        # scatters (the measured 2.6x winner, see CLAUDE.md)
        ps, ws = segment_sort_fused(p_k, wn, dst)
        with jax.named_scope('fsw_segcumsum'):
            c = segment_cumsum(ws, dst, graph.row_ptr) + pad_norm_e * (ps > 0)
        if cfg.cartesian_mode:
            sd = _sinc_diff(ws[:, None], c[:, None], f_k)          # (E, F)
            out = segment_sum(ps[:, None] * sd, dst, R)            # (R, F)
        else:
            sd = _sinc_diff(ws, c, f_k)                            # (E,)
            out = segment_sum(ps * sd, dst, R)                     # (R,)
        return (1.0 + f_k) * out

    S = cfg.nSlices
    if cfg.cartesian_mode:
        slice_freqs = jnp.broadcast_to(freqs, (S,) + freqs.shape)
    else:
        slice_freqs = freqs                                        # (S,)

    if slice_chunk is None or slice_chunk >= S:
        emb = jax.vmap(one_slice, in_axes=(1, 0))(P, slice_freqs)  # (S, R[, F])
    else:
        # pad S to a multiple of slice_chunk and scan chunks to bound memory
        n_chunks = -(-S // slice_chunk)
        S_pad = n_chunks * slice_chunk
        P_pad = jnp.pad(P, ((0, 0), (0, S_pad - S)))
        f_pad = jnp.pad(slice_freqs, ((0, S_pad - S),) + ((0, 0),) *
                        (slice_freqs.ndim - 1))
        P_chunks = jnp.moveaxis(P_pad.reshape(P.shape[0], n_chunks, slice_chunk),
                                1, 0)                              # (n_chunks, E, chunk)
        f_chunks = f_pad.reshape((n_chunks, slice_chunk) + slice_freqs.shape[1:])
        emb = jax.lax.map(
            lambda pf: jax.vmap(one_slice, in_axes=(1, 0))(pf[0], pf[1]),
            (P_chunks, f_chunks))
        emb = emb.reshape((S_pad,) + emb.shape[2:])[:S]

    emb = jnp.moveaxis(emb, 0, 1)                                  # (R, S[, F])
    return _finalize(emb.astype(dt), w_sum, cfg, bias, total_mass_scale)


def fsw_embed_graph_batched(X: jax.Array,
                            graphs,
                            projVecs: jax.Array,
                            freqs: jax.Array,
                            cfg: FSWConfig,
                            bias: Optional[jax.Array] = None,
                            total_mass_scale: Optional[jax.Array] = None,
                            slice_chunk: Optional[int] = None) -> jax.Array:
    """Batched sparse graph mode: embed a stack of equally-shaped graphs.

    The supported equivalent of the reference's batched sparse-W call
    (/root/reference/fsw_embedding.py:598-757, batch_dims with sparse COO
    W): the TPU-native layout stacks G same-shape CSR graphs (a `Graph`
    pytree whose array leaves carry a leading [G] axis -- build with
    `graph.stack_graphs`) and vmaps the single-graph CSR pipeline.

    X: (*batch, n, d_in); returns (*batch, R, d_out).  Arbitrary leading
    batch dims are supported (the reference's multi-dim batch_dims with
    sparse W): they must multiply out to the stacked graph count G and are
    flattened around the vmapped pipeline.
    """
    batch_shape = X.shape[:-2]
    G = graphs.src.shape[0]
    if len(batch_shape) != 1:
        import math
        assert math.prod(batch_shape) == G, (
            f'leading batch dims {batch_shape} must multiply out to the '
            f'stacked graph count {G}')
        out = fsw_embed_graph_batched(
            X.reshape((G,) + X.shape[-2:]), graphs, projVecs, freqs, cfg,
            bias=bias, total_mass_scale=total_mass_scale,
            slice_chunk=slice_chunk)
        return out.reshape(batch_shape + out.shape[1:])
    def one(Xg, src, dst, w, rp, ef, so, ss):
        g = dataclasses.replace(
            graphs, src=src, dst=dst, weight=w, row_ptr=rp,
            in_degrees=graphs.in_degrees[0], edge_feat=ef,
            src_order=so, src_sorted=ss)
        return fsw_embed_graph(Xg, g, projVecs, freqs, cfg, bias=bias,
                               total_mass_scale=total_mass_scale,
                               slice_chunk=slice_chunk)

    ef = graphs.edge_feat
    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0,
                                  None if ef is None else 0, 0, 0))(
        X, graphs.src, graphs.dst, graphs.weight, graphs.row_ptr,
        ef, graphs.src_order, graphs.src_sorted)


# ---------------------------------------------------------------------------
# Bucketed neighbor-table path -- the TPU fast path.
#
# Same math as fsw_embed_graph, but neighborhoods are fixed-width rows of a
# dense (R, B) table, so the segmented sort becomes a batched width-B sort
# (log^2 B bitonic passes instead of log^2 E) and cumsum/quadrature are
# plain dense ops along the bucket axis.  Zero-weight padding contributes
# exactly 0 everywhere.
# ---------------------------------------------------------------------------

def bucket_quadrature(P: jax.Array, wn: jax.Array, pad_norm: jax.Array,
                      f_block: jax.Array, cfg: FSWConfig, agg: str,
                      weights_grad: bool = True,
                      uniform_w: bool = False) -> jax.Array:
    """Per-neighborhood FSW aggregation on pre-gathered projections.

    P (R, B, S_blk): per-entry projections of one neighbor-table class;
    wn (R, B): normalized weights; pad_norm (R,): phantom-mass shift;
    f_block: (S_blk,) frequencies (or (S_blk, F) in cartesian mode).
    `agg` is a RESOLVED backend: 'rank' (fused Pallas kernel; the
    cartesian variant shares one rank loop across all F frequencies) or
    'sort' (XLA bitonic + cumsum).  Returns (R, S_blk) (or
    (R, S_blk, F)).  Shared by the single-device table path and the
    distributed slice-chunked overlap path (parallel/overlap.py).
    `uniform_w` declares row-constant weights (NeighborTable.uniform_w):
    BOTH rank kernels (non-cartesian and cartesian) then compute the
    sin/cos(pi f w) chain once per row (f64 bit-identical, f32 within
    1-2 ulp; no-op on the sort path).  HONORED ONLY when
    weights_grad=False: the flag is detected from the weights at table
    BUILD time, so differentiated (trained) weights would make it stale
    after the first update -- the gate keeps a weights_grad=True caller
    correct even if its table was built from unit weights.
    """
    uniform_w = uniform_w and not weights_grad
    if agg == 'rank':
        # fused Pallas kernel: weighted ranks replace sort+cumsum, the
        # quadrature and its backward stay VMEM-resident (f32 compute).
        # In cartesian mode the B-step rank loop is shared by all F
        # frequencies (f_block is the (S_blk, F) broadcast grid).
        from .ops.fsw_rank_pallas import (fsw_rank_aggregate,
                                          fsw_rank_aggregate_cart)
        f32 = jnp.float32
        cpu = jax.default_backend() == 'cpu'
        a32 = (P.astype(f32), wn.astype(f32), pad_norm.astype(f32),
               f_block.astype(f32))
        if cfg.cartesian_mode:
            out = fsw_rank_aggregate_cart(*a32, None, cpu, weights_grad,
                                          uniform_w)
        else:
            out = fsw_rank_aggregate(*a32, None, cpu, weights_grad,
                                     uniform_w)
        return out.astype(P.dtype)                        # (R, S[, F])

    # sort neighborhoods along the bucket axis per slice
    keysB = jnp.moveaxis(P, 1, 2)                                  # (R, S, B)
    ps, ws = sort_pairs_fused(
        keysB, jnp.broadcast_to(wn[:, None, :], keysB.shape))
    c = jnp.cumsum(ws, axis=2) + pad_norm[:, None, None] * (ps > 0)

    if cfg.cartesian_mode:
        sd = _sinc_diff(ws[..., None], c[..., None],
                        f_block[:, None, :])                       # (R,S,B,F)
        emb = jnp.einsum('rsb,rsbf->rsf', ps, sd)
        return (1.0 + f_block) * emb                               # (R, S, F)
    sd = _sinc_diff(ws, c, f_block[:, None])                       # (R, S, B)
    emb = jnp.sum(ps * sd, axis=2)
    return (1.0 + f_block) * emb                                   # (R, S)


def fsw_embed_table(X: jax.Array,
                    table,
                    projVecs: jax.Array,
                    freqs: jax.Array,
                    cfg: FSWConfig,
                    bias: Optional[jax.Array] = None,
                    total_mass_scale: Optional[jax.Array] = None,
                    slice_chunk: Optional[int] = None,
                    return_raw: bool = False,
                    aggregate: str = 'auto',
                    weights_grad: bool = True) -> jax.Array:
    """Embed neighborhoods given as a dense `NeighborTable`.

    X: (num_nodes, d_in).  Returns (num_recipients, d_out) (or
    (R, nSlices, nFreqs) in non-collapsed cartesian mode).
    With return_raw=True, returns (emb_before_finalize, w_sum) -- used by
    the degree-bucketed MultiTable assembler.
    `aggregate` selects the per-neighborhood aggregation backend
    (see `_resolve_aggregate`).  `weights_grad=False` declares the table
    weights non-differentiated data (the GNN adjacency case): the rank
    kernel then skips the dwn/dpad transposed-mask loop -- about half its
    backward cost -- and returns zero weight cotangents.
    """
    w = table.weight                                               # (R, B)
    dt = X.dtype
    agg = _resolve_aggregate(
        aggregate, cfg, table.bucket_size, weights_grad,
        s_eff=(cfg.nSlices if slice_chunk is None
               else min(slice_chunk, cfg.nSlices)))

    w_sum = jnp.sum(w, axis=-1)                                    # (R,)
    w_sum_padded = lowclamp(w_sum, cfg.total_mass_pad_thresh)
    pad_norm = lowclamp(cfg.total_mass_pad_thresh - w_sum, 0.0) / w_sum_padded
    wn = w / w_sum_padded[:, None]                                 # (R, B)

    # Fused-projection rank kernel: when the feature width D = d_in+d_edge
    # is below the (per-chunk) slice width, gather RAW sender rows (T, D)
    # and project on the MXU inside the kernel -- the XLA-side gather and
    # the backward scatter-add then move (T, D) instead of (T, S), the
    # round-2 step's main non-kernel cost (measured: headline step 9.76 ->
    # 7.77 ms).  Z is built once, hoisted out of the slice-chunk loop.
    d_eff = cfg.d_in + cfg.d_edge
    s_eff = cfg.nSlices if slice_chunk is None else min(slice_chunk,
                                                        cfg.nSlices)
    use_proj = (agg == 'rank' and not cfg.cartesian_mode and d_eff < s_eff)
    if use_proj:
        f32 = jnp.float32
        Xr = jnp.take(X, table.idx.reshape(-1), axis=0)
        Xr = Xr.reshape(table.idx.shape + (cfg.d_in,))             # (R, B, D)
        if cfg.d_edge > 0:
            assert table.edge_feat is not None
            Xr = jnp.concatenate(
                [Xr, table.edge_feat.astype(Xr.dtype)], axis=-1)
        Z32 = Xr.astype(f32)

    # weights_grad gate: the static flag is stale once weights train
    # (see bucket_quadrature's docstring)
    unif = bool(getattr(table, 'uniform_w', False)) and not weights_grad

    def slices_block(proj_block, f_block):
        """proj_block: (S_blk, d_in+d_edge) slice vectors; f_block freqs."""
        if use_proj:
            from .ops.fsw_rank_pallas import fsw_rank_aggregate_proj
            out = fsw_rank_aggregate_proj(
                Z32, wn.astype(jnp.float32), pad_norm.astype(jnp.float32),
                f_block.astype(jnp.float32),
                proj_block.T.astype(jnp.float32), None,
                jax.default_backend() == 'cpu', weights_grad, unif)
            return out.astype(dt)                                  # (R, S)

        Xp = X @ proj_block[:, :cfg.d_in].T                        # (N, S_blk)
        P = jnp.take(Xp, table.idx.reshape(-1), axis=0)
        P = P.reshape(table.idx.shape + (Xp.shape[1],))            # (R, B, S)
        if cfg.d_edge > 0:
            assert table.edge_feat is not None
            P = P + table.edge_feat @ proj_block[:, cfg.d_in:].T

        return bucket_quadrature(P, wn, pad_norm, f_block, cfg, agg,
                                 weights_grad, uniform_w=unif)

    S = cfg.nSlices
    if cfg.cartesian_mode:
        slice_freqs = jnp.broadcast_to(freqs, (S,) + freqs.shape)
    else:
        slice_freqs = freqs

    if slice_chunk is None or slice_chunk >= S:
        emb = slices_block(projVecs, slice_freqs)
    else:
        n_chunks = -(-S // slice_chunk)
        S_pad = n_chunks * slice_chunk
        V_pad = jnp.pad(projVecs, ((0, S_pad - S), (0, 0)))
        f_pad = jnp.pad(slice_freqs, ((0, S_pad - S),) + ((0, 0),) *
                        (slice_freqs.ndim - 1))
        V_chunks = V_pad.reshape(n_chunks, slice_chunk, projVecs.shape[1])
        f_chunks = f_pad.reshape((n_chunks, slice_chunk) +
                                 slice_freqs.shape[1:])
        emb = jax.lax.map(lambda pf: slices_block(pf[0], pf[1]),
                          (V_chunks, f_chunks))
        emb = jnp.moveaxis(emb, 0, 1)                              # (R, nc, chunk, ...)
        emb = emb.reshape((emb.shape[0], S_pad) + emb.shape[3:])[:, :S]

    if return_raw:
        return emb.astype(dt), w_sum
    return _finalize(emb.astype(dt), w_sum, cfg, bias, total_mass_scale)


def fsw_embed_multi_table(X: jax.Array,
                          mt,
                          projVecs: jax.Array,
                          freqs: jax.Array,
                          cfg: FSWConfig,
                          bias: Optional[jax.Array] = None,
                          total_mass_scale: Optional[jax.Array] = None,
                          slice_chunk: Optional[int] = None,
                          aggregate: str = 'auto',
                          weights_grad: bool = True) -> jax.Array:
    """Embed a degree-bucketed `MultiTable`: each degree class runs the
    width-B_c table pipeline, outputs scatter back into recipient order
    (row-oriented scatter, fast on TPU), then finalize once.  Under
    aggregate='auto' narrow classes use the fused rank kernel and wide
    classes the XLA sort path (per-class resolution)."""
    dt = X.dtype
    R = mt.num_recipients
    tail = ((cfg.nSlices, cfg.nFreqs) if cfg.cartesian_mode
            else (cfg.nSlices,))
    emb = jnp.zeros((R + 1,) + tail, dt)
    w_sum = jnp.zeros((R + 1,), dt)
    for tbl, ids in zip(mt.tables, mt.row_ids):
        raw, ws = fsw_embed_table(X, tbl, projVecs, freqs, cfg,
                                  slice_chunk=slice_chunk, return_raw=True,
                                  aggregate=aggregate,
                                  weights_grad=weights_grad)
        emb = emb.at[ids].set(raw.astype(dt))
        w_sum = w_sum.at[ids].set(ws.astype(dt))
    emb = emb[:R]
    w_sum = w_sum[:R]
    return _finalize(emb, w_sum, cfg, bias, total_mass_scale)


# ---------------------------------------------------------------------------
# Dense graph-mode path  (dense W branch with graph_mode=True,
# fsw_embedding.py:983-1004 with recipient axis)
# ---------------------------------------------------------------------------

def fsw_embed_graph_dense(X: jax.Array,
                          W: jax.Array,
                          projVecs: jax.Array,
                          freqs: jax.Array,
                          cfg: FSWConfig,
                          X_edge: Optional[jax.Array] = None,
                          bias: Optional[jax.Array] = None,
                          total_mass_scale: Optional[jax.Array] = None,
                          slice_chunk: Optional[int] = None) -> jax.Array:
    """Graph mode with a dense adjacency W: (..., R, n); X: (..., n, d_in).

    X_edge: (..., R, n, d_edge) or (..., R, n) when d_edge == 1
    (fsw_embedding.py:744-757).
    Returns (..., R, d_out).  `slice_chunk` serializes the slice axis to cap
    the (..., R, n, S_chunk) peak (the reference's serialize_num_slices,
    fsw_embedding.py:620-623, 839-851).
    """
    n = W.shape[-1]

    w_sum = jnp.sum(W, axis=-1)                                    # (..., R)
    w_sum_padded = lowclamp(w_sum, cfg.total_mass_pad_thresh)
    pad_norm = lowclamp(cfg.total_mass_pad_thresh - w_sum, 0.0) / w_sum_padded
    wn = W / w_sum_padded[..., None]                               # (..., R, n)

    if cfg.d_edge > 0:
        assert X_edge is not None
        if X_edge.ndim == W.ndim:
            X_edge = X_edge[..., None]

    def slices_block(proj_block, f_block):
        """proj_block: (Sb, d_in+d_edge); f_block: (Sb,) or (F,) freqs."""
        Xp = jnp.einsum('...nd,sd->...ns', X, proj_block[:, :cfg.d_in])
        if cfg.d_edge > 0:
            Ep = jnp.einsum('...rne,se->...rns', X_edge,
                            proj_block[:, cfg.d_in:])
            P = Xp[..., None, :, :] + Ep                           # (..., R, n, Sb)
        else:
            P = jnp.broadcast_to(Xp[..., None, :, :],
                                 W.shape[:-1] + Xp.shape[-2:])     # (..., R, n, Sb)

        keys = jnp.moveaxis(P, -2, -1)                             # (..., R, Sb, n)
        ps, ws = sort_pairs_fused(
            keys, jnp.broadcast_to(wn[..., None, :], keys.shape))

        c = jnp.cumsum(ws, axis=-1) + pad_norm[..., None, None] * (ps > 0)

        if cfg.cartesian_mode:
            sd = _sinc_diff(ws[..., None], c[..., None], f_block)  # (...,R,Sb,n,F)
            emb = jnp.einsum('...sn,...snf->...sf', ps, sd)
            return (1.0 + f_block) * emb                           # (..., R, Sb, F)
        sd = _sinc_diff(ws, c, f_block[..., :, None])              # (..., R, Sb, n)
        emb = jnp.sum(ps * sd, axis=-1)
        return (1.0 + f_block) * emb                               # (..., R, Sb)

    S = cfg.nSlices
    if slice_chunk is None or slice_chunk >= S:
        emb = slices_block(projVecs, freqs)
    else:
        n_chunks = -(-S // slice_chunk)
        S_pad = n_chunks * slice_chunk
        V_pad = jnp.pad(projVecs, ((0, S_pad - S), (0, 0)))
        V_chunks = V_pad.reshape(n_chunks, slice_chunk, projVecs.shape[1])
        if cfg.cartesian_mode:
            emb = jax.lax.map(lambda v: slices_block(v, freqs), V_chunks)
            # (n_chunks, ..., R, chunk, F) -> (..., R, S, F)
            emb = jnp.moveaxis(emb, 0, -3)
            emb = emb.reshape(emb.shape[:-3] +
                              (S_pad,) + emb.shape[-1:])[..., :S, :]
        else:
            f_pad = jnp.pad(freqs, (0, S_pad - S))
            f_chunks = f_pad.reshape(n_chunks, slice_chunk)
            emb = jax.lax.map(lambda vf: slices_block(vf[0], vf[1]),
                              (V_chunks, f_chunks))
            emb = jnp.moveaxis(emb, 0, -2)
            emb = emb.reshape(emb.shape[:-2] + (S_pad,))[..., :S]

    return _finalize(emb, w_sum, cfg, bias, total_mass_scale)
