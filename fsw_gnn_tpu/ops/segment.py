"""Segmented primitives on static CSR-segment layouts.

TPU-native replacements for the reference's segcumsum CUDA kernel
(/root/reference/fsw_embedding.cu:35-236) and the host-side hierarchy driver
(/root/reference/fsw_embedding.py:2878-3012), plus the sorted-slice machinery
(`sp.get_slice_info`, fsw_embedding.py:2586-2663).

Design: instead of COO tensors with per-op argsort/coalesce, all graph data
lives in a static CSR-segment layout -- a flat edge array sorted by segment id
(destination node), with `row_ptr` marking segment starts.  Segment membership
never changes at runtime, so "slice info" is computed once on the host and all
segmented ops become O(E) gathers/scans that XLA maps onto the VPU.

The segmented cumulative sum here is numerically the same operation as the
reference's `segcumsum_torch_main` (fsw_embedding.py:2853-2874): an inclusive
cumsum restarted at every segment boundary.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def segment_cumsum(values: jax.Array, segment_ids: jax.Array,
                   row_ptr: jax.Array | None = None,
                   num_segments: int | None = None,
                   method: str = 'restart') -> jax.Array:
    """Inclusive cumulative sum within each segment.

    `segment_ids` must be sorted (non-decreasing).  Numerically the same
    operation as the reference's `segcumsum_torch_main`
    (fsw_embedding.py:2853-2874): an inclusive cumsum restarted at every
    segment boundary.

    method='restart' (default): a log-depth `lax.associative_scan` over the
    segmented-sum monoid  (v1,f1) * (v2,f2) = (v2 + v1*(1-f2), f1|f2)  with
    f marking segment starts.  The scan restarts at each boundary, so the
    rounding error per element is ~eps * (segment prefix), matching the
    per-bucket table path and the Pallas kernel -- NOT eps * (global
    prefix).

    method='global': one global inclusive cumsum minus each segment's
    exclusive prefix at its start.  Cheaper (single plain cumsum) but at f32
    the absolute error grows like eps * global_prefix (~0.1 at 131k edges /
    8k segments -- measured, see BENCH.md); only use where that is
    acceptable (f64, or small edge counts).

    Compile-scale caveat (measured): 'restart' compiles fine at the CSR
    path's sizes (~100k-1M elements) but the associative_scan's lowering
    takes pathologically long at ~16M elements (never finished through
    this environment's remote-compile service); at that scale use
    `segcumsum_pallas` (same restart-exact numerics, one kernel) or
    method='global'.
    """
    if method == 'restart':
        # boundary flags straight from the (sorted) ids -- no scatter
        is_start = jnp.concatenate([
            jnp.ones((1,), dtype=bool),
            segment_ids[1:] != segment_ids[:-1]])
        if values.ndim > 1:
            is_start = is_start.reshape((-1,) + (1,) * (values.ndim - 1))
        flags = jnp.broadcast_to(is_start, values.shape)

        def combine(a, b):
            va, fa = a
            vb, fb = b
            return jnp.where(fb, vb, va + vb), jnp.logical_or(fa, fb)

        out, _ = jax.lax.associative_scan(combine, (values, flags), axis=0)
        return out

    incl = jnp.cumsum(values, axis=0)
    # exclusive cumsum by shift (exact), feeds the per-segment base gather
    excl = jnp.concatenate(
        [jnp.zeros((1,) + values.shape[1:], values.dtype), incl[:-1]], axis=0)
    if row_ptr is not None:
        base = excl[jnp.clip(row_ptr[:-1], 0, values.shape[0] - 1)]
        return incl - jnp.take(base, segment_ids, axis=0)
    # no row_ptr: locate each element's segment start via a running max of
    # boundary indices, then subtract the exclusive prefix at that start
    is_start = jnp.concatenate([
        jnp.ones((1,), dtype=bool), segment_ids[1:] != segment_ids[:-1]])
    idx = jnp.arange(values.shape[0], dtype=jnp.int32)
    start_idx = jax.lax.cummax(jnp.where(is_start, idx, 0), axis=0)
    return incl - jnp.take(excl, start_idx, axis=0)


def segment_sum(values: jax.Array, segment_ids: jax.Array,
                num_segments: int) -> jax.Array:
    """Sum of values per segment (sorted segment ids)."""
    return jax.ops.segment_sum(values, segment_ids, num_segments,
                               indices_are_sorted=True)


def segment_sort(keys: jax.Array, *carried: jax.Array,
                 segment_ids: jax.Array, stable: bool = True):
    """Sort `keys` ascending *within* each segment, carrying extra arrays.

    Uses a single lexicographic `lax.sort` over (segment_ids, keys): since
    segment ids are the primary key and already sorted, elements never leave
    their segment, and within a segment they are ordered by `keys`.  This is
    the TPU-native equivalent of the reference's `ag.sort_sparse`
    (fsw_embedding.py:2075-2136), which argsorts values then re-stable-sorts
    by slice key.

    Returns (sorted_keys, *sorted_carried).
    """
    out = jax.lax.sort((segment_ids, keys) + tuple(carried),
                       dimension=0, is_stable=stable, num_keys=2)
    return (out[1],) + tuple(out[2:])


def segment_argsort(keys: jax.Array, segment_ids: jax.Array,
                    stable: bool = True) -> jax.Array:
    """Permutation that sorts keys ascending within each (sorted) segment."""
    n = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    _, perm = segment_sort(keys, idx, segment_ids=segment_ids, stable=stable)
    return perm


# ---------------------------------------------------------------------------
# Scatter-free differentiable gathers.
#
# XLA lowers the adjoint of a gather to a scatter(-add), which is slow on
# TPU.  Both gathers in the FSW pipeline have structure that lets the
# backward pass be a gather/segment-sum instead:
#   * a *permutation* gather's adjoint is a gather by the inverse
#     permutation;
#   * the sender-row gather's adjoint is a sum of cotangent rows per sender,
#     i.e. a segment-sum after reordering edges by sender -- an order that is
#     static per graph and precomputed on the host.
# ---------------------------------------------------------------------------


def invert_permutation(perm: jax.Array) -> jax.Array:
    """Inverse of a permutation via one int sort (scatter-free)."""
    iota = jnp.arange(perm.shape[0], dtype=jnp.int32)
    _, inv = jax.lax.sort((perm, iota), dimension=0, num_keys=1)
    return inv


@jax.custom_vjp
def permutation_gather(x: jax.Array, perm: jax.Array,
                       inv_perm: jax.Array) -> jax.Array:
    """x[perm] with a gather-by-inverse backward instead of a scatter."""
    return jnp.take(x, perm, axis=0)


def _pg_fwd(x, perm, inv_perm):
    return jnp.take(x, perm, axis=0), inv_perm


def _pg_bwd(inv_perm, ct):
    return jnp.take(ct, inv_perm, axis=0), None, None


permutation_gather.defvjp(_pg_fwd, _pg_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def rows_gather(num_rows: int, x: jax.Array, idx: jax.Array,
                idx_order: jax.Array, idx_sorted: jax.Array) -> jax.Array:
    """x[idx] whose backward is a sorted segment-sum, not a scatter-add.

    idx_order is a permutation sorting idx ascending (host-precomputed);
    idx_sorted = idx[idx_order].  num_rows = x.shape[0] (static).
    """
    return jnp.take(x, idx, axis=0)


def _rg_fwd(num_rows, x, idx, idx_order, idx_sorted):
    return jnp.take(x, idx, axis=0), (idx_order, idx_sorted)


def _rg_bwd(num_rows, res, ct):
    idx_order, idx_sorted = res
    d = jax.ops.segment_sum(jnp.take(ct, idx_order, axis=0), idx_sorted,
                            num_rows, indices_are_sorted=True)
    return d, None, None, None


rows_gather.defvjp(_rg_fwd, _rg_bwd)


@jax.custom_vjp
def segment_sort_fused(keys: jax.Array, carried: jax.Array,
                       segment_ids: jax.Array):
    """Segmented sort of (keys, carried) with a scatter-free backward.

    Forward: ONE lex sort carrying both payloads and an iota (the
    permutation).  Backward: one int sort inverts the permutation, then the
    cotangents are plain gathers.  Returns (sorted_keys, sorted_carried).
    """
    out = jax.lax.sort((segment_ids, keys, carried),
                       dimension=0, is_stable=True, num_keys=2)
    return out[1], out[2]


def _ssf_fwd(keys, carried, segment_ids):
    iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    _, ks, cs, perm = jax.lax.sort((segment_ids, keys, carried, iota),
                                   dimension=0, is_stable=True, num_keys=2)
    return (ks, cs), perm


def _ssf_bwd(perm, cts):
    # Unsort by SORTING: sorting the cotangents with perm as the key routes
    # ct[i] to original position perm[i].  On TPU a sort (structured merge
    # network) is ~3x faster than an elementwise gather/scatter along the
    # edge axis, and it moves both cotangents in one pass.
    ct_keys, ct_carried = cts
    _, dk, dc = jax.lax.sort((perm, ct_keys, ct_carried), dimension=0,
                             num_keys=1)
    return dk, dc, None


segment_sort_fused.defvjp(_ssf_fwd, _ssf_bwd)


@jax.custom_vjp
def sort_pairs_fused(keys: jax.Array, carried: jax.Array):
    """Sort (keys asc) carrying `carried`, along the LAST axis, batched over
    leading axes, with the sort-based-unsort backward (one extra sort keyed
    on the permutation instead of elementwise scatters/gathers)."""
    out = jax.lax.sort((keys, carried), dimension=-1, is_stable=True,
                       num_keys=1)
    return out[0], out[1]


def _spf_fwd(keys, carried):
    iota = jnp.broadcast_to(
        jnp.arange(keys.shape[-1], dtype=jnp.int32), keys.shape)
    ks, cs, perm = jax.lax.sort((keys, carried, iota), dimension=-1,
                                is_stable=True, num_keys=1)
    return (ks, cs), perm


def _spf_bwd(perm, cts):
    ct_keys, ct_carried = cts
    _, dk, dc = jax.lax.sort((perm, ct_keys, ct_carried), dimension=-1,
                             num_keys=1)
    return dk, dc


sort_pairs_fused.defvjp(_spf_fwd, _spf_bwd)


@jax.custom_vjp
def sort_keys_fused(keys: jax.Array):
    """Sort keys ascending along the LAST axis (batched over leading axes)
    with the sort-based-unsort backward: one sort keyed on the saved
    permutation instead of elementwise scatters (the round-1 measured 2.6x
    law, same as sort_pairs_fused).  Carries NOTHING -- half the sort
    payload of sort_pairs_fused, for paths whose non-key payload is static
    (e.g. the uniform-weight multiset grid quadrature)."""
    return jax.lax.sort(keys, dimension=-1, is_stable=True)


def _skf_fwd(keys):
    iota = jnp.broadcast_to(
        jnp.arange(keys.shape[-1], dtype=jnp.int32), keys.shape)
    ks, perm = jax.lax.sort((keys, iota), dimension=-1, is_stable=True,
                            num_keys=1)
    return ks, perm


def _skf_bwd(perm, ct):
    _, dk = jax.lax.sort((perm, ct), dimension=-1, num_keys=1)
    return (dk,)


sort_keys_fused.defvjp(_skf_fwd, _skf_bwd)


def sort_perm_by_segmented_keys(keys: jax.Array, segment_ids: jax.Array):
    """(perm, inv_perm) ordering keys ascending within sorted segments."""
    iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    _, _, perm = jax.lax.sort((segment_ids, keys, iota), dimension=0,
                              is_stable=True, num_keys=2)
    return perm, invert_permutation(perm)


def row_ptr_to_segment_ids(row_ptr: jax.Array, num_edges: int) -> jax.Array:
    """Expand CSR row pointers to per-edge segment ids (host or device)."""
    num_segments = row_ptr.shape[0] - 1
    # searchsorted: edge e belongs to segment s iff row_ptr[s] <= e < row_ptr[s+1]
    return jnp.searchsorted(row_ptr[1:], jnp.arange(num_edges, dtype=row_ptr.dtype),
                            side='right').astype(jnp.int32)


def segment_ids_to_row_ptr(segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """CSR row pointers from sorted per-edge segment ids."""
    counts = jax.ops.segment_sum(
        jnp.ones_like(segment_ids, dtype=jnp.int32), segment_ids,
        num_segments, indices_are_sorted=True)
    return jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts).astype(jnp.int32)])
