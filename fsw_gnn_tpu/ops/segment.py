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
                   num_segments: int | None = None) -> jax.Array:
    """Inclusive cumulative sum within each segment.

    `segment_ids` must be sorted (non-decreasing).  If `row_ptr` is given
    (shape (num_segments+1,), row_ptr[s] = first index of segment s), the
    segment bases are gathered directly; otherwise they are derived from a
    boundary mask.

    Implementation: one global inclusive cumsum, then subtract each segment's
    exclusive prefix (the global cumsum just before the segment start).  This
    is O(E) with a single log-depth scan, the XLA-friendly formulation of the
    reference's hierarchical block scan (fsw_embedding.cu:35-117).
    """
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
