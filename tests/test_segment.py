"""Unit tests for segmented primitives vs O(n) numpy oracles.

Oracle semantics match the reference's `segcumsum_slow`
(/root/reference/fsw_embedding.py:3016-3027) and `segcumsum_torch_main`
(py:2853-2874).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fsw_gnn_tpu.ops.segment import (
    segment_cumsum, segment_sort, segment_sum, segment_argsort,
    row_ptr_to_segment_ids, segment_ids_to_row_ptr)


def _random_segments(rng, n, max_segments):
    ids = np.sort(rng.integers(0, max_segments, size=n))
    return ids.astype(np.int32)


def _segcumsum_oracle(values, ids):
    out = np.zeros_like(values)
    acc = {}
    for i, (v, s) in enumerate(zip(values, ids)):
        acc[s] = acc.get(s, 0.0) + v
        out[i] = acc[s]
    return out


@pytest.mark.parametrize('n,max_seg', [(1, 1), (17, 3), (1000, 50), (4096, 1)])
def test_segment_cumsum(n, max_seg):
    rng = np.random.default_rng(0)
    ids = _random_segments(rng, n, max_seg)
    vals = rng.standard_normal(n)
    got = segment_cumsum(jnp.asarray(vals), jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), _segcumsum_oracle(vals, ids),
                               rtol=1e-12, atol=1e-12)


def test_segment_cumsum_with_row_ptr():
    rng = np.random.default_rng(1)
    n, nseg = 500, 20
    ids = _random_segments(rng, n, nseg)
    vals = rng.standard_normal(n)
    row_ptr = segment_ids_to_row_ptr(jnp.asarray(ids), nseg)
    got = segment_cumsum(jnp.asarray(vals), jnp.asarray(ids), row_ptr)
    np.testing.assert_allclose(np.asarray(got), _segcumsum_oracle(vals, ids),
                               rtol=1e-12, atol=1e-12)


def test_segment_cumsum_multidim():
    rng = np.random.default_rng(2)
    n, nseg, k = 300, 11, 7
    ids = _random_segments(rng, n, nseg)
    vals = rng.standard_normal((n, k))
    got = np.asarray(segment_cumsum(jnp.asarray(vals), jnp.asarray(ids)))
    for j in range(k):
        np.testing.assert_allclose(got[:, j],
                                   _segcumsum_oracle(vals[:, j], ids),
                                   rtol=1e-12, atol=1e-12)


def test_segment_sort_matches_per_segment_numpy():
    rng = np.random.default_rng(3)
    n, nseg = 777, 13
    ids = _random_segments(rng, n, nseg)
    keys = rng.standard_normal(n)
    carry = rng.standard_normal(n)
    ks, cs = segment_sort(jnp.asarray(keys), jnp.asarray(carry),
                          segment_ids=jnp.asarray(ids))
    ks, cs = np.asarray(ks), np.asarray(cs)
    for s in range(nseg):
        m = ids == s
        exp_order = np.argsort(keys[m], kind='stable')
        np.testing.assert_allclose(ks[m], keys[m][exp_order])
        np.testing.assert_allclose(cs[m], carry[m][exp_order])


def test_segment_argsort_is_valid_permutation():
    rng = np.random.default_rng(4)
    ids = _random_segments(rng, 256, 9)
    keys = rng.standard_normal(256)
    perm = np.asarray(segment_argsort(jnp.asarray(keys), jnp.asarray(ids)))
    assert sorted(perm.tolist()) == list(range(256))
    np.testing.assert_array_equal(ids[perm], ids)  # stays within segments


def test_row_ptr_roundtrip():
    rng = np.random.default_rng(5)
    nseg = 17
    ids = _random_segments(rng, 400, nseg)
    rp = segment_ids_to_row_ptr(jnp.asarray(ids), nseg)
    back = row_ptr_to_segment_ids(rp, 400)
    np.testing.assert_array_equal(np.asarray(back), ids)


def test_segment_cumsum_grad():
    """d/dv of sum(segcumsum(v)) = (count of elements at/after v in its segment)."""
    rng = np.random.default_rng(6)
    n, nseg = 64, 5
    ids = _random_segments(rng, n, nseg)
    vals = jnp.asarray(rng.standard_normal(n))
    g = jax.grad(lambda v: segment_cumsum(v, jnp.asarray(ids)).sum())(vals)
    expected = np.zeros(n)
    for i in range(n):
        expected[i] = np.sum((ids >= ids[i]) & (np.arange(n) >= i) & (ids == ids[i]))
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-12)
