"""Pallas segcumsum kernel vs the numpy oracle (interpreter mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fsw_gnn_tpu.ops.segcumsum_pallas import segcumsum_pallas


def _oracle(values, ids):
    out = np.zeros_like(values)
    acc = {}
    for i, (v, s) in enumerate(zip(values, ids)):
        acc[s] = acc.get(s, 0.0) + v
        out[i] = acc[s]
    return out


@pytest.mark.parametrize('n,nseg,rows', [
    (128, 1, 8),           # single segment, single row
    (1000, 37, 8),         # boundary mid-lane, padding tail
    (8192, 100, 8),        # multiple blocks -> carry across tiles
    (70000, 5, 64),        # long segments spanning many tiles
    (4096, 4096, 8),       # every element its own segment
])
def test_segcumsum_pallas_matches_oracle(n, nseg, rows):
    rng = np.random.default_rng(n)
    ids = np.sort(rng.integers(0, nseg, n)).astype(np.int32)
    vals = rng.standard_normal(n).astype(np.float32)
    got = segcumsum_pallas(jnp.asarray(vals), jnp.asarray(ids),
                           rows_per_block=rows, interpret=True)
    want = _oracle(vals.astype(np.float64), ids)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('n,nseg,rows', [
    (1000, 37, 8),         # avg seg ~27 -> 5-6 lane passes, no row scan
    (8192, 100, 8),        # avg ~82, crosses tiles
    (70000, 5, 64),        # segments ~14k -> full lane scan + deep row scan
    (4096, 4096, 8),       # singletons -> max_seg 1..few, minimal passes
])
def test_segcumsum_pallas_max_seg_size(n, nseg, rows):
    """Capped doubling passes (the reference's max_seg_size contract,
    fsw_embedding.py:2812-2820) must stay exact for an honest bound."""
    rng = np.random.default_rng(n + 1)
    ids = np.sort(rng.integers(0, nseg, n)).astype(np.int32)
    vals = rng.standard_normal(n).astype(np.float32)
    max_seg = int(np.max(np.bincount(ids)))
    got = segcumsum_pallas(jnp.asarray(vals), jnp.asarray(ids),
                           rows_per_block=rows, interpret=True,
                           max_seg_size=max_seg)
    want = _oracle(vals.astype(np.float64), ids)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_segcumsum_pallas_max_seg_exact_boundaries():
    """Power-of-two and off-by-one bounds around the lane width."""
    rng = np.random.default_rng(7)
    for seg_len in (1, 2, 127, 128, 129, 256):
        n = seg_len * 7
        ids = np.repeat(np.arange(7, dtype=np.int32), seg_len)
        vals = rng.standard_normal(n).astype(np.float32)
        got = segcumsum_pallas(jnp.asarray(vals), jnp.asarray(ids),
                               rows_per_block=8, interpret=True,
                               max_seg_size=seg_len)
        want = _oracle(vals.astype(np.float64), ids)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                                   atol=2e-5, err_msg=f'seg_len={seg_len}')


def test_segment_restart_precision():
    """Per-segment restart: a huge earlier segment must not pollute later
    small segments (the weakness of the cumsum-minus-base formulation)."""
    n = 2048
    ids = np.concatenate([np.zeros(n // 2, np.int32),
                          np.ones(n // 2, np.int32)])
    vals = np.concatenate([np.full(n // 2, 1e6, np.float32),
                           np.full(n // 2, 1e-3, np.float32)])
    got = np.asarray(segcumsum_pallas(jnp.asarray(vals), jnp.asarray(ids),
                                      interpret=True))
    want = _oracle(vals.astype(np.float64), ids)
    # second segment must be accurate to f32 eps of ITS OWN magnitude
    second = slice(n // 2, None)
    np.testing.assert_allclose(got[second], want[second], rtol=1e-5)


# ---------------------------------------------------------------------------
# One-pass MXU formulation: triangular-matmul full prefix + fill-forward
# base subtraction (method='matmul'), with the nonnegative running-max
# shortcut (monotone prefix).

@pytest.mark.parametrize('nonneg', [False, True])
@pytest.mark.parametrize('n,nseg,rows', [
    (128, 1, 8),           # single segment, single row
    (1000, 37, 8),         # boundary mid-lane, padding tail
    (8192, 100, 8),        # multiple blocks -> carry across tiles
    (70000, 5, 64),        # long segments spanning many tiles
    (4096, 4096, 8),       # every element its own segment
])
def test_segcumsum_matmul_matches_oracle(n, nseg, rows, nonneg):
    rng = np.random.default_rng(n + 13)
    ids = np.sort(rng.integers(0, nseg, n)).astype(np.int32)
    vals = rng.standard_normal(n).astype(np.float32)
    if nonneg:
        vals = np.abs(vals)
    got = segcumsum_pallas(jnp.asarray(vals), jnp.asarray(ids),
                           rows_per_block=rows, interpret=True,
                           method='matmul', nonnegative=nonneg)
    want = _oracle(vals.astype(np.float64), ids)
    # atol covers f32 accumulation noise over multi-thousand-element
    # segment prefixes with cancellation (error ~ eps * running prefix,
    # the same class as the scan path, different summation tree)
    atol = 1e-4 if n // max(nseg, 1) > 4096 else 2e-5
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=atol)


@pytest.mark.parametrize('nonneg', [False, True])
def test_segcumsum_matmul_max_seg_size(nonneg):
    """The fill-forward's doubling passes honor the same max_seg_size
    contract as the direct scan (nearest previous segment end is at most
    max_seg_size lanes back)."""
    rng = np.random.default_rng(77)
    for seg_len in (1, 2, 5, 127, 128, 129, 256):
        n = seg_len * 7
        ids = np.repeat(np.arange(7, dtype=np.int32), seg_len)
        vals = rng.standard_normal(n).astype(np.float32)
        if nonneg:
            vals = np.abs(vals)
        got = segcumsum_pallas(jnp.asarray(vals), jnp.asarray(ids),
                               rows_per_block=8, interpret=True,
                               max_seg_size=seg_len, method='matmul',
                               nonnegative=nonneg)
        want = _oracle(vals.astype(np.float64), ids)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                                   atol=2e-5, err_msg=f'seg_len={seg_len}')


def test_segcumsum_matmul_restart_precision():
    """The matmul formulation's error is bounded by the IN-ROW 128-element
    prefix, not the global prefix: a huge segment in an earlier ROW must
    not pollute later small segments."""
    n = 2048
    ids = np.concatenate([np.zeros(n // 2, np.int32),
                          np.ones(n // 2, np.int32)])
    vals = np.concatenate([np.full(n // 2, 1e6, np.float32),
                           np.full(n // 2, 1e-3, np.float32)])
    got = np.asarray(segcumsum_pallas(jnp.asarray(vals), jnp.asarray(ids),
                                      interpret=True, method='matmul',
                                      nonnegative=True))
    want = _oracle(vals.astype(np.float64), ids)
    second = slice(n // 2, None)
    np.testing.assert_allclose(got[second], want[second], rtol=1e-5)


@pytest.mark.parametrize('n,nseg,rows', [
    (128, 1, 8),           # single segment, single row
    (1000, 37, 8),         # boundary mid-lane, padding tail
    (8192, 100, 8),        # multiple blocks -> carry across tiles
    (70000, 5, 64),        # long segments spanning many tiles
    (4096, 4096, 8),       # every element its own segment
])
def test_segcumsum_boundary_mask_matches_oracle(n, nseg, rows):
    """The boundary-mask kernel (round 4: 9 B/element stream, no
    id-comparison layer, 1.10-1.19x at long segments) matches
    the oracle AND the ids-driven matmul kernel across the same carry
    scenarios."""
    from fsw_gnn_tpu.ops.segcumsum_pallas import segment_boundaries
    rng = np.random.default_rng(n + 29)
    ids = np.sort(rng.integers(0, nseg, n)).astype(np.int32)
    vals = np.abs(rng.standard_normal(n)).astype(np.float32)
    m = segment_boundaries(jnp.asarray(ids))
    got = segcumsum_pallas(jnp.asarray(vals), None,
                           rows_per_block=rows, interpret=True,
                           nonnegative=True, boundaries=m)
    want = _oracle(vals.astype(np.float64), ids)
    atol = 1e-4 if n // max(nseg, 1) > 4096 else 2e-5
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=atol)
    ref = segcumsum_pallas(jnp.asarray(vals), jnp.asarray(ids),
                           rows_per_block=rows, interpret=True,
                           method='matmul', nonnegative=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_segcumsum_boundary_mask_max_seg_size():
    from fsw_gnn_tpu.ops.segcumsum_pallas import segment_boundaries
    rng = np.random.default_rng(78)
    for seg_len in (1, 2, 5, 127, 128, 129, 256):
        n = seg_len * 7
        ids = np.repeat(np.arange(7, dtype=np.int32), seg_len)
        vals = np.abs(rng.standard_normal(n)).astype(np.float32)
        got = segcumsum_pallas(
            jnp.asarray(vals), None, rows_per_block=8, interpret=True,
            max_seg_size=seg_len, nonnegative=True,
            boundaries=segment_boundaries(jnp.asarray(ids)))
        want = _oracle(vals.astype(np.float64), ids)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                                   atol=2e-5, err_msg=f'seg_len={seg_len}')


@pytest.mark.parametrize('kind', ['mask', 'matmul'])
def test_segcumsum_bf16x3_precision(kind):
    """precision='bf16x3' (3 lossless-split MXU passes; round 5) keeps the
    eps-x-in-row-prefix error class of 'highest' on both matmul kernels.

    Interpret mode checks the DECOMPOSITION algebra only; the MXU-pass
    behavior itself was validated on HW (probe_fill_floor phase 2:
    max rel diff vs 'highest' 1.5e-5 ~ 2*128*eps at 16M elements)."""
    from fsw_gnn_tpu.ops.segcumsum_pallas import segment_boundaries
    rng = np.random.default_rng(91)
    n, nseg = 8192, 40
    ids = np.sort(rng.integers(0, nseg, n)).astype(np.int32)
    vals = np.abs(rng.standard_normal(n)).astype(np.float32)
    kw = (dict(boundaries=segment_boundaries(jnp.asarray(ids)),
               segment_ids=None) if kind == 'mask'
          else dict(segment_ids=jnp.asarray(ids), method='matmul'))
    got = segcumsum_pallas(jnp.asarray(vals), rows_per_block=8,
                           interpret=True, nonnegative=True,
                           precision='bf16x3', **kw)
    want = _oracle(vals.astype(np.float64), ids)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-5, atol=3e-5)
