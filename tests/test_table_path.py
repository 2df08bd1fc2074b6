"""Parity of the bucketed NeighborTable fast path vs the CSR path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fsw_gnn_tpu import (FSWConfig, FSWConv, from_edge_index, fsw_embed_graph,
                         fsw_embed_table, to_neighbor_table)


def _random_graph(rng, n, p=0.2):
    A = rng.random((n, n)) < p
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    return np.stack([src, dst]).astype(np.int64)


def _params(rng, cfg):
    proj = rng.standard_normal((cfg.nSlices, cfg.proj_dim))
    proj /= np.linalg.norm(proj, axis=1, keepdims=True)
    freqs = np.abs(rng.standard_normal(cfg.nFreqs)) + 0.2
    return jnp.asarray(proj), jnp.asarray(freqs)


@pytest.mark.parametrize('cartesian', [False, True])
def test_table_matches_csr(cartesian):
    rng = np.random.default_rng(0)
    n, d_in = 40, 5
    if cartesian:
        cfg = FSWConfig(d_in=d_in, n_slices=6, n_freqs=4, enable_bias=False)
    else:
        cfg = FSWConfig(d_in=d_in, d_out=9, enable_bias=False)
    proj, freqs = _params(rng, cfg)
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    g = from_edge_index(_random_graph(rng, n), n, dtype=jnp.float64)
    t = to_neighbor_table(g)

    a = fsw_embed_graph(X, g, proj, freqs, cfg)
    b = fsw_embed_table(X, t, proj, freqs, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-10, atol=1e-12)


def test_table_matches_csr_edge_features():
    rng = np.random.default_rng(1)
    n, d_in, d_edge = 30, 4, 3
    cfg = FSWConfig(d_in=d_in, d_out=7, d_edge=d_edge, enable_bias=False)
    proj, freqs = _params(rng, cfg)
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    ei = _random_graph(rng, n)
    EF = rng.standard_normal((ei.shape[1], d_edge))
    g = from_edge_index(ei, n, edge_features=EF, dtype=jnp.float64)
    t = to_neighbor_table(g)

    a = fsw_embed_graph(X, g, proj, freqs, cfg)
    b = fsw_embed_table(X, t, proj, freqs, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-10, atol=1e-12)


def test_table_slice_chunking():
    rng = np.random.default_rng(2)
    n, d_in = 25, 4
    cfg = FSWConfig(d_in=d_in, d_out=10, enable_bias=False,
                    encode_total_mass=True)
    proj, freqs = _params(rng, cfg)
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    g = from_edge_index(_random_graph(rng, n), n, dtype=jnp.float64)
    t = to_neighbor_table(g)
    full = fsw_embed_table(X, t, proj, freqs, cfg,
                           total_mass_scale=jnp.asarray(1.0))
    chunked = fsw_embed_table(X, t, proj, freqs, cfg, slice_chunk=4,
                              total_mass_scale=jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               rtol=1e-12, atol=1e-12)


def test_table_gradients_match_csr():
    rng = np.random.default_rng(3)
    n, d_in = 20, 4
    cfg = FSWConfig(d_in=d_in, d_out=6, enable_bias=False)
    proj, freqs = _params(rng, cfg)
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    g = from_edge_index(_random_graph(rng, n), n, dtype=jnp.float64)
    t = to_neighbor_table(g)
    Rv = jnp.asarray(rng.standard_normal((n, 6)))

    ga = jax.grad(lambda X_, p_: jnp.sum(
        fsw_embed_graph(X_, g, p_, freqs, cfg) * Rv), argnums=(0, 1))(X, proj)
    gb = jax.grad(lambda X_, p_: jnp.sum(
        fsw_embed_table(X_, t, p_, freqs, cfg) * Rv), argnums=(0, 1))(X, proj)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-11)


def test_conv_with_table():
    rng = np.random.default_rng(4)
    n, d_in, d_out = 30, 5, 4
    X = jnp.asarray(rng.standard_normal((n, d_in)), jnp.float32)
    g = from_edge_index(_random_graph(rng, n), n)
    t = to_neighbor_table(g)
    conv = FSWConv(in_channels=d_in, out_channels=d_out, mlp_layers=2,
                   minimize_slice_coherence=False)
    variables = conv.init(jax.random.PRNGKey(0), X, t)
    out_t = conv.apply(variables, X, t)
    out_g = conv.apply(variables, X, g)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_g),
                               rtol=2e-4, atol=1e-5)


def test_multi_table_matches_csr():
    from fsw_gnn_tpu import fsw_embed_multi_table, to_multi_table
    rng = np.random.default_rng(30)
    n, d_in = 60, 5
    # heavy-tailed degrees: some hub nodes
    A = rng.random((n, n)) < 0.1
    A[:, :3] |= rng.random((n, 3)) < 0.8   # hubs
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    g = from_edge_index(np.stack([src, dst]), n, dtype=jnp.float64)
    mt = to_multi_table(g)
    assert len(mt.tables) >= 2  # multiple degree classes exercised

    cfg = FSWConfig(d_in=d_in, d_out=9, enable_bias=False,
                    encode_total_mass=True)
    proj, freqs = _params(rng, cfg)
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    a = fsw_embed_graph(X, g, proj, freqs, cfg,
                        total_mass_scale=jnp.asarray(1.0))
    b = fsw_embed_multi_table(X, mt, proj, freqs, cfg,
                              total_mass_scale=jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-10, atol=1e-12)


def test_multi_table_gradients():
    from fsw_gnn_tpu import fsw_embed_multi_table, to_multi_table
    rng = np.random.default_rng(31)
    n, d_in = 30, 4
    g = from_edge_index(_random_graph(rng, n, p=0.25), n, dtype=jnp.float64)
    mt = to_multi_table(g)
    cfg = FSWConfig(d_in=d_in, d_out=6, enable_bias=False)
    proj, freqs = _params(rng, cfg)
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    Rv = jnp.asarray(rng.standard_normal((n, 6)))
    ga = jax.grad(lambda X_, p_: jnp.sum(
        fsw_embed_graph(X_, g, p_, freqs, cfg) * Rv), argnums=(0, 1))(X, proj)
    gb = jax.grad(lambda X_, p_: jnp.sum(
        fsw_embed_multi_table(X_, mt, p_, freqs, cfg) * Rv),
        argnums=(0, 1))(X, proj)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-11)


def test_multi_table_edge_features():
    from fsw_gnn_tpu import fsw_embed_multi_table, to_multi_table
    rng = np.random.default_rng(32)
    n, d_in, d_edge = 40, 4, 2
    A = rng.random((n, n)) < 0.15
    A[:, :2] |= rng.random((n, 2)) < 0.7
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    ei = np.stack([src, dst])
    EF = rng.standard_normal((ei.shape[1], d_edge))
    g = from_edge_index(ei, n, edge_features=EF, dtype=jnp.float64)
    mt = to_multi_table(g)
    cfg = FSWConfig(d_in=d_in, d_out=7, d_edge=d_edge, enable_bias=False)
    proj, freqs = _params(rng, cfg)
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    a = fsw_embed_graph(X, g, proj, freqs, cfg)
    b = fsw_embed_multi_table(X, mt, proj, freqs, cfg)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-10, atol=1e-12)


def test_bfloat16_end_to_end():
    """bf16 compute path: finite outputs, finite grads, reasonable agreement
    with f32 (MXU-friendly deployment mode)."""
    rng = np.random.default_rng(33)
    n, d_in, d_out = 32, 6, 4
    g = from_edge_index(_random_graph(rng, n), n, dtype=jnp.bfloat16)
    from fsw_gnn_tpu import auto_layout
    gt = auto_layout(g)
    X16 = jnp.asarray(rng.standard_normal((n, d_in)), jnp.bfloat16)
    conv = FSWConv(in_channels=d_in, out_channels=d_out, mlp_layers=2,
                   minimize_slice_coherence=False, dtype=jnp.bfloat16)
    variables = conv.init(jax.random.PRNGKey(0), X16, gt)
    out = conv.apply(variables, X16, gt)
    assert out.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(out, np.float32)))

    def loss(params):
        return jnp.sum(conv.apply({**variables, 'params': params},
                                  X16, gt).astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(variables['params'])
    assert all(np.all(np.isfinite(np.asarray(x, np.float32)))
               for x in jax.tree_util.tree_leaves(grads))


# ---------------------------------------------------------------------------
# aggregate='rank' (fused Pallas weighted-rank kernel, interpret mode on CPU)
# ---------------------------------------------------------------------------

def test_rank_aggregate_matches_sort():
    """fsw_embed_table(aggregate='rank') == aggregate='sort' (f32)."""
    rng = np.random.default_rng(7)
    n, d_in = 40, 5
    cfg = FSWConfig(d_in=d_in, d_out=9, enable_bias=False)
    proj, freqs = _params(rng, cfg)
    X = jnp.asarray(rng.standard_normal((n, d_in)), jnp.float32)
    g = from_edge_index(_random_graph(rng, n), n, dtype=jnp.float32)
    t = to_neighbor_table(g)

    a = fsw_embed_table(X, t, proj.astype(jnp.float32),
                        freqs.astype(jnp.float32), cfg, aggregate='sort')
    b = fsw_embed_table(X, t, proj.astype(jnp.float32),
                        freqs.astype(jnp.float32), cfg, aggregate='rank')
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_rank_aggregate_multi_table_grads():
    """MultiTable with aggregate='rank': output + grads match 'sort'."""
    from fsw_gnn_tpu import fsw_embed_multi_table, to_multi_table
    rng = np.random.default_rng(8)
    n, d_in = 48, 4
    cfg = FSWConfig(d_in=d_in, d_out=6, enable_bias=False)
    proj, freqs = _params(rng, cfg)
    proj = proj.astype(jnp.float32)
    freqs = freqs.astype(jnp.float32)
    X = jnp.asarray(rng.standard_normal((n, d_in)), jnp.float32)
    A = rng.random((n, n)) < 0.15
    A[:, :2] |= rng.random((n, 2)) < 0.6   # heavy-degree rows -> >1 class
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    g = from_edge_index(np.stack([src, dst]), n, dtype=jnp.float32)
    mt = to_multi_table(g)
    assert len(mt.tables) > 1

    def loss(X, proj, freqs, agg):
        out = fsw_embed_multi_table(X, mt, proj, freqs, cfg, aggregate=agg)
        return jnp.sum(jnp.sin(out))

    va, ga = jax.value_and_grad(loss, argnums=(0, 1, 2))(
        X, proj, freqs, 'sort')
    vb, gb = jax.value_and_grad(loss, argnums=(0, 1, 2))(
        X, proj, freqs, 'rank')
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-4)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize('slice_chunk', [None, 2])
def test_rank_aggregate_cartesian_matches_sort(slice_chunk):
    """Cartesian aggregate='rank' (fsw_rank_aggregate_cart: one shared rank
    loop for all n_freqs) must reproduce the sort path exactly."""
    rng = np.random.default_rng(3)
    n, d_in = 24, 4
    cfg = FSWConfig(d_in=d_in, n_slices=5, n_freqs=3, enable_bias=False)
    proj, freqs = _params(rng, cfg)
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    t = to_neighbor_table(from_edge_index(_random_graph(rng, n), n,
                                          dtype=jnp.float64))
    a = fsw_embed_table(X, t, proj, freqs, cfg, aggregate='sort',
                        slice_chunk=slice_chunk)
    b = fsw_embed_table(X, t, proj, freqs, cfg, aggregate='rank',
                        slice_chunk=slice_chunk)
    # the rank kernel computes in f32 (in-kernel), the sort path here in f64
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-4, atol=2e-5)

    ga = jax.grad(lambda x, p, f: jnp.sum(jnp.cos(
        fsw_embed_table(x, t, p, f, cfg, aggregate='sort') ** 2)),
        argnums=(0, 1, 2))(X, proj, freqs)
    gb = jax.grad(lambda x, p, f: jnp.sum(jnp.cos(
        fsw_embed_table(x, t, p, f, cfg, aggregate='rank') ** 2)),
        argnums=(0, 1, 2))(X, proj, freqs)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=2e-3, atol=2e-4)


def test_auto_resolution_rules(monkeypatch):
    """aggregate='auto' backend selection, incl. the round-4 re-measured
    cartesian rules (kernel wins at every measured lane waste <= 8.6,
    INCLUDING weight grads via the split with_dw backward; bucket caps
    cap_dw/cap_nodw still apply)."""
    from fsw_gnn_tpu import embedding as E
    monkeypatch.setattr(E.jax, 'default_backend', lambda: 'tpu')
    monkeypatch.setattr(E, '_device_kind', lambda: 'tpu v5 lite')
    cart = FSWConfig(d_in=4, n_slices=128, n_freqs=8, enable_bias=False)
    assert E._resolve_aggregate('auto', cart, 32, weights_grad=False) == 'rank'
    # round 4: with_dw cartesian rides the split backward (7.2x at S=128)
    assert E._resolve_aggregate('auto', cart, 32, weights_grad=True) == 'rank'
    # ...but its bucket cap is the stricter cap_dw (64)
    assert E._resolve_aggregate('auto', cart, 96,
                                weights_grad=True) == 'sort'
    # waste 2.0 is inside the re-measured 8.6 gate; waste 16 is not
    assert E._resolve_aggregate('auto', cart, 32, weights_grad=False,
                                s_eff=64) == 'rank'
    assert E._resolve_aggregate('auto', cart, 32, weights_grad=False,
                                s_eff=8) == 'sort'
    assert E._resolve_aggregate('auto', cart, 256,
                                weights_grad=False) == 'sort'
    plain = FSWConfig(d_in=4, d_out=127, enable_bias=False)
    assert E._resolve_aggregate('auto', plain, 32) == 'rank'
    assert E._resolve_aggregate('auto', plain, 96,
                                weights_grad=True) == 'sort'
    assert E._resolve_aggregate('auto', plain, 96,
                                weights_grad=False) == 'rank'
    # lane-padding waste rule: kernel cost is flat below a 128-lane tile,
    # so it wins only while margin_at_full_lanes * S / S_pad > 1; the
    # no-dw margin (2.3-2.6x) tolerates waste 2.2x (embed 64 -> S=63 must
    # stay on the kernel: measured 1.7x faster), the with-dw and cartesian
    # margins do not
    assert E._resolve_aggregate('auto', plain, 32, weights_grad=False,
                                s_eff=63) == 'rank'
    assert E._resolve_aggregate('auto', plain, 32, weights_grad=True,
                                s_eff=63) == 'sort'
    assert E._resolve_aggregate('auto', plain, 32, s_eff=16) == 'sort'
    assert E._resolve_aggregate('auto', cart, 32, weights_grad=False,
                                s_eff=63) == 'rank'   # waste 2.03 <= 8.6
    narrow = FSWConfig(d_in=4, d_out=16, enable_bias=False)
    assert E._resolve_aggregate('auto', narrow, 32) == 'sort'
    monkeypatch.setattr(E.jax, 'default_backend', lambda: 'cpu')
    assert E._resolve_aggregate('auto', plain, 32) == 'sort'
