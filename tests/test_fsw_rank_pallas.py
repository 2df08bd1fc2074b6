"""Correctness of the fused rank-based FSW aggregation kernel (interpret
mode) vs the XLA table-path math, forward and analytic backward.

The rank reformulation must match the stable-sort + cumsum semantics
exactly: c_i = sum_j wn_j 1[p_j < p_i or (p_j == p_i and j <= i)] is the
inclusive weight cumsum at i's stable-sorted position.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fsw_gnn_tpu.ops.fsw_rank_pallas import fsw_rank_aggregate
from fsw_gnn_tpu.ops.segment import sort_pairs_fused


def _xla_ref(P, wn, pad, freqs):
    """The XLA table-path slice pipeline (embedding.fsw_embed_table math,
    non-cartesian), on pre-gathered projections."""
    keysB = jnp.moveaxis(P, 1, 2)                     # (R, S, B)
    ps, ws = sort_pairs_fused(
        keysB, jnp.broadcast_to(wn[:, None, :], keysB.shape))
    c = jnp.cumsum(ws, axis=2) + pad[:, None, None] * (ps > 0)
    sd = 2.0 * ws * jnp.sinc(freqs[None, :, None] * ws) * jnp.cos(
        jnp.pi * freqs[None, :, None] * (2.0 * c - ws))
    return (1.0 + freqs) * jnp.sum(ps * sd, axis=2)


def _rand_args(rng, R, B, S, ties=False, dtype=np.float64):
    P = rng.standard_normal((R, B, S))
    if ties:
        # force exact key ties inside buckets to exercise the stable
        # tie-break rule
        P[:, 1::2, :] = P[:, 0::2, :]
    w = np.abs(rng.standard_normal((R, B))) * (rng.random((R, B)) < 0.8)
    w_sum = w.sum(1)
    w_sum_pad = np.maximum(w_sum, 1.0)
    wn = w / w_sum_pad[:, None]
    pad = np.maximum(1.0 - w_sum, 0.0) / w_sum_pad
    freqs = np.abs(rng.standard_normal(S)) + 0.1
    return (jnp.asarray(P, dtype), jnp.asarray(wn, dtype),
            jnp.asarray(pad, dtype), jnp.asarray(freqs, dtype))


@pytest.mark.parametrize('R,B,S', [(5, 8, 6), (17, 16, 130), (3, 32, 128)])
@pytest.mark.parametrize('ties', [False, True])
def test_forward_matches_xla(R, B, S, ties):
    rng = np.random.default_rng(0)
    P, wn, pad, freqs = _rand_args(rng, R, B, S, ties)
    got = fsw_rank_aggregate(P, wn, pad, freqs, None, True)
    want = _xla_ref(P, wn, pad, freqs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize('ties', [False, True])
def test_backward_matches_xla(ties):
    rng = np.random.default_rng(1)
    R, B, S = 7, 16, 12
    P, wn, pad, freqs = _rand_args(rng, R, B, S, ties)
    V = jnp.asarray(rng.standard_normal((R, S)))

    def loss_kernel(P, wn, pad, freqs):
        return jnp.sum(fsw_rank_aggregate(P, wn, pad, freqs, None, True) * V)

    def loss_xla(P, wn, pad, freqs):
        return jnp.sum(_xla_ref(P, wn, pad, freqs) * V)

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(P, wn, pad, freqs)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(P, wn, pad, freqs)
    for a, b, name in zip(g_k, g_x, ['dP', 'dwn', 'dpad', 'dfreqs']):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10, err_msg=name)


def test_zero_weight_padding_contributes_zero():
    rng = np.random.default_rng(2)
    R, B, S = 4, 8, 6
    P, wn, pad, freqs = _rand_args(rng, R, B, S)
    # zero out half the entries' weights; their contribution must vanish
    wn = wn.at[:, B // 2:].set(0.0)
    out1 = fsw_rank_aggregate(P, wn, pad, freqs, None, True)
    # moving the zero-weight projections must not change the output
    P2 = P.at[:, B // 2:, :].add(7.0)
    out2 = fsw_rank_aggregate(P2, wn, pad, freqs, None, True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize('B', [48, 64])
@pytest.mark.parametrize('ties', [False, True])
def test_wide_bucket_fwd_bwd(B, ties):
    """Wide buckets (B > 32, incl. non-power-of-two needing sublane pad):
    outputs and all gradients must match the XLA reference exactly."""
    rng = np.random.default_rng(4)
    R, S = 6, 9
    P, wn, pad, freqs = _rand_args(rng, R, B, S, ties)
    V = jnp.asarray(rng.standard_normal((R, S)))

    got = fsw_rank_aggregate(P, wn, pad, freqs, None, True)
    want = _xla_ref(P, wn, pad, freqs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-10, atol=1e-12)

    def loss_kernel(P, wn, pad, freqs):
        return jnp.sum(fsw_rank_aggregate(P, wn, pad, freqs, None, True) * V)

    def loss_xla(P, wn, pad, freqs):
        return jnp.sum(_xla_ref(P, wn, pad, freqs) * V)

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(P, wn, pad, freqs)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(P, wn, pad, freqs)
    for a, b, name in zip(g_k, g_x, ['dP', 'dwn', 'dpad', 'dfreqs']):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10, err_msg=name)


# ---------------------------------------------------------------------------
# Fused-projection variant: in-kernel P = Z @ V on the MXU
# ---------------------------------------------------------------------------

from fsw_gnn_tpu.ops.fsw_rank_pallas import fsw_rank_aggregate_proj


def _rand_proj_args(rng, R, B, D, S, ties=False):
    Z = rng.standard_normal((R, B, D))
    if ties:
        # identical sender rows -> exactly tied projections in every slice
        Z[:, 1::2, :] = Z[:, 0::2, :]
    V = rng.standard_normal((D, S))
    w = np.abs(rng.standard_normal((R, B))) * (rng.random((R, B)) < 0.8)
    w_sum = w.sum(1)
    w_sum_pad = np.maximum(w_sum, 1.0)
    wn = w / w_sum_pad[:, None]
    pad = np.maximum(1.0 - w_sum, 0.0) / w_sum_pad
    freqs = np.abs(rng.standard_normal(S)) + 0.1
    return (jnp.asarray(Z), jnp.asarray(wn), jnp.asarray(pad),
            jnp.asarray(freqs), jnp.asarray(V))


@pytest.mark.parametrize('R,B,D,S', [(5, 8, 4, 6), (9, 16, 64, 130),
                                     (3, 32, 7, 128)])
@pytest.mark.parametrize('ties', [False, True])
def test_proj_forward_matches_xla(R, B, D, S, ties):
    rng = np.random.default_rng(5)
    Z, wn, pad, freqs, V = _rand_proj_args(rng, R, B, D, S, ties)
    got = fsw_rank_aggregate_proj(Z, wn, pad, freqs, V, None, True)
    want = _xla_ref(jnp.einsum('rbd,ds->rbs', Z, V), wn, pad, freqs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize('ties', [False, True])
def test_proj_backward_matches_xla(ties):
    rng = np.random.default_rng(6)
    R, B, D, S = 7, 16, 12, 20
    Z, wn, pad, freqs, V = _rand_proj_args(rng, R, B, D, S, ties)
    G = jnp.asarray(rng.standard_normal((R, S)))

    def loss_kernel(Z, wn, pad, freqs, V):
        return jnp.sum(
            fsw_rank_aggregate_proj(Z, wn, pad, freqs, V, None, True) * G)

    def loss_xla(Z, wn, pad, freqs, V):
        P = jnp.einsum('rbd,ds->rbs', Z, V)
        return jnp.sum(_xla_ref(P, wn, pad, freqs) * G)

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(Z, wn, pad,
                                                         freqs, V)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(Z, wn, pad, freqs, V)
    for a, b, name in zip(g_k, g_x, ['dZ', 'dwn', 'dpad', 'dfreqs', 'dV']):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9, err_msg=name)


def test_proj_matches_unfused_composition():
    """take-rows + fused-projection == gather-projections + unfused kernel,
    including the gather's scatter-add adjoint into dX."""
    rng = np.random.default_rng(7)
    N, R, B, D, S = 23, 6, 8, 5, 10
    X = jnp.asarray(rng.standard_normal((N, D)))
    idx = jnp.asarray(rng.integers(0, N, (R, B)))
    _, wn, pad, freqs, V = _rand_proj_args(rng, R, B, D, S)

    def loss_fused(X, V):
        Z = jnp.take(X, idx.reshape(-1), axis=0).reshape(R, B, D)
        return jnp.sum(
            fsw_rank_aggregate_proj(Z, wn, pad, freqs, V, None, True) ** 2)

    def loss_unfused(X, V):
        Xp = X @ V
        P = jnp.take(Xp, idx.reshape(-1), axis=0).reshape(R, B, S)
        return jnp.sum(fsw_rank_aggregate(P, wn, pad, freqs, None, True) ** 2)

    np.testing.assert_allclose(float(loss_fused(X, V)),
                               float(loss_unfused(X, V)), rtol=1e-9)
    gf = jax.grad(loss_fused, argnums=(0, 1))(X, V)
    gu = jax.grad(loss_unfused, argnums=(0, 1))(X, V)
    for a, b, name in zip(gf, gu, ['dX', 'dV']):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9, err_msg=name)


@pytest.mark.parametrize('proj', [False, True])
def test_with_dw_false_skips_weight_cotangents(proj):
    """with_dw=False: dP/dZ, dfreqs (and dV) identical; dwn, dpad zero."""
    rng = np.random.default_rng(8)
    R, B, D, S = 6, 16, 5, 10
    Z, wn, pad, freqs, V = _rand_proj_args(rng, R, B, D, S)
    G = jnp.asarray(rng.standard_normal((R, S)))

    if proj:
        def loss(with_dw):
            def f(Z, wn, pad, freqs, V):
                return jnp.sum(fsw_rank_aggregate_proj(
                    Z, wn, pad, freqs, V, None, True, with_dw) * G)
            return jax.grad(f, argnums=(0, 1, 2, 3, 4))(Z, wn, pad,
                                                        freqs, V)
        names = ['dZ', 'dwn', 'dpad', 'dfreqs', 'dV']
        zero_idx = (1, 2)
    else:
        P = jnp.einsum('rbd,ds->rbs', Z, V)

        def loss(with_dw):
            def f(P, wn, pad, freqs):
                return jnp.sum(fsw_rank_aggregate(
                    P, wn, pad, freqs, None, True, with_dw) * G)
            return jax.grad(f, argnums=(0, 1, 2, 3))(P, wn, pad, freqs)
        names = ['dP', 'dwn', 'dpad', 'dfreqs']
        zero_idx = (1, 2)

    g_on = loss(True)
    g_off = loss(False)
    for i, (a, b, name) in enumerate(zip(g_on, g_off, names)):
        if i in zero_idx:
            assert float(jnp.max(jnp.abs(b))) == 0.0, name
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=0, err_msg=name)


# ---------------------------------------------------------------------------
# Cartesian-mode kernel: one shared rank loop for all F frequencies.
# ---------------------------------------------------------------------------

from fsw_gnn_tpu.ops.fsw_rank_pallas import fsw_rank_aggregate_cart


def _xla_cart_ref(P, wn, pad, freqs):
    """Sort-path cartesian quadrature on pre-gathered projections
    (embedding.bucket_quadrature cartesian branch); freqs (S, F)."""
    keysB = jnp.moveaxis(P, 1, 2)                     # (R, S, B)
    ps, ws = sort_pairs_fused(
        keysB, jnp.broadcast_to(wn[:, None, :], keysB.shape))
    c = jnp.cumsum(ws, axis=2) + pad[:, None, None] * (ps > 0)
    f = freqs[:, None, :]                             # (S, 1, F)
    sd = (2.0 * ws[..., None] * jnp.sinc(f * ws[..., None]) *
          jnp.cos(jnp.pi * f * (2.0 * c[..., None] - ws[..., None])))
    emb = jnp.einsum('rsb,rsbf->rsf', ps, sd)
    return (1.0 + freqs) * emb


def _rand_cart_args(rng, R, B, S, F, ties=False):
    P, wn, pad, _ = _rand_args(rng, R, B, S, ties)
    freqs = jnp.asarray(np.abs(rng.standard_normal((S, F))) + 0.1)
    return P, wn, pad, freqs


@pytest.mark.parametrize('R,B,S,F', [(5, 8, 6, 3), (17, 16, 130, 5),
                                     (3, 32, 128, 9)])
@pytest.mark.parametrize('ties', [False, True])
def test_cart_forward_matches_xla(R, B, S, F, ties):
    rng = np.random.default_rng(11)
    P, wn, pad, freqs = _rand_cart_args(rng, R, B, S, F, ties)
    got = fsw_rank_aggregate_cart(P, wn, pad, freqs, None, True)
    want = _xla_cart_ref(P, wn, pad, freqs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-10, atol=1e-12)
    assert got.shape == (R, S, F)


@pytest.mark.parametrize('ties', [False, True])
@pytest.mark.parametrize('with_dw', [True, False])
@pytest.mark.parametrize('B', [16, 48])   # 48 = the round-5 'auto' cap
def test_cart_backward_matches_xla(ties, with_dw, B):
    rng = np.random.default_rng(12)
    R, S, F = 7, 10, 4
    P, wn, pad, freqs = _rand_cart_args(rng, R, B, S, F, ties)

    def loss_k(P, wn, pad, freqs):
        out = fsw_rank_aggregate_cart(P, wn, pad, freqs, None, True,
                                      with_dw)
        return jnp.sum(jnp.sin(out) * jnp.cos(out * 0.7))

    def loss_x(P, wn, pad, freqs):
        out = _xla_cart_ref(P, wn, pad, freqs)
        return jnp.sum(jnp.sin(out) * jnp.cos(out * 0.7))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(P, wn, pad, freqs)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(P, wn, pad, freqs)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gx[0]),
                               rtol=1e-9, atol=1e-11)
    if with_dw:
        np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gx[1]),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(gk[2]), np.asarray(gx[2]),
                                   rtol=1e-9, atol=1e-11)
    else:
        assert not np.any(np.asarray(gk[1]))
        assert not np.any(np.asarray(gk[2]))
    np.testing.assert_allclose(np.asarray(gk[3]), np.asarray(gx[3]),
                               rtol=1e-9, atol=1e-11)


def test_cart_zero_weight_padding_contributes_zero():
    rng = np.random.default_rng(13)
    R, B, S, F = 4, 8, 6, 3
    P, wn, pad, freqs = _rand_cart_args(rng, R, B, S, F)
    P2 = jnp.concatenate([P, rng.standard_normal((R, 5, S))], axis=1)
    wn2 = jnp.concatenate([wn, jnp.zeros((R, 5))], axis=1)
    a = fsw_rank_aggregate_cart(P, wn, pad, freqs, None, True)
    b = fsw_rank_aggregate_cart(P2, wn2, pad, freqs, None, True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-12, atol=1e-13)


# ---------------------------------------------------------------------------
# Cross-backend fuzz: the rank kernels (plain + cartesian, fwd and grads)
# must agree with the sort path on random configurations, including exact
# key ties and with_dw variants.
# ---------------------------------------------------------------------------

from fsw_gnn_tpu.embedding import FSWConfig, bucket_quadrature


@pytest.mark.parametrize('trial', range(12))
def test_fuzz_rank_vs_sort(trial):
    rng = np.random.default_rng(1000 + trial)
    R = int(rng.integers(2, 20))
    B = 2 * int(rng.integers(1, 20))   # even: the ties helper pairs rows
    cart = bool(rng.integers(0, 2))
    S = int(rng.integers(1, 40))
    F = int(rng.integers(1, 9)) if cart else None
    ties = bool(rng.integers(0, 2))
    with_dw = bool(rng.integers(0, 2))
    P, wn, pad, _ = _rand_args(rng, R, B, S, ties)
    if cart:
        cfg = FSWConfig(d_in=3, n_slices=S, n_freqs=F, enable_bias=False)
        freqs = jnp.asarray(np.abs(rng.standard_normal((S, F))) + 0.05)
    else:
        cfg = FSWConfig(d_in=3, d_out=S, enable_bias=False)
        freqs = jnp.asarray(np.abs(rng.standard_normal(S)) + 0.05)

    # call the kernels directly (f64 interpret) rather than through
    # bucket_quadrature, whose rank branch casts to f32 by design
    krn = fsw_rank_aggregate_cart if cart else fsw_rank_aggregate

    def run(agg):
        def loss(P, wn, pad, freqs):
            if agg == 'rank':
                out = krn(P, wn, pad, freqs, None, True, with_dw)
            else:
                out = bucket_quadrature(P, wn, pad, freqs, cfg, 'sort',
                                        weights_grad=with_dw)
            return jnp.sum(jnp.sin(out)), out
        (v, out), g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True)(P, wn, pad, freqs)
        return out, v, g

    out_s, v_s, g_s = run('sort')
    out_r, v_r, g_r = run('rank')
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_s),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(float(v_r), float(v_s), rtol=1e-10)
    # dP and dfreqs always; dwn/dpad only when the kernel computes them
    np.testing.assert_allclose(np.asarray(g_r[0]), np.asarray(g_s[0]),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(g_r[3]), np.asarray(g_s[3]),
                               rtol=1e-8, atol=1e-10)
    if with_dw:
        np.testing.assert_allclose(np.asarray(g_r[1]), np.asarray(g_s[1]),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(g_r[2]), np.asarray(g_s[2]),
                                   rtol=1e-8, atol=1e-10)
    else:
        assert not np.any(np.asarray(g_r[1]))
        assert not np.any(np.asarray(g_r[2]))


# ---------------------------------------------------------------------------
# uniform_w (row-constant weights) fast path: must be BIT-identical


def _rand_args_uniform(rng, R, B, S, dtype=np.float64):
    """Unit-adjacency-style args: every real entry of a row has weight 1
    (normalized to the shared 1/deg), padding exactly 0."""
    P = rng.standard_normal((R, B, S))
    w = (rng.random((R, B)) < 0.8).astype(np.float64)
    w[:, 0] = 1.0                        # at least one real entry per row
    w_sum = w.sum(1)
    wsp = np.maximum(w_sum, 1.0)
    wn = w / wsp[:, None]
    pad = np.maximum(1.0 - w_sum, 0.0) / wsp
    freqs = np.abs(rng.standard_normal(S)) + 0.1
    return (jnp.asarray(P, dtype), jnp.asarray(wn, dtype),
            jnp.asarray(pad, dtype), jnp.asarray(freqs, dtype))


@pytest.mark.parametrize('dtype', [np.float32, np.float64])
def test_uniform_w_bit_identical(dtype):
    """uniform_w=True computes the sin/cos(pi f w) chain once per row; on
    row-constant weights the per-element math is identical (same input
    bits -> same poly bits; padded entries restored to exact zero by the
    select).  f64 (which keeps the jnp.sin path) is BIT-identical; f32 is
    allowed 1-2 ulp per element (separately compiled XLA programs fuse
    the structurally different graphs differently), amplified by the
    cancelling quadrature sum -> tolerance a few ulp of the row scale."""
    import functools
    rng = np.random.default_rng(5)
    R, B, S = 6, 16, 10
    P, wn, pad, freqs = _rand_args_uniform(rng, R, B, S, dtype)
    a = fsw_rank_aggregate(P, wn, pad, freqs, None, True, False, False)
    b = fsw_rank_aggregate(P, wn, pad, freqs, None, True, False, True)

    def check(x, y, name=''):
        if dtype == np.float64:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=name)
        else:
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-6, atol=1e-6, err_msg=name)

    check(a, b)

    V = jnp.asarray(rng.standard_normal((R, S)), dtype)

    def loss(unif, P, wn, pad, f):
        return jnp.sum(
            fsw_rank_aggregate(P, wn, pad, f, None, True, False, unif) * V)

    ga = jax.grad(functools.partial(loss, False), argnums=(0, 3))(
        P, wn, pad, freqs)
    gb = jax.grad(functools.partial(loss, True), argnums=(0, 3))(
        P, wn, pad, freqs)
    for x, y, name in zip(ga, gb, ['dP', 'dfreqs']):
        check(x, y, name)


def test_uniform_w_proj_bit_identical():
    """Same parity for the fused-projection kernel (f32 -> ulp-level
    tolerance, see test_uniform_w_bit_identical)."""
    from fsw_gnn_tpu.ops.fsw_rank_pallas import fsw_rank_aggregate_proj
    rng = np.random.default_rng(6)
    R, B, D, S = 6, 8, 4, 10
    _, wn, pad, freqs = _rand_args_uniform(rng, R, B, S, np.float32)
    Z = jnp.asarray(rng.standard_normal((R, B, D)), jnp.float32)
    V = jnp.asarray(rng.standard_normal((D, S)), jnp.float32)
    a = fsw_rank_aggregate_proj(Z, wn, pad, freqs, V, None, True, False,
                                False)
    b = fsw_rank_aggregate_proj(Z, wn, pad, freqs, V, None, True, False,
                                True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-6, atol=1e-6)

    G = jnp.asarray(rng.standard_normal((R, S)), jnp.float32)

    def loss(unif, Z, wn, pad, f, V):
        return jnp.sum(fsw_rank_aggregate_proj(
            Z, wn, pad, f, V, None, True, False, unif) * G)

    import functools
    ga = jax.grad(functools.partial(loss, False), argnums=(0, 3, 4))(
        Z, wn, pad, freqs, V)
    gb = jax.grad(functools.partial(loss, True), argnums=(0, 3, 4))(
        Z, wn, pad, freqs, V)
    for x, y, name in zip(ga, gb, ['dZ', 'dfreqs', 'dV']):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-6, atol=1e-6, err_msg=name)


def test_uniform_w_cart_parity():
    """Cartesian kernel: uniform_w fast path vs per-entry path (f64 exact
    jnp trig -> bit-identical is expected, but allow ulp-level fusion
    drift like the non-cart f32 case), forward and with_dw=False grads."""
    import functools
    from fsw_gnn_tpu.ops.fsw_rank_pallas import fsw_rank_aggregate_cart
    rng = np.random.default_rng(9)
    R, B, S, F = 5, 8, 6, 3
    P, wn, pad, _ = _rand_args_uniform(rng, R, B, S)
    freqs = jnp.asarray(np.abs(rng.standard_normal((S, F))) + 0.1)
    a = fsw_rank_aggregate_cart(P, wn, pad, freqs, None, True, False,
                                False)
    b = fsw_rank_aggregate_cart(P, wn, pad, freqs, None, True, False,
                                True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-12, atol=1e-14)

    G = jnp.asarray(rng.standard_normal((R, S, F)))

    def loss(unif, P, wn, pad, f):
        return jnp.sum(fsw_rank_aggregate_cart(
            P, wn, pad, f, None, True, False, unif) * G)

    ga = jax.grad(functools.partial(loss, False), argnums=(0, 3))(
        P, wn, pad, freqs)
    gb = jax.grad(functools.partial(loss, True), argnums=(0, 3))(
        P, wn, pad, freqs)
    for x, y, name in zip(ga, gb, ['dP', 'dfreqs']):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-12, atol=1e-14, err_msg=name)


def test_uniform_w_gated_off_when_weights_differentiated():
    """Review finding (round 4): NeighborTable.uniform_w is detected at
    BUILD time, so if the weights are later trained/replaced the static
    flag is stale.  bucket_quadrature / fsw_embed_table must therefore
    honor it only under weights_grad=False; with weights_grad=True and
    NON-uniform weights on a table whose flag (incorrectly) says
    uniform, the rank path must still match the sort path exactly."""
    import dataclasses
    from fsw_gnn_tpu import (FSWConfig, from_edge_index, fsw_embed_table,
                             to_neighbor_table)
    rng = np.random.default_rng(31)
    n, d = 24, 4
    A = rng.random((n, n)) < 0.25
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    t = to_neighbor_table(from_edge_index(np.stack([src, dst]), n,
                                          dtype=jnp.float64))
    assert t.uniform_w                      # unit weights at build
    # weights drift away from row-constant (what SGD on learnable
    # weights does) -- the STATIC flag cannot know
    w_new = np.asarray(t.weight) * (
        1.0 + 0.5 * rng.random(np.asarray(t.weight).shape))
    t = dataclasses.replace(t, weight=jnp.asarray(w_new))
    assert t.uniform_w                      # stale by construction

    cfg = FSWConfig(d_in=d, d_out=7, enable_bias=False)
    proj = jnp.asarray(rng.standard_normal((cfg.nSlices, d)))
    freqs = jnp.asarray(np.abs(rng.standard_normal(cfg.nFreqs)) + 0.1)
    X = jnp.asarray(rng.standard_normal((n, d)))
    a = fsw_embed_table(X, t, proj, freqs, cfg, aggregate='sort',
                        weights_grad=True)
    b = fsw_embed_table(X, t, proj, freqs, cfg, aggregate='rank',
                        weights_grad=True)
    # f32-kernel-vs-f64-sort tolerance (as in the rank/sort parity
    # tests); the ungated bug this guards produces O(1) errors (the row
    # MAX substituted for every entry's weight)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-4, atol=2e-5)


def test_uniform_w_detection():
    """Host-side row-constant detection: unit adjacency detects True;
    gcn-normalized and mixed-weight tables detect False (safe fallback)."""
    from fsw_gnn_tpu import from_edge_index, to_multi_table, \
        to_neighbor_table
    from fsw_gnn_tpu.graph import _detect_uniform_w
    rng = np.random.default_rng(7)
    n = 40
    A = rng.random((n, n)) < 0.2
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    ei = np.stack([src, dst])

    g_unit = from_edge_index(ei, n)
    assert to_neighbor_table(g_unit).uniform_w
    assert all(t.uniform_w for t in to_multi_table(g_unit).tables)
    # self-loops of weight 1 keep rows constant
    g_sl = from_edge_index(ei, n, self_loop_weight=1.0)
    assert to_neighbor_table(g_sl).uniform_w
    # gcn-normalized weights vary per edge -> fast path off
    g_gcn = from_edge_index(ei, n, edge_weighting='gcn')
    assert not to_neighbor_table(g_gcn).uniform_w
    # direct predicate checks, incl. the positivity guard
    assert _detect_uniform_w(np.array([[2.0, 2.0, 0.0]]))
    assert not _detect_uniform_w(np.array([[2.0, 1.0, 0.0]]))
    assert not _detect_uniform_w(np.array([[-1.0, -1.0]]))


# ---------------------------------------------------------------------------
# f32 fast trig (poly sin2pi + floor-based wrap; probe_select_ceiling.py)

def test_round_wrap_f32_matches_numpy_round():
    """The floor-based round (u - floor(u + 0.5)) is BIT-exact vs
    round-to-nearest off ties; exact .5 ties round half-up (vs np.round's
    half-even), which the trig path is insensitive to (sin2pi(+0.5) ==
    sin2pi(-0.5) == 0).  Must hold under jit too: the classic
    magic-constant trick is folded away by XLA's algebraic simplifier,
    which is why it is NOT used (it also measured no faster)."""
    from fsw_gnn_tpu.ops.fsw_rank_pallas import _round_wrap
    u = np.concatenate([
        np.linspace(-300.0, 300.0, 200003),
        np.arange(-20, 20) + 0.5,                       # exact ties
        np.array([0.0, -0.0, 0.49999997, -0.49999997]),
    ]).astype(np.float32)
    u64 = u.astype(np.float64)
    want = u - np.trunc(u64 + np.copysign(0.5, u64)).astype(np.float32)
    # the f32 add u + 0.5 can itself round, shifting the effective tie
    # boundary by <= half an ulp of u (e.g. 0.49999997f + 0.5f ties to
    # 1.0): inside that band either neighbor is acceptable -- the wrapped
    # argument lands at ~+/-0.5 where sin2pi is ~0 from both sides
    near_tie = np.abs(np.abs(u64 - np.rint(u64)) - 0.5) < 6e-8 * np.maximum(
        1.0, np.abs(u64))
    for f in (_round_wrap, jax.jit(_round_wrap)):
        got = np.asarray(f(jnp.asarray(u)))
        np.testing.assert_array_equal(got[~near_tie], want[~near_tie])
        assert np.all(np.abs(got[near_tie]) <= 0.5 + 1e-6)
        # off ties it equals round-half-even as well
        tie = np.abs(u64 - np.floor(u64)) == 0.5
        keep = ~tie & ~near_tie
        np.testing.assert_array_equal(
            got[keep], (u - np.round(u64).astype(np.float32))[keep])


def test_sin2pi_poly_accuracy():
    """Max abs error of the degree-13 odd polynomial vs f64 sin over the
    full wrapped period: ~1.6 f32 ulp."""
    from fsw_gnn_tpu.ops.fsw_rank_pallas import _sin2pi_poly
    u = np.linspace(-0.5, 0.5, 100001).astype(np.float32)
    got = np.asarray(_sin2pi_poly(jnp.asarray(u)))
    want = np.sin(2 * np.pi * u.astype(np.float64))
    assert np.max(np.abs(got - want)) < 2.5e-7


def test_sincos2pi_f32_shared_fold():
    """The f32 sincos pair (shift-identity folds, single |u|, no re-wrap)
    matches f64 sin/cos to poly accuracy and keeps the exact zeros at
    u in {0, +/-1/2} (sin) and +/-1/4 (cos)."""
    from fsw_gnn_tpu.ops.fsw_rank_pallas import _sincos2pi
    u = np.concatenate([
        np.linspace(-0.5, 0.5, 100001),
        np.array([0.0, -0.0, 0.5, -0.5, 0.25, -0.25]),
    ]).astype(np.float32)
    s, c = (np.asarray(v) for v in _sincos2pi(jnp.asarray(u)))
    u64 = u.astype(np.float64)
    np.testing.assert_allclose(s, np.sin(2 * np.pi * u64), atol=2.5e-7)
    np.testing.assert_allclose(c, np.cos(2 * np.pi * u64), atol=2.5e-7)
    assert s[-6] == 0.0 and s[-5] == 0.0 and s[-4] == 0.0 and s[-3] == 0.0
    assert c[-2] == 0.0 and c[-1] == 0.0


@pytest.mark.parametrize('ties', [False, True])
def test_f32_fast_trig_kernel_parity(ties):
    """The f32 kernel (which routes _trig through the poly + floor-wrap path)
    matches the f64 exact kernel at f32 accuracy, forward and gradients.
    This is the production path: on TPU every rank kernel runs f32."""
    rng = np.random.default_rng(11)
    R, B, S = 9, 16, 10
    P, wn, pad, freqs = _rand_args(rng, R, B, S, ties)
    V = jnp.asarray(rng.standard_normal((R, S)))
    args32 = tuple(jnp.asarray(a, jnp.float32) for a in (P, wn, pad, freqs))

    def loss(P, wn, pad, freqs):
        out = fsw_rank_aggregate(P, wn, pad, freqs, None, True)
        return jnp.sum(out * V.astype(out.dtype)), out

    (v64, out64), g64 = jax.value_and_grad(
        loss, argnums=(0, 1, 2, 3), has_aux=True)(P, wn, pad, freqs)
    (v32, out32), g32 = jax.value_and_grad(
        loss, argnums=(0, 1, 2, 3), has_aux=True)(*args32)

    np.testing.assert_allclose(np.asarray(out32), np.asarray(out64),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(v32), float(v64), rtol=2e-5, atol=1e-5)
    for a, b, name in zip(g32, g64, ['dP', 'dwn', 'dpad', 'dfreqs']):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=5e-5, err_msg=name)
