"""Export/serve roundtrip: serialized forward reproduces live apply."""
import numpy as np
import jax
import jax.numpy as jnp

from fsw_gnn_tpu import FSWGNN, auto_layout, from_edge_index
from fsw_gnn_tpu.serving import load_forward, export_forward
import pytest


def test_export_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, d_in, d_out = 24, 5, 3
    A = rng.random((n, n)) < 0.2
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    g = auto_layout(from_edge_index(np.stack([src, dst]), n))
    X = jnp.asarray(rng.standard_normal((n, d_in)), jnp.float32)

    model = FSWGNN(in_channels=d_in, hidden_dims=(6, d_out),
                   minimize_slice_coherence=False)
    variables = model.init(jax.random.PRNGKey(0), X, g)
    want = np.asarray(model.apply(variables, X, g))

    blob = export_forward(model, variables,
                          jax.ShapeDtypeStruct(X.shape, X.dtype), g)
    assert isinstance(blob, bytes) and len(blob) > 0
    p = tmp_path / 'fswgnn.stablehlo'
    p.write_bytes(blob)

    fwd = load_forward(p.read_bytes())
    got = np.asarray(fwd(X))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def _random_graph(rng, n, p=0.2):
    A = rng.random((n, n)) < p
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    return np.stack([src, dst]).astype(np.int64)


@pytest.mark.slow
def test_graph_server_one_compile_many_graphs():
    """Differently-sized request graphs share one compiled executable and
    match the unpadded forward exactly."""
    from fsw_gnn_tpu.serving import GraphServer
    rng = np.random.default_rng(3)
    d_in, d_out = 5, 3
    model = FSWGNN(in_channels=d_in, hidden_dims=(6, d_out),
                   minimize_slice_coherence=False)
    n0 = 20
    ei0 = _random_graph(rng, n0)
    X0 = rng.standard_normal((n0, d_in)).astype(np.float32)
    g0 = from_edge_index(ei0, n0)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X0), g0)

    srv = GraphServer(model, variables, max_nodes=64, max_edges=1024)
    for seed, n in [(1, 20), (2, 33), (3, 7), (4, 64)]:
        r = np.random.default_rng(seed)
        ei = _random_graph(r, n)
        X = r.standard_normal((n, d_in)).astype(np.float32)
        got = srv.predict(ei, X)
        want = np.asarray(model.apply(variables, jnp.asarray(X),
                                      from_edge_index(ei, n)))
        assert got.shape == (n, d_out)
        np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-5)
    assert srv.num_compiles() == 1

    # pipelined batch API: same results, same single executable
    batch = []
    wants = []
    for seed, n in [(5, 18), (6, 40)]:
        r = np.random.default_rng(seed)
        ei = _random_graph(r, n)
        X = r.standard_normal((n, d_in)).astype(np.float32)
        batch.append((ei, X))
        wants.append(np.asarray(model.apply(variables, jnp.asarray(X),
                                            from_edge_index(ei, n))))
    outs = srv.predict_many(batch)
    for got, want in zip(outs, wants):
        np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-5)
    assert srv.num_compiles() == 1

    # envelope enforcement
    big = _random_graph(np.random.default_rng(9), 80)
    Xbig = np.zeros((80, d_in), np.float32)
    try:
        srv.predict(big, Xbig)
        assert False, 'expected ValueError'
    except ValueError:
        pass


def test_graph_server_multi_fast_path():
    """A pinned degree-class envelope serves on the MultiTable fast path
    with ONE compile; results match the CSR server exactly; an
    envelope-overflowing request falls back to the CSR executable."""
    from fsw_gnn_tpu.serving import GraphServer, multi_envelope
    rng = np.random.default_rng(5)
    d_in, d_out = 5, 3
    model = FSWGNN(in_channels=d_in, hidden_dims=(6, d_out),
                   minimize_slice_coherence=False)
    n0 = 24
    ei0 = _random_graph(rng, n0)
    g0 = from_edge_index(ei0, n0)
    X0 = rng.standard_normal((n0, d_in)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X0), g0)

    classes, class_rows = multi_envelope(g0, max_nodes=64)
    assert class_rows[0] == 64          # node-count slack lands in class 0
    srv = GraphServer(model, variables, max_nodes=64, max_edges=2048,
                      classes=classes, class_rows=class_rows)
    ref = GraphServer(model, variables, max_nodes=64, max_edges=2048)
    for seed, n in [(1, 24), (2, 33), (3, 9)]:
        r = np.random.default_rng(seed)
        ei = _random_graph(r, n)
        X = r.standard_normal((n, d_in)).astype(np.float32)
        np.testing.assert_allclose(srv.predict(ei, X), ref.predict(ei, X),
                                   rtol=5e-5, atol=1e-5)
    assert srv.fallbacks == 0
    assert srv._fwd_multi.num_compiles == 1     # fast path, one compile
    assert srv._fwd.num_compiles == 0           # CSR never ran

    # a DUPLICATE-edge request coalesces to a weight-2 edge -> non-uniform
    # rows; the server must still hit the SAME multi executable (uniform_w
    # pinned, not per-request detected -- the round-4 serving bench caught
    # a second mid-stream compile here)
    r = np.random.default_rng(11)
    ei_dup = _random_graph(r, 21)
    ei_dup = np.concatenate([ei_dup, ei_dup[:, :1]], axis=1)  # dup 1 edge
    Xd = r.standard_normal((21, d_in)).astype(np.float32)
    got = srv.predict(ei_dup, Xd)
    want = ref.predict(ei_dup, Xd)
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-5)
    assert srv.fallbacks == 0
    assert srv._fwd_multi.num_compiles == 1     # STILL one compile

    # a request whose max degree exceeds the envelope falls back to CSR
    star_n = 50
    hub = np.zeros(star_n - 1, np.int64)
    spokes = np.arange(1, star_n, dtype=np.int64)
    ei_star = np.stack([spokes, hub])           # everyone -> node 0
    Xs = np.random.default_rng(7).standard_normal(
        (star_n, d_in)).astype(np.float32)
    got = srv.predict(ei_star, Xs)
    want = ref.predict(ei_star, Xs)
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-5)
    assert srv.fallbacks == 1
    assert srv.num_compiles() == 2              # one per path


def test_graph_server_assume_uniform_w_verified_per_request():
    """assume_uniform_w=True must not serve wrong results: a request whose
    coalesced weights are NOT row-constant (duplicate edge -> weight 2) is
    detected host-side and routed to the CSR executable instead of the
    pinned-uniform multi kernel."""
    from fsw_gnn_tpu.serving import GraphServer, multi_envelope
    rng = np.random.default_rng(13)
    d_in, d_out = 5, 3
    model = FSWGNN(in_channels=d_in, hidden_dims=(6, d_out),
                   minimize_slice_coherence=False)
    n0 = 24
    ei0 = _random_graph(rng, n0)
    g0 = from_edge_index(ei0, n0)
    X0 = rng.standard_normal((n0, d_in)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X0), g0)

    classes, class_rows = multi_envelope(g0, max_nodes=64)
    srv = GraphServer(model, variables, max_nodes=64, max_edges=2048,
                      classes=classes, class_rows=class_rows,
                      assume_uniform_w=True)
    ref = GraphServer(model, variables, max_nodes=64, max_edges=2048)

    # clean unit-weight request: fast path
    np.testing.assert_allclose(srv.predict(ei0, X0), ref.predict(ei0, X0),
                               rtol=5e-5, atol=1e-5)
    assert srv.uniform_w_fallbacks == 0
    assert srv._fwd_multi.num_compiles == 1

    # duplicate-edge request: uniform_w verification fails -> CSR, correct
    r = np.random.default_rng(14)
    ei_dup = _random_graph(r, 21)
    ei_dup = np.concatenate([ei_dup, ei_dup[:, :1]], axis=1)
    Xd = r.standard_normal((21, d_in)).astype(np.float32)
    np.testing.assert_allclose(srv.predict(ei_dup, Xd),
                               ref.predict(ei_dup, Xd),
                               rtol=5e-5, atol=1e-5)
    assert srv.uniform_w_fallbacks == 1
    assert srv._fwd_multi.num_compiles == 1     # multi executable untouched


def test_export_from_checkpoint(tmp_path):
    """Checkpoint directory -> artifact -> same logits as the live model."""
    from fsw_gnn_tpu.data import synthetic_planted_partition
    from fsw_gnn_tpu.train import TrainConfig, Trainer
    from fsw_gnn_tpu.serving import export_from_checkpoint, load_forward

    data = synthetic_planted_partition(num_nodes=120, num_classes=3,
                                       feat_dim=8, p_in=0.1, p_out=0.01)
    ckpt = str(tmp_path / 'ckpt')
    tr = Trainer(data, TrainConfig(hidden_dims=(8,), epochs=3, eval_every=3,
                                   checkpoint_dir=ckpt))
    tr.fit()
    want = tr.predict()

    X_spec = jax.ShapeDtypeStruct(tr.X.shape, tr.X.dtype)
    blob = export_from_checkpoint(
        ckpt, tr.model,
        {'params': tr.params, 'opt_state': tr.opt_state,
         'batch_stats': tr.batch_stats, 'fixed': tr.fixed},
        X_spec, tr.compute_graph)
    fwd = load_forward(blob)
    np.testing.assert_allclose(np.asarray(fwd(tr.X)), want,
                               rtol=1e-5, atol=1e-6)


def test_graph_server_edge_features_packed_paths():
    """Edge-featured requests flow through the packed buffers on BOTH
    layouts (fbuf carries the raveled per-class/per-edge features) and
    match the direct forward."""
    from fsw_gnn_tpu.serving import GraphServer, multi_envelope
    rng = np.random.default_rng(31)
    d_in, d_e, d_out = 5, 3, 4
    model = FSWGNN(in_channels=d_in, hidden_dims=(6, d_out),
                   edgefeat_dim=d_e, minimize_slice_coherence=False)
    n0 = 24
    ei0 = _random_graph(rng, n0)
    ef0 = rng.standard_normal((ei0.shape[1], d_e)).astype(np.float32)
    g0 = from_edge_index(ei0, n0, edge_features=ef0)
    X0 = rng.standard_normal((n0, d_in)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X0), g0)

    classes, class_rows = multi_envelope(g0, max_nodes=48)
    srv = GraphServer(model, variables, max_nodes=48, max_edges=1024,
                      d_edge=d_e, classes=classes, class_rows=class_rows)
    csr = GraphServer(model, variables, max_nodes=48, max_edges=1024,
                      d_edge=d_e)
    for seed, n in [(1, 24), (2, 17)]:
        r = np.random.default_rng(seed)
        ei = _random_graph(r, n)
        ef = r.standard_normal((ei.shape[1], d_e)).astype(np.float32)
        X = r.standard_normal((n, d_in)).astype(np.float32)
        want = np.asarray(model.apply(
            variables, jnp.asarray(X),
            from_edge_index(ei, n, edge_features=ef)))
        got_m = srv.predict(ei, X, edge_features=ef)
        got_c = csr.predict(ei, X, edge_features=ef)
        np.testing.assert_allclose(got_m, want, rtol=5e-5, atol=1e-5)
        np.testing.assert_allclose(got_c, want, rtol=5e-5, atol=1e-5)
    assert srv.fallbacks == 0
    assert srv._fwd_multi.num_compiles == 1
    assert csr._fwd.num_compiles == 1

    # presence mismatch is rejected loudly
    with pytest.raises(ValueError):
        srv.predict(ei0, X0)


def test_graph_server_warmup_compiles_both_paths():
    """warmup(d_in) compiles the multi AND the CSR-fallback executables
    before traffic; subsequent requests on either path add no compiles."""
    from fsw_gnn_tpu.serving import GraphServer, multi_envelope
    rng = np.random.default_rng(41)
    d_in, d_out = 5, 3
    model = FSWGNN(in_channels=d_in, hidden_dims=(6, d_out),
                   minimize_slice_coherence=False)
    n0 = 24
    ei0 = _random_graph(rng, n0)
    g0 = from_edge_index(ei0, n0)
    X0 = rng.standard_normal((n0, d_in)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X0), g0)

    classes, class_rows = multi_envelope(g0, max_nodes=64)
    srv = GraphServer(model, variables, max_nodes=64, max_edges=2048,
                      classes=classes, class_rows=class_rows)
    n_compiles = srv.warmup(d_in)
    assert n_compiles == 2 and srv.num_compiles() == 2
    assert srv.fallbacks == 0

    # traffic on both paths: zero new compiles
    srv.predict(ei0, X0)                            # multi
    star_n = 50
    ei_star = np.stack([np.arange(1, star_n, dtype=np.int64),
                        np.zeros(star_n - 1, np.int64)])
    srv.predict(ei_star, np.zeros((star_n, d_in), np.float32))  # CSR
    assert srv.num_compiles() == 2
    assert srv.fallbacks == 1

    # CSR-only server: one executable
    csr = GraphServer(model, variables, max_nodes=64, max_edges=2048)
    assert csr.warmup(d_in) == 1


def test_graph_server_bf16_pair_packed_single_buffer():
    """A 2-byte dtype rides the single-buffer layout with PAIR-PACKED
    floats and uint16 indices, and still serves correct (bf16-class)
    results with one compile."""
    from fsw_gnn_tpu.serving import GraphServer
    rng = np.random.default_rng(11)
    d_in, d_out = 5, 3
    model = FSWGNN(in_channels=d_in, hidden_dims=(6, d_out),
                   minimize_slice_coherence=False)
    n0 = 16
    ei0 = _random_graph(rng, n0)
    X0 = rng.standard_normal((n0, d_in)).astype(np.float32)
    g0 = from_edge_index(ei0, n0)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X0), g0)

    srv = GraphServer(model, variables, max_nodes=32, max_edges=256,
                      dtype=jnp.bfloat16)
    assert srv._single_buffer and srv._idx16 and srv._itemsize == 2
    for seed, n in [(1, 16), (2, 25)]:
        r = np.random.default_rng(seed)
        ei = _random_graph(r, n)
        X = r.standard_normal((n, d_in)).astype(np.float32)
        got = srv.predict(ei, X)
        want = np.asarray(model.apply(variables, jnp.asarray(X),
                                      from_edge_index(ei, n)))
        assert got.shape == (n, d_out)
        # bf16 graph weights + features: class-level tolerance
        np.testing.assert_allclose(got.astype(np.float32), want,
                                   rtol=5e-2, atol=5e-2)
    assert srv.num_compiles() == 1


def test_single_buffer_pack_is_bit_exact():
    """The int32 carrier's float bit-views must roundtrip exactly --
    including NaN/inf/denormal weight patterns that a value conversion
    would disturb."""
    from fsw_gnn_tpu.serving import GraphServer
    rng = np.random.default_rng(12)
    d_in = 4
    model = FSWGNN(in_channels=d_in, hidden_dims=(4, 2),
                   minimize_slice_coherence=False)
    n0 = 12
    ei0 = _random_graph(rng, n0)
    g0 = from_edge_index(ei0, n0)
    X0 = rng.standard_normal((n0, d_in)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X0), g0)
    srv = GraphServer(model, variables, max_nodes=16, max_edges=64)
    assert srv._single_buffer

    ibuf = np.arange(srv._li_csr, dtype=np.int32)
    fvals = np.array([0.0, -0.0, 1.5, np.inf, -np.inf, np.nan,
                      np.float32(1e-42), 3.14], np.float32)
    fbuf = np.resize(fvals, srv._lf_csr).astype(np.float32)
    Xp = rng.standard_normal((16, d_in)).astype(np.float32)
    buf = jnp.asarray(srv._pack_all(ibuf, fbuf, Xp))

    ib2, fb2 = srv._split(buf, srv._li_csr, srv._lf_csr)
    X2 = srv._unpack_x(buf, srv._li_csr, srv._lf_csr)
    np.testing.assert_array_equal(np.asarray(ib2), ibuf)
    np.testing.assert_array_equal(
        np.asarray(fb2).view(np.int32), fbuf.view(np.int32))
    np.testing.assert_array_equal(
        np.asarray(X2).view(np.int32), Xp.view(np.int32))


def test_graph_server_f64_legacy_transfer_layout():
    """Dtypes outside the {2,4}-byte carrier widths fall back to the
    3-transfer layout and still serve correctly with one compile."""
    from fsw_gnn_tpu.serving import GraphServer
    rng = np.random.default_rng(13)
    d_in, d_out = 4, 2
    model = FSWGNN(in_channels=d_in, hidden_dims=(4, d_out),
                   minimize_slice_coherence=False)
    n0 = 14
    ei0 = _random_graph(rng, n0)
    X0 = rng.standard_normal((n0, d_in)).astype(np.float32)
    g0 = from_edge_index(ei0, n0)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X0), g0)

    srv = GraphServer(model, variables, max_nodes=16, max_edges=128,
                      dtype=jnp.float64)
    assert not srv._single_buffer
    got = srv.predict(ei0, X0)
    want = np.asarray(model.apply(variables, jnp.asarray(X0), g0))
    assert got.shape == (n0, d_out)
    np.testing.assert_allclose(got.astype(np.float32), want,
                               rtol=5e-5, atol=1e-5)
    assert srv.num_compiles() == 1


def test_graph_server_idx16_disabled_on_big_envelopes():
    """An envelope whose index values exceed uint16 range must keep
    int32 indices (the uint16 packing is envelope-conditional)."""
    from fsw_gnn_tpu.serving import GraphServer
    rng = np.random.default_rng(14)
    d_in = 3
    model = FSWGNN(in_channels=d_in, hidden_dims=(4, 2),
                   minimize_slice_coherence=False)
    n0 = 10
    ei0 = _random_graph(rng, n0)
    g0 = from_edge_index(ei0, n0)
    X0 = rng.standard_normal((n0, d_in)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X0), g0)
    srv = GraphServer(model, variables, max_nodes=128, max_edges=70000)
    assert srv._single_buffer and not srv._idx16
    # pack/unpack roundtrip stays exact with raw int32 indices
    ibuf = np.linspace(0, 69999, srv._li_csr).astype(np.int32)
    fbuf = rng.standard_normal(srv._lf_csr).astype(np.float32)
    Xp = rng.standard_normal((128, d_in)).astype(np.float32)
    buf = jnp.asarray(srv._pack_all(ibuf, fbuf, Xp))
    ib2, fb2 = srv._split(buf, srv._li_csr, srv._lf_csr)
    X2 = srv._unpack_x(buf, srv._li_csr, srv._lf_csr)
    np.testing.assert_array_equal(np.asarray(ib2), ibuf)
    np.testing.assert_array_equal(np.asarray(fb2), fbuf)
    np.testing.assert_array_equal(np.asarray(X2), Xp)


def test_transfer_layout_knobs_bit_identical():
    """The three transfer layouts (single+u16 / single+i32 / triple) are
    pure re-encodings: same requests, bit-identical outputs, one compile
    each (the ABA bench's correctness contract, pinned on CPU)."""
    from fsw_gnn_tpu.serving import GraphServer, multi_envelope
    rng = np.random.default_rng(21)
    d_in = 5
    model = FSWGNN(in_channels=d_in, hidden_dims=(6, 3),
                   minimize_slice_coherence=False)
    n0 = 24
    ei0 = _random_graph(rng, n0)
    g0 = from_edge_index(ei0, n0)
    X0 = rng.standard_normal((n0, d_in)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X0), g0)
    classes, class_rows = multi_envelope(g0, max_nodes=48)

    def mk(**kw):
        return GraphServer(model, variables, 48, 1024, classes=classes,
                           class_rows=class_rows, **kw)

    servers = [mk(), mk(pack_indices=False), mk(transfer_layout='triple')]
    assert servers[0]._idx16 and not servers[1]._idx16
    assert not servers[2]._single_buffer
    outs = [s.predict(ei0, X0) for s in servers]
    for o in outs[1:]:
        np.testing.assert_array_equal(outs[0], o)
    for s in servers:
        assert s.num_compiles() == 1

    # invalid knob combinations raise
    try:
        mk(pack_indices=True, max_nodes=48)     # duplicate kw -> TypeError
    except TypeError:
        pass
    try:
        GraphServer(model, variables, 128, 70000, pack_indices=True)
    except AssertionError:
        pass
    else:
        raise AssertionError('pack_indices=True must raise on big envelopes')
    try:
        GraphServer(model, variables, 48, 1024, dtype=jnp.float64,
                    transfer_layout='single')
    except AssertionError:
        pass
    else:
        raise AssertionError('single layout must raise for 8-byte dtypes')
