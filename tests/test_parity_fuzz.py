"""Randomized configuration fuzz: every sampled FSWConfig x input mode must
match the reference implementation to tight float64 tolerance.

Covers the cross-product the targeted tests sample only partially:
cartesian/collapse, edge features, total-mass encodings, pad thresholds,
bias, degenerate weights, multiset vs sparse-graph vs dense-graph modes.
"""
import numpy as np
import jax.numpy as jnp
import pytest
import torch

from _reference import make_reference_embedding
from fsw_gnn_tpu import (FSWConfig, from_edge_index, fsw_embed_graph,
                         fsw_embed_graph_dense, fsw_embed_multiset,
                         fsw_embed_table, to_neighbor_table)
from fsw_gnn_tpu.params import bias_shape

RTOL, ATOL = 1e-8, 1e-9


def _sample_cfg(rng):
    d_in = int(rng.integers(1, 7))
    cartesian = rng.random() < 0.3
    d_edge = int(rng.integers(0, 4)) if rng.random() < 0.4 else 0
    encode_tm = bool(rng.random() < 0.5)
    kw = dict(
        d_in=d_in,
        d_edge=d_edge,
        encode_total_mass=encode_tm,
        total_mass_encoding_function=str(rng.choice(
            ['identity', 'sqrt', 'log'])),
        total_mass_encoding_method=str(rng.choice(
            ['plain', 'homog', 'homog_alt'])),
        total_mass_encoding_scale=float(rng.uniform(0.5, 2.0)),
        total_mass_pad_thresh=float(rng.uniform(0.3, 2.0)),
        enable_bias=bool(rng.random() < 0.7),
    )
    if cartesian:
        kw.update(n_slices=int(rng.integers(1, 6)),
                  n_freqs=int(rng.integers(1, 5)),
                  collapse_freqs=True if encode_tm else rng.random() < 0.5)
        if encode_tm:
            # NOT a gap here: the reference itself crashes on cartesian +
            # collapse_freqs + encode_total_mass + enable_bias (its bias
            # reshape at fsw_embedding.py:403-405 drops the total-mass
            # slot); this framework supports the combination, but there is
            # no oracle to compare against
            kw['enable_bias'] = False
    else:
        kw.update(d_out=int(rng.integers(2, 10)))
    return FSWConfig(**kw)


def _ref_kwargs(cfg: FSWConfig):
    kw = dict(d_in=cfg.d_in, d_edge=cfg.d_edge,
              encode_total_mass=cfg.encode_total_mass,
              total_mass_encoding_function=cfg.total_mass_encoding_function,
              total_mass_encoding_method=cfg.total_mass_encoding_method,
              total_mass_encoding_scale=cfg.total_mass_encoding_scale,
              total_mass_pad_thresh=cfg.total_mass_pad_thresh,
              enable_bias=cfg.enable_bias)
    if cfg.cartesian_mode:
        kw.update(d_out=None, nSlices=cfg.n_slices, nFreqs=cfg.n_freqs,
                  collapse_freqs=cfg.collapse_freqs)
    else:
        kw.update(d_out=cfg.d_out)
    return kw


def _params(rng, cfg):
    proj = rng.standard_normal((cfg.nSlices, cfg.proj_dim))
    norms = np.linalg.norm(proj, axis=1, keepdims=True)
    proj = proj / np.maximum(norms, 1e-12)
    freqs = np.abs(rng.standard_normal(cfg.nFreqs)) + 0.05
    bias = rng.standard_normal(bias_shape(cfg)) if cfg.enable_bias else None
    return proj, freqs, bias


def _inject(ref, proj, freqs, bias, scale):
    sd = ref.state_dict()
    sd['projVecs'] = torch.from_numpy(proj)
    sd['freqs'] = torch.from_numpy(freqs)
    if bias is not None and 'bias' in sd:
        b = bias
        if 'bias' in sd and sd['bias'].shape != torch.Size(b.shape):
            b = b.reshape(tuple(sd['bias'].shape))
        sd['bias'] = torch.from_numpy(b)
    if 'total_mass_encoding_scale' in sd:
        sd['total_mass_encoding_scale'] = torch.tensor(scale,
                                                       dtype=torch.float64)
    ref.load_state_dict(sd)


@pytest.mark.parametrize('trial', range(20))
def test_fuzz_parity(trial):
    rng = np.random.default_rng(1000 + trial)
    cfg = _sample_cfg(rng)
    ref = make_reference_embedding(**_ref_kwargs(cfg))
    proj, freqs, bias = _params(rng, cfg)
    _inject(ref, proj, freqs, bias, cfg.total_mass_encoding_scale)
    scale = jnp.asarray(cfg.total_mass_encoding_scale) \
        if cfg.encode_total_mass else None
    bias_j = None if bias is None else jnp.asarray(bias)

    mode = ['multiset', 'graph', 'dense_graph'][trial % 3]
    if cfg.d_edge > 0:
        mode = 'graph' if trial % 2 == 0 else 'dense_graph'

    if mode == 'multiset':
        n = int(rng.integers(2, 15))
        batch = tuple(rng.integers(1, 4, size=int(rng.integers(0, 3))))
        X = rng.standard_normal(batch + (n, cfg.d_in))
        W = np.abs(rng.standard_normal(batch + (n,))) * rng.uniform(0.1, 2)
        want = ref(torch.from_numpy(X), torch.from_numpy(W)).detach().numpy()
        got = fsw_embed_multiset(jnp.asarray(X), jnp.asarray(W),
                                 jnp.asarray(proj), jnp.asarray(freqs), cfg,
                                 bias=bias_j, total_mass_scale=scale)
    elif mode == 'graph':
        n = int(rng.integers(5, 25))
        A = rng.random((n, n)) < 0.3
        np.fill_diagonal(A, False)
        src, dst = np.nonzero(A)
        if len(src) == 0:
            src, dst = np.array([0]), np.array([1])
        edge_index = np.stack([src, dst]).astype(np.int64)
        X = rng.standard_normal((n, cfg.d_in))
        E = edge_index.shape[1]
        EF = (rng.standard_normal((E, cfg.d_edge))
              if cfg.d_edge > 0 else None)
        g = from_edge_index(edge_index, n, edge_features=EF,
                            dtype=jnp.float64)
        idx = torch.from_numpy(np.stack([edge_index[1], edge_index[0]]))
        if cfg.cartesian_mode:
            # NOT a gap: the reference's SPARSE path crashes in cartesian
            # mode (its slice_info is computed before the frequency repmat,
            # fsw_embedding.py:1031 vs 1097, tripping its own
            # verify_slice_info assert).  Use its dense branch as oracle.
            Wd = np.zeros((n, n))
            Wd[edge_index[1], edge_index[0]] = 1.0
            Xe_d = None
            if cfg.d_edge > 0:
                Xe_d = np.zeros((n, n, cfg.d_edge))
                Xe_d[edge_index[1], edge_index[0]] = EF
                Xe_d = torch.from_numpy(Xe_d)
            want = ref(torch.from_numpy(X), torch.from_numpy(Wd),
                       X_edge=Xe_d, graph_mode=True).detach().numpy()
        else:
            Wt = torch.sparse_coo_tensor(
                idx, torch.ones(E, dtype=torch.float64), (n, n)).coalesce()
            X_edge = None
            if cfg.d_edge > 0:
                key = edge_index[1] * n + edge_index[0]
                order = np.argsort(key, kind='stable')
                X_edge = torch.sparse_coo_tensor(
                    idx[:, order], torch.from_numpy(EF[order]),
                    (n, n, cfg.d_edge)).coalesce()
            want = ref(torch.from_numpy(X), Wt, X_edge=X_edge,
                       graph_mode=True).detach().numpy()
        got = fsw_embed_graph(jnp.asarray(X), g, jnp.asarray(proj),
                              jnp.asarray(freqs), cfg, bias=bias_j,
                              total_mass_scale=scale)
        # the bucketed table path must agree with the CSR path too
        t = to_neighbor_table(g)
        got_t = fsw_embed_table(jnp.asarray(X), t, jnp.asarray(proj),
                                jnp.asarray(freqs), cfg, bias=bias_j,
                                total_mass_scale=scale)
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(got),
                                   rtol=1e-9, atol=1e-10)
    else:  # dense_graph
        n, R = int(rng.integers(3, 12)), int(rng.integers(2, 8))
        X = rng.standard_normal((n, cfg.d_in))
        W = np.abs(rng.standard_normal((R, n))) * \
            (rng.random((R, n)) < 0.6) * rng.uniform(0.2, 2)
        X_edge = (rng.standard_normal((R, n, cfg.d_edge))
                  if cfg.d_edge > 0 else None)
        want = ref(torch.from_numpy(X), torch.from_numpy(W),
                   X_edge=None if X_edge is None else torch.from_numpy(X_edge),
                   graph_mode=True).detach().numpy()
        got = fsw_embed_graph_dense(
            jnp.asarray(X), jnp.asarray(W), jnp.asarray(proj),
            jnp.asarray(freqs), cfg,
            X_edge=None if X_edge is None else jnp.asarray(X_edge),
            bias=bias_j, total_mass_scale=scale)

    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL,
                               err_msg=f'cfg={cfg} mode={mode}')
