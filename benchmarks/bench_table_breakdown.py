"""Stage breakdown of the MultiTable FSW_conv step (the headline path).

Stages, one jit each (in-scan, amortized), matching the current production
design (fused-projection rank kernel, weights_grad=False): (a) raw-row
table gather (T, D), (b) + fused-projection rank-kernel fwd, (c) full
multi-table embedding fwd, (d) embedding fwd+bwd (grad wrt X), (e) full
FSWConv fwd+bwd+SGD (the headline).  Differences between consecutive
stages localize the cost of each piece.

Run on TPU: python benchmarks/bench_table_breakdown.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_NODES = int(os.environ.get('FSW_BD_NODES', 8192))
AVG_DEG = int(os.environ.get('FSW_BD_DEG', 16))
D_IN = int(os.environ.get('FSW_BD_DIN', 64))
EMBED = int(os.environ.get('FSW_BD_EMBED', 128))
STEPS = int(os.environ.get('FSW_BD_STEPS', 20))
CALLS = int(os.environ.get('FSW_BD_CALLS', 3))


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from fsw_gnn_tpu import (FSWConfig, FSWConv, from_edge_index,
                             fsw_embed_multi_table, to_multi_table)
    from fsw_gnn_tpu.ops.fsw_rank_pallas import fsw_rank_aggregate_proj
    from fsw_gnn_tpu.embedding import lowclamp

    rng = np.random.default_rng(0)
    E = N_NODES * AVG_DEG
    src = rng.integers(0, N_NODES, E)
    dst = rng.integers(0, N_NODES, E)
    keep = src != dst
    g = from_edge_index(np.stack([src[keep], dst[keep]]), N_NODES,
                        dtype=jnp.float32)
    E_real = g.num_edges
    mt = to_multi_table(g)
    X = jnp.asarray(rng.standard_normal((N_NODES, D_IN)), jnp.float32)
    cfg = FSWConfig(d_in=D_IN, d_out=EMBED, enable_bias=False)
    S = cfg.nSlices
    proj = jnp.asarray(rng.standard_normal((S, D_IN)), jnp.float32)
    proj = proj / jnp.linalg.norm(proj, axis=1, keepdims=True)
    freqs = jnp.abs(jnp.asarray(rng.standard_normal(S), jnp.float32)) + 0.1

    def gather_all(X):
        out = []
        for tbl in mt.tables:
            Z = jnp.take(X, tbl.idx.reshape(-1), axis=0)
            out.append(Z.reshape(tbl.idx.shape + (D_IN,)))
        return out

    def agg_fwd(X):
        outs = []
        for tbl, Z in zip(mt.tables, gather_all(X)):
            w = tbl.weight
            w_sum = jnp.sum(w, axis=-1)
            wsp = lowclamp(w_sum, cfg.total_mass_pad_thresh)
            pad = lowclamp(cfg.total_mass_pad_thresh - w_sum, 0.0) / wsp
            outs.append(fsw_rank_aggregate_proj(
                Z, w / wsp[:, None], pad, freqs, proj.T, None,
                jax.default_backend() == 'cpu', False))
        return outs

    def embed_fwd(X):
        return fsw_embed_multi_table(X, mt, proj, freqs, cfg,
                                     weights_grad=False)

    def embed_loss(X):
        return jnp.sum(jnp.sin(embed_fwd(X)))

    model = FSWConv(in_channels=D_IN, out_channels=D_IN, mlp_layers=3,
                    minimize_slice_coherence=False)
    variables = model.init(jax.random.PRNGKey(0), X, mt)
    params0 = variables['params']
    fixed = {k: v for k, v in variables.items() if k != 'params'}
    opt = optax.sgd(1e-3)

    def conv_step(params, opt_state):
        def loss_fn(p):
            out = model.apply({'params': p, **fixed}, X, mt)
            return jnp.sum(out * out)
        _, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def scan_over(fn, init_carry, combine):
        def make(length):
            def body(carry, _):
                return combine(carry, fn), None

            @jax.jit
            def run():
                c, _ = jax.lax.scan(body, init_carry, None, length=length)
                return c
            return run
        return make

    results = {}

    def timed(name, make_factory):
        # value-readback barriers + 20-vs-1-step differencing: under a
        # non-empty remote pipeline block_until_ready returns immediately
        # (CLAUDE.md timing protocol), and differencing removes the ~25 ms
        # per-call dispatch
        make = make_factory()
        run_n, run_1 = make(STEPS), make(1)

        def readback(x):
            return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))

        def measure(run):
            t0 = time.time()
            readback(run())                       # compile + drain
            compile_s = time.time() - t0
            best = float('inf')
            for _ in range(CALLS):
                t0 = time.time()
                readback(run())
                best = min(best, time.time() - t0)
            return best, compile_s

        t_n, compile_s = measure(run_n)
        t_1, _ = measure(run_1)
        print(f'{name}: compile {compile_s:.1f}s', flush=True)
        ms = max(t_n - t_1, 0.0) / (STEPS - 1) * 1e3
        results[name] = ms
        print(f'{name}: {ms:.3f} ms/step', flush=True)

    eps = jnp.float32(1e-30)
    # stage (a) must consume the FULL gather output: a [0,0,:1] slice of a
    # transparent XLA gather can be simplified to a 1-row gather (the
    # pallas stages are opaque, so partial consumption is fine there)
    timed('a_gather', lambda: scan_over(
        None, jnp.float32(0.0),
        lambda c, _: c + sum(jnp.sum(P) * jnp.float32(1e-20)
                             for P in gather_all(X + c * eps))))
    timed('b_gather_rank_fwd', lambda: scan_over(
        None, jnp.float32(0.0),
        lambda c, _: c + sum(jnp.sum(o[0, :1]) for o in agg_fwd(X + c * eps))))
    timed('c_embed_fwd', lambda: scan_over(
        None, jnp.float32(0.0),
        lambda c, _: c + jnp.sum(embed_fwd(X + c * eps)[0, :1])))
    timed('d_embed_fwd_bwd', lambda: scan_over(
        None, jnp.float32(0.0),
        lambda c, _: c + jnp.sum(jax.grad(embed_loss)(X + c * eps)[0, :1])))

    def conv_run():
        opt_state = opt.init(params0)

        def make(length):
            @jax.jit
            def run(params, opt_state):
                def body(carry, _):
                    return conv_step(*carry), None
                (p, s), _ = jax.lax.scan(body, (params, opt_state), None,
                                         length=length)
                return p, s
            return lambda: run(params0, opt_state)
        return make
    timed('e_conv_step', conv_run)

    print(json.dumps({'edges': E_real, 'stages_ms': results}))


if __name__ == '__main__':
    main()
