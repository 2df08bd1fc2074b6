"""Benchmark: FSW_conv forward+backward edges/sec on one chip.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.

The workload is the demo_conv-equivalent scaled to a production shard: a
random graph with ~128k edges, 64-dim vertex features, a 3-layer-MLP FSW_conv
(embed_dim 128), full forward+backward+SGD step.  Steps are looped inside a
single jit (lax.fori_loop) so tunnel dispatch latency does not pollute the
measurement; the metric is real edges processed per second per chip.

vs_baseline compares against bench_baseline.json when present (committed
once measured), else 1.0.  The reference publishes no numbers (BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

def _env_int(name, default):
    return int(os.environ.get(name, default))


N_NODES = _env_int('FSW_BENCH_NODES', 8192)
AVG_DEG = _env_int('FSW_BENCH_DEG', 16)
D_IN = _env_int('FSW_BENCH_DIN', 64)
D_OUT = _env_int('FSW_BENCH_DOUT', 64)
# 60 (round 5): the rep spread is dispatch/readback RTT jitter in the
# 1-step subtrahend (raw t_1 jitters +/-20%, t_n +/-2% -- bench_repspread
# A/B); tripling the in-scan step count cut the differenced spread
# 7.6% -> 4.6% with the median unchanged (68.06 vs 68.72 Meps), at ~1 s
# of extra exec per rep.  Medians are protocol-stable; best-reps are
# RTT-lucky draws, not harvestable performance.
STEPS_PER_CALL = _env_int('FSW_BENCH_STEPS', 60)
WARMUP_CALLS = _env_int('FSW_BENCH_WARMUP', 1)
TIMED_CALLS = _env_int('FSW_BENCH_CALLS', 3)
# median-of-N protocol (round-4): the remote tunnel adds ~+/-5% run-to-run
# variance, so a single differenced measurement is not reproducible; the
# headline is the MEDIAN of N independent differenced reps, with the spread
# reported alongside.
REPS = _env_int('FSW_BENCH_REPS', 5)
DTYPE = os.environ.get('FSW_BENCH_DTYPE', 'float32')  # float32 | bfloat16


# v5e per-chip peaks used for the speed-of-light model (public figures /
# jax-ml.github.io/scaling-book): HBM ~819 GB/s; VPU f32 ~3.95 Tops
# (2 cores x 4 ALUs x (8,128) lanes x 0.94 GHz -- upper bound; the
# effective select/compare mix runs below multiply-add peak).
HBM_BYTES_PER_S = 819e9
VPU_OPS_PER_S = 3.95e12


def speed_of_light_step(mt, n_slices: int, n_nodes: int, d_in: int):
    """Analytic floor (seconds) for one fwd+bwd training step of the
    MultiTable aggregation design (see BENCH.md 'Speed of light').

    Two ceilings, take the binding one:
    - VPU: the fused rank kernel does ~(6B+20) ops per entry-slice fwd and
      ~(6B+45) bwd: ONE B-step masked rank loop each way, quadrature +
      trig.  The tail constants track the round-3 divide-free/shared-fold/
      floor-wrap trig (probe_select_ceiling fwd/bwd_tail_new op models;
      the round-2 tails were 25/60).  (The conv path declares graph
      weights non-differentiated -- weights_grad=False -- so the
      backward's second, transposed-mask loop for dwn/dpad is skipped;
      with it the bwd term would be 12B+45.)
    - HBM: the fused-projection design gathers raw rows Z (T, D) and
      scatter-adds dZ (T, D) (D = d_in here), and streams P-sized arrays
      through kernel IO twice; model: 2 passes of (T, D) + 2 of (T, S).
    MLP/projection matmuls ride the MXU and are <2% here (not modeled).
    """
    ops = 0
    entries = 0
    for t in mt.tables:
        ec = t.idx.shape[0] * t.idx.shape[1]
        B = t.idx.shape[1]
        entries += ec
        ops += ec * n_slices * ((6 * B + 20) + (6 * B + 45))
    t_vpu = ops / VPU_OPS_PER_S
    t_hbm = (2 * entries * (d_in + n_slices)) * 4 / HBM_BYTES_PER_S
    return max(t_vpu, t_hbm), {'t_vpu_ms': t_vpu * 1e3,
                               't_hbm_ms': t_hbm * 1e3,
                               'table_entries': entries}


def build(steps_per_call=None):
    """Construct the benchmark workload; returns a dict with the jitted
    `run_n` / `run_1` (in-scan step loops with a readback probe), the
    initial (params, opt_state), the real edge count and the layout/graph.
    Shared by main() and benchmarks/bench_repspread.py so variance
    experiments time the EXACT headline program."""
    import jax
    import jax.numpy as jnp
    import optax
    from fsw_gnn_tpu import FSWConv, from_edge_index

    steps_per_call = steps_per_call or STEPS_PER_CALL
    rng = np.random.default_rng(0)
    E = N_NODES * AVG_DEG
    src = rng.integers(0, N_NODES, E)
    dst = rng.integers(0, N_NODES, E)
    keep = src != dst
    # dedupe: duplicate pairs coalesce to weight 2 in from_edge_index,
    # which makes rows non-uniform and silently disables the row-constant
    # trig fast path (uniform_w) -- the benchmark graph is a SIMPLE
    # random graph, like the test/demo generators
    pairs = np.unique(src[keep].astype(np.int64) * N_NODES + dst[keep])
    edge_index = np.stack([pairs // N_NODES, pairs % N_NODES])
    dt = jnp.bfloat16 if DTYPE == 'bfloat16' else jnp.float32
    g = from_edge_index(edge_index, N_NODES, dtype=dt)
    E_real = g.num_edges
    # measured on v5e: 'table' 2.3x over 'csr' (log^2(B) bitonic passes beat
    # log^2(E)); 'multi' (degree-bucketed) another ~1.8x on top
    layout = os.environ.get('FSW_BENCH_LAYOUT', 'multi')
    if layout == 'table':
        from fsw_gnn_tpu import to_neighbor_table
        g = to_neighbor_table(g)
    elif layout == 'multi':
        from fsw_gnn_tpu import to_multi_table
        g = to_multi_table(g)

    X = jnp.asarray(rng.standard_normal((N_NODES, D_IN)), dt)

    model = FSWConv(in_channels=D_IN, out_channels=D_OUT, mlp_layers=3,
                    minimize_slice_coherence=False, dtype=dt)
    variables = model.init(jax.random.PRNGKey(0), X, g)
    params = variables['params']
    fixed = {k: v for k, v in variables.items() if k != 'params'}

    opt = optax.sgd(1e-3)
    opt_state = opt.init(params)

    def loss_fn(params, X):
        out = model.apply({'params': params, **fixed}, X, g)
        return jnp.sum(out * out)

    def one_step(carry, _):
        params, opt_state = carry
        _, grads = jax.value_and_grad(loss_fn)(params, X)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), None

    def make_run(length):
        # the probe scalar lets the caller end the timed region with a
        # VALUE READBACK: under a non-empty remote pipeline
        # block_until_ready returns immediately and timings are silent
        # garbage (see CLAUDE.md timing protocol)
        @jax.jit
        def run(params, opt_state):
            (params, opt_state), _ = jax.lax.scan(
                one_step, (params, opt_state), None, length=length)
            probe = jnp.sum(jax.tree_util.tree_leaves(params)[0])
            return params, opt_state, probe
        return run

    run_n = make_run(steps_per_call)
    run_1 = make_run(1)
    return dict(run_n=run_n, run_1=run_1, make_run=make_run,
                params=params, opt_state=opt_state, E_real=E_real,
                steps_per_call=steps_per_call, graph=g, layout=layout,
                d_in=D_IN, d_out=D_OUT, n_nodes=N_NODES)


def main():
    b = build()
    run_n, run_1 = b['run_n'], b['run_1']
    params, opt_state, E_real = b['params'], b['opt_state'], b['E_real']
    g, layout = b['graph'], b['layout']

    def timed(run, calls):
        p, s = params, opt_state
        t0 = time.perf_counter()
        for _ in range(calls):
            p, s, probe = run(p, s)
        float(probe)                              # readback barrier
        return time.perf_counter() - t0

    # compile + drain both programs before any timing
    for run in (run_n, run_1):
        for _ in range(WARMUP_CALLS):
            _, _, probe = run(params, opt_state)
            float(probe)                          # drain the pipeline

    # dispatch + readback RTT cancels in the difference of the two
    # measurements; what remains is pure step time.  N independent reps;
    # the headline is the median (tunnel variance ~+/-5%).
    steps = (STEPS_PER_CALL - 1) * TIMED_CALLS
    samples = []
    for _ in range(REPS):
        dt = max(timed(run_n, TIMED_CALLS) - timed(run_1, TIMED_CALLS),
                 1e-9)
        samples.append(E_real * steps / dt)
    samples.sort()
    edges_per_sec = float(np.median(samples))
    spread_pct = (100.0 * (samples[-1] - samples[0]) / edges_per_sec
                  if edges_per_sec else 0.0)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 'bench_baseline.json')
    vs = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f).get('edges_per_sec')
        if base:
            vs = edges_per_sec / base

    out = {
        'metric': 'fsw_conv_fwd_bwd_edges_per_sec',
        'value': round(edges_per_sec, 1),
        'unit': 'edges/s/chip',
        'vs_baseline': round(vs, 4),
        'n_reps': REPS,
        'spread_pct': round(spread_pct, 1),
        'min': round(samples[0], 1),
        'max': round(samples[-1], 1),
    }
    if layout == 'multi':
        t_floor, detail = speed_of_light_step(
            g, 2 * max(D_IN, D_OUT) - 1, N_NODES, D_IN)
        roofline_eps = E_real / t_floor
        out['roofline_edges_per_sec'] = round(roofline_eps, 1)
        out['pct_of_roofline'] = round(100.0 * edges_per_sec / roofline_eps,
                                       1)
        out['roofline_detail'] = {k: round(v, 3) if isinstance(v, float)
                                  else v for k, v in detail.items()}
    print(json.dumps(out))


if __name__ == '__main__':
    main()
