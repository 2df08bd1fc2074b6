"""Same-process interleaved A/B/C of the GraphServer transfer layouts.

Separate-process serving runs drift +-10-45% with tunnel/time-of-day
state (observed round 5: the SAME multi-envelope config measured 40.3,
41.7, 56.2, and 60.3 ms p50 across four processes over one afternoon),
so layout comparisons are only honest when the candidate servers share
one process and their requests interleave (the CLAUDE.md ABA law).

Three multi-envelope servers, identical model/envelope, differing ONLY
in transfer layout:
    A  single carrier + uint16 index packing (the default)
    B  single carrier, int32 indices
    C  legacy 3-transfer (X + int buffer + float buffer)

Each request from one stream is served by A, B, and C back-to-back in
rotated order (abc, bca, cab, ...) so no layout systematically goes
first.  One compile each (~6-9 s, persistent-cached).

Run on TPU:  python benchmarks/bench_serving_aba.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_REQ = int(os.environ.get('SRV_REQUESTS', 24))
MAX_NODES = int(os.environ.get('SRV_MAX_NODES', 2048))
MAX_EDGES = int(os.environ.get('SRV_MAX_EDGES', 32768))
D_IN = int(os.environ.get('SRV_DIN', 64))
D_OUT = int(os.environ.get('SRV_DOUT', 16))


def _request(rng, n, avg_deg=8):
    E = n * avg_deg
    src = rng.integers(0, n, E)
    dst = rng.integers(0, n, E)
    keep = src != dst
    return (np.stack([src[keep], dst[keep]]),
            rng.standard_normal((n, D_IN)).astype(np.float32))


def main():
    import jax
    import jax.numpy as jnp
    from fsw_gnn_tpu import FSWGNN, from_edge_index
    from fsw_gnn_tpu.serving import GraphServer, multi_envelope
    from fsw_gnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    ei0, X0 = _request(rng, MAX_NODES // 2)
    g0 = from_edge_index(ei0, MAX_NODES // 2)
    model = FSWGNN(in_channels=D_IN, hidden_dims=(64, D_OUT),
                   minimize_slice_coherence=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X0), g0)
    classes, class_rows = multi_envelope(g0, max_nodes=MAX_NODES)

    def mk(**kw):
        return GraphServer(model, variables, MAX_NODES, MAX_EDGES,
                           classes=classes, class_rows=class_rows, **kw)

    servers = [
        ('single+u16', mk()),
        ('single+i32', mk(pack_indices=False)),
        ('triple', mk(transfer_layout='triple')),
    ]
    reqs = [_request(rng, int(n))
            for n in rng.integers(MAX_NODES // 4, MAX_NODES // 2 + 1,
                                  N_REQ)]

    # compile + drain each (multi path only; no fallbacks in this stream)
    for name, srv in servers:
        t0 = time.time()
        srv.predict(*reqs[0])
        print(json.dumps({'server': name,
                          'first_request_s': round(time.time() - t0, 1)}),
              flush=True)

    lat = {name: [] for name, _ in servers}
    for k, req in enumerate(reqs):
        order = servers[k % 3:] + servers[:k % 3]     # rotate who goes first
        for name, srv in order:
            t0 = time.perf_counter()
            srv.predict(*req)
            lat[name].append(time.perf_counter() - t0)

    outs = {name: np.sort(np.array(v) * 1e3) for name, v in lat.items()}
    for name, _ in servers:
        v = outs[name]
        print(json.dumps({
            'server': name, 'requests': len(v),
            'p50_ms': round(float(v[len(v) // 2]), 2),
            'p90_ms': round(float(v[int(len(v) * 0.9)]), 2),
        }), flush=True)

    a = servers[0][1].predict(*reqs[-1])
    for name, srv in servers[1:]:
        b = srv.predict(*reqs[-1])
        err = float(np.max(np.abs(a - b)) / (1e-6 + np.max(np.abs(a))))
        print(json.dumps({'cross_check': f'single+u16 vs {name}',
                          'rel_err': f'{err:.2e}', 'ok': err < 5e-3}),
              flush=True)
    for name, srv in servers:
        assert srv.num_compiles() == 1, name


if __name__ == '__main__':
    main()
