"""Why does the multi server's sequential p50 differ 10x between a
repeated request (37 ms) and the bench's fresh-request stream (422 ms)?

Times GraphServer.predict on (a) the SAME request repeated, (b) fresh
random requests of identical shapes, for both the multi and CSR
executables, plus raw jnp.asarray H2D of same-bytes vs fresh-bytes
buffers -- isolating content-dependent transfer/dispatch behavior in the
remote tunnel (e.g. payload dedup) from genuine compute.

Run on TPU:  python benchmarks/probe_serving_fresh.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MAX_NODES = int(os.environ.get('SRV_MAX_NODES', 2048))
MAX_EDGES = int(os.environ.get('SRV_MAX_EDGES', 32768))
D_IN = int(os.environ.get('SRV_DIN', 64))
D_OUT = int(os.environ.get('SRV_DOUT', 16))
REPS = int(os.environ.get('SRV_REPS', 8))


def main():
    import jax
    import jax.numpy as jnp
    from fsw_gnn_tpu import FSWGNN, from_edge_index
    from fsw_gnn_tpu.serving import GraphServer, multi_envelope
    from fsw_gnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)

    def req(n, avg=8):
        E = n * avg
        s, d = rng.integers(0, n, E), rng.integers(0, n, E)
        k = s != d
        return (np.stack([s[k], d[k]]),
                rng.standard_normal((n, D_IN)).astype(np.float32))

    ei0, X0 = req(MAX_NODES // 2)
    g0 = from_edge_index(ei0, MAX_NODES // 2)
    model = FSWGNN(in_channels=D_IN, hidden_dims=(64, D_OUT),
                   minimize_slice_coherence=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X0), g0)
    classes, class_rows = multi_envelope(g0, max_nodes=MAX_NODES)
    srv_m = GraphServer(model, variables, MAX_NODES, MAX_EDGES,
                        classes=classes, class_rows=class_rows)
    srv_c = GraphServer(model, variables, MAX_NODES, MAX_EDGES)

    fresh = [req(MAX_NODES // 2) for _ in range(REPS)]
    for name, srv in [('multi', srv_m), ('csr', srv_c)]:
        srv.predict(*fresh[0])                 # compile + drain

        def run(stream):
            ts = []
            for ei, X in stream:
                t0 = time.perf_counter()
                srv.predict(ei, X)
                ts.append((time.perf_counter() - t0) * 1e3)
            ts.sort()
            return round(ts[len(ts) // 2], 1)

        same = run([fresh[0]] * REPS)
        fr = run(fresh)
        print(json.dumps({'server': name, 'repeat_same_p50_ms': same,
                          'fresh_p50_ms': fr}), flush=True)

    # raw H2D: same bytes re-sent vs fresh bytes each time
    buf = np.random.default_rng(1).standard_normal(190000).astype(np.float32)
    bufs = [np.random.default_rng(i + 2).standard_normal(190000)
            .astype(np.float32) for i in range(REPS)]

    def h2d(arrs):
        ts = []
        for a in arrs:
            t0 = time.perf_counter()
            d = jnp.asarray(a)
            float(d[0])
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        return round(ts[len(ts) // 2], 1)

    h2d([buf])                                  # drain
    print(json.dumps({'h2d_760KB_same_p50_ms': h2d([buf] * REPS),
                      'h2d_760KB_fresh_p50_ms': h2d(bufs)}), flush=True)


if __name__ == '__main__':
    main()
