"""Decompose GraphServer request latency: host build / H2D / exec / D2H.

The round-5 packed layout cut per-request transfers from ~18 to 3
(X + ibuf + fbuf) but sequential p50 only moved 562 -> ~420 ms while the
pipelined mode reached ~25 req/s (~40 ms/req amortized) -- so ~380 ms of
the sequential latency is per-request round-trip overhead that
pipelining hides, not device execution.  This probe measures each stage
in isolation on the SAME envelope/model as bench_serving:

  build    host-side numpy: pad + fits + to_multi_table + pack
  h2d      jnp.asarray of the single packed carrier + readback barrier
  exec     compiled forward on PRE-STAGED device inputs + 1-scalar D2H
  d2h      np.asarray of the full (max_nodes, d_out) output
  predict  the end-to-end GraphServer.predict call

Run on TPU (after bench_serving, reusing its compile cache):
    python benchmarks/probe_serving_budget.py
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
REPS = int(os.environ.get('SRV_REPS', 10))


def main():
    import jax
    import jax.numpy as jnp
    from fsw_gnn_tpu import FSWGNN, from_edge_index
    from fsw_gnn_tpu.graph import to_multi_table
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
    srv = GraphServer(model, variables, MAX_NODES, MAX_EDGES,
                      classes=classes, class_rows=class_rows)

    ei, X = req(MAX_NODES // 2)

    def stage_build():
        g = srv._pad_graph(ei)
        srv._fits_envelope(g)
        mt = to_multi_table(g, classes=srv.classes,
                            class_rows=srv.class_rows, as_numpy=True)
        Xp = np.zeros((MAX_NODES, D_IN), np.float32)
        Xp[:X.shape[0]] = X
        ib, fb = srv._pack_multi(mt)
        buf = srv._pack_all(ib, fb, Xp)     # single int32 carrier (round 5)
        return buf

    buf = stage_build()
    print(json.dumps({'carrier_bytes': int(buf.nbytes)}), flush=True)

    def stage_h2d():
        a = jnp.asarray(buf)
        float(a[0])                         # readback barrier on the carrier
        return a

    bufd = stage_h2d()
    out = srv._fwd_multi(srv.variables, bufd)           # compile + stage
    float(out[0, 0])

    def stage_exec():
        o = srv._fwd_multi(srv.variables, bufd)
        float(o[0, 0])
        return o

    def stage_exec_pipelined8():
        os_ = [srv._fwd_multi(srv.variables, bufd)
               for _ in range(8)]
        float(os_[-1][0, 0])

    def stage_d2h():
        np.asarray(out)

    def stage_predict():
        srv.predict(ei, X)

    srv.predict(ei, X)                                  # drain

    for name, fn in [('build', stage_build), ('h2d', stage_h2d),
                     ('exec_1scalar', stage_exec),
                     ('exec_pipelined8', stage_exec_pipelined8),
                     ('d2h_full', stage_d2h),
                     ('predict_e2e', stage_predict)]:
        fn()
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(json.dumps({'stage': name,
                          'p50_ms': round(ts[len(ts) // 2] * 1e3, 2),
                          'min_ms': round(ts[0] * 1e3, 2),
                          'max_ms': round(ts[-1] * 1e3, 2)}), flush=True)

    # (the main h2d stage IS the single-buffer carrier since round 5's
    # layout change; the old separate h2d_single_buffer stage is gone)


if __name__ == '__main__':
    main()
