"""Serving demo: train briefly, export a StableHLO artifact, and run a
one-compile GraphServer over requests of different sizes.

Run on CPU:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/demo_serving.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from fsw_gnn_tpu.data import synthetic_planted_partition
    from fsw_gnn_tpu.serving import (GraphServer, export_forward,
                                     load_artifact, save_artifact)
    from fsw_gnn_tpu.train import TrainConfig, Trainer

    data = synthetic_planted_partition(num_nodes=300, num_classes=3,
                                       feat_dim=16, p_in=0.08, p_out=0.01)
    tr = Trainer(data, TrainConfig(hidden_dims=(16,), epochs=20,
                                   eval_every=10, learning_rate=2e-2))
    out = tr.fit()
    print(f"trained: test_acc={out['final']['test_acc']:.3f}")

    # 1) frozen artifact for the training graph (batch/offline scoring)
    variables = {'params': tr.params, **tr.batch_stats, **tr.fixed}
    blob = export_forward(tr.model, variables,
                          jax.ShapeDtypeStruct(tr.X.shape, tr.X.dtype),
                          tr.compute_graph)
    path = os.path.join(tempfile.gettempdir(), 'fswgnn_demo.stablehlo')
    save_artifact(path, blob)
    fwd = load_artifact(path)
    logits = np.asarray(fwd(tr.X))
    print(f"artifact: {len(blob)} bytes, logits {logits.shape}")

    # 2) online server: arbitrary request graphs, ONE compile
    srv = GraphServer(tr.model, variables, max_nodes=128, max_edges=2048)
    rng = np.random.default_rng(0)
    for n in (30, 77, 128):
        A = rng.random((n, n)) < 0.1
        np.fill_diagonal(A, False)
        src, dst = np.nonzero(A)
        X = rng.standard_normal((n, data.features.shape[1])).astype(
            np.float32)
        pred = srv.predict(np.stack([src, dst]), X)
        print(f"request n={n:4d}: predictions {pred.shape}, "
              f"compiles so far: {srv.num_compiles()}")


if __name__ == '__main__':
    main()
