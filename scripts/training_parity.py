"""Multi-seed side-by-side training parity vs the torch reference (CPU, f64).

Runs the composed reference conv (reference FSW_embedding + matching torch
MLP; /root/reference/fsw_conv.py:331-371 semantics) and this framework's
FSWConv from IDENTICAL initial parameters through identical SGD recipes on
planted-partition node classification, for several seeds, and reports:
  * max relative per-step loss deviation over the first 10 steps, and
  * final train/val accuracy for both frameworks after full training.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/training_parity.py
Results are recorded in PARITY.md §"End-to-end training parity".
"""
import os
import sys

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tests'))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from _parity_train import Problem  # noqa: E402


def main(seeds=(0, 1, 2), steps=200, lr=0.1):
    print(f'{"seed":>4} {"max |dloss|/|loss| (10 steps)":>30} '
          f'{"ours tr/va":>12} {"ref tr/va":>12}')
    for seed in seeds:
        prob = Problem(seed=seed, num_nodes=80, feat_dim=8, num_classes=3)
        ours10 = prob.train_jax(steps=10, lr=lr)[0]
        ref10 = prob.train_ref(steps=10, lr=lr)
        # fresh problem so the full run starts from the transplanted init
        prob = Problem(seed=seed, num_nodes=80, feat_dim=8, num_classes=3)
        _, params = prob.train_jax(steps=steps, lr=lr)
        prob.train_ref(steps=steps, lr=lr)
        dev = np.max(np.abs(ours10 - ref10) / np.abs(ref10))
        ours_tr = prob.jax_accuracy(params, prob.train_idx)
        ours_va = prob.jax_accuracy(params, prob.val_idx)
        ref_tr = prob.ref_accuracy(prob.train_idx)
        ref_va = prob.ref_accuracy(prob.val_idx)
        print(f'{seed:>4} {dev:>30.3e} '
              f'{ours_tr:.3f}/{ours_va:.3f}  {ref_tr:.3f}/{ref_va:.3f}')
        assert dev < 1e-8, f'loss trajectories diverged: {dev}'
    print('OK: trajectories and final accuracies agree across seeds')


if __name__ == '__main__':
    main()
