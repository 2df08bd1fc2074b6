"""End-to-end TRAINING parity vs the torch reference.

The reference's purpose is a GNN that learns (/root/reference/test_conv.py:
59-85 runs an SGD loop and watches the loss/scale move).  Operator-level
parity (1e-8, incl. gradients) is covered elsewhere; this test proves the
*optimization trajectories* coincide: identical initial parameters, identical
data, identical SGD recipe -> per-step losses must agree to f64 tightness
over ten full-batch steps, and the parameters must still agree afterwards.
"""
import numpy as np
import pytest

from _parity_train import Problem
from _reference import load_reference


pytestmark = pytest.mark.skipif(load_reference() is None,
                                reason='reference unavailable')


def test_ten_step_loss_trajectory_matches_reference():
    prob = Problem(seed=0)
    ours, params = prob.train_jax(steps=10, lr=0.05)
    ref = prob.train_ref(steps=10, lr=0.05)
    # f64 end-to-end; divergence growth over 10 steps stays ~1e-10 relative
    np.testing.assert_allclose(ours, ref, rtol=1e-8)
    assert ours[-1] < ours[0], 'training should reduce the loss'

    # post-training parameter agreement (the trajectories, not just the
    # scalar losses, coincide)
    import torch
    got_proj = np.asarray(params['fsw_embed']['proj_vecs'])
    want_proj = prob.ref_emb.projVecs.detach().numpy()
    np.testing.assert_allclose(got_proj, want_proj, rtol=1e-7, atol=1e-10)
    got_scale = float(params['fsw_embed']['total_mass_scale'])
    want_scale = float(prob.ref_emb.total_mass_encoding_scale)
    assert want_scale != 1.0, 'scale should have moved (it is learnable)'
    np.testing.assert_allclose(got_scale, want_scale, rtol=1e-8)
    got_k = np.asarray(params['head']['dense_1']['kernel'])
    want_k = prob.lin2.weight.detach().numpy().T
    np.testing.assert_allclose(got_k, want_k, rtol=1e-7, atol=1e-10)


def test_trained_accuracy_matches_reference():
    """Short full training run: both frameworks reach the same train/val
    accuracy (trajectory-identical, so exactly equal predictions here)."""
    prob = Problem(seed=1)
    _, params = prob.train_jax(steps=60, lr=0.1)
    prob.train_ref(steps=60, lr=0.1)
    ours_tr = prob.jax_accuracy(params, prob.train_idx)
    ref_tr = prob.ref_accuracy(prob.train_idx)
    ours_va = prob.jax_accuracy(params, prob.val_idx)
    ref_va = prob.ref_accuracy(prob.val_idx)
    assert ours_tr == ref_tr
    assert ours_va == ref_va
    assert ours_tr >= 0.8, f'planted partition should be learnable, {ours_tr}'
