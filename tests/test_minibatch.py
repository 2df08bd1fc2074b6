"""Minibatch (neighbor-sampled) training tests."""
import numpy as np
import pytest

from fsw_gnn_tpu.data import synthetic_planted_partition
from fsw_gnn_tpu.train import MinibatchTrainer, TrainConfig


@pytest.fixture(scope='module')
def data():
    return synthetic_planted_partition(num_nodes=400, num_classes=3,
                                       feat_dim=16, p_in=0.06, p_out=0.008,
                                       seed=1)


def test_minibatch_training_learns(data):
    tr = MinibatchTrainer(
        data, TrainConfig(hidden_dims=(16,), epochs=8, eval_every=4,
                          learning_rate=1e-2),
        batch_size=64, fanouts=(8, 8))
    out = tr.fit()
    assert np.isfinite(out['final']['train_acc'])
    assert out['final']['train_acc'] > 0.7, out


def test_minibatch_static_shapes_single_compile(data):
    """All batches must share one jit cache entry (static padded shapes)."""
    tr = MinibatchTrainer(
        data, TrainConfig(hidden_dims=(8,), epochs=1, eval_every=1),
        batch_size=32, fanouts=(4,))
    tr.train_epoch()
    # underlying jitted step was compiled exactly once (deterministic
    # CountingJit counter -- immune to global jit-cache clearing)
    assert tr._mb_step.num_compiles == 1


@pytest.mark.slow
def test_dp_minibatch_wave_matches_combined_gradient_step(data):
    """One DP wave (D per-device batches, psum-summed grads, global seed
    normalization) must equal ONE full-batch SGD step over the union of
    its D batches, computed manually on a single device."""
    import jax
    import jax.numpy as jnp
    import optax

    from fsw_gnn_tpu.parallel.dist import masked_softmax_cross_entropy

    D = 2
    tr = MinibatchTrainer(
        data, TrainConfig(hidden_dims=(8,), epochs=1, eval_every=1,
                          learning_rate=5e-2, num_devices=D, seed=3),
        batch_size=32, fanouts=(4,))
    assert tr.dp_devices == D

    # record the exact batches the DP epoch builds
    built = []
    orig = tr._build_batch

    def recording(seeds):
        out = orig(seeds)
        built.append(out)
        return out
    tr._build_batch = recording

    params0 = jax.tree_util.tree_map(jnp.copy, tr.params)
    opt_state0 = jax.tree_util.tree_map(jnp.copy, tr.opt_state)
    loss_dp = tr._train_epoch_dp()
    assert np.isfinite(loss_dp)

    # replay the FIRST wave manually: combined loss over batches 0..D-1
    wave = built[:D]

    def combined_loss(params):
        s_tot, c_tot = 0.0, 0.0
        for g, Xb, labels, mask in wave:
            logits = tr.model.apply({'params': params, **tr.fixed}, Xb, g,
                                    train=False)
            s, c = masked_softmax_cross_entropy(logits, labels, mask)
            s_tot, c_tot = s_tot + s, c_tot + c
        return s_tot / jnp.maximum(c_tot, 1.0)

    grads = jax.grad(combined_loss)(params0)
    updates, _ = tr.opt.update(grads, opt_state0, params0)
    want_first = optax.apply_updates(params0, updates)

    # the DP epoch ran several waves; re-run JUST the first wave from the
    # same initial state through the DP step and compare
    from fsw_gnn_tpu.parallel.dp import stack_batches
    stacked = stack_batches([p[0] for p in wave], [p[1] for p in wave],
                            [p[2] for p in wave], [p[3] for p in wave])
    got, _, _, loss0 = tr._dp_step(
        jax.tree_util.tree_map(jnp.copy, params0),
        jax.tree_util.tree_map(jnp.copy, opt_state0),
        tr.batch_stats, *stacked, jax.random.PRNGKey(0))
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want_first)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(loss0), float(combined_loss(params0)),
                               rtol=1e-5)


def test_dp_minibatch_trains_via_cli_surface(data):
    """The production entry (TrainConfig.num_devices + fit()) runs DP
    minibatch training end to end on the virtual 8-CPU mesh and learns."""
    tr = MinibatchTrainer(
        data, TrainConfig(hidden_dims=(16,), epochs=8, eval_every=4,
                          learning_rate=1e-2, num_devices=4),
        batch_size=32, fanouts=(8, 8))
    out = tr.fit()
    assert np.isfinite(out['final']['train_acc'])
    assert out['final']['train_acc'] > 0.7, out
