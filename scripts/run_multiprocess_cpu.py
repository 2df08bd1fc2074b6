"""True multi-process jax.distributed run on localhost CPU.

Exercises the process-spanning runtime that a TPU pod slice uses — the
coordinator handshake (`parallel.runtime.ensure_distributed` →
`jax.distributed.initialize`), a mesh spanning all processes
(`runtime.global_mesh`), global-Array construction from host-replicated
numpy (`runtime.distribute_tree`), the full distributed train step
(`parallel.dist.make_distributed_train_step`, all XLA collectives crossing
process boundaries over gRPC the way they cross DCN on a pod), and a
multi-host orbax checkpoint save/restore.  The reference has no equivalent
(single-process, single-GPU — SURVEY.md §2.3); this is the execution
evidence for the multi-host runtime row.

Two modes:
  launcher (default):  python scripts/run_multiprocess_cpu.py
      spawns --num-processes workers on a free localhost port, waits,
      merges their JSON reports, prints a one-line summary, exit 0/1.
  worker (internal):   ... --process-id I
      runs the SPMD program; every worker executes identical code.

Each process gets --devices-per-process virtual CPU devices
(xla_force_host_platform_device_count), so 2 processes x 4 devices = an
8-way mesh whose collectives genuinely cross process boundaries.
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time


def _worker(args) -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import PartitionSpec as P

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from fsw_gnn_tpu import FSWGNN, from_edge_index
    from fsw_gnn_tpu.parallel import (make_distributed_train_step,
                                      masked_softmax_cross_entropy,
                                      partition_graph, shard_node_features,
                                      shard_recipient_labels)
    from fsw_gnn_tpu.parallel.dist import _shard_specs
    from fsw_gnn_tpu.parallel.runtime import (distribute_tree,
                                              ensure_distributed,
                                              global_mesh)

    jax.config.update('jax_enable_x64', True)

    multi = ensure_distributed(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    report = {
        'process_id': args.process_id,
        'multi': bool(multi),
        'process_count': jax.process_count(),
        'local_devices': jax.local_device_count(),
        'global_devices': jax.device_count(),
    }
    assert multi, 'ensure_distributed did not report a multi-process run'
    assert jax.process_count() == args.num_processes
    assert jax.local_device_count() == args.devices_per_process
    Pn = jax.device_count()
    assert Pn == args.num_processes * args.devices_per_process

    # -- identical deterministic problem on every host (SPMD) --------------
    rng = np.random.default_rng(7)
    n, d_in, n_classes = 64, 6, 3
    A = rng.random((n, n)) < 0.2
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    g = from_edge_index(np.stack([src, dst]).astype(np.int64), n,
                        dtype=jnp.float64)
    X = rng.standard_normal((n, d_in))
    y = rng.integers(0, n_classes, n)

    model = FSWGNN(in_channels=d_in, hidden_dims=(8, n_classes),
                   minimize_slice_coherence=False, dtype=jnp.float64)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X), g)
    params = variables['params']
    fixed = {k: v for k, v in variables.items() if k != 'params'}

    mesh = global_mesh()
    shards = partition_graph(g, Pn)
    Xs = shard_node_features(np.asarray(X), shards)
    labels, mask = shard_recipient_labels(y, np.ones(n), shards)
    mask = np.asarray(mask, np.float64)

    opt = optax.sgd(1.0)
    opt_state = opt.init(params)
    step = make_distributed_train_step(model, opt, shards, mesh,
                                       fixed_collections=fixed)

    # -- host-replicated numpy -> process-spanning global Arrays ----------
    spec = _shard_specs(shards)
    (p_g, s_g, X_g, shards_g, labels_g, mask_g) = distribute_tree(
        (params, opt_state, Xs, shards, labels, mask),
        (jax.tree_util.tree_map(lambda _: P(), params),
         jax.tree_util.tree_map(lambda _: P(), opt_state),
         P('graph'), spec, P('graph'), P('graph')), mesh)
    rng_key = jax.random.PRNGKey(0)

    # single-device oracle (full graph on one local device; dropout=0 so
    # the distributed step must reproduce it exactly in f64)
    def single_loss(p):
        logits = model.apply({'params': p, **fixed}, jnp.asarray(X), g)
        s, c = masked_softmax_cross_entropy(logits, jnp.asarray(y),
                                            jnp.ones(n))
        return s / c

    want_loss0 = float(single_loss(params))
    g_single = jax.grad(single_loss)(params)

    losses = []
    p_, s_, b_ = p_g, s_g, {}
    for i in range(args.steps):
        p_, s_, b_, loss = step(p_, s_, b_, X_g, shards_g, labels_g,
                                mask_g, jax.random.fold_in(rng_key, i))
        losses.append(float(loss))   # replicated -> addressable everywhere

    # first step was SGD(lr=1): params delta == gradient
    p_host = jax.tree_util.tree_map(
        lambda a: np.asarray(jax.device_get(a)), p_)
    if args.steps == 1:
        g_dist = jax.tree_util.tree_map(lambda a, b: np.asarray(a) - b,
                                        params, p_host)
        gerr = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
            g_single, g_dist)))
        report['grad_max_abs_err'] = gerr
    report['losses'] = losses
    report['loss0_err'] = abs(losses[0] - want_loss0)
    report['want_loss0'] = want_loss0

    # -- boundary-exchange variants across process boundaries -------------
    # the same one-step SGD update must come out of the all_to_all and
    # slice-chunked overlap transports when their collectives cross the
    # process (gRPC) boundary, not just the in-process virtual mesh
    shards_x = partition_graph(g, Pn, with_all_to_all=True)
    spec_x = _shard_specs(shards_x)
    (shards_xg,) = distribute_tree((shards_x,), (spec_x,), mesh)
    exch_updates = {}
    for exch in ('all_gather', 'all_to_all', 'overlap'):
        step_x = make_distributed_train_step(model, opt, shards_x, mesh,
                                             fixed_collections=fixed,
                                             exchange=exch)
        (p_dist, s_dist, _, X_dist, l_dist, m_dist) = distribute_tree(
            (params, opt.init(params), shards_x, Xs, labels, mask),
            (jax.tree_util.tree_map(lambda _: P(), params),
             jax.tree_util.tree_map(lambda _: P(), opt.init(params)),
             spec_x, P('graph'), P('graph'), P('graph')), mesh)
        p_x, _, _, loss_x = step_x(p_dist, s_dist, {}, X_dist, shards_xg,
                                   l_dist, m_dist, rng_key)
        exch_updates[exch] = (
            jax.tree_util.tree_map(
                lambda a: np.asarray(jax.device_get(a)), p_x),
            float(loss_x))
    base_p, base_loss = exch_updates['all_gather']
    for exch in ('all_to_all', 'overlap'):
        pe, le = exch_updates[exch]
        err = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(a - b))), base_p, pe)))
        report[f'{exch}_update_max_abs_diff'] = err
        report[f'{exch}_loss_diff'] = abs(le - base_loss)

    # -- multi-host orbax checkpoint save/restore -------------------------
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.join(args.ckpt_dir, 'state')
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(ckpt_dir, {'params': p_, 'opt_state': s_,
                          'step': args.steps})
    # restore with the replicated process-spanning sharding
    rep = jax.sharding.NamedSharding(mesh, P())
    abstract = jax.tree_util.tree_map(
        lambda a: (jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=rep)
                   if hasattr(a, 'shape') else a),
        {'params': p_, 'opt_state': s_, 'step': args.steps})
    restored = ckptr.restore(ckpt_dir, item=abstract)
    r_err = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(jax.device_get(a))
                                         - np.asarray(jax.device_get(b))))),
        restored['params'], p_)))
    report['ckpt_roundtrip_max_abs_err'] = r_err
    assert int(restored['step']) == args.steps
    # restored state must drive the step (sharding-compatible)
    _, _, _, loss_r = step(
        jax.tree_util.tree_map(jnp.array, restored['params']),
        jax.tree_util.tree_map(jnp.array, restored['opt_state']),
        {}, X_g, shards_g, labels_g, mask_g,
        jax.random.fold_in(rng_key, args.steps))
    report['loss_after_restore'] = float(loss_r)

    with open(args.out, 'w') as f:
        json.dump(report, f, indent=1)
    # clean shutdown barrier so no process exits while peers still stream
    jax.experimental.multihost_utils.sync_global_devices('done')
    return 0


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def _launch(args) -> int:
    port = _free_port()
    coordinator = f'127.0.0.1:{port}'
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)   # skip the axon TPU registration
    env['JAX_PLATFORMS'] = 'cpu'
    flags = env.get('XLA_FLAGS', '')
    env['XLA_FLAGS'] = (
        f'{flags} --xla_force_host_platform_device_count='
        f'{args.devices_per_process}').strip()
    tmp = tempfile.mkdtemp(prefix='fswmp_')
    procs, outs = [], []
    for pid in range(args.num_processes):
        out = os.path.join(tmp, f'report_{pid}.json')
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             '--process-id', str(pid),
             '--num-processes', str(args.num_processes),
             '--devices-per-process', str(args.devices_per_process),
             '--coordinator', coordinator,
             '--steps', str(args.steps),
             '--ckpt-dir', os.path.join(tmp, 'ckpt'),
             '--out', out],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
    deadline = time.time() + args.timeout
    rcs = [None] * len(procs)
    while time.time() < deadline and any(rc is None for rc in rcs):
        for i, p in enumerate(procs):
            if rcs[i] is None:
                rcs[i] = p.poll()
        time.sleep(0.5)
    for i, p in enumerate(procs):
        if rcs[i] is None:
            p.kill()
            rcs[i] = -9
    if any(rc != 0 for rc in rcs):
        print(json.dumps({'ok': False, 'returncodes': rcs}))
        return 1
    reports = []
    for out in outs:
        with open(out) as f:
            reports.append(json.load(f))
    r0 = reports[0]
    ok = (all(r['multi'] and r['process_count'] == args.num_processes
              for r in reports)
          and all(r['losses'] == r0['losses'] for r in reports)
          and r0['loss0_err'] < 1e-10
          and r0.get('grad_max_abs_err', 0.0) < 1e-8
          and r0['ckpt_roundtrip_max_abs_err'] == 0.0
          and r0['all_to_all_update_max_abs_diff'] < 1e-10
          and r0['overlap_update_max_abs_diff'] < 1e-10)
    print(json.dumps({'ok': ok, 'processes': args.num_processes,
                      'global_devices': r0['global_devices'],
                      'losses': r0['losses'],
                      'loss0_err': r0['loss0_err'],
                      'grad_max_abs_err': r0.get('grad_max_abs_err'),
                      'ckpt_roundtrip_max_abs_err':
                          r0['ckpt_roundtrip_max_abs_err'],
                      'loss_after_restore': r0['loss_after_restore'],
                      'all_to_all_update_max_abs_diff':
                          r0['all_to_all_update_max_abs_diff'],
                      'overlap_update_max_abs_diff':
                          r0['overlap_update_max_abs_diff']}))
    return 0 if ok else 1


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--process-id', type=int, default=None)
    ap.add_argument('--num-processes', type=int, default=2)
    ap.add_argument('--devices-per-process', type=int, default=4)
    ap.add_argument('--coordinator', default=None)
    ap.add_argument('--steps', type=int, default=1)
    ap.add_argument('--ckpt-dir', default=None)
    ap.add_argument('--out', default=None)
    ap.add_argument('--timeout', type=float, default=300.0)
    args = ap.parse_args(argv)
    if args.process_id is None:
        return _launch(args)
    return _worker(args)


if __name__ == '__main__':
    sys.exit(main())
