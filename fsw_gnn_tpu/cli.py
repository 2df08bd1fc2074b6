"""Command-line interface for training and evaluating FSW-GNNs.

The reference has no CLI (SURVEY.md section 1); this provides runnable entry
points for the BASELINE configs:

  python -m fsw_gnn_tpu.cli train --dataset cora --hidden 64 --epochs 100
  python -m fsw_gnn_tpu.cli train --dataset ogbn-arxiv --minibatch \
      --batch-size 1024 --fanouts 10,10
  python -m fsw_gnn_tpu.cli train --dataset cora --num-devices 8
  python -m fsw_gnn_tpu.cli bench
"""
from __future__ import annotations

import argparse
import json
import sys


def _add_train_args(p):
    p.add_argument('--dataset', default='cora')
    p.add_argument('--hidden', type=int, nargs='+', default=[64])
    p.add_argument('--embed-dim', type=int, default=None,
                   help='FSW embedding dim per layer (default: reference '
                        'heuristic 2*max(in, out), huge for wide features)')
    p.add_argument('--epochs', type=int, default=100)
    p.add_argument('--lr', type=float, default=1e-2)
    p.add_argument('--weight-decay', type=float, default=0.0)
    p.add_argument('--mlp-layers', type=int, default=1)
    p.add_argument('--dropout', type=float, default=0.0)
    p.add_argument('--eval-every', type=int, default=5)
    p.add_argument('--patience', type=int, default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--num-devices', type=int, default=None,
                   help='edge-partition the graph over this many devices')
    p.add_argument('--slice-chunk', type=int, default=None,
                   help='serialize the slice axis in chunks (memory cap)')
    p.add_argument('--eval-node-chunk', type=int, default=None,
                   help='exact layer-wise evaluation in recipient chunks '
                        'of this size (memory cap for huge graphs)')
    p.add_argument('--exchange', default='all_gather',
                   choices=['all_gather', 'all_to_all', 'overlap'],
                   help='boundary feature exchange for distributed runs')
    p.add_argument('--minimize-slice-coherence', action='store_true',
                   help='coherence-minimize projection frames at init '
                        '(reference default; slower init)')
    p.add_argument('--checkpoint-dir', default=None)
    p.add_argument('--no-auto-resume', action='store_true',
                   help='do not restore the latest checkpoint in '
                        '--checkpoint-dir before training')
    p.add_argument('--metrics-path', default=None,
                   help='append per-epoch metrics to this JSONL file')
    p.add_argument('--trace-dir', default=None)
    p.add_argument('--compilation-cache', default=None, metavar='DIR',
                   help='persist compiled XLA executables on disk '
                        '(minutes-long TPU compiles become one-time)')
    p.add_argument('--minibatch', action='store_true',
                   help='neighbor-sampled minibatch training')
    p.add_argument('--batch-size', type=int, default=512)
    p.add_argument('--fanouts', default='10,10')
    p.add_argument('--verbose', action='store_true')


def cmd_train(args) -> int:
    from .data.datasets import load
    from .train import TrainConfig, Trainer


    data = load(args.dataset)
    cfg = TrainConfig(
        hidden_dims=tuple(args.hidden), embed_dim=args.embed_dim,
        learning_rate=args.lr,
        weight_decay=args.weight_decay, epochs=args.epochs,
        eval_every=args.eval_every, patience=args.patience,
        minimize_slice_coherence=args.minimize_slice_coherence,
        mlp_layers=args.mlp_layers, dropout=args.dropout, seed=args.seed,
        num_devices=args.num_devices, exchange=args.exchange,
        slice_chunk=args.slice_chunk,
        eval_node_chunk=args.eval_node_chunk,
        checkpoint_dir=args.checkpoint_dir,
        auto_resume=not args.no_auto_resume,
        metrics_path=args.metrics_path,
        trace_dir=args.trace_dir,
        compilation_cache=args.compilation_cache)

    if args.minibatch:
        from .train.minibatch import MinibatchTrainer
        fanouts = tuple(int(x) for x in args.fanouts.split(','))
        tr = MinibatchTrainer(data, cfg, batch_size=args.batch_size,
                              fanouts=fanouts)
    else:
        tr = Trainer(data, cfg)
    out = tr.fit(verbose=args.verbose)
    print(json.dumps({'dataset': data.name, **out['final'],
                      'seconds': round(out['seconds'], 2),
                      'epochs_run': out['epochs_run']}))
    return 0


def cmd_autotune(args) -> int:
    """One-shot rank-vs-sort crossover measurement for THIS chip, cached
    by device kind so aggregate='auto' can use the rank kernel on
    generations without a measured rules table."""
    from .utils.autotune import autotune_rank_rules, cache_path
    from .utils.cache import enable_compilation_cache
    # persistent XLA cache: a rerun after a mid-sweep failure (or a config
    # tweak) pays ~nothing for the programs that already compiled; run
    # TIMES are unaffected (the cache skips compiles, not execution)
    enable_compilation_cache()
    rules = autotune_rank_rules(write_cache=not args.dry_run)
    print(json.dumps({'rules': rules,
                      'cache': None if args.dry_run else cache_path()}))
    return 0


def cmd_bench(args) -> int:
    import runpy
    import os
    runpy.run_path(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'bench.py'), run_name='__main__')
    return 0


def cmd_export(args) -> int:
    """Checkpoint -> serialized StableHLO serving artifact."""
    import jax

    from .data.datasets import load
    from .serving import export_forward, save_artifact
    from .train import TrainConfig, Trainer

    data = load(args.dataset)
    cfg = TrainConfig(hidden_dims=tuple(args.hidden),
                      embed_dim=args.embed_dim, mlp_layers=args.mlp_layers,
                      seed=args.seed, checkpoint_dir=args.checkpoint_dir,
                      slice_chunk=args.slice_chunk)
    tr = Trainer(data, cfg)
    step = tr.restore_checkpoint()
    variables = {'params': tr.params, **tr.batch_stats, **tr.fixed}
    blob = export_forward(
        tr.model, variables,
        jax.ShapeDtypeStruct(tr.X.shape, tr.X.dtype), tr.compute_graph,
        platform=args.platform)
    save_artifact(args.out, blob)
    print(json.dumps({'artifact': args.out, 'bytes': len(blob),
                      'checkpoint_step': step}))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog='fsw_gnn_tpu')
    sub = parser.add_subparsers(dest='cmd', required=True)
    pt = sub.add_parser('train', help='train an FSW-GNN node classifier')
    _add_train_args(pt)
    sub.add_parser('bench', help='run the headline benchmark')
    pa = sub.add_parser('autotune', help='measure + cache the rank-vs-sort '
                                         'crossover for this chip')
    pa.add_argument('--dry-run', action='store_true',
                    help='measure and print, do not write the cache')
    pe = sub.add_parser('export', help='checkpoint -> StableHLO artifact')
    pe.add_argument('--dataset', default='cora')
    pe.add_argument('--hidden', type=int, nargs='+', default=[64])
    pe.add_argument('--embed-dim', type=int, default=None)
    pe.add_argument('--mlp-layers', type=int, default=1)
    pe.add_argument('--slice-chunk', type=int, default=None)
    pe.add_argument('--seed', type=int, default=0)
    pe.add_argument('--checkpoint-dir', required=True)
    pe.add_argument('--platform', default=None,
                    help="lowering platform ('tpu'/'cpu'); default current")
    pe.add_argument('--out', required=True)
    args = parser.parse_args(argv)
    if args.cmd == 'train':
        return cmd_train(args)
    if args.cmd == 'bench':
        return cmd_bench(args)
    if args.cmd == 'autotune':
        return cmd_autotune(args)
    if args.cmd == 'export':
        return cmd_export(args)
    return 1


if __name__ == '__main__':
    sys.exit(main())
