"""Full-graph node-classification trainer with checkpointing and metrics.

New subsystem (the reference ships no trainer -- SURVEY.md section 1 "There
is no CLI, no trainer...").  Covers BASELINE config #3 (Cora/Citeseer-style
full-graph training) on one chip or an edge-partitioned mesh, with:

  * optax optimizer + optional LR schedule,
  * orbax checkpointing of (params, opt_state, step) + fixed collections,
  * train/val/test accuracy metrics and early stopping,
  * jax.profiler hooks (trace_dir) for performance work.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.datasets import NodeClassificationData
from ..graph import Graph, auto_layout, from_edge_index
from ..models.gnn import FSWGNN
from ..parallel import (make_distributed_train_step, make_graph_mesh,
                        make_distributed_forward, partition_graph,
                        shard_node_features, shard_recipient_labels,
                        unshard_recipient_values)
from ..parallel.dist import masked_softmax_cross_entropy


def _trees_equal(a, b) -> bool:
    """Structural + exact-value equality of two pytrees of arrays."""
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    if ta != tb:
        return False
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


@dataclasses.dataclass
class TrainConfig:
    hidden_dims: tuple = (64,)
    embed_dim: Optional[int] = None          # None -> reference heuristic
                                             # 2*max(in, out) per layer
    learning_rate: float = 1e-2
    lr_schedule: Optional[str] = None        # None | 'cosine' | 'warmup_cosine'
    warmup_epochs: int = 10
    weight_decay: float = 0.0
    epochs: int = 100
    eval_every: int = 5
    patience: Optional[int] = None          # early stopping on val accuracy
    minimize_slice_coherence: bool = False  # True matches reference defaults;
                                            # off by default for init speed
    mlp_layers: int = 1
    dropout: float = 0.0
    batchnorm: bool = False
    slice_chunk: Optional[int] = None       # serialize slices to cap memory
    seed: int = 0
    num_devices: Optional[int] = None       # >1 -> edge-partitioned mesh
    exchange: str = 'all_gather'   # 'all_gather' | 'all_to_all' | 'overlap'
    overlap_chunks: int = 4        # slice chunks for exchange='overlap'
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 50
    auto_resume: bool = True                # fit() restores the latest
                                            # checkpoint in checkpoint_dir
                                            # and continues (failure
                                            # recovery for preempted runs)
    metrics_path: Optional[str] = None      # append per-epoch metrics as
                                            # JSON lines (structured export
                                            # for external observability)
    eval_node_chunk: Optional[int] = None   # exact layer-wise inference in
                                            # recipient chunks of this size
                                            # (memory-capped evaluation for
                                            # ogbn-products-scale graphs;
                                            # train/infer.py)
    trace_dir: Optional[str] = None         # jax.profiler trace output
    compilation_cache: Optional[str] = None  # persist compiled XLA
                                             # executables at this dir
                                             # (minutes-long TPU compiles
                                             # become one-time per machine)


class Trainer:
    def __init__(self, data: NodeClassificationData, config: TrainConfig):
        self.data = data
        self.cfg = config
        if config.compilation_cache:
            from ..utils import enable_compilation_cache
            enable_compilation_cache(config.compilation_cache)
        self.graph = from_edge_index(data.edge_index, data.num_nodes,
                                     dtype=jnp.float32)
        # single-device compute uses the faster layout for this degree
        # distribution; the distributed path partitions the CSR graph
        self.compute_graph = auto_layout(self.graph)
        dims = tuple(config.hidden_dims) + (data.num_classes,)
        n_dev = config.num_devices or 1
        self.distributed = n_dev > 1
        self.model = FSWGNN(
            in_channels=data.features.shape[1], hidden_dims=dims,
            embed_dim=config.embed_dim,
            minimize_slice_coherence=config.minimize_slice_coherence,
            mlp_layers=config.mlp_layers, dropout=config.dropout,
            batchnorm=config.batchnorm,
            # cross-shard batch statistics when BatchNorm runs inside the
            # edge-partitioned shard_map (each device sees only its
            # recipients' rows)
            bn_axis_name='graph' if (self.distributed and config.batchnorm)
            else None,
            slice_chunk=config.slice_chunk)
        self.X = jnp.asarray(data.features, jnp.float32)
        variables = self.model.init(jax.random.PRNGKey(config.seed),
                                    self.X, self.graph)
        self.params = variables['params']
        # BatchNorm running statistics are training-mutable state; everything
        # else non-params (e.g. 'fsw_fixed' non-learnable embedding params)
        # is constant per run
        self.batch_stats = ({'batch_stats': variables['batch_stats']}
                            if 'batch_stats' in variables else {})
        self.fixed = {k: v for k, v in variables.items()
                      if k not in ('params', 'batch_stats')}
        self._key = jax.random.PRNGKey(config.seed + 1)

        if config.lr_schedule == 'cosine':
            lr = optax.cosine_decay_schedule(config.learning_rate,
                                             config.epochs)
        elif config.lr_schedule == 'warmup_cosine':
            lr = optax.warmup_cosine_decay_schedule(
                0.0, config.learning_rate, config.warmup_epochs,
                config.epochs)
        else:
            lr = config.learning_rate
        if config.weight_decay > 0:
            self.opt = optax.adamw(lr, weight_decay=config.weight_decay)
        else:
            self.opt = optax.adam(lr)
        self.opt_state = self.opt.init(self.params)
        self.step_count = 0
        self.history: list = []

        if self.distributed:
            self.mesh = make_graph_mesh(n_dev)
            self.shards = partition_graph(self.graph, n_dev)
            self.Xs = shard_node_features(data.features.astype(np.float32),
                                          self.shards)
            self.labels_s, self.train_mask_s = shard_recipient_labels(
                data.labels, data.train_mask.astype(np.float32), self.shards)
            # sharded split masks so evaluate() never unshards logits
            _, self.val_mask_s = shard_recipient_labels(
                data.labels, data.val_mask.astype(np.float32), self.shards)
            _, self.test_mask_s = shard_recipient_labels(
                data.labels, data.test_mask.astype(np.float32), self.shards)
            self._step = make_distributed_train_step(
                self.model, self.opt, self.shards, self.mesh,
                fixed_collections=self.fixed, exchange=config.exchange,
                overlap_chunks=config.overlap_chunks)
            # built ONCE: a fresh closure per predict() would retrace+
            # recompile on every evaluation (minutes per compile on TPU)
            self._fwd = make_distributed_forward(
                self.model, self.shards, self.mesh, exchange=config.exchange,
                overlap_chunks=config.overlap_chunks)
        else:
            self._step = self._make_single_step()
            model, graph = self.model, self.compute_graph
            self._fwd = jax.jit(
                lambda variables, X: model.apply(variables, X, graph))

        self._ckpt_mgr = None
        self._last_saved_step = None   # steps written by THIS process
        if config.checkpoint_dir:
            import orbax.checkpoint as ocp
            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(config.checkpoint_dir),
                options=ocp.CheckpointManagerOptions(max_to_keep=3))

    # ------------------------------------------------------------------
    def _make_single_step(self):
        labels = jnp.asarray(self.data.labels)
        mask = jnp.asarray(self.data.train_mask, jnp.float32)
        model, opt, fixed = self.model, self.opt, self.fixed
        graph = self.compute_graph

        def loss_fn(params, bstats, X, rng):
            # train=True: dropout active, BatchNorm uses (and updates) batch
            # statistics -- the reference's MLP training semantics
            # (/root/reference/fsw_conv.py:268-310)
            logits, mutated = model.apply(
                {'params': params, **bstats, **fixed}, X, graph,
                train=True, rngs={'dropout': rng}, mutable=['batch_stats'])
            s, c = masked_softmax_cross_entropy(logits, labels, mask)
            return s / jnp.maximum(c, 1.0), mutated

        @functools.partial(jax.jit, donate_argnums=(0, 2))
        def step(params, bstats, opt_state, X, rng):
            (loss, mutated), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bstats, X, rng)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, mutated, opt_state, loss

        return step

    # ------------------------------------------------------------------
    def train_epoch(self) -> float:
        self._key, rng = jax.random.split(self._key)
        if self.distributed:
            (self.params, self.opt_state, self.batch_stats,
             loss) = self._step(
                self.params, self.opt_state, self.batch_stats, self.Xs,
                self.shards, self.labels_s, self.train_mask_s, rng)
        else:
            self.params, self.batch_stats, self.opt_state, loss = self._step(
                self.params, self.batch_stats, self.opt_state, self.X, rng)
        self.step_count += 1
        return float(loss)

    def predict(self) -> np.ndarray:
        variables = {'params': self.params, **self.batch_stats, **self.fixed}
        if self.distributed:
            stacked = self._fwd(variables, self.Xs, self.shards)
            return unshard_recipient_values(stacked, self.shards)
        if self.cfg.eval_node_chunk:
            from .infer import layerwise_predict
            return layerwise_predict(self.model, variables, self.X,
                                     self.graph, self.cfg.eval_node_chunk,
                                     slice_chunk=self.cfg.slice_chunk)
        return np.asarray(self._fwd(variables, self.X))

    @staticmethod
    @jax.jit
    def _split_accuracy(stacked_logits, labels_s, mask_s):
        """(correct, count) over sharded [P, R_shard, C] logits -- the
        reduction runs on-device (XLA inserts the cross-shard psum), so
        evaluation never unshards the logits to the host."""
        pred = jnp.argmax(stacked_logits, -1)
        ok = (pred == labels_s).astype(jnp.float32) * mask_s
        return jnp.sum(ok), jnp.sum(mask_s)

    def evaluate(self) -> Dict[str, float]:
        if self.distributed:
            variables = {'params': self.params, **self.batch_stats,
                         **self.fixed}
            stacked = self._fwd(variables, self.Xs, self.shards)
            out = {}
            for split, mask_s in (('train', self.train_mask_s),
                                  ('val', self.val_mask_s),
                                  ('test', self.test_mask_s)):
                correct, count = self._split_accuracy(stacked, self.labels_s,
                                                      mask_s)
                count = float(count)
                out[f'{split}_acc'] = (float(correct) / count if count
                                       else float('nan'))
            return out
        logits = self.predict()
        pred = logits.argmax(-1)
        y = self.data.labels
        out = {}
        for split, m in [('train', self.data.train_mask),
                         ('val', self.data.val_mask),
                         ('test', self.data.test_mask)]:
            out[f'{split}_acc'] = float((pred[m] == y[m]).mean()) if m.any() \
                else float('nan')
        return out

    # ------------------------------------------------------------------
    def save_checkpoint(self):
        if self._ckpt_mgr is None:
            return
        if self._last_saved_step == self.step_count:
            return  # this step is already on disk (e.g. final save right
                    # after a periodic one).  Tracked in-process, NOT via
                    # latest_step(): a reused checkpoint_dir may hold a
                    # stale entry with the same step number from a previous
                    # run, which must be overwritten, not skipped.
        import orbax.checkpoint as ocp
        if self.step_count in (self._ckpt_mgr.all_steps() or []):
            self._ckpt_mgr.delete(self.step_count)   # stale previous-run entry
        self._ckpt_mgr.save(
            self.step_count,
            args=ocp.args.StandardSave({'params': self.params,
                                        'opt_state': self.opt_state,
                                        'batch_stats': self.batch_stats,
                                        'fixed': self.fixed}))
        self._ckpt_mgr.wait_until_finished()
        self._last_saved_step = self.step_count

    def restore_checkpoint(self, step: Optional[int] = None):
        assert self._ckpt_mgr is not None, 'no checkpoint_dir configured'
        import orbax.checkpoint as ocp
        step = step if step is not None else self._ckpt_mgr.latest_step()
        restored = self._ckpt_mgr.restore(
            step,
            args=ocp.args.StandardRestore({'params': self.params,
                                           'opt_state': self.opt_state,
                                           'batch_stats': self.batch_stats,
                                           'fixed': self.fixed}))
        if self.distributed:
            # orbax restores arrays COMMITTED to one device; the mesh train
            # step needs them replicated (init-time params are uncommitted,
            # so this only bites on restore)
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(self.mesh, PartitionSpec())
            restored = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), restored)
        self.params = restored['params']
        self.opt_state = restored['opt_state']
        self.batch_stats = restored.get('batch_stats', {}) or {}
        old_fixed, self.fixed = self.fixed, restored['fixed']
        # the restored step's on-disk entry is exactly this state: a
        # same-step save would rewrite identical data, so mark it written
        # (this also keeps save_checkpoint's delete-then-save replacement
        # path off the entry we just resumed from)
        self._last_saved_step = step
        if not _trees_equal(old_fixed, self.fixed):
            # the compiled train step closed over the init-time fixed
            # collections; rebuild it so training uses the RESTORED
            # projections/freqs (predict() already takes them as arguments)
            if self.distributed:
                self._step = make_distributed_train_step(
                    self.model, self.opt, self.shards, self.mesh,
                    fixed_collections=self.fixed,
                    exchange=self.cfg.exchange,
                    overlap_chunks=self.cfg.overlap_chunks)
            else:
                self._step = self._make_single_step()
        self.step_count = step
        return step

    # ------------------------------------------------------------------
    def _export_metrics(self, rec):
        if not self.cfg.metrics_path:
            return
        with open(self.cfg.metrics_path, 'a') as f:
            f.write(json.dumps(rec) + '\n')

    def fit(self, verbose: bool = False) -> Dict[str, Any]:
        cfg = self.cfg
        best_val, best_metrics, strikes = -1.0, None, 0
        start_epoch = 1
        if (cfg.auto_resume and self._ckpt_mgr is not None
                and self._ckpt_mgr.latest_step() is not None):
            # failure recovery: continue a preempted run from its latest
            # checkpoint (one optimizer step per epoch, so step == epoch)
            start_epoch = self.restore_checkpoint() + 1
            if verbose:
                print(f'resumed from checkpoint at epoch {start_epoch - 1}')
        if cfg.trace_dir:
            jax.profiler.start_trace(cfg.trace_dir)
        t0 = time.perf_counter()
        for epoch in range(start_epoch, cfg.epochs + 1):
            loss = self.train_epoch()
            rec = {'epoch': epoch, 'loss': loss}
            if epoch % cfg.eval_every == 0 or epoch == cfg.epochs:
                rec.update(self.evaluate())
                if rec['val_acc'] == rec['val_acc']:  # not NaN
                    if rec['val_acc'] > best_val:
                        best_val, best_metrics, strikes = rec['val_acc'], rec, 0
                    else:
                        strikes += 1
                if verbose:
                    print(f"epoch {epoch}: loss={loss:.4f} "
                          f"train={rec.get('train_acc', float('nan')):.3f} "
                          f"val={rec.get('val_acc', float('nan')):.3f}")
                if cfg.patience and strikes >= cfg.patience:
                    break
            self.history.append(rec)
            self._export_metrics(rec)
            if self._ckpt_mgr and epoch % cfg.checkpoint_every == 0:
                self.save_checkpoint()
        elapsed = time.perf_counter() - t0
        if cfg.trace_dir:
            jax.profiler.stop_trace()
        if self._ckpt_mgr is not None:
            self.save_checkpoint()
        final = self.evaluate()
        self._export_metrics({'final': final, 'seconds': elapsed})
        return {'final': final, 'best': best_metrics, 'seconds': elapsed,
                'epochs_run': len(self.history)}
