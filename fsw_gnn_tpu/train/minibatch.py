"""Neighbor-sampled minibatch training (BASELINE configs #4-#5,
ogbn-arxiv/products style).

Host-side pipeline: NeighborSampler (numpy or native C++) draws fixed-fanout
subgraphs around a seed batch; each subgraph is padded to static shapes
(max_nodes nodes, E_max edges) so one jitted train step serves every batch.
Loss is computed on the seed nodes only (the first `batch_size` local ids).

With config.num_devices > 1 the trainer goes DATA-PARALLEL (parallel/dp.py):
each epoch is processed in waves of D batches, one per device, stacked
host-side into [D, ...] arrays and consumed by one shard_mapped step whose
gradients are psum-summed and whose loss is normalized by the GLOBAL seed
count -- one DP wave is mathematically one full-batch step over the union
of its D subgraph batches (tested against a manually combined-gradient
step in tests/test_minibatch.py).
CLI: `python -m fsw_gnn_tpu.cli train --minibatch --num-devices D`.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.datasets import NodeClassificationData
from ..data.sampler import NeighborSampler
from ..graph import Graph, from_edge_index
from ..models.gnn import FSWGNN
from ..parallel.dist import masked_softmax_cross_entropy
from .trainer import TrainConfig, Trainer


class MinibatchTrainer(Trainer):
    def __init__(self, data: NodeClassificationData, config: TrainConfig,
                 batch_size: int = 512, fanouts: Tuple[int, ...] = (10, 10)):
        # Trainer.__init__ builds the full graph (used for evaluation) and
        # the single-device step; we add the sampler machinery on top.
        # num_devices > 1 selects DATA parallelism over batch waves (the
        # edge-partitioned distributed path lives in the full-graph
        # Trainer), so the base class is always built single-device.
        self.dp_devices = (config.num_devices
                           if (config.num_devices or 1) > 1 else None)
        super().__init__(data, dataclasses.replace(config, num_devices=None))
        self.batch_size = batch_size
        self.fanouts = tuple(fanouts)
        self.sampler = NeighborSampler(data.edge_index, data.num_nodes,
                                       fanouts=self.fanouts, seed=config.seed)
        # static shape caps: nodes <= b*(1 + f1 + f1*f2 + ...), edges
        # <= b*(f1 + f1*f2 + ...)
        nodes_cap, edges_cap, frontier = 1, 0, 1
        for f in self.fanouts:
            frontier *= f
            nodes_cap += frontier
            edges_cap += frontier
        self.max_nodes = batch_size * nodes_cap
        self.max_edges = max(128, -(-batch_size * edges_cap // 128) * 128)
        self.train_seeds = np.nonzero(data.train_mask)[0]
        self._rng = np.random.default_rng(config.seed)
        self._mb_step = self._make_minibatch_step()
        if self.dp_devices:
            from ..parallel.dp import make_data_mesh, make_dp_train_step
            self.mesh = make_data_mesh(self.dp_devices)
            template = self._build_batch(
                self.train_seeds[:min(self.batch_size,
                                      len(self.train_seeds))])[0]
            self._dp_step = make_dp_train_step(
                self.model, self.opt, template, self.mesh,
                fixed_collections=self.fixed)

    def _make_minibatch_step(self):
        model, opt, fixed = self.model, self.opt, self.fixed

        def loss_fn(params, bstats, Xb, graph, labels, mask, rng):
            logits, mutated = model.apply(
                {'params': params, **bstats, **fixed}, Xb, graph,
                train=True, rngs={'dropout': rng}, mutable=['batch_stats'])
            s, c = masked_softmax_cross_entropy(logits, labels, mask)
            return s / jnp.maximum(c, 1.0), mutated

        def step(params, bstats, opt_state, Xb, graph, labels, mask, rng):
            (loss, mutated), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bstats, Xb, graph, labels,
                                       mask, rng)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, mutated, opt_state, loss

        # CountingJit (not bare jax.jit): `num_compiles` is the
        # deterministic "every batch shares one executable" observable --
        # the static padded shapes guarantee is load-bearing for the
        # 2-7 min/compile TPU tunnel, so it is asserted in tests
        from ..utils.cache import CountingJit
        return CountingJit(step, donate_argnums=(0, 2))

    def _build_batch(self, seeds: np.ndarray):
        batch = self.sampler.sample(seeds, labels=self.data.labels,
                                    max_nodes=self.max_nodes)
        g = from_edge_index(batch.edge_index_local, self.max_nodes,
                            pad_to=self.max_edges, dtype=jnp.float32)
        # pin static metadata so every batch hits the same jit cache entry
        g = dataclasses.replace(g, num_edges=self.max_edges)
        Xb = jnp.asarray(self.data.features[batch.node_ids], jnp.float32)
        labels = np.zeros(self.max_nodes, np.int32)
        mask = np.zeros(self.max_nodes, np.float32)
        n_seed = batch.num_seeds
        labels[:n_seed] = batch.seed_labels
        mask[:n_seed] = 1.0
        return g, Xb, jnp.asarray(labels), jnp.asarray(mask)

    def train_epoch(self) -> float:
        if self.dp_devices:
            return self._train_epoch_dp()
        order = self._rng.permutation(self.train_seeds)
        losses = []
        for i in range(0, len(order), self.batch_size):
            seeds = order[i:i + self.batch_size]
            if len(seeds) < self.batch_size:
                if len(order) < self.batch_size:
                    break  # dataset smaller than one batch
                # keep shapes static: wrap around with the epoch's first seeds
                # (seeds must stay unique within a batch)
                seeds = np.concatenate(
                    [seeds, order[:self.batch_size - len(seeds)]])
            g, Xb, labels, mask = self._build_batch(seeds)
            self._key, rng = jax.random.split(self._key)
            (self.params, self.batch_stats, self.opt_state,
             loss) = self._mb_step(self.params, self.batch_stats,
                                   self.opt_state, Xb, g, labels, mask, rng)
            losses.append(float(loss))
        self.step_count += 1
        return float(np.mean(losses)) if losses else float('nan')

    def _train_epoch_dp(self) -> float:
        """One epoch in waves of D per-device batches (parallel/dp.py)."""
        from ..parallel.dp import stack_batches
        D = self.dp_devices
        order = self._rng.permutation(self.train_seeds)
        if len(order) < self.batch_size:
            self.step_count += 1
            return float('nan')   # dataset smaller than one batch

        def batch_seeds(k):
            # k-th batch, cyclic over the epoch permutation: a contiguous
            # cyclic slice of a permutation is unique within the batch
            # whenever batch_size <= len(order)
            start = (k * self.batch_size) % len(order)
            idx = np.arange(start, start + self.batch_size) % len(order)
            return order[idx]

        n_batches = -(-len(order) // self.batch_size)
        n_batches = -(-n_batches // D) * D      # full waves only
        losses = []
        for w in range(0, n_batches, D):
            parts = [self._build_batch(batch_seeds(w + d)) for d in range(D)]
            stacked = stack_batches([p[0] for p in parts],
                                    [p[1] for p in parts],
                                    [p[2] for p in parts],
                                    [p[3] for p in parts])
            self._key, rng = jax.random.split(self._key)
            (self.params, self.opt_state, self.batch_stats,
             loss) = self._dp_step(self.params, self.opt_state,
                                   self.batch_stats, *stacked, rng)
            losses.append(float(loss))
        self.step_count += 1
        return float(np.mean(losses)) if losses else float('nan')
