"""Minimal FSW embedding example -- TPU-native equivalent of the reference's
demo_fsw_embedding.py (/root/reference/demo_fsw_embedding.py): embed a batch
of weighted point clouds.

Run: python examples/demo_fsw_embedding.py  (CPU or TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fsw_gnn_tpu import FSWConfig
from fsw_gnn_tpu.modules import FSWEmbedding

batch_dims = (3, 2, 5)
d = 20
n = 100
embed_dim = 1000

cfg = FSWConfig(d_in=d, d_out=embed_dim)
emb = FSWEmbedding(cfg)

key = jax.random.PRNGKey(0)
kx, kw, ki = jax.random.split(key, 3)
X = jax.random.normal(kx, batch_dims + (n, d))
W = jax.nn.softmax(jax.random.normal(kw, batch_dims + (n,)), axis=-1)

variables = emb.init(ki, X, W)
X_emb = jax.jit(emb.apply)(variables, X, W)

print(f'Feature dimension: {d}  Size of each multiset: {n}  '
      f'Embedding dimension: {embed_dim}  Batch dimensions: {batch_dims}')
print('Size of X:    ', X.shape)
print('Size of E(X): ', X_emb.shape)
