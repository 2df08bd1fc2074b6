"""Side-by-side training harness: this framework vs the torch reference.

Composes the reference "conv" exactly as tests/test_conv.py does (reference
FSW_embedding in graph mode + a torch MLP matching _MLPHead's
Dense->LeakyReLU(0.2)->Dense tail, since /root/reference/fsw_conv.py:331-371
cannot be imported without torch_geometric), transplants identical initial
parameters into both frameworks, and trains both with the same SGD recipe on
the same planted-partition data.  Used by tests/test_training_parity.py (ten
f64 steps, tight per-step loss agreement) and scripts/training_parity.py
(multi-seed final-accuracy comparison); mirrors the reference's own training
smoke test /root/reference/test_conv.py:59-85.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch
import torch.nn.functional as F

from _reference import make_reference_embedding
from fsw_gnn_tpu import FSWConv, from_edge_index
from fsw_gnn_tpu.data.datasets import synthetic_planted_partition


def _torch_sparse_from_graph(g):
    E = g.num_edges
    idx = torch.from_numpy(np.stack([np.asarray(g.dst)[:E],
                                     np.asarray(g.src)[:E]]).astype(np.int64))
    vals = torch.from_numpy(np.asarray(g.weight)[:E].astype(np.float64))
    return torch.sparse_coo_tensor(idx, vals,
                                   (g.num_recipients, g.num_nodes)).coalesce()


class Problem:
    """One planted-partition node-classification problem with both models
    initialized to IDENTICAL parameters."""

    def __init__(self, seed, num_nodes=60, feat_dim=8, num_classes=3,
                 p_in=0.12, p_out=0.02, self_loop_weight=0.2):
        data = synthetic_planted_partition(
            num_nodes=num_nodes, num_classes=num_classes, feat_dim=feat_dim,
            p_in=p_in, p_out=p_out, seed=seed)
        self.data = data
        self.g = from_edge_index(data.edge_index, num_nodes,
                                 self_loop_weight=self_loop_weight,
                                 dtype=jnp.float64)
        self.X = jnp.asarray(data.features, jnp.float64)
        self.labels = jnp.asarray(data.labels)
        self.train_idx = np.nonzero(data.train_mask)[0]
        self.val_idx = np.nonzero(data.val_mask)[0]

        C = num_classes
        self.conv = FSWConv(
            in_channels=feat_dim, out_channels=C, mlp_layers=2,
            mlp_activation_final=None,
            vertex_degree_encoding_function='log',
            learnable_vertex_degree_encoding_scale=True,
            minimize_slice_coherence=False, dtype=jnp.float64)
        variables = self.conv.init(jax.random.PRNGKey(seed), self.X, self.g)
        self.params = variables['params']
        self.fixed = {k: v for k, v in variables.items() if k != 'params'}

        # ---- reference twin with transplanted parameters ----
        embed_dim = 2 * max(feat_dim, C)   # fsw_conv.py:231-234 default
        hidden = max(feat_dim, C)          # fsw_conv.py:228-229 default
        self.ref_emb = make_reference_embedding(
            d_in=feat_dim, d_out=embed_dim, encode_total_mass=True,
            total_mass_encoding_function='log',
            total_mass_encoding_scale=1.0,
            learnable_slices=True, learnable_freqs=True,
            learnable_total_mass_encoding_scale=True, enable_bias=False)
        pe = self.params['fsw_embed']
        sd = self.ref_emb.state_dict()
        sd['projVecs'] = torch.from_numpy(np.array(pe['proj_vecs']))
        sd['freqs'] = torch.from_numpy(np.array(pe['freqs']))
        sd['total_mass_encoding_scale'] = torch.from_numpy(
            np.array(pe['total_mass_scale']))
        self.ref_emb.load_state_dict(sd)

        ph = self.params['head']
        self.lin1 = torch.nn.Linear(embed_dim + feat_dim, hidden,
                                    dtype=torch.float64)
        self.lin2 = torch.nn.Linear(hidden, C, dtype=torch.float64)
        with torch.no_grad():
            self.lin1.weight.copy_(torch.from_numpy(
                np.asarray(ph['dense_0']['kernel']).T))
            self.lin1.bias.copy_(torch.from_numpy(
                np.asarray(ph['dense_0']['bias'])))
            self.lin2.weight.copy_(torch.from_numpy(
                np.asarray(ph['dense_1']['kernel']).T))
            self.lin2.bias.copy_(torch.from_numpy(
                np.asarray(ph['dense_1']['bias'])))

        self.W_t = _torch_sparse_from_graph(self.g)
        self.X_t = torch.from_numpy(np.asarray(self.X))
        self.labels_t = torch.from_numpy(np.asarray(data.labels))

    # ---- ours ----
    def jax_logits(self, params):
        return self.conv.apply({'params': params, **self.fixed},
                               self.X, self.g)

    def jax_loss(self, params):
        logits = self.jax_logits(params)[self.train_idx]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, self.labels[self.train_idx]).mean()

    def train_jax(self, steps, lr):
        """Plain SGD; returns (per-step losses BEFORE each update, params)."""
        opt = optax.sgd(lr)
        params = self.params
        state = opt.init(params)
        loss_and_grad = jax.jit(jax.value_and_grad(self.jax_loss))
        losses = []
        for _ in range(steps):
            loss, grads = loss_and_grad(params)
            losses.append(float(loss))
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        return np.array(losses), params

    # ---- reference ----
    def ref_logits(self):
        emb = self.ref_emb(self.X_t, self.W_t, graph_mode=True)
        h = torch.cat([emb, self.X_t], dim=-1)
        return self.lin2(F.leaky_relu(self.lin1(h), 0.2))

    def train_ref(self, steps, lr):
        ps = ([p for p in self.ref_emb.parameters() if p.requires_grad]
              + list(self.lin1.parameters()) + list(self.lin2.parameters()))
        opt = torch.optim.SGD(ps, lr=lr)
        losses = []
        for _ in range(steps):
            opt.zero_grad()
            logits = self.ref_logits()[self.train_idx]
            loss = F.cross_entropy(logits,
                                   self.labels_t[self.train_idx])
            losses.append(float(loss.detach()))
            loss.backward()
            opt.step()
        return np.array(losses)

    # ---- metrics ----
    def jax_accuracy(self, params, idx):
        pred = np.asarray(jnp.argmax(self.jax_logits(params), -1))
        return float((pred[idx] == np.asarray(self.labels)[idx]).mean())

    def ref_accuracy(self, idx):
        with torch.no_grad():
            pred = self.ref_logits().argmax(-1).numpy()
        return float((pred[idx] == self.labels_t.numpy()[idx]).mean())
