"""Graph autoencoders + contrastive models: GAE, VGAE, DGI.

TPU-native counterparts of the reference models
(reference: tf_euler/python/mp_utils/base_gae.py:23 + examples/gae/gae.py
— inner-product edge decoder over GNN embeddings, variational variant
with KL; examples/dgi/dgi.py — corruption + sigmoid-mean readout +
bilinear discriminator).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from euler_tpu.graph.store import GraphTensors
from euler_tpu.models.gnn import _sigmoid_xent
from euler_tpu.ops import sampling

Array = jnp.ndarray


class GAE(nn.Module):
    """embedder: GNN producing node embeddings. Edge decoder = dot product
    against a positive neighbor vs sampled negatives (base_gae.py)."""

    embedder: nn.Module
    edge_types: Tuple[int, ...]
    node_type: int = -1
    num_negs: int = 5

    def encode(self, g, n_id):
        return self.embedder(g, n_id)

    @nn.compact
    def __call__(self, g: GraphTensors, roots: Array):
        ks, kn = jax.random.split(self.make_rng("sample"))
        B = roots.shape[0]
        pos, _, _, _ = sampling.sample_neighbor(g, ks, roots,
                                                self.edge_types, 1)
        pos = pos[:, 0]
        negs = sampling.sample_node(g, kn, B * self.num_negs,
                                    self.node_type).reshape(B, self.num_negs)
        emb = self.encode(g, roots)
        emb_pos = self.encode(g, pos)
        emb_negs = self.encode(g, negs.reshape(-1)).reshape(
            B, self.num_negs, -1)
        logits = jnp.sum(emb * emb_pos, axis=-1, keepdims=True)
        neg_logits = jnp.einsum("bd,bnd->bn", emb, emb_negs)
        ok = ((roots >= 0) & (pos >= 0)).astype(jnp.float32)[:, None]
        loss = (jnp.sum(_sigmoid_xent(logits, jnp.ones_like(logits)) * ok) +
                jnp.sum(_sigmoid_xent(neg_logits,
                                      jnp.zeros_like(neg_logits)) * ok)) / \
            jnp.maximum(jnp.sum(ok) * (1 + self.num_negs), 1.0)
        extra = self.extra_loss(g, roots, emb)
        return dict(loss=loss + extra, embedding=emb, logits=logits,
                    neg_logits=neg_logits, pos_mask=ok)

    def extra_loss(self, g, roots, emb):
        return 0.0


class VGAE(GAE):
    """Variational GAE: mu/log_var encoders + KL (gae.py kl at :96-98).
    The reparameterized sample feeds the decoder."""

    latent_dim: int = 0

    @nn.compact
    def __call__(self, g: GraphTensors, roots: Array):
        # mu from the GNN; log_var from a parallel linear head on mu
        kz = self.make_rng("sample")
        ks, kn, ke = jax.random.split(kz, 3)
        B = roots.shape[0]
        pos, _, _, _ = sampling.sample_neighbor(g, ks, roots,
                                                self.edge_types, 1)
        pos = pos[:, 0]
        negs = sampling.sample_node(g, kn, B * self.num_negs,
                                    self.node_type).reshape(B, self.num_negs)

        log_var_fc = None

        def enc(n_id, key):
            nonlocal log_var_fc
            mu = self.embedder(g, n_id)
            if log_var_fc is None:
                log_var_fc = nn.Dense(mu.shape[-1], name="log_var_fc")
            lv = log_var_fc(mu)
            eps = jax.random.normal(key, mu.shape)
            z = mu + jnp.exp(0.5 * lv) * eps
            return z, mu, lv

        k1, k2, k3 = jax.random.split(ke, 3)
        z, mu, lv = enc(roots, k1)
        z_pos, _, _ = enc(pos, k2)
        z_negs, _, _ = enc(negs.reshape(-1), k3)
        z_negs = z_negs.reshape(B, self.num_negs, -1)
        logits = jnp.sum(z * z_pos, axis=-1, keepdims=True)
        neg_logits = jnp.einsum("bd,bnd->bn", z, z_negs)
        ok = ((roots >= 0) & (pos >= 0)).astype(jnp.float32)[:, None]
        recon = (jnp.sum(_sigmoid_xent(logits, jnp.ones_like(logits)) * ok) +
                 jnp.sum(_sigmoid_xent(neg_logits,
                                       jnp.zeros_like(neg_logits)) * ok)) / \
            jnp.maximum(jnp.sum(ok) * (1 + self.num_negs), 1.0)
        kl = jnp.mean(-0.5 * (lv - jnp.exp(lv) - mu ** 2 + 1))
        return dict(loss=recon + kl, embedding=mu, logits=logits,
                    neg_logits=neg_logits, pos_mask=ok)


class DGI(nn.Module):
    """Deep Graph Infomax (dgi.py): positive patch embeddings vs corrupted
    ones against the sigmoid-mean summary, bilinear discriminator."""

    embedder: nn.Module
    node_type: int = -1
    num_negs: int = 5

    @nn.compact
    def __call__(self, g: GraphTensors, roots: Array):
        kn = self.make_rng("sample")
        B = roots.shape[0]
        corrupt = sampling.sample_node(g, kn, B * self.num_negs,
                                       self.node_type).reshape(-1)
        emb = self.embedder(g, roots)                       # [B, D]
        emb_neg = self.embedder(g, corrupt).reshape(B, self.num_negs, -1)
        summary = jax.nn.sigmoid(jnp.mean(emb, axis=0, keepdims=True))
        kernel = nn.Dense(emb.shape[-1], use_bias=False, name="disc")
        logits = jnp.sum(kernel(emb) * summary, axis=-1, keepdims=True)
        neg_logits = jnp.einsum("bnd,d->bn", kernel(emb_neg), summary[0])
        loss = (jnp.mean(_sigmoid_xent(logits, jnp.ones_like(logits))) +
                jnp.mean(_sigmoid_xent(neg_logits,
                                       jnp.zeros_like(neg_logits)))) / 2
        return dict(loss=loss, embedding=emb, logits=logits,
                    neg_logits=neg_logits)
