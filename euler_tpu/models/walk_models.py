"""Walk/proximity embedding models: DeepWalk, Node2Vec, LINE.

TPU-native counterparts of the reference examples
(reference: examples/deepwalk/deepwalk.py:28-90 — random_walk + gen_pair +
skip-gram with negative sampling; examples/line/line.py — first/second
order proximity). The walk, pair generation, negative sampling and the
skip-gram loss fuse into a single XLA program per step.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from euler_tpu.graph.store import GraphTensors
from euler_tpu.models.gnn import _sigmoid_xent
from euler_tpu.ops import sampling, walk

Array = jnp.ndarray


class DeepWalk(nn.Module):
    """reference: examples/deepwalk/deepwalk.py. ``p``/``q`` != 1 gives
    Node2Vec (same code path; reference node2vec lives in random_walk_op)."""

    n_nodes: int
    dim: int
    edge_types: Tuple[int, ...]
    walk_len: int = 3
    left_win: int = 1
    right_win: int = 1
    num_negs: int = 5
    node_type: int = -1
    walk_p: float = 1.0
    walk_q: float = 1.0
    bias_cap: int = 64        # node2vec window size (see ops/walk)
    bias_windows: int = 1     # windows of exact p/q coverage; size via
    # walk.check_bias_cap so cap*windows >= max degree for exactness
    shard_embeddings: bool = False   # partition the [n_nodes, dim]
    # tables over the mesh's graph axis (layers.ShardedEmbedding — the
    # reference's PS-partitioned Embedding); required at papers100M
    # scale where one replica cannot hold the table

    @nn.compact
    def __call__(self, g: GraphTensors, roots: Array):
        if self.shard_embeddings:
            from euler_tpu.models.layers import ShardedEmbedding
            t_mod = ShardedEmbedding(self.n_nodes + 1, self.dim,
                                     name="target_emb")
            c_mod = ShardedEmbedding(self.n_nodes + 1, self.dim,
                                     name="context_emb")
            target = lambda ids: t_mod(g, ids)
            context = lambda ids: c_mod(g, ids)
        else:
            target = nn.Embed(self.n_nodes + 1, self.dim,
                              name="target_emb")
            context = nn.Embed(self.n_nodes + 1, self.dim,
                               name="context_emb")
        kw, kn = jax.random.split(self.make_rng("sample"))
        paths = walk.random_walk(g, kw, roots, self.edge_types,
                                 self.walk_len, self.walk_p, self.walk_q,
                                 bias_cap=self.bias_cap,
                                 bias_windows=self.bias_windows)
        pairs = walk.gen_pair(paths, self.left_win, self.right_win)
        src = pairs[..., 0].reshape(-1)
        ctx = pairs[..., 1].reshape(-1)
        M = src.shape[0]
        negs = sampling.sample_node(g, kn, M * self.num_negs,
                                    self.node_type).reshape(M, self.num_negs)
        s = target(jnp.maximum(src, 0))
        c = context(jnp.maximum(ctx, 0))
        n = context(jnp.maximum(negs, 0))
        logits = jnp.sum(s * c, axis=-1, keepdims=True)
        neg_logits = jnp.einsum("md,mnd->mn", s, n)
        ok = ((src >= 0) & (ctx >= 0)).astype(jnp.float32)[:, None]
        loss = (jnp.sum(_sigmoid_xent(logits, jnp.ones_like(logits)) * ok) +
                jnp.sum(_sigmoid_xent(neg_logits,
                                      jnp.zeros_like(neg_logits)) * ok)) / \
            jnp.maximum(jnp.sum(ok) * (1 + self.num_negs), 1.0)
        emb = target(jnp.maximum(roots, 0))
        return dict(loss=loss, embedding=emb, logits=logits,
                    neg_logits=neg_logits, pos_mask=ok)


class Node2Vec(DeepWalk):
    """DeepWalk with biased walks (p=return, q=in-out)."""


class LINE(nn.Module):
    """reference: examples/line/line.py — order 1: shared embedding dot
    with a sampled neighbor; order 2: separate context table."""

    n_nodes: int
    dim: int
    edge_types: Tuple[int, ...]
    order: int = 2
    num_negs: int = 5
    node_type: int = -1
    shard_embeddings: bool = False   # see DeepWalk.shard_embeddings

    @nn.compact
    def __call__(self, g: GraphTensors, roots: Array):
        if self.shard_embeddings:
            from euler_tpu.models.layers import ShardedEmbedding
            t_mod = ShardedEmbedding(self.n_nodes + 1, self.dim,
                                     name="target_emb")
            target = lambda ids: t_mod(g, ids)
            if self.order == 1:
                context = target
            else:
                c_mod = ShardedEmbedding(self.n_nodes + 1, self.dim,
                                         name="context_emb")
                context = lambda ids: c_mod(g, ids)
        elif self.order == 1:
            target = nn.Embed(self.n_nodes + 1, self.dim,
                              name="target_emb")
            context = target
        else:
            target = nn.Embed(self.n_nodes + 1, self.dim,
                              name="target_emb")
            context = nn.Embed(self.n_nodes + 1, self.dim,
                               name="context_emb")
        ks, kn = jax.random.split(self.make_rng("sample"))
        B = roots.shape[0]
        pos, _, _, _ = sampling.sample_neighbor(g, ks, roots,
                                                self.edge_types, 1)
        pos = pos[:, 0]
        negs = sampling.sample_node(g, kn, B * self.num_negs,
                                    self.node_type).reshape(B, self.num_negs)
        s = target(jnp.maximum(roots, 0))
        c = context(jnp.maximum(pos, 0))
        n = context(jnp.maximum(negs, 0))
        logits = jnp.sum(s * c, axis=-1, keepdims=True)
        neg_logits = jnp.einsum("bd,bnd->bn", s, n)
        ok = ((roots >= 0) & (pos >= 0)).astype(jnp.float32)[:, None]
        loss = (jnp.sum(_sigmoid_xent(logits, jnp.ones_like(logits)) * ok) +
                jnp.sum(_sigmoid_xent(neg_logits,
                                      jnp.zeros_like(neg_logits)) * ok)) / \
            jnp.maximum(jnp.sum(ok) * (1 + self.num_negs), 1.0)
        return dict(loss=loss, embedding=s, logits=logits,
                    neg_logits=neg_logits, pos_mask=ok)
