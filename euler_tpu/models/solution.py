"""Solution kit: composable supervised/unsupervised building blocks.

TPU-native counterpart of the reference's solution package
(reference: tf_euler/python/solution/ — losses.py (sigmoid_loss,
xent_loss), logits.py (DenseLogits, PosNegLogits, CosineLogits),
samplers.py (SampleNegWithTypes, SamplePosWithTypes),
base_supervise.py:25-49, base_unsupervise.py).
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


# ---- losses (solution/losses.py) ------------------------------------------

def sigmoid_loss(logits, labels, mask=None):
    x = _sigmoid_xent(logits, labels)
    if mask is not None:
        m = mask.astype(x.dtype)
        return jnp.sum(x * m) / jnp.maximum(jnp.sum(m) * x.shape[-1], 1.0)
    return jnp.mean(x)


def xent_loss(logits, neg_logits, pos_mask=None):
    t = _sigmoid_xent(logits, jnp.ones_like(logits))
    n = _sigmoid_xent(neg_logits, jnp.zeros_like(neg_logits))
    if pos_mask is not None:
        m = pos_mask.astype(t.dtype)
        return (jnp.sum(t * m) + jnp.sum(n)) / \
            jnp.maximum(jnp.sum(m) + n.size, 1.0)
    return (jnp.sum(t) + jnp.sum(n)) / (t.size + n.size)


# ---- logits heads (solution/logits.py) -------------------------------------

class DenseLogits(nn.Module):
    logits_dim: int

    @nn.compact
    def __call__(self, emb):
        return nn.Dense(self.logits_dim, use_bias=False)(emb)


class PosNegLogits(nn.Module):
    @nn.compact
    def __call__(self, emb, pos_emb, neg_emb):
        pos = jnp.sum(emb * pos_emb, axis=-1, keepdims=True)
        neg = jnp.einsum("bd,bnd->bn", emb, neg_emb)
        return pos, neg


class CosineLogits(nn.Module):
    @nn.compact
    def __call__(self, a, b):
        na = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True),
                             1e-12)
        nb = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True),
                             1e-12)
        return jnp.sum(na * nb, axis=-1, keepdims=True)


# ---- samplers (solution/samplers.py) ---------------------------------------

def sample_pos_with_types(g: GraphTensors, key, roots, edge_types,
                          count: int = 1):
    pos, w, ty, eid = sampling.sample_neighbor(g, key, roots, edge_types,
                                               count)
    return pos, pos >= 0


def sample_neg_with_types(g: GraphTensors, key, roots, node_type,
                          num_negs: int):
    B = roots.shape[0]
    negs = sampling.sample_node(g, key, B * num_negs, node_type)
    return negs.reshape(B, num_negs)
