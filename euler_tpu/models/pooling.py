"""Graph-level pooling (readout) layers.

TPU-native counterparts of the reference's graph_pool package
(reference: tf_euler/python/graph_pool/base_pool.py:21 segment pooling,
attention_pool.py:22, set2set_pool.py:22) — scatter over graph_index.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from euler_tpu.ops import mp_ops

Array = jnp.ndarray


class SegmentPool(nn.Module):
    """sum/mean/max readout by graph index (base_pool.py)."""

    aggr: str = "sum"   # 'sum' | 'mean' | 'max'
    num_graphs: int = 0  # static segment count

    @nn.compact
    def __call__(self, x: Array, graph_index: Array, mask=None):
        op = {"sum": "add", "add": "add", "mean": "mean",
              "max": "max"}[self.aggr]
        return mp_ops.masked_scatter_(op, x, graph_index, self.num_graphs,
                                      mask)


class AttentionPool(nn.Module):
    """Gated attention readout (attention_pool.py): softmax(gate(x)) * x."""

    num_graphs: int

    @nn.compact
    def __call__(self, x: Array, graph_index: Array, mask=None):
        gate = nn.Dense(1, use_bias=False)(x)
        alpha = mp_ops.masked_scatter_softmax(gate, graph_index,
                                              self.num_graphs, mask)
        msg = x * alpha
        if mask is not None:
            msg = msg * mask[:, None]
        return mp_ops.scatter_add(msg, graph_index, self.num_graphs)


class Set2SetPool(nn.Module):
    """Set2Set readout (set2set_pool.py): LSTM query + attention over the
    node set, ``processing_steps`` iterations; output [G, 2*dim]."""

    num_graphs: int
    dim: int
    processing_steps: int = 3

    @nn.compact
    def __call__(self, x: Array, graph_index: Array, mask=None):
        proj = nn.Dense(self.dim, use_bias=False)(x)
        lstm = nn.OptimizedLSTMCell(features=self.dim)
        G = self.num_graphs
        q_star = jnp.zeros((G, 2 * self.dim))
        carry = lstm.initialize_carry(jax.random.PRNGKey(0),
                                      (G, 2 * self.dim))
        for _ in range(self.processing_steps):
            carry, q = lstm(carry, q_star)
            e = jnp.sum(proj * mp_ops.gather(q, graph_index), axis=-1,
                        keepdims=True)
            a = mp_ops.masked_scatter_softmax(e, graph_index, G, mask)
            msg = proj * a
            if mask is not None:
                msg = msg * mask[:, None]
            r = mp_ops.scatter_add(msg, graph_index, G)
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star


def get_pool_class(name: str):
    return {"sum": SegmentPool, "mean": SegmentPool, "max": SegmentPool,
            "attention": AttentionPool, "set2set": Set2SetPool}[name]
