"""Building-block layers: embeddings (plain/sparse/hash), attention, LSTM.

TPU-native counterparts of the reference's layer kit
(reference: tf_euler/python/utils/layers.py:119-270 — Embedding,
SparseEmbedding (embedding_lookup_sparse, sum/mean combiner),
HashEmbedding (mod-hash into buckets), AttLayer (multi-head additive
attention over a sequence), LSTMLayer). The reference's PS partitioning
of big tables (``tf.get_variable(partitioner=...)``) is replaced by a
``jax.sharding`` PartitionSpec on the table when run under a mesh —
nothing at this level changes.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class Embedding(nn.Module):
    """Id -> dense vector; -1 ids map to a dedicated padding row that is
    zero-masked on output (reference: layers.py:119-149)."""

    max_id: int
    dim: int

    @nn.compact
    def __call__(self, ids: Array) -> Array:
        table = nn.Embed(self.max_id + 2, self.dim, name="embeddings")
        ok = ids >= 0
        out = table(jnp.where(ok, ids, self.max_id + 1))
        return jnp.where(ok[..., None], out, 0.0)


class SparseEmbedding(nn.Module):
    """Padded sparse-id block (ids [..., L], -1 padding) -> combined
    embedding (reference: layers.py:152-169 embedding_lookup_sparse)."""

    max_id: int
    dim: int
    combiner: str = "sum"   # 'sum' | 'mean'

    @nn.compact
    def __call__(self, ids: Array) -> Array:
        table = nn.Embed(self.max_id + 2, self.dim, name="embeddings")
        mask = ids >= 0
        emb = table(jnp.where(mask, ids, self.max_id + 1))
        m = mask[..., None].astype(emb.dtype)
        s = jnp.sum(emb * m, axis=-2)
        if self.combiner == "mean":
            s = s / jnp.maximum(jnp.sum(m, axis=-2), 1.0)
        return s


class HashEmbedding(nn.Module):
    """Unbounded ids mod-hashed into ``buckets`` rows
    (reference: HashEmbedding / HashSparseEmbedding, utils/layers.py).
    Accepts scalar-id or sparse-block input; sparse blocks are combined."""

    buckets: int
    dim: int
    combiner: str = "sum"
    sparse: bool = False

    @nn.compact
    def __call__(self, ids: Array) -> Array:
        table = nn.Embed(self.buckets, self.dim, name="embeddings")
        mask = ids >= 0
        hashed = jnp.where(mask, ids % self.buckets, 0)
        emb = jnp.where(mask[..., None], table(hashed), 0.0)
        if not self.sparse:
            return emb
        m = mask[..., None].astype(emb.dtype)
        s = jnp.sum(emb * m, axis=-2)
        if self.combiner == "mean":
            s = s / jnp.maximum(jnp.sum(m, axis=-2), 1.0)
        return s


class AttLayer(nn.Module):
    """Multi-head additive self-attention pooling over a sequence
    [B, L, D] -> [B, out_dim] (reference: layers.py:172-242 AttLayer:
    stacked hidden attention blocks with per-head softmax weights,
    concat heads, output projection)."""

    out_dim: int
    hidden_dim: Tuple[int, ...] = ()
    head_num: Tuple[int, ...] = (1,)
    activation: Callable = nn.elu

    @nn.compact
    def __call__(self, x: Array, mask: Array = None) -> Array:
        if x.ndim != 3:
            raise ValueError(f"AttLayer needs [B, L, D], got {x.shape}")
        if len(self.head_num) != len(self.hidden_dim) + 1:
            raise ValueError("head_num must have len(hidden_dim)+1 entries")

        def att_block(h, dim, heads, act, idx):
            outs = []
            for j in range(heads):
                score = nn.Dense(1, name=f"att_{idx}_{j}")(h)  # [B, L, 1]
                if mask is not None:
                    score = jnp.where(mask[..., None], score, -1e9)
                w = jax.nn.softmax(score, axis=1)
                pooled = jnp.sum(w * nn.Dense(dim,
                                              name=f"val_{idx}_{j}")(h),
                                 axis=1)
                outs.append(act(pooled))
            return jnp.concatenate(outs, axis=-1)

        h = x
        for i, (dim, heads) in enumerate(zip(self.hidden_dim,
                                             self.head_num[:-1])):
            # hidden attention blocks keep the sequence axis: attend, then
            # broadcast the context back as a residual signal
            ctx = att_block(h, dim, heads, self.activation, i)
            h = self.activation(
                nn.Dense(dim, name=f"mix_{i}")(h) +
                nn.Dense(dim, name=f"ctx_{i}")(ctx)[:, None, :])
        return att_block(h, self.out_dim, self.head_num[-1],
                         lambda v: v, len(self.hidden_dim))


class LSTMLayer(nn.Module):
    """Run an LSTM over [B, L, D]; returns (outputs [B, L, out_dim],
    final carry) (reference: layers.py:245-270)."""

    out_dim: int

    @nn.compact
    def __call__(self, x: Array):
        cell = nn.OptimizedLSTMCell(features=self.out_dim)
        B = x.shape[0]
        carry = cell.initialize_carry(jax.random.PRNGKey(0),
                                      (B, x.shape[-1]))
        scan = nn.scan(type(cell), variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=1, out_axes=1)(features=self.out_dim)
        carry, ys = scan(carry, x)
        return ys, carry
