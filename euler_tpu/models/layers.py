"""Building-block layers: embeddings (plain/sparse/hash), attention, LSTM.

TPU-native counterparts of the reference's layer kit
(reference: tf_euler/python/utils/layers.py:119-270 — Embedding,
SparseEmbedding (embedding_lookup_sparse, sum/mean combiner),
HashEmbedding (mod-hash into buckets), AttLayer (multi-head additive
attention over a sequence), LSTMLayer). The reference's PS partitioning
of big tables (``tf.get_variable(partitioner=...)``) maps to
``ShardedEmbedding`` below: the table lives as per-shard blocks under a
PartitionSpec('graph') with owner-routed collective lookups.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct
from flax.core import meta

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


@struct.dataclass
class ManualPartitioned(meta.Partitioned):
    """nn.Partitioned whose unbox skips the sharding constraint.

    Inside shard_map the mesh axes are Manual, where flax's
    ``Partitioned.unbox`` (which emits with_sharding_constraint) is
    rejected by XLA — but the value IS already the local block, so no
    constraint is needed. Keeps the metadata (names) that
    nn.get_partition_spec / parallel.train.param_specs read."""

    def unbox(self, apply_constraint=True):
        return super().unbox(apply_constraint=False)


def with_manual_partitioning(fn, names):
    """nn.with_partitioning for params created INSIDE shard_map."""
    def wrapper(*args, **kw):
        return ManualPartitioned(fn(*args, **kw), names=names, mesh=None)
    return wrapper


class ShardedEmbedding(nn.Module):
    """Embedding table partitioned over the mesh's graph axis.

    TPU-native counterpart of the reference's parameter-server-sharded
    embeddings (reference: tf_euler/python/utils/layers.py Embedding —
    ``tf.get_variable`` with a partitioner, rows scattered over PS
    tasks) — the piece that makes DeepWalk/LINE/TransX feasible at
    ogbn-papers100M scale, where one replica cannot hold [1e8, d].

    Called with a ShardView (inside shard_map) the param is the LOCAL
    block [ceil(num/S), d] boxed with ``nn.with_partitioning(('graph',
    None))``; row r lives on shard ``r % S`` at local row ``r // S``
    (the graph-node ownership convention) and lookups are the same
    owner-routed all_gather -> local gather -> all_to_all exchange the
    feature verbs use — fully differentiable, so the backward pass
    scatter-adds each shard's gradient rows locally. Called with plain
    GraphTensors it holds the full table (single-chip path).

    NB: single-chip and mesh checkpoints have different table layouts.
    """

    num: int
    dim: int

    @nn.compact
    def __call__(self, g, ids: Array) -> Array:
        from euler_tpu.ops.dispatch import is_shard_view
        ids = jnp.asarray(ids, jnp.int32)
        shape_in = ids.shape
        base_init = nn.initializers.variance_scaling(
            1.0, "fan_in", "normal", out_axis=0)   # nn.Embed's default
        if not is_shard_view(g):
            table = self.param("embedding", base_init,
                               (self.num, self.dim))
            ok = ids >= 0
            flat = jnp.maximum(ids, 0).reshape(-1)
            out = table[flat].reshape(shape_in + (self.dim,))
            return jnp.where(ok[..., None], out, 0.0)

        S, axis = g.num_shards, g.axis
        n_local = -(-self.num // S)

        def shard_init(key, shape, dtype=jnp.float32):
            # distinct rows per shard (one shared key would replicate
            # the local block across shards)
            return base_init(
                jax.random.fold_in(key, jax.lax.axis_index(axis)),
                shape, dtype)

        table = self.param(
            "embedding",
            with_manual_partitioning(shard_init, ("graph", None)),
            (n_local, self.dim))
        flat = ids.reshape(-1)
        b = flat.shape[0]
        from euler_tpu.parallel import comms
        alln = comms.all_gather(flat, axis, axis=0).reshape(-1)
        owned = (alln >= 0) & (alln % S == jax.lax.axis_index(axis))
        rows = jnp.clip(jnp.where(owned, alln, 0) // S, 0, n_local - 1)
        v = jnp.where(owned[:, None], table[rows], 0.0)
        ex = comms.all_to_all(v, axis, split_axis=0, concat_axis=0,
                                tiled=True)
        out = ex.reshape(S, b, self.dim).sum(axis=0)
        out = jnp.where((flat >= 0)[:, None], out, 0.0)
        return out.reshape(shape_in + (self.dim,))


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
