"""Feature encoders: node ids + graph features -> input vectors.

TPU-native counterpart of the reference's ShallowEncoder / feature
combiners (reference: tf_euler/python/utils/encoders.py:32-120 — id
embedding + dense + sparse-embedding combiner; utils/layers.py Embedding /
SparseEmbedding / HashEmbedding with mod-hash). PS-sharded embedding
partitioning becomes a jax.sharding PartitionSpec on the embed table when
run under a mesh (parallel/), invisible at this level.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from euler_tpu.graph.store import GraphTensors
from euler_tpu.ops import feature_ops

Array = jnp.ndarray


class ShallowEncoder(nn.Module):
    """Concat of [id-embedding?, dense features?, sparse-id embeddings?].

    sparse ids are mod-hashed into ``sparse_buckets`` at conversion time or
    here (reference: HashEmbedding, utils/layers.py).
    """

    dense_names: Tuple[str, ...] = ()
    sparse_names: Tuple[str, ...] = ()
    sparse_buckets: int = 0
    sparse_dim: int = 16
    sparse_combiner: str = "sum"   # 'sum' | 'mean'
    use_id: bool = False
    max_id: int = 0
    id_dim: int = 16

    @nn.compact
    def __call__(self, g: GraphTensors, n_id: Array) -> Array:
        parts = []
        ok = (n_id >= 0)
        if self.use_id:
            table = nn.Embed(self.max_id + 2, self.id_dim,
                             name="id_embedding")
            ids = jnp.where(ok, n_id, self.max_id + 1)
            parts.append(table(ids))
        if self.dense_names:
            for d in feature_ops.get_dense_feature(g, n_id,
                                                   list(self.dense_names)):
                parts.append(d)
        for name in self.sparse_names:
            (ids, mask), = feature_ops.get_sparse_feature(g, n_id, [name])
            buckets = self.sparse_buckets or int(
                g.sparse_nf[name][0].shape[0])
            hashed = jnp.where(mask, ids % buckets, 0)
            emb = nn.Embed(buckets, self.sparse_dim,
                           name=f"sparse_{name}")(hashed)
            m = mask[..., None].astype(emb.dtype)
            s = jnp.sum(emb * m, axis=-2)
            if self.sparse_combiner == "mean":
                s = s / jnp.maximum(jnp.sum(m, axis=-2), 1.0)
            parts.append(s)
        if not parts:
            raise ValueError("ShallowEncoder configured with no inputs")
        out = jnp.concatenate(parts, axis=-1)
        return jnp.where(ok[..., None], out, 0.0)
