"""Utility ops: inflate_idx, sparse_gather.

TPU-native counterparts of the reference's util ops
(reference: tf_euler/ops/util_ops.cc:22-59 InflateIdx/SparseGather,
kernels tf_euler/kernels/inflate_idx_op.cc, sparse_gather_op.cc; python
surface tf_euler/python/euler_ops/util_ops.py). Used by dataflows to
re-inflate results after unique-before-fetch dedup (the reference
optimizer's "unique+gather" rewrite, euler/parser/optimizer.cc:91-229).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def inflate_idx(idx: Array) -> Array:
    """Given ``idx`` (each position's index into a unique-value array),
    return each position's slot in the *inflated* layout where unique
    value ``v`` occupies ``count[v]`` consecutive slots in value order.

    reference: InflateIdx (util_ops.cc:22-35): after
    ``unique_with_counts`` and a per-unique-row fetch repeated by count,
    this maps original positions to distinct inflated rows.
    """
    idx = jnp.asarray(idx, jnp.int32)
    n = idx.shape[0]
    u = jnp.max(idx, initial=-1) + 1
    counts = jnp.zeros((n,), jnp.int32).at[idx].add(1)  # padded to n slots
    start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                             jnp.cumsum(counts)[:-1]])
    # occurrence number of each position within its value, in input order:
    # stable sort by idx groups positions; rank within group = position
    # in the sorted order minus the group's first sorted position.
    order = jnp.argsort(idx, stable=True)
    rank_sorted = jnp.arange(n, dtype=jnp.int32) - start[idx[order]]
    occ = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)
    return start[idx] + occ


def sparse_gather(gather_idx: Array, ids: Array, mask: Array
                  ) -> Tuple[Array, Array]:
    """Row-gather on a padded sparse block (ids [N, L], mask [N, L]).

    reference: SparseGather (util_ops.cc:37-59) gathers rows of a
    SparseTensor; the TPU layout for ragged sparse values is padded
    blocks, so a row gather is a take (invalid gather rows -> empty).
    """
    gi = jnp.asarray(gather_idx, jnp.int32)
    rows = jnp.take(ids, jnp.maximum(gi, 0), axis=0)
    m = jnp.take(mask, jnp.maximum(gi, 0), axis=0) & (gi >= 0)[:, None]
    return jnp.where(m, rows, -1), m
