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


def unique_gather(fetch_fn, ids: Array) -> Array:
    """Unique-before-gather combinator: run ``fetch_fn`` (ids -> [S, ...]
    rows, -1 ids -> zero rows) with duplicate ids replaced by -1, then
    restore every original position's row with one compact self-gather.

    TPU-native form of the reference optimizer's unique+gather rewrite
    (euler/parser/optimizer.cc:91-229 + id_unique_op.cc /
    inflate_idx_op.cc). The reference wins because its fetch is a
    network RPC priced per row; on this hardware the rewrite is a
    MEASURED NEGATIVE for the hop-2 feature path (tools/micro/
    micro_dedup_gather.py, frag_gather.py on v5e): XLA's HBM gather
    engine runs ~10-12 ns/row regardless of duplication or index
    locality, the re-inflate self-gather costs as much as the rows
    saved (~87% of draws are unique at bench shapes), and the argsort
    adds on top. Kept flag-gated (GNNNet.dedup_features) for frontiers
    with extreme duplication (deep power-law graphs), where the unique
    count collapses far enough to flip the balance.
    """
    ids = jnp.asarray(ids, jnp.int32)
    S = ids.shape[0]
    order = jnp.argsort(ids)
    sid = ids[order]
    is_new = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    rows = fetch_fn(jnp.where(is_new, sid, -1))    # dup slots fetch pad
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    pos = jnp.arange(S, dtype=jnp.int32)
    head = jnp.full((S,), S - 1, jnp.int32).at[seg].min(pos)
    inv = jnp.zeros((S,), jnp.int32).at[order].set(pos)
    return rows[head[seg][inv]]


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
