"""Feature lookup ops.

TPU-native counterpart of the reference's feature query path
(reference: euler/core/kernels/get_feature_op.cc API_GET_P and the tf
wrappers tf_euler/python/euler_ops/feature_ops.py:57-188). The reference
returns idx/data segment pairs; here dense features are direct takes and
sparse features come back as fixed-width padded id blocks + masks (the
segment-offset layout maps onto padding at conversion time). Binary
(string) features are host-only — see ``Graph.get_binary_feature``.

Invalid/padded node ids (-1) yield zeros / empty rows.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

from euler_tpu.graph.store import GraphTensors
from euler_tpu.ops.dispatch import is_shard_view as _is_shard_view

Array = jnp.ndarray


def _take_rows(table: Array, ids: Array, fill=0):
    ids = jnp.asarray(ids, jnp.int32)
    flat = ids.reshape(-1)
    rows = jnp.take(table, jnp.maximum(flat, 0), axis=0)
    ok = (flat >= 0).reshape((-1,) + (1,) * (rows.ndim - 1))
    rows = jnp.where(ok, rows, fill)
    return rows.reshape(ids.shape + table.shape[1:])


def get_dense_feature(g: GraphTensors, nodes: Array,
                      names: Sequence[str]) -> List[Array]:
    """Dense (float) node features; [*, dim] per name.
    reference: tf_euler.get_dense_feature (feature_ops.py:126)."""
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.get_dense_feature_sharded(g, nodes, names)
    return [_take_rows(g.dense_nf[n], nodes, 0.0) for n in names]


def get_sparse_feature(g: GraphTensors, nodes: Array, names: Sequence[str]
                       ) -> List[Tuple[Array, Array]]:
    """Sparse (id-list) node features as (ids [*, L] padded -1, mask).
    reference: tf_euler.get_sparse_feature (feature_ops.py:57)."""
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.get_sparse_feature_sharded(g, nodes, names)
    out = []
    for n in names:
        vals, _ = g.sparse_nf[n]
        ids = _take_rows(vals, nodes, -1)
        out.append((ids, ids >= 0))
    return out


def get_edge_dense_feature(g: GraphTensors, eids: Array,
                           names: Sequence[str]) -> List[Array]:
    """reference: tf_euler.get_edge_dense_feature (feature_ops.py:170)."""
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.get_edge_feature_sharded(g, eids, names, "dense")
    return [_take_rows(g.dense_ef[n], eids, 0.0) for n in names]


def get_edge_sparse_feature(g: GraphTensors, eids: Array,
                            names: Sequence[str]):
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.get_edge_feature_sharded(g, eids, names, "sparse")
    out = []
    for n in names:
        vals, _ = g.sparse_ef[n]
        ids = _take_rows(vals, eids, -1)
        out.append((ids, ids >= 0))
    return out


def get_edge_type(g: GraphTensors, eids: Array) -> Array:
    """Edge type of each (global) edge row; -1 for invalid eids.

    The relation lookup of RGCN-style models. NB the CSR's ``adj_type`` is
    slot-ordered — indexing it with the original edge rows the sampling
    verbs return would permute relations; ``eid_type`` is the
    original-row-ordered table (reference: edges carry their type in the
    edge record, euler/core/graph/edge.h).
    """
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.get_edge_type_sharded(g, eids)
    eids = jnp.asarray(eids, jnp.int32)
    return jnp.where(eids >= 0, g.eid_type[jnp.maximum(eids, 0)], -1)
