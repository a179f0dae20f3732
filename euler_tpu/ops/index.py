"""Attribute index: predicate masks + conditional sampling.

TPU-native counterpart of the reference's index subsystem
(reference: euler/core/index/ — IndexManager index_manager.h:34,
HashSampleIndex hash_sample_index.h:41-68 (eq/in), RangeSampleIndex
(lt/le/gt/ge), DNF AND/OR composition in common_index_result.cc, consumed
by conditional sampling sample_node_op.cc:65-103 for GQL
``sampleN(t).has(price gt 3)``).

Re-design: inverted id lists are a CPU-pointer optimization; on TPU a
predicate is a vectorized compare over an attribute column producing a
[N] mask, DNF composition is elementwise and/or, and *conditional weighted
sampling* is one masked-CDF searchsorted — everything stays on device and
inside jit (SURVEY.md §2.1 "Attribute index" TPU equivalent).

Predicates:
  Pred(name, op, value, idx=0)
    name: dense feature name, 'node_type', 'weight', or a binary feature
    op:   'eq','ne','gt','ge','lt','le','in','not_in'
    value: scalar (or list for in/not_in); strings for binary features
DNF:  [[p1, p2], [p3]]  ==  (p1 AND p2) OR p3  — the reference's DNF form.
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Union

import jax
import jax.numpy as jnp

from euler_tpu.graph.store import GraphTensors, string_hash32
from euler_tpu.ops.dispatch import is_shard_view as _is_shard_view

Array = jnp.ndarray

_OPS = ("eq", "ne", "gt", "ge", "lt", "le", "in", "not_in")


@dataclasses.dataclass(frozen=True)
class Pred:
    name: str
    op: str
    value: Union[float, int, str, tuple]
    idx: int = 0  # column within a multi-dim dense feature

    def __post_init__(self):
        if self.op not in _OPS:
            raise ValueError(f"unknown op {self.op!r}")


def _column(g: GraphTensors, p: Pred):
    """Attribute column [N] + the comparison value(s) in matching space."""
    vals = p.value if isinstance(p.value, (tuple, list)) else (p.value,)
    if p.name == "node_type":
        ids = tuple(g.meta.node_type_id(v) for v in vals)
        return g.node_type, jnp.asarray(ids)
    if p.name == "weight":
        return g.node_w, jnp.asarray(vals, jnp.float32)
    if p.name in g.dense_nf:
        return g.dense_nf[p.name][:, p.idx], jnp.asarray(vals, jnp.float32)
    if p.name in g.binary_hash_nf:
        hashed = tuple(string_hash32(str(v)) for v in vals)
        return g.binary_hash_nf[p.name], jnp.asarray(hashed, jnp.int32)
    raise KeyError(f"no indexable attribute {p.name!r}")


def pred_mask(g: GraphTensors, p: Pred) -> Array:
    col, v = _column(g, p)
    if p.op == "eq":
        return col == v[0]
    if p.op == "ne":
        return col != v[0]
    if p.op == "gt":
        return col > v[0]
    if p.op == "ge":
        return col >= v[0]
    if p.op == "lt":
        return col < v[0]
    if p.op == "le":
        return col <= v[0]
    if p.op == "in":
        return jnp.isin(col, v)
    if p.op == "not_in":
        return ~jnp.isin(col, v)
    raise AssertionError


def dnf_mask(g: GraphTensors, dnf: Sequence[Sequence[Pred]]) -> Array:
    """OR of AND-clauses -> bool [N] (common_index_result union/intersect)."""
    out = jnp.zeros((g.n_nodes,), bool)
    for clause in dnf:
        m = jnp.ones((g.n_nodes,), bool)
        for p in clause:
            m = m & pred_mask(g, p)
        out = out | m
    return out


def masked_weighted_sample(key, weights: Array, count: int) -> Array:
    """``count`` draws (with replacement) proportional to ``weights``;
    -1 when total weight is 0. One cumsum + searchsorted."""
    cdf = jnp.cumsum(weights)
    total = cdf[-1]
    u = jax.random.uniform(key, (count,)) * total
    idx = jnp.searchsorted(cdf, u, side="right").astype(jnp.int32)
    idx = jnp.minimum(idx, weights.shape[0] - 1)
    return jnp.where(total > 0, idx, -1)


def sample_node_with_condition(g: GraphTensors, key, count: int,
                               dnf: Sequence[Sequence[Pred]],
                               node_type=-1) -> Array:
    """Weighted node sampling restricted to the DNF-matching set
    (reference: sample_node_op.cc:65-103 index-backed conditional
    sampling)."""
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.sample_node_with_condition_sharded(
            g, key, count, dnf, node_type)
    mask = dnf_mask(g, dnf)
    if node_type != -1:
        if isinstance(node_type, str):
            node_type = g.meta.node_type_id(node_type)
        mask = mask & (g.node_type == node_type)
    return masked_weighted_sample(key, g.node_w * mask, count)


def query_index_ids(g: GraphTensors, dnf, cap: int):
    """Matching node ids, padded to ``cap`` with -1 (the reference's
    QueryIndex kernel, core/kernels/common.cc:79, returns the id set)."""
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.query_index_ids_sharded(g, dnf, cap)
    mask = dnf_mask(g, dnf)
    order = jnp.argsort(~mask)  # matches first, stable
    ids = jnp.where(mask[order], order, -1)[:cap].astype(jnp.int32)
    return ids, ids >= 0
