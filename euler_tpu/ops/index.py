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
from flax import struct

from euler_tpu.graph.store import GraphTensors, string_hash32
from euler_tpu.ops.dispatch import is_shard_view as _is_shard_view

Array = jnp.ndarray

_OPS = ("eq", "ne", "gt", "ge", "lt", "le", "in", "not_in")


@struct.dataclass
class AttrIndex:
    """Prebuilt sorted index over one attribute column.

    The device-resident analogue of the reference's load-time
    Hash/RangeSampleIndex (euler/core/index/hash_sample_index.h:41-68,
    range_sample_index.h): ids sorted by value + weight prefix sums, so
    a conditional weighted draw is two binary searches on the value
    array (range bounds) + one per draw on the weight prefix —
    O(count log N), independent of both N-scans and result size,
    instead of the O(N) mask+cdf fallback below.
    """
    order: Array   # int32 [M] population ids sorted by value
    vals: Array    # [M] values, ascending
    wcum: Array    # f32 [M+1] prefix sums of weights in sorted order


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


def index_key(name: str, idx: int = 0) -> str:
    return f"{name}:{idx}"


def build_attr_index(graph, names, target: str = "node"):
    """Host-side index build for the named attributes; returns updated
    GraphTensors with ``node_index`` / ``edge_index_`` populated.

    ``names``: iterable of attribute names or ``(name, idx)`` pairs.
    Node attrs: dense feature columns, 'weight', 'node_type', binary
    (hash) features. Edge attrs: dense edge-feature columns, 'weight',
    'edge_type' (eid-ordered columns). The reference declares indexed
    attributes at convert time (index_meta -> IndexManager,
    index_manager.h:34); here any attribute can be indexed post-load.
    """
    import numpy as np
    g = graph.tensors if hasattr(graph, "tensors") else graph
    out = dict(getattr(g, "node_index" if target == "node"
                       else "edge_index_", {}))
    for spec in names:
        name, idx = spec if isinstance(spec, tuple) else (spec, 0)
        if target == "node":
            col, _ = _column(g, Pred(name, "eq", 0, idx))
            w = np.asarray(g.node_w, np.float64)
        else:
            col = _edge_column(g, Pred(name, "eq", 0, idx))
            # eid-ordered weights to match the eid-ordered columns
            w = np.asarray(g.adj_w, np.float64)[np.asarray(g.eid_slot)]
        col = np.asarray(col)
        order = np.argsort(col, kind="stable").astype(np.int32)
        wcum = np.concatenate([[0.0], np.cumsum(w[order])])
        out[index_key(name, idx)] = AttrIndex(
            order=jnp.asarray(order),
            vals=jnp.asarray(col[order]),
            wcum=jnp.asarray(wcum, jnp.float32))
    field = "node_index" if target == "node" else "edge_index_"
    t = g.replace(**{field: out})
    if hasattr(graph, "tensors"):
        graph.tensors = t
    return t


def _norm_vals(g: GraphTensors, p: Pred, target: str):
    """Comparison values mapped into the indexed column's space
    (type names -> ids, binary strings -> hashes)."""
    vals = tuple(p.value) if isinstance(p.value, (tuple, list)) \
        else (p.value,)
    if target == "node" and p.name == "node_type":
        return tuple(g.meta.node_type_id(v) if isinstance(v, str) else v
                     for v in vals)
    if target == "edge" and p.name == "edge_type":
        return tuple(g.meta.edge_type_id(v) if isinstance(v, str) else v
                     for v in vals)
    if target == "node" and p.name in getattr(g, "binary_hash_nf", {}):
        return tuple(string_hash32(str(v)) for v in vals)
    return vals


def _index_ranges(ai: AttrIndex, p: Pred, vals):
    """Static-count [(lo, hi)] sorted-position ranges matching ``p``."""
    M = ai.vals.shape[0]
    v = jnp.asarray(vals, ai.vals.dtype)
    left = jnp.searchsorted(ai.vals, v, side="left").astype(jnp.int32)
    right = jnp.searchsorted(ai.vals, v, side="right").astype(jnp.int32)
    if p.op == "eq":
        return [(left[0], right[0])]
    if p.op == "in":
        return [(left[i], right[i]) for i in range(len(vals))]
    if p.op == "ge":
        return [(left[0], M)]
    if p.op == "gt":
        return [(right[0], M)]
    if p.op == "le":
        return [(0, right[0])]
    if p.op == "lt":
        return [(0, left[0])]
    if p.op == "ne":
        return [(0, left[0]), (right[0], M)]
    if p.op == "not_in":
        vs = jnp.sort(v)
        l2 = jnp.searchsorted(ai.vals, vs, side="left").astype(jnp.int32)
        r2 = jnp.searchsorted(ai.vals, vs, side="right").astype(jnp.int32)
        bounds = [jnp.int32(0)]
        rngs = []
        for i in range(len(vals)):
            rngs.append((bounds[-1], l2[i]))
            bounds.append(r2[i])
        rngs.append((bounds[-1], jnp.int32(M)))
        return rngs
    raise AssertionError(p.op)


def indexed_sample(g: GraphTensors, key, count: int, p: Pred,
                   target: str = "node"):
    """Conditional weighted sampling through a prebuilt AttrIndex:
    O(count log N) draws, no full-column scan (reference:
    sample_node_op.cc:65-103 served by Hash/RangeSampleIndex). Returns
    ids ([count], -1 when the matching set has zero weight)."""
    tab = g.node_index if target == "node" else g.edge_index_
    ai = tab[index_key(p.name, p.idx)]
    rngs = _index_ranges(ai, p, _norm_vals(g, p, target))
    lo = jnp.stack([r[0] for r in rngs])
    hi = jnp.stack([jnp.maximum(r[1], r[0]) for r in rngs])
    mass = ai.wcum[hi] - ai.wcum[lo]                  # [R]
    cdf = jnp.cumsum(mass)
    total = cdf[-1]
    kr, kd = jax.random.split(key)
    rr = jax.random.uniform(kr, (count,)) * total
    ridx = jnp.minimum(jnp.searchsorted(cdf, rr, side="right"),
                       len(rngs) - 1)
    rlo, rhi = lo[ridx], hi[ridx]
    u = jax.random.uniform(kd, (count,))
    tgt = ai.wcum[rlo] + u * (ai.wcum[rhi] - ai.wcum[rlo])
    pos = jnp.searchsorted(ai.wcum, tgt, side="right").astype(jnp.int32) \
        - 1
    pos = jnp.clip(pos, rlo, jnp.maximum(rhi - 1, rlo))
    return jnp.where(total > 0, ai.order[pos], -1)


def _edge_column(g: GraphTensors, p: Pred):
    """Edge attribute column [E] in ORIGINAL-edge (eid) order."""
    if p.name == "edge_type":
        return g.eid_type
    if p.name == "weight":
        return g.adj_w[g.eid_slot]
    if p.name in g.dense_ef:
        return g.dense_ef[p.name][:, p.idx]
    raise KeyError(f"no indexable edge attribute {p.name!r}")


def _cmp(col, v, op):
    if op == "eq":
        return col == v[0]
    if op == "ne":
        return col != v[0]
    if op == "gt":
        return col > v[0]
    if op == "ge":
        return col >= v[0]
    if op == "lt":
        return col < v[0]
    if op == "le":
        return col <= v[0]
    if op == "in":
        return jnp.isin(col, v)
    if op == "not_in":
        return ~jnp.isin(col, v)
    raise AssertionError(op)


def edge_pred_mask(g: GraphTensors, p: Pred, eids: Array) -> Array:
    """Predicate over the edges named by ``eids`` — O(result) column
    gathers (reference: the edge side of IndexManager; edges carry
    attributes in edge.h and are index-queryable like nodes)."""
    vals = p.value if isinstance(p.value, (tuple, list)) else (p.value,)
    if p.name == "edge_type" and isinstance(vals[0], str):
        vals = tuple(g.meta.edge_type_id(v) for v in vals)
    col = _edge_column(g, p)
    rows = col[jnp.maximum(eids, 0)]
    v = jnp.asarray(vals, rows.dtype)
    return _cmp(rows, v, p.op) & (eids >= 0)


def edge_dnf_mask(g: GraphTensors, dnf, eids: Array) -> Array:
    out = jnp.zeros(eids.shape, bool)
    for clause in dnf:
        m = eids >= 0
        for p in clause:
            m = m & edge_pred_mask(g, p, eids)
        out = out | m
    return out


def dnf_mask_at(g: GraphTensors, dnf, ids: Array) -> Array:
    """DNF mask evaluated only at ``ids`` — O(result) gathers of the
    attribute columns instead of full-N masks."""
    out = jnp.zeros(ids.shape, bool)
    safe = jnp.maximum(ids, 0)
    for clause in dnf:
        m = ids >= 0
        for p in clause:
            col, v = _column(g, p)
            m = m & _cmp(col[safe], v, p.op)
        out = out | m
    return out


def sample_edge_with_condition(g: GraphTensors, key, count: int, dnf,
                               edge_type=-1):
    """Weighted edge sampling restricted to the DNF-matching edge set;
    returns (src, dst, type, eid) like sample_edge. Uses a prebuilt
    edge AttrIndex for single-predicate conditions, else the O(E) mask
    path."""
    if isinstance(edge_type, str):
        edge_type = g.meta.edge_type_id(edge_type)
    single = (len(dnf) == 1 and len(dnf[0]) == 1 and edge_type == -1)
    if single and getattr(g, "edge_index_", None) and \
            index_key(dnf[0][0].name, dnf[0][0].idx) in g.edge_index_:
        eids = indexed_sample(g, key, count, dnf[0][0], target="edge")
    else:
        w = g.adj_w[g.eid_slot]                      # eid-ordered
        mask = jnp.zeros((w.shape[0],), bool)
        E = w.shape[0]
        all_eids = jnp.arange(E, dtype=jnp.int32)
        mask = edge_dnf_mask(g, dnf, all_eids)
        if edge_type != -1:
            mask = mask & (g.eid_type == edge_type)
        eids = masked_weighted_sample(key, w * mask, count)
    ok = eids >= 0
    slot = g.eid_slot[jnp.maximum(eids, 0)]
    return (jnp.where(ok, g.adj_src[slot], -1),
            jnp.where(ok, g.adj_dst[slot], -1),
            jnp.where(ok, g.adj_type[slot], -1),
            eids)


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
    # prebuilt-index fast path: single predicate on an indexed
    # attribute -> O(count log N) draws, no full-N column scan
    if len(dnf) == 1 and len(dnf[0]) == 1 and node_type == -1 and \
            getattr(g, "node_index", None) and \
            index_key(dnf[0][0].name, dnf[0][0].idx) in g.node_index:
        return indexed_sample(g, key, count, dnf[0][0], target="node")
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
