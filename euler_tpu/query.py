"""Gremlin-style query builder compiled to one XLA program.

TPU-native counterpart of the reference's GQL stack
(reference: euler/parser/gremlin.l:15-53 + gremlin.y:27-44 verbs —
``v()``, ``e()``, ``sampleN``, ``sampleE``, ``sampleNB``, ``outV``,
``inV``, ``outE``, ``values``, ``label``, ``has/hasLabel/gt/ge/lt/le/eq/
ne/in_/not_in``, ``order_by/limit``, ``as``, ``udf_*`` — lexed/parsed into
a DAG, optimized, and run on the C++ ``Executor``).

Re-design: there is no string language, parser, DAG executor, or compiled-
DAG cache to build — a ``Query`` is a Python builder that records verbs
and ``run()`` traces them into a single jit-compiled function over the
device-resident ``GraphTensors``. XLA plays the role of the reference's
``Optimizer`` (fusion/CSE, optimizer.cc:91-229); sharded execution comes
from running the same plan under a mesh (euler_tpu.parallel), which
replaces the split/REMOTE/merge rewriting (optimizer.h:49-86).

Example (mirrors "v(nodes).sampleNB(et,10,-1).as(nb).values(f)"):

    q = (Query(graph)
         .v(ids)
         .sampleNB(("link",), 10).alias("nb")
         .values("feature").alias("f"))
    out = q.run(jax.random.key(0))
    out["nb"].ids, out["nb"].weights    # [B,10] neighbor block
    out["f"]                            # [B*10, dim] gathered features

Randomized verbs require a key; ``run`` jit-compiles by default.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from euler_tpu.graph.store import Graph, GraphTensors
from euler_tpu.ops import feature_ops, index as index_ops, sampling
from euler_tpu.ops.index import Pred

Array = jnp.ndarray


@dataclasses.dataclass
class NodeResult:
    """A padded node frontier: ids [...], weights, types, eids, mask."""
    ids: Array
    weights: Optional[Array] = None
    types: Optional[Array] = None
    eids: Optional[Array] = None
    mask: Optional[Array] = None


@dataclasses.dataclass
class EdgeResult:
    src: Array
    dst: Array
    types: Array
    eids: Array


jax.tree_util.register_dataclass(
    NodeResult, data_fields=["ids", "weights", "types", "eids", "mask"],
    meta_fields=[])
jax.tree_util.register_dataclass(
    EdgeResult, data_fields=["src", "dst", "types", "eids"], meta_fields=[])


def udf_mean(name: str):
    """values(udf_mean(f)) — row mean of a dense feature
    (reference: euler/core/kernels/mean_udf.cc:63)."""
    return ("udf_mean", name)


def udf_min(name: str):
    return ("udf_min", name)


def udf_max(name: str):
    return ("udf_max", name)


_UDFS = {
    "udf_mean": lambda x: jnp.mean(x, axis=-1, keepdims=True),
    "udf_min": lambda x: jnp.min(x, axis=-1, keepdims=True),
    "udf_max": lambda x: jnp.max(x, axis=-1, keepdims=True),
}


def register_udf(name: str, fn) -> None:
    """Register a user UDF under ``name`` for use in ``values``.

    ``fn(x, *params) -> array`` receives the gathered [B, dim] dense
    feature block of the frontier and must be jax-traceable (it runs
    inside the compiled query program, single-chip or under the mesh).
    Parameterized UDFs receive the extra args given to :func:`udf` —
    the registry + parameterized-UDF surface of the reference's UDF
    framework (euler/core/framework/udf.h:33,43 RegisterUdf /
    ValuesUdf::Compute with norm params).
    """
    if not callable(fn):
        raise TypeError("udf must be callable")
    _UDFS[name] = fn


def udf(name_or_fn, feature: str, *params):
    """``values`` wrapper for a registered or inline UDF.

    ``udf("my_norm", "feature", 2.0)`` looks up a :func:`register_udf`
    entry; ``udf(lambda x: x.sum(-1, keepdims=True), "feature")`` runs
    the callable directly. Extra ``params`` are passed through to the
    UDF after the feature block (udf.h parameterized UDFs).
    """
    if not (callable(name_or_fn) or name_or_fn in _UDFS):
        raise KeyError(f"unknown udf {name_or_fn!r}; register_udf first")
    return (name_or_fn, feature) + tuple(params)


class Query:
    """Chainable query plan over a device-resident graph.

    Verbs append steps; ``run(key)`` executes them as one jitted program.
    ``alias(name)`` (the reference's ``as``) records the current frontier /
    last value in the result dict.
    """

    def __init__(self, graph):
        self._g = graph.tensors if isinstance(graph, Graph) else graph
        self._steps: List[Tuple[str, Callable]] = []
        self._preds: List[List[Pred]] = []   # DNF under construction
        self._n_aliased = 0

    # -- internal -----------------------------------------------------------

    def _add(self, name: str, fn: Callable) -> "Query":
        self._steps.append((name, fn))
        return self

    def _take_dnf(self):
        dnf, self._preds = self._preds, []
        return dnf

    # -- roots --------------------------------------------------------------

    def v(self, ids) -> "Query":
        """Start from explicit node ids (gremlin ``v(nodes)``)."""
        ids = jnp.asarray(ids, jnp.int32)

        self._pending_sample = None

        def step(g, st, key):
            st["frontier"] = NodeResult(ids=ids, mask=ids >= 0)
        return self._add("v", step)

    def e(self, eids) -> "Query":
        """Start from explicit edge ids (CSR eid; gremlin ``e(edges)``)."""
        eids = jnp.asarray(eids, jnp.int32)
        self._pending_sample = None

        def step(g, st, key):
            ok = eids >= 0
            if getattr(g, "eid_slot", None) is not None:
                slot = g.eid_slot[jnp.maximum(eids, 0)]
            else:
                # adj_eid is a permutation of [0, E); invert per run only
                # for stores predating the load-time inverse
                inv = jnp.argsort(g.adj_eid)
                slot = inv[jnp.maximum(eids, 0)]
            st["frontier"] = EdgeResult(
                src=jnp.where(ok, g.adj_src[slot], -1),
                dst=jnp.where(ok, g.adj_dst[slot], -1),
                types=jnp.where(ok, g.adj_type[slot], -1),
                eids=eids)
        return self._add("e", step)

    def sampleN(self, node_type, count: int) -> "Query":
        """Weighted global node sampling, honoring any pending ``has``/
        comparison predicates (reference: API_SAMPLE_NODE incl. the
        index-backed conditional path, sample_node_op.cc:65-103)."""
        def step(g, st, key):
            d = step.dnf
            if d:
                ids = index_ops.sample_node_with_condition(
                    g, key, count, d, node_type)
            else:
                ids = sampling.sample_node(g, key, count, node_type)
            st["frontier"] = NodeResult(ids=ids, mask=ids >= 0)
        step.dnf = None
        self._add("sampleN", step)
        self._pending_sample = step
        return self

    def sampleE(self, edge_type=-1, count: int = 512) -> "Query":
        """Weighted global edge sampling, honoring pending edge-attribute
        predicates (reference: API_SAMPLE_EDGE + the edge side of the
        index subsystem)."""
        def step(g, st, key):
            d = step.dnf
            if d:
                src, dst, ty, eid = index_ops.sample_edge_with_condition(
                    g, key, count, d, edge_type)
            else:
                src, dst, ty, eid = sampling.sample_edge(g, key, count,
                                                         edge_type)
            st["frontier"] = EdgeResult(src=src, dst=dst, types=ty,
                                        eids=eid)
        step.dnf = None
        self._add("sampleE", step)
        self._pending_sample = step
        return self

    def filter(self) -> "Query":
        """Apply the pending predicates to the CURRENT frontier: edge
        frontiers filter through edge-attribute columns at their eids,
        node frontiers through node attributes at their ids — both
        O(frontier) gathers. run() auto-appends this when predicates
        trail a ``v()``/``e()`` frontier with no sample verb to bind to.
        """
        dnf = self._take_dnf()
        if getattr(self, "_pending_sample", None) is not None:
            self._pending_sample = None

        def step(g, st, key):
            f = st["frontier"]
            if isinstance(f, EdgeResult):
                m = index_ops.edge_dnf_mask(g, dnf, f.eids)
                st["frontier"] = EdgeResult(
                    src=jnp.where(m, f.src, -1),
                    dst=jnp.where(m, f.dst, -1),
                    types=jnp.where(m, f.types, -1),
                    eids=jnp.where(m, f.eids, -1))
            else:
                m = index_ops.dnf_mask_at(g, dnf, f.ids)
                st["frontier"] = dataclasses.replace(
                    f, ids=jnp.where(m, f.ids, -1),
                    mask=(f.mask & m) if f.mask is not None else m)
        return self._add("filter", step)

    # -- predicates (attach to the nearest following/preceding sampleN) -----

    def has(self, name: str, value) -> "Query":
        return self._pred(name, "eq", value)

    def hasLabel(self, *types) -> "Query":
        vals = types if len(types) > 1 else types[0]
        op = "in" if len(types) > 1 else "eq"
        return self._pred("node_type", op, vals)

    def eq(self, name, value):
        return self._pred(name, "eq", value)

    def ne(self, name, value):
        return self._pred(name, "ne", value)

    def gt(self, name, value):
        return self._pred(name, "gt", value)

    def ge(self, name, value):
        return self._pred(name, "ge", value)

    def lt(self, name, value):
        return self._pred(name, "lt", value)

    def le(self, name, value):
        return self._pred(name, "le", value)

    def in_(self, name, values):
        return self._pred(name, "in", tuple(values))

    def not_in(self, name, values):
        return self._pred(name, "not_in", tuple(values))

    def or_(self) -> "Query":
        """Close the current AND clause (DNF support,
        reference: common_index_result union)."""
        self._preds.append([])
        return self

    def _pred(self, name, op, value) -> "Query":
        if not self._preds:
            self._preds.append([])
        self._preds[-1].append(Pred(name, op, value))
        # bind to the most recent sampleN (gremlin allows trailing .has())
        if getattr(self, "_pending_sample", None) is not None:
            self._pending_sample.dnf = [list(c) for c in self._preds if c]
        return self

    # -- traversal ----------------------------------------------------------

    def sampleNB(self, edge_types, count: int, default_id: int = -1
                 ) -> "Query":
        """Weighted neighbor sampling; frontier becomes the [B, count]
        neighbor block (reference: API_SAMPLE_NB)."""
        def step(g, st, key):
            cur = _node_ids(st)
            nbr, w, ty, eid = sampling.sample_neighbor(
                g, key, cur.reshape(-1), edge_types, count, default_id)
            st["frontier"] = NodeResult(ids=nbr, weights=w, types=ty,
                                        eids=eid, mask=nbr >= 0)
        return self._add("sampleNB", step)

    def sampleLNB(self, edge_types, count: int, n_layer_nodes: int,
                  weight_func: str = "sqrt") -> "Query":
        """Layerwise (LADIES-style) sampling: one shared layer of
        ``n_layer_nodes`` drawn from the union of frontier neighborhoods
        (reference: sampleLNB gremlin.l:28 / local_sample_layer_op.cc)."""
        def step(g, st, key):
            cur = _node_ids(st).reshape(-1)
            layer, lw = sampling.sample_layer(g, key, cur, edge_types,
                                              count, n_layer_nodes,
                                              weight_func)
            st["frontier"] = NodeResult(ids=layer, weights=lw,
                                        mask=layer >= 0)
        return self._add("sampleLNB", step)

    def outV(self) -> "Query":
        """Edge frontier -> source nodes (gremlin outV)."""
        def step(g, st, key):
            f = st["frontier"]
            st["frontier"] = NodeResult(ids=f.src, mask=f.src >= 0)
        return self._add("outV", step)

    def inV(self) -> "Query":
        """Edge frontier -> destination nodes."""
        def step(g, st, key):
            f = st["frontier"]
            st["frontier"] = NodeResult(ids=f.dst, mask=f.dst >= 0)
        return self._add("inV", step)

    def outE(self, edge_types, cap: int = 64) -> "Query":
        """Node frontier -> its out-edges, padded to ``cap`` per node
        (reference: API_GET_NB_EDGE)."""
        def step(g, st, key):
            cur = _node_ids(st).reshape(-1)
            nbr, w, ty, eid, ok = sampling.get_full_neighbor(
                g, cur, edge_types, cap)
            B = cur.shape[0]
            src = jnp.where(ok, jnp.broadcast_to(cur[:, None], (B, cap)), -1)
            st["frontier"] = EdgeResult(src=src, dst=nbr, types=ty, eids=eid)
        return self._add("outE", step)

    # -- values -------------------------------------------------------------

    def values(self, *names) -> "Query":
        """Gather features of the current frontier. Accepts dense feature
        names, sparse feature names, and ``udf_*(name)`` wrappers; on an
        edge frontier, edge-feature names resolve through the frontier's
        edge ids (reference: API_GET_P on nodes AND edges + udf
        framework, get_feature_op.cc)."""
        def step(g, st, key):
            f = st["frontier"]
            eids = f.eids.reshape(-1) if isinstance(f, EdgeResult) else None
            cur = _node_ids(st).reshape(-1)
            outs = []
            for n in names:
                if isinstance(n, tuple):          # udf
                    fn = n[0] if callable(n[0]) else _UDFS[n[0]]
                    # per-query fetch cache: repeated UDFs over the same
                    # feature on the same frontier share one gather
                    # (reference: the per-query UdfCache, udf.h:43)
                    cache = st.setdefault("_udf_cache", {})
                    ck = (id(f), n[1])
                    if ck not in cache:
                        cache[ck], = feature_ops.get_dense_feature(
                            g, cur, (n[1],))
                    outs.append(fn(cache[ck], *n[2:]))
                elif n in g.dense_nf:
                    outs.append(
                        feature_ops.get_dense_feature(g, cur, (n,))[0])
                elif n in g.sparse_nf:
                    outs.append(
                        feature_ops.get_sparse_feature(g, cur, (n,))[0])
                elif eids is not None and n in g.dense_ef:
                    outs.append(feature_ops.get_edge_dense_feature(
                        g, eids, (n,))[0])
                elif eids is not None and n in g.sparse_ef:
                    outs.append(feature_ops.get_edge_sparse_feature(
                        g, eids, (n,))[0])
                else:
                    raise KeyError(f"unknown feature {n!r}")
            st["last_value"] = outs[0] if len(outs) == 1 else tuple(outs)
        return self._add("values", step)

    def label(self) -> "Query":
        """Node type ids of the frontier (gremlin ``label()``)."""
        def step(g, st, key):
            st["last_value"] = sampling.get_node_type(g, _node_ids(st))
        return self._add("label", step)

    # -- post-processing (reference: POST_PROCESS order_by/limit,
    #    euler/core/kernels/post_process_op.cc:41-84) ------------------------

    def order_by(self, field: str = "id", desc: bool = False) -> "Query":
        def step(g, st, key):
            f = st["frontier"]
            valid = f.mask if f.mask is not None else f.ids >= 0
            if field == "id":
                pad = jnp.iinfo(jnp.int32).min if desc \
                    else jnp.iinfo(jnp.int32).max
                kf = jnp.where(valid, f.ids, pad)
            else:
                kf = jnp.where(valid, f.weights,
                               -jnp.inf if desc else jnp.inf)
            order = jnp.argsort(-kf if desc else kf, axis=-1)
            take = lambda x: (None if x is None else
                              jnp.take_along_axis(x, order, axis=-1))
            st["frontier"] = NodeResult(
                ids=jnp.take_along_axis(f.ids, order, axis=-1),
                weights=take(f.weights), types=take(f.types),
                eids=take(f.eids), mask=take(f.mask))
        return self._add("order_by", step)

    def limit(self, k: int) -> "Query":
        def step(g, st, key):
            f = st["frontier"]
            cut = lambda x: None if x is None else x[..., :k]
            st["frontier"] = NodeResult(ids=cut(f.ids),
                                        weights=cut(f.weights),
                                        types=cut(f.types),
                                        eids=cut(f.eids), mask=cut(f.mask))
        return self._add("limit", step)

    # -- alias / run --------------------------------------------------------

    def alias(self, name: str) -> "Query":
        """Record the current result under ``name`` (gremlin ``as``)."""
        def step(g, st, key):
            v = st.pop("last_value", None)
            st["out"][name] = st["frontier"] if v is None else v
        self._n_aliased += 1
        return self._add("alias", step)

    # keep the reference's spelling available (``as`` is reserved in python)
    as_ = alias

    def run(self, key=None, jit: bool = True) -> Dict[str, Any]:
        """Execute the plan; returns {alias: result} plus ``_frontier``."""
        if self._preds and getattr(self, "_pending_sample", None) is None:
            # trailing predicates after a v()/e() frontier with no
            # sample verb to bind to: filter the frontier
            self.filter()
        if key is None:
            key = jax.random.PRNGKey(0)
        steps = list(self._steps)

        def plan(g, key):
            st: Dict[str, Any] = {"out": {}}
            for name, fn in steps:
                key, sub = jax.random.split(key)
                fn(g, st, sub)
            out = st["out"]
            if "last_value" in st:
                out["_value"] = st["last_value"]
            out["_frontier"] = st.get("frontier")
            return out

        if jit:
            return jax.jit(plan)(self._g, key)
        return plan(self._g, key)


def _node_ids(st) -> Array:
    f = st["frontier"]
    if isinstance(f, EdgeResult):
        return f.dst
    return f.ids
