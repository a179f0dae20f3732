"""Dataflow samplers: sampling strategy -> sequence of bipartite Blocks.

TPU-native counterparts of the reference's 7 dataflow classes
(reference: tf_euler/python/dataflow/ — sage_dataflow.py:24-50,
gcn_dataflow.py, whole_dataflow.py:26-63, fast_dataflow.py,
layerwise_dataflow.py, relation_dataflow.py, neighbor_dataflow.py:26-76).

Each flow is a callable ``flow(g, key, roots) -> [Block, ...]`` returning
blocks deepest-first (ready for BaseGNNNet-style consumption); everything
is jit-traceable with shapes fixed by (batch, fanouts/caps).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from euler_tpu.dataflow.block import Block, fanout_block, full_graph_block
from euler_tpu.ops import sampling
from euler_tpu.ops.mp_ops import scatter_add

Array = jnp.ndarray


class SageDataFlow:
    """Per-hop weighted neighbor sampling (GraphSAGE).

    reference: SageDataFlow (tf_euler/python/dataflow/sage_dataflow.py:24-50,
    sample_neighbor per hop).

    ``payload=False`` (default) samples over the packed fan rows
    (sampling.sample_neighbor_fast — one row gather per frontier node):
    blocks carry edge_weight = the 0/1 validity mask and e_id = -1.
    ``payload=True`` uses the full verb so blocks carry true edge
    weights/ids (needed by edge features). ``typed=True`` keeps the fast
    path but also carries each draw's edge TYPE (free — the multi-type
    fan draw knows its serving group), which is all RGCN's
    relation_from_etype needs: measured 2.3x faster than payload
    sampling for the rgcn bench family.
    """

    def __init__(self, fanouts: Sequence[int], metapath,
                 add_self_loops: bool = True, default_id: int = -1,
                 payload: bool = False, typed: bool = False, **_):
        self.fanouts = list(fanouts)
        self.metapath = list(metapath)
        self.add_self_loops = add_self_loops
        self.default_id = default_id
        self.payload = payload
        self.typed = typed

    def __call__(self, g, key, roots: Array):
        roots = jnp.asarray(roots, jnp.int32).reshape(-1)
        blocks = []
        cur = roots
        for ets, cnt in zip(self.metapath, self.fanouts):
            key, sub = jax.random.split(key)
            if self.payload:
                nbr, w, ty, eid = sampling.sample_neighbor(
                    g, sub, cur, ets, cnt, self.default_id)
            elif self.typed:
                nbr, valid, ty = sampling.sample_neighbor_fast(
                    g, sub, cur, ets, cnt, self.default_id,
                    return_types=True)
                w = valid.astype(jnp.float32)
                eid = jnp.full(nbr.shape, -1, jnp.int32)
            else:
                nbr, valid = sampling.sample_neighbor_fast(
                    g, sub, cur, ets, cnt, self.default_id)
                w = valid.astype(jnp.float32)
                eid = jnp.full(nbr.shape, -1, jnp.int32)
                ty = None
            blk = fanout_block(cur, nbr, w, eid, cnt, self.add_self_loops,
                               etypes=ty)
            blocks.append(blk)
            cur = blk.n_id
        return list(reversed(blocks))


class GCNDataFlow:
    """Full (capped) neighborhoods per hop.

    reference: GCNDataFlow (tf_euler/python/dataflow/gcn_dataflow.py, uses
    get_full_neighbor). ``caps`` bounds per-hop degree; real degree beyond
    the cap is truncated."""

    def __init__(self, caps: Sequence[int], metapath,
                 add_self_loops: bool = True, default_id: int = -1, **_):
        self.caps = list(caps)
        self.metapath = list(metapath)
        self.add_self_loops = add_self_loops
        self.default_id = default_id

    def __call__(self, g, key, roots: Array):
        roots = jnp.asarray(roots, jnp.int32).reshape(-1)
        blocks = []
        cur = roots
        for ets, cap in zip(self.metapath, self.caps):
            nbr, w, ty, eid, ok = sampling.get_full_neighbor(
                g, cur, ets, cap, self.default_id)
            nbr = jnp.where(ok, nbr, -1)
            blk = fanout_block(cur, nbr, w, eid, cap, self.add_self_loops,
                               etypes=ty)
            blocks.append(blk)
            cur = blk.n_id
        return list(reversed(blocks))


class WholeDataFlow:
    """Whole-graph propagation (small graphs / full-batch GCN).

    reference: WholeDataFlow (whole_dataflow.py:26-63). One shared block
    repeated per layer; n_id covers every node so ``roots`` only matter to
    the caller's final gather.

    ``cap``: ELL fast path. With a degree cap set (>= the graph's max
    degree for exact equivalence), the block lays every node's
    neighborhood out as a REGULAR [N, cap] fanout block instead of the
    [E]-edge-list block, so per-layer aggregation compiles to
    gather+reshape+reduce instead of XLA's serialized segment-scatter —
    measured 26.6ms vs 9.9ms-class ops for a 2.5M-edge layer on v5e
    (tools/micro/micro_spmm.py; the scatter is 2-5x the cost of the
    reads it moves). GNNNet re-gathers each layer's [N, D] output
    through ``n_id`` (targets are all nodes, so the per-layer source
    set is one VMEM-friendly row gather)."""

    def __init__(self, num_layers: int, metapath,
                 add_self_loops: bool = True, cap: int = None,
                 layout: str = "auto", **_):
        self.num_layers = num_layers
        self.metapath = list(metapath)
        self.add_self_loops = add_self_loops
        self.cap = cap
        if layout not in ("auto", "ell", "edge_list"):
            raise ValueError(layout)
        self.layout = layout

    def _src_deg(self, blk, deg_in):
        if self.add_self_loops:
            deg_in = deg_in + 1.0
        return jnp.where(blk.n_id >= 0,
                         deg_in[jnp.maximum(blk.n_id, 0)], 0.0)

    def __call__(self, g, key, roots: Array):
        from euler_tpu.ops.sampling import _as_etypes
        from euler_tpu.ops.dispatch import is_shard_view
        if is_shard_view(g):
            # distributed whole-graph propagation: each shard's block
            # carries its LOCAL edges over the GLOBAL node space and
            # segment reductions complete with psum/pmax over the graph
            # axis (Block.psum_axis)
            blk = full_graph_block_sharded(g, self.metapath[0],
                                           self.add_self_loops)
            return [blk] * self.num_layers
        have_pack = getattr(g, "ell_nbr", None) is not None
        use_ell = self.layout == "ell" or (
            self.layout == "auto" and (have_pack or self.cap is not None))
        if use_ell and have_pack:
            # build-time ELL pack: zero per-step assembly beyond type
            # masking; blocks aggregate by reshape+reduce and layer
            # outputs expand back scatter-free through ell_tpos
            N = g.meta.n_nodes
            ets = _as_etypes(g, self.metapath[0])
            et_arr = jnp.asarray(ets, jnp.int32)
            all_nodes = jnp.arange(N, dtype=jnp.int32)
            sel = jnp.isin(g.ell_ty, et_arr)
            blk = fanout_block(
                all_nodes,
                jnp.where(sel, g.ell_nbr, -1),
                jnp.where(sel, g.ell_w, 0.0),
                jnp.where(sel, g.ell_eid, -1),
                int(g.ell_nbr.shape[1]), self.add_self_loops,
                etypes=jnp.where(sel, g.ell_ty, -1))
            deg_in = g.ell_in_deg[:, et_arr].sum(axis=1)
            blk = blk.replace(src_deg=self._src_deg(blk, deg_in),
                              ell_tpos=g.ell_tpos)
        elif use_ell and self.cap is not None:
            # dynamic fallback: assemble the ELL rows from the CSR per
            # call (correct everywhere, but rebuilds per step)
            from euler_tpu.ops.sampling import get_full_neighbor
            N = g.meta.n_nodes
            all_nodes = jnp.arange(N, dtype=jnp.int32)
            nbr, w, ty, eid, ok = get_full_neighbor(
                g, all_nodes, self.metapath[0], self.cap)
            nbr = jnp.where(ok, nbr, -1)
            blk = fanout_block(all_nodes, nbr, w, eid, self.cap,
                               self.add_self_loops, etypes=ty)
            ets = jnp.asarray(_as_etypes(g, self.metapath[0]), jnp.int32)
            sel = jnp.isin(g.adj_type, ets).astype(jnp.float32)
            deg_in = jax.ops.segment_sum(sel, g.adj_dst, num_segments=N)
            blk = blk.replace(src_deg=self._src_deg(blk, deg_in))
        else:
            blk = full_graph_block(g, self.metapath[0],
                                   self.add_self_loops)
        return [blk] * self.num_layers


def full_graph_block_sharded(view, edge_types, add_self_loops=True):
    """One shard's whole-graph block: its local CSR edges addressed in
    GLOBAL node ids, self-loops only for owned nodes (each node's loop
    must appear on exactly one shard — the psum completion would double
    -count it otherwise). Pairs with Block.psum_axis."""
    from euler_tpu.ops.sampling import _as_etypes
    ets = _as_etypes(view, edge_types)
    N = view.meta.n_nodes
    S = view.num_shards
    ET = view.meta.num_edge_types
    me = jax.lax.axis_index(view.axis)
    gp = view.group_ptr
    E = view.adj_dst.shape[0]                     # padded e_max
    slots = jnp.arange(E, dtype=jnp.int32)
    real = slots < gp[-1]
    gidx = jnp.clip(jnp.searchsorted(gp, slots, side="right") - 1,
                    0, gp.shape[0] - 2)
    row = gidx // ET                              # local target row
    dst = jnp.where(real, row * S + me, 0).astype(jnp.int32)
    src = jnp.where(real & (view.adj_dst >= 0), view.adj_dst, 0)
    sel = real & jnp.isin(view.adj_type,
                          jnp.asarray(ets, jnp.int32)) \
        & (view.adj_dst >= 0) & (dst < N)
    mask = sel.astype(jnp.float32)
    w = jnp.where(sel, view.adj_w, 0.0)
    e_id = jnp.where(sel, view.adj_eid, -1)
    if add_self_loops:
        n_local = view.node_type.shape[0]
        loop = (jnp.arange(n_local, dtype=jnp.int32) * S
                + me).astype(jnp.int32)
        ok = loop < N
        loop = jnp.where(ok, loop, 0)
        dst = jnp.concatenate([dst, loop])
        src = jnp.concatenate([src, loop])
        mask = jnp.concatenate([mask, ok.astype(jnp.float32)])
        w = jnp.concatenate([w, jnp.ones((n_local,), w.dtype)])
        e_id = jnp.concatenate([e_id,
                                jnp.full((n_local,), -1, jnp.int32)])
    return Block(
        n_id=jnp.arange(N, dtype=jnp.int32),
        res_n_id=jnp.arange(N, dtype=jnp.int32),
        edge_index=jnp.stack([dst, src]),
        e_id=e_id, edge_weight=w, mask=mask,
        size=(N, N), psum_axis=view.axis)


class LayerwiseDataFlow:
    """Layer-wise importance sampling (LADIES-style).

    reference: sampleLNB / SampleNeighborLayerwiseWithAdj
    (euler/core/kernels/local_sample_layer_op.cc:94-102 — candidate layer =
    union of frontier neighborhoods, importance weight = weight_func of
    summed edge weights, default sqrt; adjacency returned between layers)
    and layerwise_dataflow.py.

    Device formulation: sample M candidate (frontier, neighbor) draws,
    importance-reweight via Gumbel top-k over weight_func of the edge
    weights, dedup the selected layer, then recover the FULL frontier x
    layer adjacency with per-group binary searches (sparse_get_adj) — the
    reference returns every frontier->layer edge, not just the one that
    drew each layer node (local_sample_layer_op.cc:94-102,
    sample_neighbor_layerwise_with_adj_op.cc).
    """

    def __init__(self, layer_sizes: Sequence[int], metapath,
                 add_self_loops: bool = True, default_id: int = -1,
                 candidates_per_node: int = 8, weight_func=jnp.sqrt, **_):
        self.layer_sizes = list(layer_sizes)
        self.metapath = list(metapath)
        self.add_self_loops = add_self_loops
        self.default_id = default_id
        self.cpn = candidates_per_node
        self.weight_func = weight_func

    def __call__(self, g, key, roots: Array):
        roots = jnp.asarray(roots, jnp.int32).reshape(-1)
        blocks = []
        cur = roots
        for ets, m in zip(self.metapath, self.layer_sizes):
            key, k1 = jax.random.split(key)
            T = cur.shape[0]
            layer, _ = sampling.sample_layer(
                g, k1, cur, ets, self.cpn, m, self.weight_func)
            # dedup: a node drawn via several frontier candidates must
            # appear in the layer once or the adjacency double-counts it
            eq = layer[None, :] == layer[:, None]
            first = jnp.argmax(eq, axis=1)          # first occurrence index
            dup = first != jnp.arange(m)
            layer = jnp.where(dup, -1, layer)
            # full bipartite adjacency frontier x layer (true LADIES
            # estimator; dense [T, m] mask + weights)
            conn, w2 = sampling.sparse_get_adj(g, cur, layer, ets)
            n_id = jnp.concatenate([cur, layer])
            dst = jnp.repeat(jnp.arange(T, dtype=jnp.int32), m)
            src = T + jnp.tile(jnp.arange(m, dtype=jnp.int32), T)
            conn = conn & (cur >= 0)[:, None] & (layer >= 0)[None, :]
            mask = conn.astype(jnp.float32).reshape(-1)
            w = jnp.where(conn, w2, 0.0).reshape(-1)
            e_id = jnp.full((T * m,), -1, jnp.int32)
            if self.add_self_loops:
                loop = jnp.arange(T, dtype=jnp.int32)
                dst = jnp.concatenate([dst, loop])
                src = jnp.concatenate([src, loop])
                mask = jnp.concatenate([mask,
                                        (cur >= 0).astype(jnp.float32)])
                w = jnp.concatenate([w, jnp.ones((T,), w.dtype)])
                e_id = jnp.concatenate([e_id, jnp.full((T,), -1, jnp.int32)])
            blocks.append(Block(
                n_id=n_id, res_n_id=jnp.arange(T, dtype=jnp.int32),
                edge_index=jnp.stack([dst, src]), e_id=e_id,
                edge_weight=w, mask=mask, size=(T, T + m),
                fanout=m, self_loops=self.add_self_loops, shared_src=True))
            cur = n_id
        return list(reversed(blocks))


# FastGCN: layerwise with uniform-importance candidates
class FastDataFlow(LayerwiseDataFlow):
    """reference: fast_dataflow.py (FastGCN importance sampling)."""

    def __init__(self, layer_sizes, metapath, **kw):
        kw.setdefault("weight_func", lambda w: jnp.ones_like(w))
        super().__init__(layer_sizes, metapath, **kw)


_FLOWS = {
    "sage": SageDataFlow,
    "sample": SageDataFlow,
    "full": GCNDataFlow,
    "gcn": GCNDataFlow,
    "whole": WholeDataFlow,
    "layerwise": LayerwiseDataFlow,
    "adapt": LayerwiseDataFlow,
    "fast": FastDataFlow,
}


def get_flow_class(name: str):
    """reference: mp_utils/utils.py get_flow_class."""
    return _FLOWS[name]
