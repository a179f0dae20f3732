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
    weights/ids (needed by RGCN's relation_from_etype and edge features).
    """

    def __init__(self, fanouts: Sequence[int], metapath,
                 add_self_loops: bool = True, default_id: int = -1,
                 payload: bool = False, **_):
        self.fanouts = list(fanouts)
        self.metapath = list(metapath)
        self.add_self_loops = add_self_loops
        self.default_id = default_id
        self.payload = payload

    def __call__(self, g, key, roots: Array):
        roots = jnp.asarray(roots, jnp.int32).reshape(-1)
        blocks = []
        cur = roots
        for ets, cnt in zip(self.metapath, self.fanouts):
            key, sub = jax.random.split(key)
            if self.payload:
                nbr, w, ty, eid = sampling.sample_neighbor(
                    g, sub, cur, ets, cnt, self.default_id)
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
    the caller's final gather."""

    def __init__(self, num_layers: int, metapath,
                 add_self_loops: bool = True, **_):
        self.num_layers = num_layers
        self.metapath = list(metapath)
        self.add_self_loops = add_self_loops

    def __call__(self, g, key, roots: Array):
        blk = full_graph_block(g, self.metapath[0], self.add_self_loops)
        return [blk] * self.num_layers


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
