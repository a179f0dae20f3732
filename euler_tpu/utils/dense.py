"""Dense-batch helpers: to_dense_adj / to_dense_batch.

TPU-native counterparts of the reference utils
(reference: tf_euler/python/utils/to_dense_adj.py, to_dense_batch.py —
convert an edge_index / node set grouped by graph into per-graph dense
adjacency [G, maxN, maxN] and node-feature [G, maxN, D] blocks).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def to_dense_batch(x: Array, graph_idx: Array, n_graphs: int,
                   max_nodes: int) -> Tuple[Array, Array]:
    """Scatter per-node rows into [n_graphs, max_nodes, D] + mask.

    graph_idx[i] = graph of node i (-1 = drop). Nodes beyond
    ``max_nodes`` within a graph are dropped.
    """
    n = x.shape[0]
    gi = jnp.asarray(graph_idx, jnp.int32)
    ok = gi >= 0
    g_safe = jnp.where(ok, gi, n_graphs)
    # position of each node within its graph (stable running count)
    onehot = (g_safe[:, None] == jnp.arange(n_graphs + 1)[None, :])
    pos = jnp.cumsum(onehot, axis=0)[jnp.arange(n), g_safe] - 1
    keep = ok & (pos < max_nodes)
    flat = jnp.where(keep, g_safe * max_nodes + pos,
                     n_graphs * max_nodes)
    out = jnp.zeros((n_graphs * max_nodes + 1,) + x.shape[1:],
                    x.dtype).at[flat].set(jnp.where(keep[:, None], x, 0.0))
    mask = jnp.zeros((n_graphs * max_nodes + 1,), bool).at[flat].set(keep)
    return (out[:-1].reshape((n_graphs, max_nodes) + x.shape[1:]),
            mask[:-1].reshape(n_graphs, max_nodes))


def to_dense_adj(edge_index: Array, graph_idx: Array, n_graphs: int,
                 max_nodes: int,
                 edge_weight: Optional[Array] = None) -> Array:
    """Per-graph dense adjacency [n_graphs, max_nodes, max_nodes].

    edge_index [2, E] in *global* node numbering; graph_idx maps global
    node -> graph. Node slots follow the same within-graph ordering as
    ``to_dense_batch``.
    """
    gi = jnp.asarray(graph_idx, jnp.int32)
    n = gi.shape[0]
    ok = gi >= 0
    g_safe = jnp.where(ok, gi, n_graphs)
    onehot = (g_safe[:, None] == jnp.arange(n_graphs + 1)[None, :])
    pos = jnp.cumsum(onehot, axis=0)[jnp.arange(n), g_safe] - 1

    src, dst = edge_index[0], edge_index[1]
    e_ok = (src >= 0) & (dst >= 0)
    sg = jnp.where(e_ok, gi[jnp.maximum(src, 0)], -1)
    dg = jnp.where(e_ok, gi[jnp.maximum(dst, 0)], -1)
    e_ok = e_ok & (sg == dg) & (sg >= 0)
    sp = pos[jnp.maximum(src, 0)]
    dp = pos[jnp.maximum(dst, 0)]
    e_ok = e_ok & (sp < max_nodes) & (dp < max_nodes)
    w = jnp.ones(src.shape, jnp.float32) if edge_weight is None \
        else edge_weight
    flat = jnp.where(e_ok,
                     (jnp.maximum(sg, 0) * max_nodes + sp) * max_nodes + dp,
                     n_graphs * max_nodes * max_nodes)
    adj = jnp.zeros((n_graphs * max_nodes * max_nodes + 1,),
                    jnp.float32).at[flat].add(jnp.where(e_ok, w, 0.0))
    return adj[:-1].reshape(n_graphs, max_nodes, max_nodes)
