"""Mini-batch bipartite blocks with static shapes.

TPU-native counterpart of the reference's dataflow Block
(reference: tf_euler/python/dataflow/base_dataflow.py:23-52 —
``Block{n_id, res_n_id, e_id, edge_index, size}`` consumed deepest-first by
BaseGNNNet, mp_utils/base_gnn.py:74-92).

The reference dedups node sets with tf.unique (dynamic shapes). Under jit we
keep the layered sets as ``N_{d+1} = concat(N_d, sampled_neighbors)`` with
duplicates allowed, which makes every shape a function of (batch, fanouts)
only; padded/dead neighbors carry an edge mask instead of being dropped
(SURVEY.md §7 "Fixed shapes vs ragged graph data").

Index spaces: ``edge_index[0]`` indexes targets (0..size[0]),
``edge_index[1]`` indexes sources (0..size[1]); ``res_n_id`` selects the
target rows out of the source set — here always ``arange(size[0])`` because
targets are the prefix of the source set.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct

Array = jnp.ndarray


@struct.dataclass
class Block:
    n_id: Array                  # int32 [S_src] source node ids (-1 = pad)
    res_n_id: Array              # int32 [S_dst] target positions in sources
    edge_index: Array            # int32 [2, E_blk]
    e_id: Optional[Array]        # int32 [E_blk] original edge rows (-1 pad)
    edge_weight: Optional[Array]  # f32 [E_blk]
    mask: Array                  # f32 [E_blk] 1=real edge, 0=padding
    size: Tuple[int, int] = struct.field(pytree_node=False)


def fanout_block(targets: Array, sampled: Array, weights: Array,
                 eids: Array, count: int, add_self_loops: bool = True
                 ) -> Block:
    """Build the block for one sampled hop.

    targets: [T] node ids of this hop's frontier.
    sampled/weights/eids: [T, count] from ops.sampling.sample_neighbor.
    Sources = concat(targets, sampled.flatten()); the self-loop edges mirror
    the reference's add_self_loops in NeighborDataFlow
    (tf_euler/python/dataflow/neighbor_dataflow.py:45-76).
    """
    T = targets.shape[0]
    flat = sampled.reshape(-1)
    n_id = jnp.concatenate([targets, flat])
    dst = jnp.repeat(jnp.arange(T, dtype=jnp.int32), count)
    src = T + jnp.arange(T * count, dtype=jnp.int32)
    mask = ((flat >= 0) & (targets >= 0)[dst]).astype(jnp.float32)
    w = weights.reshape(-1)
    e_id = eids.reshape(-1)
    if add_self_loops:
        loop = jnp.arange(T, dtype=jnp.int32)
        dst = jnp.concatenate([dst, loop])
        src = jnp.concatenate([src, loop])
        mask = jnp.concatenate([mask, (targets >= 0).astype(jnp.float32)])
        w = jnp.concatenate([w, jnp.ones((T,), w.dtype)])
        e_id = jnp.concatenate([e_id, jnp.full((T,), -1, jnp.int32)])
    return Block(
        n_id=n_id,
        res_n_id=jnp.arange(T, dtype=jnp.int32),
        edge_index=jnp.stack([dst, src]),
        e_id=e_id,
        edge_weight=w,
        mask=mask,
        size=(T, int(n_id.shape[0])),
    )


def full_graph_block(g, edge_types, add_self_loops: bool = True) -> Block:
    """Whole-graph block: every edge of the requested types.

    reference: WholeDataFlow via sparse_get_adj
    (tf_euler/python/dataflow/whole_dataflow.py:26-63)."""
    import numpy as np

    from euler_tpu.ops.sampling import _as_etypes
    ets = _as_etypes(g, edge_types)
    N = g.meta.n_nodes
    sel = jnp.isin(g.adj_type, jnp.asarray(ets, jnp.int32))
    # static shapes: keep all edges, mask out other types
    dst = g.adj_src  # aggregate into the *source* node of the stored edge?
    # stored CSR edges are src->dst; messages flow src<-dst neighbors, i.e.
    # target = adj_src (the querying node), source = adj_dst (its neighbor),
    # matching GetFullNeighbor semantics (out-neighbors aggregate inward).
    src_pos = g.adj_dst
    mask = sel.astype(jnp.float32)
    dst_idx = dst
    src_idx = src_pos
    e_id = g.adj_eid
    w = g.adj_w
    if add_self_loops:
        loop = jnp.arange(N, dtype=jnp.int32)
        dst_idx = jnp.concatenate([dst_idx, loop])
        src_idx = jnp.concatenate([src_idx, loop])
        mask = jnp.concatenate([mask, jnp.ones((N,), jnp.float32)])
        w = jnp.concatenate([w, jnp.ones((N,), w.dtype)])
        e_id = jnp.concatenate([e_id, jnp.full((N,), -1, jnp.int32)])
    return Block(
        n_id=jnp.arange(N, dtype=jnp.int32),
        res_n_id=jnp.arange(N, dtype=jnp.int32),
        edge_index=jnp.stack([dst_idx, src_idx]),
        e_id=e_id,
        edge_weight=w,
        mask=mask,
        size=(N, N),
    )
