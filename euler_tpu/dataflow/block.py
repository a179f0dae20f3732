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
    # regular-structure marker: fanout blocks have exactly ``fanout`` sampled
    # edges per target, laid out contiguously (edge t*fanout+c has dst=t,
    # src=T+t*fanout+c), optionally followed by T self-loop edges. When set,
    # the gather/scatter methods below compile to slices/reshapes instead of
    # random HBM gathers + XLA scatters (the dominant cost of the sampled
    # message-passing step; XLA lowers scatter to a serialized sort-loop).
    fanout: Optional[int] = struct.field(pytree_node=False, default=None)
    self_loops: bool = struct.field(pytree_node=False, default=False)
    # shared-source variant of the regular layout (layerwise/LADIES
    # blocks): edge t*fanout+j connects dst=t to src=T+j — the ``fanout``
    # sources per target are the SAME shared layer of ``fanout`` nodes
    # rather than per-target samples (sample_neighbor_layerwise_with_adj
    # returns exactly this frontier x layer adjacency)
    shared_src: bool = struct.field(pytree_node=False, default=False)
    # edge type per block edge (-1 pad/self-loop), carried from the sampling
    # verb that produced the block so relation lookups (RGCN) need no
    # eid->type resolution (which all-gathers across shards under a mesh)
    e_type: Optional[Array] = None
    # true source-side degrees [size[1]] for sym-norm convs. In regular
    # (ELL) whole-graph blocks every source SLOT is a copy of a node, so
    # the per-slot count scatter_src_add computes (=1) is not the node's
    # degree; flows that duplicate sources provide the per-node values
    # here (WholeDataFlow(cap=...)).
    src_deg: Optional[Array] = None
    # transpose-position table [N, C_in] of the whole-graph ELL layout
    # (store.GraphTensors.ell_tpos): lets GNNNet expand a [N, D] layer
    # output into this block's source set with a SCATTER-FREE backward
    # (ell_expand below) — the vjp of a plain x[n_id] gather is an
    # unsorted segment-scatter, 2-5x the cost of the reads it moves
    # (tools/micro/micro_spmm.py)
    ell_tpos: Optional[Array] = None
    # distributed whole-graph blocks (WholeDataFlow under a mesh): each
    # shard's block holds only its LOCAL edges over the global node
    # space, so segment reductions produce PARTIAL per-node results that
    # must complete with a collective over this axis. Set by
    # flows.full_graph_block_sharded; scatter/aggregate/softmax/
    # scatter_src_add finish with psum/pmax over it.
    psum_axis: Optional[str] = struct.field(pytree_node=False,
                                            default=None)

    # ---- index-free message passing over the block ------------------
    # Generic (irregular) blocks fall back to mp_ops gather/scatter; the
    # method set is the TPU-native replacement for the reference's
    # per-edge gather -> scatter_(aggr) contract (conv.py:27-53).

    def _is_compact(self, x_src) -> bool:
        """True when x_src is the per-node [N, ...] table of a
        whole-graph ELL block rather than the expanded source set."""
        return (self.ell_tpos is not None
                and x_src.shape[0] == self.size[0] != self.size[1])

    def _expand(self, x: Array) -> Array:
        """Compact [N, ...] -> expanded source set. Routed through
        ell_expand's transpose-gather vjp for 2-D features (still pays
        an [N·C, D] cotangent read — prefer aggregate_neighbors, which
        fuses the whole round trip through _ell_agg)."""
        if x.ndim == 2:
            return ell_expand(x, self.n_id, self.ell_tpos)
        return jnp.where((self.n_id >= 0).reshape(
            (-1,) + (1,) * (x.ndim - 1)), x[jnp.maximum(self.n_id, 0)], 0)

    def gather_src(self, x_src: Array) -> Array:
        """Per-edge view of source values: x_src[edge_index[1]]."""
        from euler_tpu.ops import mp_ops
        if self._is_compact(x_src):
            x_src = self._expand(x_src)
        if self.fanout is None:
            return mp_ops.gather(x_src, self.edge_index[1])
        T = self.size[0]
        sampled = x_src[T:]                      # contiguous slice, free
        if self.shared_src:
            # the [C] shared layer broadcasts to every target's edge row
            C = self.fanout
            sampled = jnp.broadcast_to(
                sampled[None], (T, C) + sampled.shape[1:]
            ).reshape((T * C,) + sampled.shape[1:])
        if not self.self_loops:
            return sampled
        return jnp.concatenate([sampled, x_src[:T]], axis=0)

    def gather_tgt(self, v: Array) -> Array:
        """Per-edge view of target values: v[edge_index[0]] (v has size[0]
        rows). Regular blocks broadcast instead of gathering."""
        from euler_tpu.ops import mp_ops
        if self.fanout is None:
            return mp_ops.gather(v, self.edge_index[0])
        T, C = self.size[0], self.fanout
        rep = jnp.broadcast_to(v[:, None], (T, C) + v.shape[1:])
        rep = rep.reshape((T * C,) + v.shape[1:])
        return jnp.concatenate([rep, v], axis=0) if self.self_loops else rep

    def _split(self, edge_vals: Array):
        """(sampled [T,C,...], loop [T,...]|None) views of a [E,...] tensor."""
        T, C = self.size[0], self.fanout
        tail = edge_vals.shape[1:]
        sampled = edge_vals[:T * C].reshape((T, C) + tail)
        loop = edge_vals[T * C:] if self.self_loops else None
        return sampled, loop

    def _reduce(self, op: str, up_s, up_l, m_s, m_l):
        """Aggregate (sampled [T,C,...], loop [T,...]) with masks of the
        same leading shapes; the shared arithmetic of scatter and
        aggregate_neighbors."""
        if op == "add":
            out = (up_s * m_s if m_s is not None else up_s).sum(axis=1)
            if up_l is not None:
                out = out + (up_l * m_l if m_l is not None else up_l)
            return out
        if op == "mean":
            if m_s is None:
                tot = up_s.sum(axis=1)
                cnt = float(self.fanout)
                if up_l is not None:
                    tot, cnt = tot + up_l, cnt + 1.0
                return tot / (cnt + 1e-7)             # scatter_mean parity
            tot = (up_s * m_s).sum(axis=1)
            cnt = m_s.sum(axis=1)
            if up_l is not None:
                tot = tot + up_l * m_l
                cnt = cnt + m_l
            return tot / jnp.maximum(cnt, 1e-7)       # masked_scatter_ parity
        if op == "max":
            neg = jnp.finfo(up_s.dtype).min
            vals = jnp.where(m_s > 0, up_s, neg) if m_s is not None else up_s
            out = vals.max(axis=1)
            if up_l is not None:
                lv = jnp.where(m_l > 0, up_l, neg) if m_l is not None else up_l
                out = jnp.maximum(out, lv)
            return jnp.where(out <= neg * 0.5, 0.0, out)
        raise ValueError(op)

    def _split_mask(self, mask, dtype, tail_nd):
        if mask is None:
            return None, None
        return self._split(mask.astype(dtype).reshape(
            (-1,) + (1,) * tail_nd))

    def scatter(self, op: str, updates: Array, mask: Optional[Array] = None
                ) -> Array:
        """Aggregate per-edge updates into targets (segment_{op} over
        edge_index[0], num_segments=size[0]); mask drops padded edges.
        Distributed whole-graph blocks complete partial per-node results
        with a collective over ``psum_axis``."""
        from euler_tpu.ops import mp_ops
        if self.psum_axis is not None:
            from euler_tpu.parallel import comms
            ax = self.psum_axis
            dst, T = self.edge_index[0], self.size[0]
            if op == "add":
                return comms.psum(
                    mp_ops.masked_scatter_("add", updates, dst, T, mask),
                    ax)
            if op == "mean":
                m = jnp.ones((updates.shape[0],), updates.dtype) \
                    if mask is None else mask.astype(updates.dtype)
                tot = comms.psum(mp_ops.masked_scatter_(
                    "add", updates * m.reshape(
                        (-1,) + (1,) * (updates.ndim - 1)), dst, T, None),
                    ax)
                cnt = comms.psum(mp_ops.scatter_add(
                    m[:, None], dst, T), ax)
                return tot / jnp.maximum(
                    cnt.reshape((T,) + (1,) * (updates.ndim - 1)), 1e-7)
            if op == "max":
                neg = jnp.finfo(updates.dtype).min
                up = updates if mask is None else jnp.where(
                    mask.reshape((-1,) + (1,) * (updates.ndim - 1)) > 0,
                    updates, neg)
                loc = mp_ops._segment_max_raw(up, dst, T)
                glob = jax.lax.pmax(loc, ax)
                return jnp.where(glob <= neg * 0.5, 0.0, glob)
            raise ValueError(op)
        if self.fanout is None:
            return mp_ops.masked_scatter_(op, updates, self.edge_index[0],
                                          self.size[0], mask)
        up_s, up_l = self._split(updates)
        m_s, m_l = self._split_mask(mask, updates.dtype, updates.ndim - 1)
        return self._reduce(op, up_s, up_l, m_s, m_l)

    def aggregate_neighbors(self, op: str, x_src: Array,
                            mask: Optional[Array] = None,
                            scale: Optional[Array] = None) -> Array:
        """Fused ``scatter(op, gather_src(x_src) * scale, mask)``.

        For regular layouts this reads ``x_src`` through strided views
        instead of materializing the concatenated per-edge tensor —
        measured on-chip, the gather_src concat blocked XLA fusion and
        cost three full [E, D] copies per conv layer (select + slice +
        relayout-reshape). ``scale`` is an optional per-edge multiplier
        ([E] or [E, 1]; e.g. GCN's sym-norm, GAT's attention).
        """
        from euler_tpu.ops import mp_ops
        if scale is not None and scale.ndim == 1:
            scale = scale[:, None]
        if self._is_compact(x_src):
            if op in ("add", "mean") and x_src.ndim == 2:
                return self._ell_aggregate(op, x_src, mask, scale)
            x_src = self._expand(x_src)
        if self.fanout is None:
            xj = mp_ops.gather(x_src, self.edge_index[1])
            if scale is not None:
                xj = xj * scale.astype(xj.dtype)
            if self.psum_axis is not None:
                return self.scatter(op, xj, mask)
            return mp_ops.masked_scatter_(op, xj, self.edge_index[0],
                                          self.size[0], mask)
        T, C = self.size[0], self.fanout
        tail = x_src.shape[1:]
        if self.shared_src:
            up_s = jnp.broadcast_to(x_src[T:][None], (T, C) + tail)
        else:
            up_s = x_src[T:].reshape((T, C) + tail)
        up_l = x_src[:T] if self.self_loops else None
        if scale is not None:
            s_s, s_l = self._split(scale.astype(x_src.dtype))
            up_s = up_s * s_s
            if up_l is not None:
                up_l = up_l * s_l
        m_s, m_l = self._split_mask(mask, x_src.dtype, x_src.ndim - 1)
        return self._reduce(op, up_s, up_l, m_s, m_l)

    def _ell_aggregate(self, op: str, x: Array, mask, scale) -> Array:
        """add/mean aggregation straight from the compact [N, D] table
        through the fused _ell_agg (VMEM-friendly vjp)."""
        T, C = self.size[0], self.fanout
        eff = jnp.ones((self.edge_index.shape[1],), jnp.float32)
        if scale is not None:
            eff = eff * scale.reshape(-1).astype(jnp.float32)
        if mask is not None:
            eff = eff * mask.astype(jnp.float32)
        w_s = eff[:T * C].reshape(T, C)
        w_l = eff[T * C:] if self.self_loops \
            else jnp.zeros((T,), jnp.float32)
        nbr = self.n_id[T:].reshape(T, C)
        out = _ell_agg(C, x, w_s, w_l, nbr, self.ell_tpos)
        if op == "add":
            return out
        if mask is None:                       # generic-path parity:
            cnt = float(C) + (1.0 if self.self_loops else 0.0)
            return out / (cnt + 1e-7)
        cnt_s = mask[:T * C].reshape(T, C).sum(axis=1)
        cnt = cnt_s + (mask[T * C:] if self.self_loops else 0.0)
        return out / jnp.maximum(cnt, 1e-7)[:, None].astype(out.dtype)

    def softmax(self, scores: Array, mask: Optional[Array] = None) -> Array:
        """Per-target segment softmax of per-edge scores (masked edges get
        probability 0); returns per-edge probabilities."""
        from euler_tpu.ops import mp_ops
        if self.psum_axis is not None:
            from euler_tpu.parallel import comms
            ax = self.psum_axis
            dst, T = self.edge_index[0], self.size[0]
            neg = -1e30
            z = scores if mask is None else jnp.where(
                mask.reshape((-1,) + (1,) * (scores.ndim - 1)) > 0,
                scores, neg)
            # the max shift is numerical stabilization only — its
            # gradient contribution cancels exactly, and pmax has no
            # differentiation rule, so gradients stop BEFORE the
            # collective (stopping the output still traces pmax's jvp)
            mx = jax.lax.pmax(jax.lax.stop_gradient(
                mp_ops._segment_max_raw(z, dst, T)), ax)
            mx = jnp.where(mx <= neg * 0.5, 0.0, mx)
            e = jnp.exp(z - mp_ops.gather(mx, dst))
            if mask is not None:
                e = jnp.where(mask.reshape(
                    (-1,) + (1,) * (scores.ndim - 1)) > 0, e, 0.0)
            denom = comms.psum(mp_ops.scatter_add(e, dst, T), ax)
            return e / jnp.maximum(mp_ops.gather(denom, dst), 1e-16)
        if self.fanout is None:
            return mp_ops.masked_scatter_softmax(scores, self.edge_index[0],
                                                 self.size[0], mask)
        T, C = self.size[0], self.fanout
        tail = scores.shape[1:]
        s_s, s_l = self._split(scores)
        grp = s_s if s_l is None else jnp.concatenate(
            [s_s, s_l[:, None]], axis=1)             # [T, C(+1), ...]
        neg = -1e30
        if mask is not None:
            m_s, m_l = self._split(
                mask.astype(scores.dtype).reshape(
                    (-1,) + (1,) * (scores.ndim - 1)))
            mg = m_s if m_l is None else jnp.concatenate(
                [m_s, m_l[:, None]], axis=1)
            grp = jnp.where(mg > 0, grp, neg)
        mx = grp.max(axis=1, keepdims=True)
        mx = jnp.where(mx <= neg * 0.5, 0.0, mx)
        e = jnp.exp(grp - mx)
        if mask is not None:
            e = jnp.where(mg > 0, e, 0.0)
        denom = jnp.maximum(e.sum(axis=1, keepdims=True), 1e-16)
        p = e / denom
        p_s = p[:, :C].reshape((T * C,) + tail)
        if s_l is None:
            return p_s
        return jnp.concatenate([p_s, p[:, C]], axis=0)

    def scatter_src_add(self, updates: Array, mask: Optional[Array] = None
                        ) -> Array:
        """segment_sum over edge_index[1] into the source set (size[1] rows);
        used for source-side degrees."""
        from euler_tpu.ops import mp_ops
        if mask is not None:
            updates = updates * mask.reshape(
                (-1,) + (1,) * (updates.ndim - 1)).astype(updates.dtype)
        if self.fanout is None:
            out = mp_ops.scatter_add(updates, self.edge_index[1],
                                     self.size[1])
            if self.psum_axis is not None:
                from euler_tpu.parallel import comms
                out = comms.psum(out, self.psum_axis)
            return out
        T, C = self.size[0], self.fanout
        if self.shared_src:
            # shared layer: reduce each source column over all targets
            sampled = updates[:T * C].reshape((T, C) + updates.shape[1:]
                                              ).sum(axis=0)
        else:
            sampled = updates[:T * C]             # src slots T.. are 1:1
        if self.self_loops:
            head = updates[T * C:]
        else:
            head = jnp.zeros((T,) + updates.shape[1:], updates.dtype)
        return jnp.concatenate([head, sampled], axis=0)


import jax


@jax.custom_vjp
def ell_expand(x: Array, n_id: Array, tpos: Array) -> Array:
    """Expand a per-node [N, D] table into a whole-graph ELL block's
    source set ``concat(x, x[nbr_flat])`` (``n_id = concat(arange(N),
    nbr_flat)``), with the TRANSPOSE adjacency driving the backward:

      grad_x[u] = g[u] + sum_{c} g[N + tpos[u, c]]

    — a gather over the precomputed transpose positions instead of the
    unsorted scatter jax's native gather-vjp emits. Exact: tpos lists
    every flat cell that reads u (pad -1 contributes 0)."""
    return jnp.where((n_id >= 0)[:, None], x[jnp.maximum(n_id, 0)], 0)


def _ell_expand_fwd(x, n_id, tpos):
    return ell_expand(x, n_id, tpos), (n_id, tpos, x.shape[0])


def _ell_expand_bwd(res, g):
    n_id, tpos, N = res
    g_nbr = g[N:]                                       # [N*C, D]
    rows = g_nbr[jnp.maximum(tpos, 0)]                  # [N, C_in, D]
    rows = jnp.where((tpos >= 0)[..., None], rows, 0)
    return (g[:N] + rows.sum(axis=1).astype(g.dtype), None, None)


ell_expand.defvjp(_ell_expand_fwd, _ell_expand_bwd)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ell_agg(C: int, x: Array, w_s: Array, w_l: Array, nbr: Array,
             tpos: Array) -> Array:
    """Fused whole-graph ELL aggregate: out[t] = Σ_c x[nbr[t,c]]·w_s[t,c]
    (+ x[t]·w_l[t] for the self loop), x compact [N, D].

    The vjp is the whole point: the naive composition (expand x to the
    [N·C, D] source set, reduce) backprops through a gather whose
    cotangent array is N·C rows — far past XLA's VMEM staging threshold,
    so its transpose gather runs at the ~11ns/row HBM floor (123ms of a
    128ms full-graph GCN step, /tmp bisect r5). Here BOTH directions
    gather only from [N, D] arrays (VMEM-stageable):

      grad_x[u] = Σ_{cells p=tpos[u,c]} g[p//C] · w_flat[p]  + g[u]·w_l[u]
      grad_w_s[t,c] = g[t] · x[nbr[t,c]]
    """
    rows = jnp.where((nbr >= 0)[..., None],
                     x[jnp.maximum(nbr, 0)], 0)
    out = (rows * w_s[..., None].astype(x.dtype)).sum(axis=1)
    return out + x * w_l[:, None].astype(x.dtype)


def _ell_agg_fwd(C, x, w_s, w_l, nbr, tpos):
    return _ell_agg(C, x, w_s, w_l, nbr, tpos), (x, w_s, w_l, nbr, tpos)


def _ell_agg_bwd(C, res, g):
    x, w_s, w_l, nbr, tpos = res
    N = g.shape[0]
    ok = tpos >= 0
    tr = jnp.clip(tpos // C, 0, N - 1)
    gv = g[tr]                                        # [N, C_in, D]
    wv = w_s.reshape(-1)[jnp.clip(tpos, 0, w_s.size - 1)]
    grad_x = (gv * jnp.where(ok, wv, 0.0)[..., None].astype(g.dtype)
              ).sum(axis=1) + g * w_l[:, None].astype(g.dtype)
    rows = jnp.where((nbr >= 0)[..., None], x[jnp.maximum(nbr, 0)], 0)
    grad_ws = jnp.einsum("td,tcd->tc", g.astype(jnp.float32),
                         rows.astype(jnp.float32))
    grad_wl = jnp.einsum("td,td->t", g.astype(jnp.float32),
                         x.astype(jnp.float32))
    return grad_x.astype(x.dtype), grad_ws.astype(w_s.dtype), \
        grad_wl.astype(w_l.dtype), None, None


_ell_agg.defvjp(_ell_agg_fwd, _ell_agg_bwd)


def fanout_block(targets: Array, sampled: Array, weights: Array,
                 eids: Array, count: int, add_self_loops: bool = True,
                 etypes: Optional[Array] = None) -> Block:
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
    # NB: (targets >= 0)[dst] would lower to a per-edge random gather
    # (~8ns/edge — measured 45% of a whole GraphSAGE train step); dst is
    # repeat(arange(T), C), so broadcast+reshape expresses the same mask
    # as a free layout change
    tgt_ok = jnp.broadcast_to((targets >= 0)[:, None],
                              (T, count)).reshape(-1)
    mask = ((flat >= 0) & tgt_ok).astype(jnp.float32)
    w = weights.reshape(-1)
    e_id = eids.reshape(-1)
    e_type = None if etypes is None else etypes.reshape(-1)
    if add_self_loops:
        loop = jnp.arange(T, dtype=jnp.int32)
        dst = jnp.concatenate([dst, loop])
        src = jnp.concatenate([src, loop])
        mask = jnp.concatenate([mask, (targets >= 0).astype(jnp.float32)])
        w = jnp.concatenate([w, jnp.ones((T,), w.dtype)])
        e_id = jnp.concatenate([e_id, jnp.full((T,), -1, jnp.int32)])
        if e_type is not None:
            e_type = jnp.concatenate([e_type,
                                      jnp.full((T,), -1, jnp.int32)])
    return Block(
        n_id=n_id,
        res_n_id=jnp.arange(T, dtype=jnp.int32),
        edge_index=jnp.stack([dst, src]),
        e_id=e_id,
        edge_weight=w,
        mask=mask,
        size=(T, int(n_id.shape[0])),
        fanout=count,
        self_loops=add_self_loops,
        e_type=e_type,
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
