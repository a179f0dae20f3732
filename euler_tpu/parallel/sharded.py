"""Graph-sharded storage + SPMD sampling collectives.

TPU-native counterpart of the reference's distributed graph service
(reference: shard routing ``(id % partition_number) % shard_num``
id_split_op.cc:46-48, per-shard gRPC servers grpc_server.cc, client
scatter/gather with split/REMOTE/merge DAG rewriting optimizer.h:49-86 +
remote_op.cc:60-146, proportional cross-shard root sampling
query_proxy.cc:93-145).

Design inversion: a single SPMD program over a ``Mesh(('data','graph'))``.
Node ``v`` lives on shard ``v % S`` at local row ``v // S``. Every verb
computes locally for the roots a shard owns and combines with one
``psum`` over the 'graph' axis (each root has exactly one owner, so the
masked sum IS the order-restoring merge — the reference's *_MERGE kernels
collapse into one collective). Results ride ICI; no serialization layer
exists (SURVEY.md §2.5).

Two layers:
  * ``ShardedGraphTensors`` — host-built, stacked per-shard arrays with
    leading dim S, placed with PartitionSpec('graph').
  * ``ShardView`` — what one device sees inside ``shard_map``; the ops in
    euler_tpu.ops dispatch to the sharded implementations below when
    handed a ShardView, so the whole model stack (flows, encoders, nets)
    runs unchanged under shard_map.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from euler_tpu.graph import convert as _convert
from euler_tpu.graph.meta import DENSE, SPARSE, GraphMeta
from euler_tpu.graph.store import AliasTables, Graph
from euler_tpu.ops.alias import (FAN_ALIAS_OFF, FAN_D, FAN_KEPT_OFF,
                                 FAN_PROB_OFF, alias_draw,
                                 build_fan_pack, build_group_alias,
                                 build_typed_alias_tables)

Array = jnp.ndarray


@struct.dataclass
class ShardedGraphTensors:
    """Stacked per-shard graph arrays; leading dim = shard."""

    meta: GraphMeta = struct.field(pytree_node=False)
    num_shards: int = struct.field(pytree_node=False)

    node_type: Array        # [S, n_max]
    node_w: Array           # [S, n_max]
    group_ptr: Array        # [S, n_max*ET+1]
    adj_dst: Array          # [S, e_max]  GLOBAL neighbor ids (-1 pad)
    adj_type: Array         # [S, e_max]
    adj_w: Array            # [S, e_max]
    adj_w_cumsum: Array     # [S, e_max]
    adj_eid: Array          # [S, e_max]  GLOBAL edge rows
    group_w_sum: Array      # [S, n_max, ET]
    adj_prob: Array         # [S, e_max]  per-group alias tables
    adj_alias: Array        # [S, e_max]  (within-group slots)

    node_alias: AliasTables     # per-shard stacked ([S, n_max] etc.)
    edge_alias: AliasTables     # per-shard stacked over local CSR slots

    dense_nf: Dict[str, Array]              # [S, n_max, d]
    sparse_nf: Dict[str, Tuple[Array, Array]]
    dense_ef: Dict[str, Array]              # [S, e_max, d] (local edge rows)
    sparse_ef: Dict[str, Tuple[Array, Array]]
    binary_hash_nf: Dict[str, Array]        # [S, n_max] int32 hash columns

    # global-eid -> local CSR slot lookup (edge features / edge types are
    # queried by the global edge row the sampling verbs return):
    # eid_sorted is each shard's owned global eids ascending (pad: INT32_MAX),
    # eid_slot the matching local CSR slot.
    eid_sorted: Array       # [S, e_max]
    eid_slot: Array         # [S, e_max]

    # replicated (same on every shard): per-shard per-type weight sums for
    # proportional root sampling (query_proxy.cc:93-145)
    shard_node_w: Array     # [S, NT]
    shard_edge_w: Array     # [S, ET]

    # per-shard hot-path packs (same layouts as the single-chip store,
    # graph/store.py) so multi-chip sampling takes the same O(1) row-gather
    # paths instead of per-column gathers
    group_pack: Optional[Array] = None    # [S, n_max*ET, 2]
    adj_pack: Optional[Array] = None      # [S, e_max, 4]
    sample_pack: Optional[Array] = None   # [S, e_max, 9]
    fan_pack: Optional[Array] = None      # [S, n_max*ET, 128]
    # union fan rows (see _pad_shard_fields / ops/alias FANU_*)
    fanu_pack: Optional[Array] = None     # [S, n_max, 128]
    fanu_ptr: Optional[Array] = None      # [S, n_max+1]
    fanu_prob: Optional[Array] = None     # [S, e_max]
    fanu_alias: Optional[Array] = None    # [S, e_max]

    # in-CSR, dst-partitioned: shard s owns the in-groups of nodes with
    # id % S == s (built by build_sharded when the source graph was
    # loaded with has_in_edges; reference: node.h:87-112 in-neighbor API
    # served by the dst shard)
    in_group_ptr: Optional[Array] = None    # [S, n_max*ET+1]
    in_adj_src: Optional[Array] = None      # [S, ie_max] GLOBAL src ids
    in_adj_w: Optional[Array] = None        # [S, ie_max]
    in_adj_eid: Optional[Array] = None      # [S, ie_max] GLOBAL edge rows
    in_group_w_sum: Optional[Array] = None  # [S, n_max, ET]
    in_adj_prob: Optional[Array] = None     # [S, ie_max]
    in_adj_alias: Optional[Array] = None    # [S, ie_max]

    # graph-classification membership, REPLICATED: graph-label sets are
    # mutag-scale ([G, maxN] int32), so every shard holds the whole table
    # and the graph-label verbs stay local (get_graph_by_label_op.cc)
    graph_members: Optional[Array] = None   # [G, maxN] (-1 pad)


@struct.dataclass
class ShardView:
    """One shard's local view + collective context (inside shard_map)."""

    meta: GraphMeta = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False)
    num_shards: int = struct.field(pytree_node=False)

    node_type: Array
    node_w: Array
    group_ptr: Array
    adj_dst: Array
    adj_type: Array
    adj_w: Array
    adj_w_cumsum: Array
    adj_eid: Array
    group_w_sum: Array
    adj_prob: Array
    adj_alias: Array
    node_alias: AliasTables
    edge_alias: AliasTables
    dense_nf: Dict[str, Array]
    sparse_nf: Dict[str, Tuple[Array, Array]]
    dense_ef: Dict[str, Array]
    sparse_ef: Dict[str, Tuple[Array, Array]]
    binary_hash_nf: Dict[str, Array]
    eid_sorted: Array
    eid_slot: Array
    shard_node_w: Array
    shard_edge_w: Array
    group_pack: Optional[Array] = None
    adj_pack: Optional[Array] = None
    sample_pack: Optional[Array] = None
    fan_pack: Optional[Array] = None
    fanu_pack: Optional[Array] = None
    fanu_ptr: Optional[Array] = None
    fanu_prob: Optional[Array] = None
    fanu_alias: Optional[Array] = None
    in_group_ptr: Optional[Array] = None
    in_adj_src: Optional[Array] = None
    in_adj_w: Optional[Array] = None
    in_adj_eid: Optional[Array] = None
    in_group_w_sum: Optional[Array] = None
    in_adj_prob: Optional[Array] = None
    in_adj_alias: Optional[Array] = None
    graph_members: Optional[Array] = None   # replicated [G, maxN]

    @property
    def my_shard(self):
        return jax.lax.axis_index(self.axis)

    @property
    def n_nodes(self) -> int:
        # local padded row count (predicate masks are per-shard local)
        return self.node_type.shape[0]


def _build_shard_core(meta: GraphMeta, own_node_type, own_node_w,
                      lsrc, dst, etype, ew, eid):
    """Build one shard's unpadded CSR + samplers from its RAW edge list.

    ``lsrc`` is LOCAL rows (global_id // S); ``dst``/``eid`` stay GLOBAL.
    Shared by :func:`build_sharded` (single-host re-partition) and
    :func:`euler_tpu.parallel.distributed.load_graph_sharded` (per-host
    partition-file loading) so both produce identical shard layouts.
    """
    ET, NT = meta.num_edge_types, meta.num_node_types
    n_local = len(own_node_type)
    (gp, col, w, cw, eid_s, perm) = _convert.build_csr(
        n_local, ET, np.ascontiguousarray(lsrc, np.int32),
        np.asarray(dst, np.int32), np.asarray(etype, np.int32),
        np.asarray(ew, np.float32), np.asarray(eid, np.int32))
    ety = np.asarray(etype)[perm]
    node_w_row = np.bincount(own_node_type, own_node_w,
                             minlength=NT).astype(np.float32)
    edge_w_row = np.bincount(ety, w, minlength=ET).astype(np.float32)
    return dict(gp=gp, col=col, w=w, cw=cw, eid=eid_s, ety=ety, perm=perm,
                n_local=n_local, m_local=len(col),
                node_w_row=node_w_row, edge_w_row=edge_w_row)


def _pad_shard_fields(meta: GraphMeta, core, n_max, e_max,
                      own_node_type, own_node_w,
                      dense_nf_own, sparse_nf_own, binary_hash_own,
                      dense_ef_local, sparse_ef_local):
    """One shard's padded field pytree (constructor-kwargs shape, minus the
    replicated shard_*_w tables). Feature dicts are already subset to this
    shard: node features indexed by own-node order, edge features by LOCAL
    CSR slot order."""
    ET, NT = meta.num_edge_types, meta.num_node_types
    n_local, m_local = core["n_local"], core["m_local"]

    def padn(a, fill=0, dtype=None):
        out = np.full((n_max,) + a.shape[1:], fill, dtype or a.dtype)
        out[:n_local] = a
        return out

    def pade(a, fill=0, dtype=None):
        out = np.full((e_max,) + a.shape[1:], fill, dtype or a.dtype)
        out[:m_local] = a
        return out

    gp = core["gp"]
    gp_full = np.full(n_max * ET + 1, gp[-1] if len(gp) else 0,
                      gp.dtype if len(gp) else np.int32)
    gp_full[: len(gp)] = gp
    seg = np.repeat(np.arange(len(gp_full) - 1), np.diff(gp_full))
    gws = np.zeros(n_max * ET, np.float64)
    np.add.at(gws, seg, core["w"].astype(np.float64))

    cw = core["cw"]
    last = cw[-1] if len(cw) else 0.0
    gprob, galias = build_group_alias(gp_full.astype(np.int64), core["w"])
    eorder = np.argsort(core["eid"], kind="stable").astype(np.int32)

    na = build_typed_alias_tables(
        np.concatenate([own_node_type,
                        np.full(n_max - n_local, NT, np.int32)]),
        np.concatenate([own_node_w, np.zeros(n_max - n_local)]), NT)
    ea = build_typed_alias_tables(
        np.concatenate([core["ety"],
                        np.full(e_max - m_local, ET, np.int32)]),
        np.concatenate([core["w"], np.zeros(e_max - m_local)]), ET)

    def alias_dict(t):
        return dict(ids=t["ids"], type_ptr=t["type_ptr"].astype(np.int32),
                    prob=t["prob"], alias=t["alias"], w_sum=t["w_sum"])

    # hot-path packs over the padded local CSR — the same layouts the
    # single-chip store builds (graph/store.py pack_fields), so sharded
    # sampling reads ONE packed row per draw instead of 4-6 column gathers
    from euler_tpu.graph.store import _adj_pack_np, _sample_pack_np
    gp32 = gp_full.astype(np.int32)
    adj_dst_p = pade(core["col"], -1)
    adj_type_p = pade(core["ety"], -1)
    adj_eid_p = pade(core["eid"], -1)
    adj_w_p = pade(core["w"])
    adj_prob_p = pade(gprob, 1.0)
    adj_alias_p = pade(galias)
    # packs are built over the UNPADDED local CSR (group_ptr only covers
    # real slots), then padded; pad rows are never addressed (draw slots
    # are clipped to group sizes)
    adj_pack_u = _adj_pack_np(core["col"], core["ety"], core["eid"],
                              core["w"])
    sample_pack_u = _sample_pack_np(gp_full, gprob, galias, adj_pack_u)
    gws32 = gws.astype(np.float32)

    out = dict(
        node_type=padn(own_node_type, -1),
        node_w=padn(own_node_w),
        group_ptr=gp32,
        adj_dst=adj_dst_p,
        adj_type=adj_type_p,
        adj_w=adj_w_p,
        adj_w_cumsum=pade(cw, last),
        adj_eid=adj_eid_p,
        group_w_sum=gws32.reshape(n_max, ET),
        adj_prob=adj_prob_p,
        adj_alias=adj_alias_p,
        group_pack=np.stack([gp32[:-1], gp32[1:]], axis=1),
        adj_pack=pade(adj_pack_u, -1),
        sample_pack=pade(sample_pack_u),
        fan_pack=build_fan_pack(gp_full, core["col"], gprob, galias,
                                gws32),
        node_alias=alias_dict(na),
        edge_alias=alias_dict(ea),
        dense_nf={k: padn(v) for k, v in dense_nf_own.items()},
        sparse_nf={k: (padn(ids, -1), padn(ln))
                   for k, (ids, ln) in sparse_nf_own.items()},
        dense_ef={k: pade(v) for k, v in dense_ef_local.items()},
        sparse_ef={k: (pade(ids, -1), pade(ln))
                   for k, (ids, ln) in sparse_ef_local.items()},
        binary_hash_nf={k: padn(v) for k, v in binary_hash_own.items()},
        eid_sorted=pade(core["eid"][eorder], np.iinfo(np.int32).max),
        eid_slot=pade(eorder),
    )
    # union fan rows ("fanu"): one 128-lane row per LOCAL node over the
    # union of edge types, lanes packing (etype << FANU_SHIFT) | dst
    # (GLOBAL neighbor ids) — multi-type typed draws under the mesh cost
    # one row gather, like the single-chip path (ops/alias.py FANU_*)
    from euler_tpu.ops.alias import FANU_MAX_TYPES, FANU_SHIFT
    if 2 <= ET <= FANU_MAX_TYPES and meta.n_nodes < (1 << FANU_SHIFT):
        node_ptr = gp_full[::ET].astype(np.int64)
        packed = ((core["ety"].astype(np.int32) << FANU_SHIFT)
                  | core["col"])
        prob_u, alias_u = build_group_alias(node_ptr, core["w"])
        wsum_u = gws.astype(np.float32).reshape(n_max, ET).sum(axis=1)
        out.update(
            fanu_pack=build_fan_pack(node_ptr, packed, prob_u, alias_u,
                                     wsum_u),
            fanu_ptr=node_ptr.astype(np.int32),
            fanu_prob=pade(prob_u, 1.0),
            fanu_alias=pade(alias_u))
    return out


def _pad_in_fields(meta: GraphMeta, core, n_max, ie_max):
    """One shard's padded in-CSR fields (dst-partitioned). ``core['gp']``
    already spans the padded n_max*ET groups (built with n_max rows)."""
    ET = meta.num_edge_types
    m = len(core["col"])

    def pade(a, fill=0):
        out = np.full((ie_max,) + a.shape[1:], fill, a.dtype)
        out[:m] = a
        return out

    gp = core["gp"].astype(np.int32)
    seg = np.repeat(np.arange(len(gp) - 1), np.diff(gp))
    gws = np.zeros(n_max * ET, np.float64)
    np.add.at(gws, seg, core["w"].astype(np.float64))
    iprob, ialias = build_group_alias(gp.astype(np.int64), core["w"])
    return dict(
        in_group_ptr=gp,
        in_adj_src=pade(core["col"].astype(np.int32), -1),
        in_adj_w=pade(core["w"].astype(np.float32)),
        in_adj_eid=pade(core["eid"].astype(np.int32), -1),
        in_group_w_sum=gws.astype(np.float32).reshape(n_max, ET),
        in_adj_prob=pade(iprob.astype(np.float32), 1.0),
        in_adj_alias=pade(ialias.astype(np.int32)),
    )


def assemble_sharded(meta: GraphMeta, S: int, fields_by_shard,
                     shard_node_w, shard_edge_w,
                     mesh=None, graph_members=None) -> ShardedGraphTensors:
    """Stack per-shard field pytrees into a ShardedGraphTensors.

    ``mesh=None``: host numpy stack (single process holds every shard).
    With a mesh: assemble DISTRIBUTED arrays via
    ``jax.make_array_from_callback`` — each process supplies only the
    shards its local devices own (``fields_by_shard`` may hold just those),
    so no host ever materializes the full graph (the per-host loading the
    reference gets from per-shard servers, grpc_server.h:38).
    """
    example = fields_by_shard[sorted(fields_by_shard)[0]]
    flat0, treedef = jax.tree_util.tree_flatten(example)
    flat_by_shard = {
        s: jax.tree_util.tree_flatten(f)[0]
        for s, f in fields_by_shard.items()}

    if mesh is None:
        missing = [s for s in range(S) if s not in fields_by_shard]
        if missing:
            raise ValueError(f"mesh=None needs every shard; missing "
                             f"{missing}")
        glob = [jnp.asarray(np.stack([flat_by_shard[s][i]
                                      for s in range(S)]))
                for i in range(len(flat0))]
        node_w_tab = jnp.asarray(shard_node_w)
        edge_w_tab = jnp.asarray(shard_edge_w)
    else:
        sharding = NamedSharding(mesh, P("graph"))

        def make(i, leaf):
            shape = (S,) + leaf.shape

            def cb(idx):
                s = idx[0].start if idx[0].start is not None else 0
                return flat_by_shard[s][i][None]

            return jax.make_array_from_callback(shape, sharding, cb)

        glob = [make(i, leaf) for i, leaf in enumerate(flat0)]
        rep = NamedSharding(mesh, P())
        node_w_tab = jax.make_array_from_callback(
            shard_node_w.shape, rep, lambda idx: shard_node_w[idx])
        edge_w_tab = jax.make_array_from_callback(
            shard_edge_w.shape, rep, lambda idx: shard_edge_w[idx])

    fields = jax.tree_util.tree_unflatten(treedef, glob)
    fields["node_alias"] = AliasTables(**fields["node_alias"])
    fields["edge_alias"] = AliasTables(**fields["edge_alias"])
    if graph_members is not None:
        if mesh is None:
            fields["graph_members"] = jnp.asarray(graph_members)
        else:
            rep = NamedSharding(mesh, P())
            fields["graph_members"] = jax.make_array_from_callback(
                graph_members.shape, rep, lambda idx: graph_members[idx])
    return ShardedGraphTensors(
        meta=meta, num_shards=S, shard_node_w=node_w_tab,
        shard_edge_w=edge_w_tab, **fields)


def build_sharded(graph: Graph, num_shards: int) -> ShardedGraphTensors:
    """Partition a loaded Graph into stacked per-shard arrays (host).

    Single-process path (re-partitions an already-loaded graph); for
    multi-host per-partition loading see
    euler_tpu.parallel.distributed.load_graph_sharded.
    """
    meta = graph.meta
    S, N, ET, NT = num_shards, meta.n_nodes, meta.num_edge_types, \
        meta.num_node_types
    g = graph.tensors
    n_max = -(-N // S)

    node_type = np.asarray(g.node_type)
    node_w = np.asarray(g.node_w)
    adj_src = np.asarray(g.adj_src)
    adj_dst = np.asarray(g.adj_dst)
    adj_type = np.asarray(g.adj_type)
    adj_w = np.asarray(g.adj_w)
    adj_eid = np.asarray(g.adj_eid)

    shard_node_w = np.zeros((S, NT), np.float32)
    shard_edge_w = np.zeros((S, ET), np.float32)

    # one-pass partition: node v lives on shard v % S, so edge ownership is
    # a modulo, not a membership test (the reference's
    # (id % partition_number) % shard_num routing, id_split_op.cc:46-48)
    edge_shard = adj_src % S

    cores, owns = [], []
    e_max = 1
    for s in range(S):
        own = np.where(np.arange(N) % S == s)[0]
        esel = edge_shard == s
        core = _build_shard_core(
            meta, node_type[own], node_w[own], adj_src[esel] // S,
            adj_dst[esel], adj_type[esel], adj_w[esel], adj_eid[esel])
        cores.append(core)
        owns.append(own)
        e_max = max(e_max, core["m_local"])
        shard_node_w[s] = core["node_w_row"]
        shard_edge_w[s] = core["edge_w_row"]

    # in-CSR shards (dst-partitioned): built when the source graph carries
    # the in-adjacency, so the in-neighbor verbs work under the mesh
    in_cores = None
    ie_max = 1
    if getattr(g, "in_group_ptr", None) is not None:
        in_cores = []
        in_shard = adj_dst % S
        for s in range(S):
            isel = in_shard == s
            (igp, icol, iw, _icum, ieid, _perm) = _convert.build_csr(
                n_max, ET, np.ascontiguousarray(adj_dst[isel] // S,
                                                np.int32),
                adj_src[isel].astype(np.int32), adj_type[isel],
                adj_w[isel], adj_eid[isel])
            in_cores.append(dict(gp=igp, col=icol, w=iw, eid=ieid))
            ie_max = max(ie_max, len(icol))

    fields_by_shard = {}
    for s in range(S):
        own, core = owns[s], cores[s]
        orig_rows = core["eid"]           # global edge rows, CSR slot order
        fields_by_shard[s] = _pad_shard_fields(
            meta, core, n_max, e_max, node_type[own], node_w[own],
            {k: np.asarray(v)[own] for k, v in g.dense_nf.items()},
            {k: (np.asarray(ids)[own], np.asarray(ln)[own])
             for k, (ids, ln) in g.sparse_nf.items()},
            {k: np.asarray(v)[own] for k, v in g.binary_hash_nf.items()},
            {k: np.asarray(v)[orig_rows] for k, v in g.dense_ef.items()},
            {k: (np.asarray(ids)[orig_rows], np.asarray(ln)[orig_rows])
             for k, (ids, ln) in g.sparse_ef.items()})
        if in_cores is not None:
            fields_by_shard[s].update(_pad_in_fields(
                meta, in_cores[s], n_max, ie_max))

    gm = getattr(g, "graph_members", None)
    return assemble_sharded(meta, S, fields_by_shard, shard_node_w,
                            shard_edge_w,
                            graph_members=None if gm is None
                            else np.asarray(gm))


def shard_specs(sg: ShardedGraphTensors):
    """PartitionSpecs: per-shard arrays split over 'graph'; the per-shard
    weight-sum tables (and the graph-label membership table) are
    replicated (they drive proportional root sampling / graph-batch
    assembly on every device, query_proxy.cc:93-145)."""
    specs = jax.tree_util.tree_map(lambda _: P("graph"), sg)
    rep = dict(shard_node_w=P(), shard_edge_w=P())
    if sg.graph_members is not None:
        rep["graph_members"] = P()
    return specs.replace(**rep)


def to_view(sg_block: "ShardedGraphTensors", axis: str) -> ShardView:
    """Strip the (local) leading shard dim inside shard_map."""
    sq = lambda a: a[0]
    return ShardView(
        meta=sg_block.meta, axis=axis, num_shards=sg_block.num_shards,
        node_type=sq(sg_block.node_type), node_w=sq(sg_block.node_w),
        group_ptr=sq(sg_block.group_ptr), adj_dst=sq(sg_block.adj_dst),
        adj_type=sq(sg_block.adj_type), adj_w=sq(sg_block.adj_w),
        adj_w_cumsum=sq(sg_block.adj_w_cumsum),
        adj_eid=sq(sg_block.adj_eid), group_w_sum=sq(sg_block.group_w_sum),
        adj_prob=sq(sg_block.adj_prob), adj_alias=sq(sg_block.adj_alias),
        node_alias=AliasTables(*[sq(x) for x in (
            sg_block.node_alias.ids, sg_block.node_alias.type_ptr,
            sg_block.node_alias.prob, sg_block.node_alias.alias,
            sg_block.node_alias.w_sum)]),
        edge_alias=AliasTables(*[sq(x) for x in (
            sg_block.edge_alias.ids, sg_block.edge_alias.type_ptr,
            sg_block.edge_alias.prob, sg_block.edge_alias.alias,
            sg_block.edge_alias.w_sum)]),
        dense_nf={k: sq(v) for k, v in sg_block.dense_nf.items()},
        sparse_nf={k: (sq(a), sq(b))
                   for k, (a, b) in sg_block.sparse_nf.items()},
        dense_ef={k: sq(v) for k, v in sg_block.dense_ef.items()},
        sparse_ef={k: (sq(a), sq(b))
                   for k, (a, b) in sg_block.sparse_ef.items()},
        binary_hash_nf={k: sq(v)
                        for k, v in sg_block.binary_hash_nf.items()},
        eid_sorted=sq(sg_block.eid_sorted),
        eid_slot=sq(sg_block.eid_slot),
        # replicated tables keep their full [S, ...] shape
        shard_node_w=sg_block.shard_node_w,
        shard_edge_w=sg_block.shard_edge_w,
        group_pack=None if sg_block.group_pack is None
        else sq(sg_block.group_pack),
        adj_pack=None if sg_block.adj_pack is None
        else sq(sg_block.adj_pack),
        sample_pack=None if sg_block.sample_pack is None
        else sq(sg_block.sample_pack),
        fan_pack=None if sg_block.fan_pack is None
        else sq(sg_block.fan_pack),
        fanu_pack=None if sg_block.fanu_pack is None
        else sq(sg_block.fanu_pack),
        fanu_ptr=None if sg_block.fanu_ptr is None
        else sq(sg_block.fanu_ptr),
        fanu_prob=None if sg_block.fanu_prob is None
        else sq(sg_block.fanu_prob),
        fanu_alias=None if sg_block.fanu_alias is None
        else sq(sg_block.fanu_alias),
        in_group_ptr=None if sg_block.in_group_ptr is None
        else sq(sg_block.in_group_ptr),
        in_adj_src=None if sg_block.in_adj_src is None
        else sq(sg_block.in_adj_src),
        in_adj_w=None if sg_block.in_adj_w is None
        else sq(sg_block.in_adj_w),
        in_adj_eid=None if sg_block.in_adj_eid is None
        else sq(sg_block.in_adj_eid),
        in_group_w_sum=None if sg_block.in_group_w_sum is None
        else sq(sg_block.in_group_w_sum),
        in_adj_prob=None if sg_block.in_adj_prob is None
        else sq(sg_block.in_adj_prob),
        in_adj_alias=None if sg_block.in_adj_alias is None
        else sq(sg_block.in_adj_alias),
        # replicated: keeps its full shape
        graph_members=sg_block.graph_members,
    )


# ---------------------------------------------------------------------------
# sharded op implementations (called from euler_tpu.ops dispatch)
# ---------------------------------------------------------------------------

def _psum(x, axis):
    from euler_tpu.parallel import comms
    return comms.psum(x, axis)


def _spread(view: ShardView, nodes: Array):
    """all_gather the group's query ids: every shard must see every root to
    answer for the ones it owns (the ID_SPLIT fan-out of the reference,
    id_split_op.cc, as one collective). Returns [S*b, ...]."""
    from euler_tpu.parallel import comms
    g = comms.all_gather(nodes, view.axis, axis=0)
    return g.reshape((-1,) + nodes.shape[1:])


def _take_mine(view: ShardView, res: Array, b: int):
    """Slice this device's chunk back out after the psum merge."""
    start = view.my_shard * b
    return jax.lax.dynamic_slice_in_dim(res, start, b, axis=0)


def _combine_ids(owned, local_ids, axis, default=-1):
    """Merge per-shard id results into a REPLICATED array (every shard
    gets the whole thing — root sampling etc.)."""
    return _psum(jnp.where(owned, local_ids - default, 0), axis) + default


def _combine(owned, vals, axis):
    return _psum(jnp.where(owned, vals, 0), axis)


def _owner_to_mine(view: ShardView, vals: Array, b: int):
    """[S*b, ...] per-owner partial answers (0 where not owned) -> this
    shard's combined [b, ...] rows.

    One tiled all_to_all: chunk j of my answers travels to shard j only,
    then the owner contributions for MY rows are summed locally (each row
    has exactly one owner). Replaces psum-over-[S*b,...] + dynamic-slice
    — the all-reduce moved ~2x the payload and materialized every
    shard's results everywhere (the reference routes replies only to the
    querying client, remote_op.cc:60-146 + the *_MERGE kernels)."""
    from euler_tpu.parallel import comms
    ex = comms.all_to_all(vals, view.axis, split_axis=0, concat_axis=0,
                          tiled=True)
    return ex.reshape((view.num_shards, b) + vals.shape[1:]).sum(axis=0)


def _route_ids(view, owned, local_ids, b, default=-1):
    z = jnp.where(owned, local_ids - default, 0)
    return _owner_to_mine(view, z, b) + default


def _route_vals(view, owned, vals, b):
    return _owner_to_mine(view, jnp.where(owned, vals, 0), b)


def _own_rows(view: ShardView, nodes: Array):
    S = view.num_shards
    owned = (nodes >= 0) & (nodes % S == view.my_shard)
    rows = jnp.clip(nodes // S, 0, view.node_type.shape[0] - 1)
    return owned, rows


def _group_bounds_local(view: ShardView, rows, etype):
    ET = view.meta.num_edge_types
    gidx = rows * ET + etype
    if view.group_pack is not None:
        gp = view.group_pack[gidx]       # one packed row read, not two
        return gp[..., 0], gp[..., 1]
    return view.group_ptr[gidx], view.group_ptr[gidx + 1]


def sample_neighbor_sharded(view: ShardView, key, nodes, ets, count,
                            default_id=-1):
    """Full-payload sharded neighbor sampling; owner-compute compaction
    (see _owner_cap) keeps per-shard pack gathers O(b) when active."""
    nodes = jnp.asarray(nodes, jnp.int32)
    b = nodes.shape[0]
    S = view.num_shards
    cap = _owner_cap(b, S, sampler=True)
    if cap is not None:
        # compact request routing: per-owner distinct-id tables ride
        # the wire, owners answer locally, answers route back —
        # duplicate roots share one draw set (see _request_route)
        def answer(flat_ids):
            nbr, w, ty, eid, ok = _sample_neighbor_local(
                view, key, flat_ids, ets, count, default_id)
            return (jnp.where(ok, nbr, default_id),
                    jnp.where(ok, w, 0.0),
                    jnp.where(ok, ty, -1),
                    jnp.where(ok, eid, -1))

        (nbr, w, ty, eid), _served = _request_route(
            view, nodes, answer,
            fills=(jnp.int32(default_id), jnp.float32(0),
                   jnp.int32(-1), jnp.int32(-1)))
        return nbr, w, ty, eid
    spread = _spread(view, nodes)

    owned, _ = _own_rows(view, spread)
    nbr, w, ty, eid, ok = _sample_neighbor_local(
        view, key, spread, ets, count, default_id)
    ok = ok & owned[:, None]
    nbr = jnp.where(ok, nbr, default_id)
    w = jnp.where(ok, w, 0.0)
    ty = jnp.where(ok, ty, -1)
    eid = jnp.where(ok, eid, -1)
    own_any = owned[:, None]
    return (_route_ids(view, own_any, nbr, b, default_id),
            _route_vals(view, own_any, w, b),
            _route_ids(view, own_any, ty, b, -1),
            _route_ids(view, own_any, eid, b, -1))


def _sample_neighbor_local(view: ShardView, key, nodes, ets, count,
                           default_id):
    """Per-shard payload draws for LOCAL-OWNED global ids (no
    collectives): (nbr, w, ty, eid, ok)."""
    B = nodes.shape[0]
    rows = jnp.clip(jnp.maximum(nodes, 0) // view.num_shards, 0,
                    view.node_type.shape[0] - 1)
    kt, kd = jax.random.split(key)

    et_arr = jnp.asarray(ets, jnp.int32)
    W = view.group_w_sum[rows][:, et_arr]
    cdf = jnp.cumsum(W, axis=1)
    total = cdf[:, -1]
    r = jax.random.uniform(kt, (B, count)) * total[:, None]
    t_idx = jnp.sum(r[:, :, None] >= cdf[:, None, :], axis=-1)
    t_idx = jnp.minimum(t_idx, len(ets) - 1)
    etype = et_arr[t_idx]

    lo, hi = _group_bounds_local(view, rows[:, None], etype)
    if view.sample_pack is not None:
        # fused pre-resolved alias rows: ONE random row read per draw
        # (the single-chip sample_pack path, ops/sampling.sample_neighbor)
        size = hi - lo
        k1, k2 = jax.random.split(kd)
        u1 = jax.random.uniform(k1, (B, count))
        u2 = jax.random.uniform(k2, (B, count))
        slot = jnp.minimum((u1 * size).astype(jnp.int32),
                           jnp.maximum(size - 1, 0))
        row = view.sample_pack[jnp.clip(lo + slot, 0,
                                        view.sample_pack.shape[0] - 1)]
        prob = jax.lax.bitcast_convert_type(row[..., 0], jnp.float32)
        sel = jnp.where((u2 < prob)[..., None], row[..., 1:5], row[..., 5:9])
        ok = (nodes >= 0)[:, None] & (size > 0) & (total > 0)[:, None]
        nbr = jnp.where(ok, sel[..., 0], default_id)
        ty = jnp.where(ok, sel[..., 1], -1)
        eid = jnp.where(ok, sel[..., 2], -1)
        w = jnp.where(ok, jax.lax.bitcast_convert_type(sel[..., 3],
                                                       jnp.float32), 0.0)
    else:
        # O(1) per-group alias draw (see ops/sampling._weighted_group_draw)
        slot = alias_draw(kd, view.adj_prob, view.adj_alias, lo, hi - lo,
                          (B, count))
        slot = jnp.maximum(slot, 0)
        ok = (nodes >= 0)[:, None] & (hi > lo) & (total > 0)[:, None]
        s = jnp.clip(slot, 0, view.adj_dst.shape[0] - 1)
        nbr = jnp.where(ok, view.adj_dst[s], default_id)
        w = jnp.where(ok, view.adj_w[s], 0.0)
        ty = jnp.where(ok, view.adj_type[s], -1)
        eid = jnp.where(ok, view.adj_eid[s], -1)

    return nbr, w, ty, eid, ok


# --- owner-compute gating (VERDICT r3 #4: per-shard gather count must
# not scale with S). When enabled, verbs use COMPACT REQUEST ROUTING
# (_request_route): per-owner distinct-id tables ride the wire instead
# of dense [S*b] spreads, so both per-shard work AND per-device ICI are
# O(b), independent of S. Rows past the static per-owner capacity
# degrade to explicit invalid padding (never garbage). Auto-gated:
# small batches (b < OWNER_COMPUTE_MIN * S) keep the exact full-spread
# path, where worst-case skew cannot overflow.
OWNER_COMPUTE_SLACK = 4
OWNER_ROUTE_SLACK = 2         # request-table slack over the b/S mean
OWNER_COMPUTE_MIN = 16
_owner_compute_force = None   # tests: True/False override


def set_owner_compute(flag):
    global _owner_compute_force
    _owner_compute_force = flag


def _owner_cap(b, S, sampler: bool = False):
    """Capacity marker for the request-routed path (a positive int), or
    None for the exact full-spread path.

    Feature-like verbs (deterministic answers) route compactly whenever
    there are >= 2 shards — deduplication cannot change their results.
    SAMPLERS only switch in the large-S regime (S > OWNER_COMPUTE_SLACK)
    where the O(S*b) spread is unaffordable: under request routing,
    duplicate ids within one member's batch share a draw set (exact
    marginals, correlated within the batch), which small-S exact paths
    avoid."""
    if _owner_compute_force is False:
        return None
    cap = min(OWNER_COMPUTE_SLACK * b, S * b)
    if _owner_compute_force:
        return cap
    if b < OWNER_COMPUTE_MIN * S:
        return None
    if S < 2 or (sampler and S <= OWNER_COMPUTE_SLACK):
        return None
    return cap


def _request_route(view: ShardView, ids, answer_fn, fills,
                   key=None):
    """Owner-compute with COMPACT request routing (zero scatters).

    The dense owner-routing (_spread + _owner_to_mine) moves [S*b, W]
    values through the all_to_all, (S-1)/S of them structural zeros —
    1.8 GB/step/device for the bench feature fetch at S=4
    (tools/scaling_bench.py ICI accounting, r5). This replaces it for
    the owner-compute verbs with the reference's actual architecture
    (route REQUESTS to owners, id_split_op.cc:46-48) in static shapes:

      1. sort my b query ids by (owner, id); dedup; rank distinct ids
         per owner (duplicates share their representative's rank)
      2. all_to_all the per-owner distinct-id request tables
         [S, cap_out] (cap_out = SLACK*b/S — per-device ICI is now
         INDEPENDENT of S)
      3. each owner answers its received [S, cap_out] ids locally
         (``answer_fn(flat_ids) -> tuple of [S*cap_out, ...] arrays``)
      4. all_to_all the answers back; every query row gathers its
         answer at (owner, rank) — both sides derive the same ranking
         independently, so no positions ride the wire

    Everything is argsort/searchsorted/gather — no XLA scatter (serialized
    on TPU, micro_spmm.py) anywhere. Rows whose (owner, rank) overflows
    cap_out degrade to explicit fills, like the owner-compute buffer.
    Returns (outputs tuple matching fills, served [b] bool).
    """
    from euler_tpu.parallel import comms
    S = view.num_shards
    ids = jnp.asarray(ids, jnp.int32)
    b = ids.shape[0]
    # an owner holds at most n_local distinct ids, so the request table
    # never needs more rows than that — for small graphs this caps the
    # exchange at O(N/S) rows regardless of batch; for huge graphs the
    # ROUTE_SLACK*b/S bound keeps it O(b) with 2x skew headroom
    n_local = view.node_type.shape[0]
    cap_out = max(1, min(b, -(-OWNER_ROUTE_SLACK * b // S), n_local))
    valid = ids >= 0
    owner = jnp.where(valid, ids % S, S)
    IMAX = jnp.iinfo(jnp.int32).max
    # lexicographic (owner, id) order via two STABLE sorts (x64 is off;
    # a fused 64-bit key would silently truncate)
    order1 = jnp.argsort(jnp.where(valid, ids, IMAX), stable=True)
    order = order1[jnp.argsort(owner[order1], stable=True)]
    inv = jnp.argsort(order)                      # double argsort = inverse
    own_s = owner[order]
    ids_s = ids[order]
    ok_s = ids_s >= 0
    is_new = ok_s & jnp.concatenate(
        [jnp.ones((1,), bool),
         (own_s[1:] != own_s[:-1]) | (ids_s[1:] != ids_s[:-1])])
    grank = jnp.cumsum(is_new.astype(jnp.int32)) - 1   # dups share rank
    pos0 = jnp.searchsorted(own_s, jnp.arange(S, dtype=own_s.dtype),
                            side="left").astype(jnp.int32)
    base = grank[jnp.clip(pos0, 0, b - 1)]
    crank = grank - base[jnp.clip(own_s, 0, S - 1)]    # rank within owner
    # request table req[o, c] = the distinct id with (owner o, rank c):
    # binary search over the (owner, rank) keys, which are sorted and
    # fit int32 (owner*(b+1)+rank <= S*(b+1)+b)
    kq = jnp.where(ok_s, own_s * (b + 1) + jnp.clip(crank, 0, b), IMAX)
    want = (jnp.arange(S, dtype=jnp.int32)[:, None] * (b + 1)
            + jnp.arange(cap_out, dtype=jnp.int32)[None, :])
    p = jnp.searchsorted(kq, want.reshape(-1), side="left")
    p = jnp.clip(p, 0, b - 1).astype(jnp.int32)
    hit = kq[p] == want.reshape(-1)
    req = jnp.where(hit, ids_s[p], -1).reshape(S, cap_out)

    reqs = comms.all_to_all(req, view.axis, split_axis=0, concat_axis=0,
                            tiled=True).reshape(S, cap_out)
    answers = answer_fn(reqs.reshape(-1))         # tuple of [S*cap_out,...]
    outs = []
    for a, fill in zip(answers, fills):
        a = a.reshape((S, cap_out) + a.shape[1:])
        back = comms.all_to_all(a, view.axis, split_axis=0,
                                concat_axis=0, tiled=True)
        back = back.reshape((S, cap_out) + a.shape[2:])
        # my row i -> (owner[i], crank at its sorted position)
        c_i = crank[inv]
        served = valid & (c_i < cap_out)
        o_i = jnp.clip(owner, 0, S - 1)
        got = back[o_i, jnp.clip(c_i, 0, cap_out - 1)]
        ok_shape = (b,) + (1,) * (got.ndim - 1)
        outs.append(jnp.where(served.reshape(ok_shape), got, fill))
    c_i = crank[inv]
    return tuple(outs), valid & (c_i < cap_out)


def sample_neighbor_fast_sharded(view: ShardView, key, nodes, ets, count,
                                 default_id=-1, return_types=False):
    """Ids-only sampling over the per-shard packed fan rows — the sharded
    mirror of ops.sampling.sample_neighbor_fast: each owner serves every
    draw for a root from ONE 128-lane fan-row gather, then only the drawn
    ids ride the combine collective. Returns (ids [b, count], valid).

    With owner-compute active (see _owner_cap) the pack gathers run on a
    compacted [cap]-row buffer instead of all S*b spread rows, so
    per-shard work is O(b), independent of the shard count
    (reference: SURVEY §2.5 bucket-by-owner plan, id_split_op.cc:46-48).
    """
    nodes = jnp.asarray(nodes, jnp.int32)
    b = nodes.shape[0]
    S = view.num_shards
    cap = _owner_cap(b, S, sampler=True)
    if cap is not None:
        def answer(flat_ids):
            out = _fan_draw_local(view, key, flat_ids, ets, count,
                                  default_id, return_types=return_types)
            ids_c, ok_c = out[0], out[1]
            res = (jnp.where(ok_c, ids_c, default_id),
                   ok_c.astype(jnp.int8))
            if return_types:
                res += (jnp.where(ok_c, out[2], -1),)
            return res

        fills = (jnp.int32(default_id), jnp.int8(0))
        if return_types:
            fills += (jnp.int32(-1),)
        outs, served = _request_route(view, nodes, answer, fills=fills)
        valid = (outs[1] > 0) & served[:, None]
        ids = jnp.where(valid, outs[0], default_id)
        if return_types:
            return ids, valid, jnp.where(valid, outs[2], -1)
        return ids, valid

    spread = _spread(view, nodes)
    owned, _ = _own_rows(view, spread)
    out = _fan_draw_local(view, key, spread, ets, count, default_id,
                          return_types=return_types)
    ids_all, ok_all = out[0], out[1]
    ok_all = ok_all & owned[:, None]
    ids = _route_ids(view, owned[:, None],
                     jnp.where(ok_all, ids_all, default_id), b,
                     default_id)
    valid = _route_vals(view, owned[:, None], ok_all.astype(jnp.int32),
                        b) > 0
    ids = jnp.where(valid, ids, default_id)
    if return_types:
        ty = _route_ids(view, ok_all, jnp.where(ok_all, out[2], -1),
                        b, -1)
        return ids, valid, jnp.where(valid, ty, -1)
    return ids, valid


def _fan_draw_local(view: ShardView, key, nodes, ets, count, default_id,
                    return_types=False):
    """Per-shard fan-row draws for LOCAL-OWNED global ids (no
    collectives): (ids [B, count], ok[, types]). Rows with nodes < 0
    are invalid. Multi-type draws over ALL edge types prefer the UNION
    fan rows when the shard carries them (one row gather + lane decode,
    mirroring the single-chip fanu path).
    """
    B = nodes.shape[0]
    rows = jnp.clip(jnp.maximum(nodes, 0) // view.num_shards, 0,
                    view.node_type.shape[0] - 1)
    ET = view.meta.num_edge_types
    et_arr = jnp.asarray(ets, jnp.int32)
    K = len(ets)

    if view.fanu_pack is not None and K > 1 and \
            sorted(ets) == list(range(ET)):
        from euler_tpu.ops.alias import FANU_MASK, FANU_SHIFT
        packu = view.fanu_pack[rows]                      # [B, 128]
        deg_c = jnp.broadcast_to(packu[:, 0:1], (B, count))
        total = jax.lax.bitcast_convert_type(packu[:, 1], jnp.float32)
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (B, count))
        u2 = jax.random.uniform(k2, (B, count))
        slot = jnp.minimum((u1 * deg_c).astype(jnp.int32),
                           jnp.maximum(deg_c - 1, 0))
        oh = (slot[..., None] ==
              jnp.arange(FAN_D, dtype=jnp.int32)).astype(jnp.int32)
        pick = lambda off: jnp.einsum("bcd,bd->bc", oh,
                                      packu[:, off:off + FAN_D])
        prob = jax.lax.bitcast_convert_type(pick(FAN_PROB_OFF),
                                            jnp.float32)
        draw = jnp.where(u2 < prob, pick(FAN_KEPT_OFF),
                         pick(FAN_ALIAS_OFF))
        ok = (nodes >= 0)[:, None] & (deg_c > 0) & (total > 0)[:, None]
        ids = jnp.where(ok, draw & FANU_MASK, default_id)
        if return_types:
            return ids, ok, jnp.where(ok, draw >> FANU_SHIFT, -1)
        return ids, ok

    packs = view.fan_pack[rows[:, None] * ET + et_arr[None, :]]  # [B,K,128]
    deg = packs[..., 0]
    wsum = jax.lax.bitcast_convert_type(packs[..., 1], jnp.float32)
    prob_bank = packs[..., FAN_PROB_OFF:FAN_PROB_OFF + FAN_D]
    kept_bank = packs[..., FAN_KEPT_OFF:FAN_KEPT_OFF + FAN_D]
    alias_bank = packs[..., FAN_ALIAS_OFF:FAN_ALIAS_OFF + FAN_D]

    if K == 1:
        total = wsum[:, 0]
        deg_c = jnp.broadcast_to(deg[:, 0:1], (B, count))
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (B, count))
        u2 = jax.random.uniform(k2, (B, count))
        slot = jnp.minimum((u1 * deg_c).astype(jnp.int32),
                           jnp.maximum(deg_c - 1, 0))
        oh = (slot[..., None] ==
              jnp.arange(FAN_D, dtype=jnp.int32)).astype(jnp.int32)
        pick = lambda bank: jnp.einsum("bcd,bd->bc", oh, bank[:, 0, :])
    else:
        kt, kd = jax.random.split(key)
        cdf = jnp.cumsum(wsum, axis=1)
        total = cdf[:, -1]
        r = jax.random.uniform(kt, (B, count)) * total[:, None]
        kidx = jnp.minimum(
            jnp.sum(r[:, :, None] >= cdf[:, None, :], axis=-1), K - 1)
        ohk = (kidx[..., None] ==
               jnp.arange(K, dtype=jnp.int32)).astype(jnp.int32)
        deg_c = jnp.einsum("bck,bk->bc", ohk, deg)
        k1, k2 = jax.random.split(kd)
        u1 = jax.random.uniform(k1, (B, count))
        u2 = jax.random.uniform(k2, (B, count))
        slot = jnp.minimum((u1 * deg_c).astype(jnp.int32),
                           jnp.maximum(deg_c - 1, 0))
        ohs = (slot[..., None] ==
               jnp.arange(FAN_D, dtype=jnp.int32)).astype(jnp.int32)
        oh = ohk[:, :, :, None] * ohs[:, :, None, :]
        pick = lambda bank: jnp.einsum("bckd,bkd->bc", oh, bank)

    prob = jax.lax.bitcast_convert_type(pick(prob_bank), jnp.float32)
    ids = jnp.where(u2 < prob, pick(kept_bank), pick(alias_bank))
    ok = (nodes >= 0)[:, None] & (deg_c > 0) & (total > 0)[:, None]
    if return_types:
        ty = et_arr[kidx] if K > 1 else jnp.broadcast_to(
            et_arr[0], ids.shape)
        return (jnp.where(ok, ids, default_id), ok,
                jnp.where(ok, ty, -1))
    return jnp.where(ok, ids, default_id), ok


def get_dense_feature_sharded(view: ShardView, nodes, names):
    """Owner-served dense feature rows. With owner-compute active the
    (dominant) [*, d] table gathers run on the compacted owned-row
    buffer, O(b) per shard instead of O(S*b)."""
    nodes = jnp.asarray(nodes, jnp.int32)
    shape_in = nodes.shape
    flat_in = nodes.reshape(-1)
    b = flat_in.shape[0]
    S = view.num_shards
    cap = _owner_cap(b, S)
    out = []
    if cap is not None:
        def answer(flat_ids):
            crow = jnp.clip(jnp.maximum(flat_ids, 0) // S, 0,
                            view.node_type.shape[0] - 1)
            return tuple(
                jnp.where((flat_ids >= 0)[:, None],
                          view.dense_nf[n][crow], 0)
                for n in names)

        outs, _served = _request_route(view, flat_in, answer,
                                       fills=(0,) * len(names))
        return [v.reshape(shape_in + (view.dense_nf[n].shape[-1],))
                for n, v in zip(names, outs)]
    flat_all = _spread(view, flat_in)
    owned, rows = _own_rows(view, flat_all)
    for n in names:
        tab = view.dense_nf[n]
        v = jnp.where(owned[:, None], tab[rows], 0.0)
        v = _owner_to_mine(view, v, b)
        out.append(v.reshape(shape_in + (tab.shape[-1],)))
    return out


def get_sparse_feature_sharded(view: ShardView, nodes, names):
    nodes = jnp.asarray(nodes, jnp.int32)
    shape_in = nodes.shape
    flat_in = nodes.reshape(-1)
    b = flat_in.shape[0]
    S = view.num_shards
    cap = _owner_cap(b, S)
    out = []
    if cap is not None:
        def answer(flat_ids):
            crow = jnp.clip(jnp.maximum(flat_ids, 0) // S, 0,
                            view.node_type.shape[0] - 1)
            return tuple(
                jnp.where((flat_ids >= 0)[:, None],
                          view.sparse_nf[n][0][crow], -1)
                for n in names)

        outs, _served = _request_route(view, flat_in, answer,
                                       fills=(jnp.int32(-1),) * len(names))
        for n, ids in zip(names, outs):
            ids = ids.reshape(shape_in + (view.sparse_nf[n][0].shape[-1],))
            out.append((ids, ids >= 0))
        return out
    flat_all = _spread(view, flat_in)
    owned, rows = _own_rows(view, flat_all)
    for n in names:
        tab, _ = view.sparse_nf[n]
        ids = jnp.where(owned[:, None], tab[rows] + 1, 0)
        ids = _owner_to_mine(view, ids, b) - 1
        ids = ids.reshape(shape_in + (tab.shape[-1],))
        out.append((ids, ids >= 0))
    return out


def get_node_type_sharded(view: ShardView, nodes):
    nodes = jnp.asarray(nodes, jnp.int32)
    shape_in = nodes.shape
    flat_in = nodes.reshape(-1)
    b = flat_in.shape[0]
    S = view.num_shards
    cap = _owner_cap(b, S)
    if cap is not None:
        def answer(flat_ids):
            crow = jnp.clip(jnp.maximum(flat_ids, 0) // S, 0,
                            view.node_type.shape[0] - 1)
            return (jnp.where(flat_ids >= 0,
                              view.node_type[crow], -1),)

        (ty,), _served = _request_route(view, flat_in, answer,
                                        fills=(jnp.int32(-1),))
        return ty.reshape(shape_in)
    flat_all = _spread(view, flat_in)
    owned, rows = _own_rows(view, flat_all)
    ty = jnp.where(owned, view.node_type[rows] + 1, 0)
    return (_owner_to_mine(view, ty, b) - 1).reshape(shape_in)


def _sync_key(view: ShardView, key):
    """Graph-group-uniform PRNG key.

    The shard-choice ops (global node/edge sampling) are cooperative:
    every member of a graph group must draw the SAME shard_choice or the
    masked psum merge sums contributions from several claimed owners
    (garbage ids). Callers inside shard_map often hold per-device keys
    (e.g. a model's "sample" rng folded per member), so these ops
    synchronize on member 0's key themselves rather than relying on
    caller discipline."""
    from euler_tpu.parallel import comms
    return comms.all_gather(key, view.axis)[0]


def sample_node_sharded(view: ShardView, key, count, node_type=-1):
    """Proportional cross-shard root sampling
    (reference: query_proxy.cc:93-145)."""
    key = _sync_key(view, key)
    S = view.num_shards
    NT = view.meta.num_node_types
    if isinstance(node_type, str):
        node_type = view.meta.node_type_id(node_type)
    kt, ks, kd = jax.random.split(key, 3)
    if node_type == -1:
        w_type = view.shard_node_w.sum(axis=0)          # [NT] replicated
        cdf_t = jnp.cumsum(w_type)
        rt = jax.random.uniform(kt, (count,)) * cdf_t[-1]
        t = jnp.minimum(jnp.searchsorted(cdf_t, rt, side="right"),
                        NT - 1).astype(jnp.int32)
    else:
        t = jnp.full((count,), node_type, jnp.int32)
    w_shard = view.shard_node_w[:, t].T                 # [count, S]
    cdf_s = jnp.cumsum(w_shard, axis=1)
    rs = jax.random.uniform(ks, (count,)) * cdf_s[:, -1]
    shard_choice = jnp.sum(rs[:, None] >= cdf_s, axis=1)
    shard_choice = jnp.minimum(shard_choice, S - 1).astype(jnp.int32)

    # every shard draws with a shard-folded key; the chosen shard's draw wins
    na = view.node_alias
    kd = jax.random.fold_in(kd, view.my_shard)
    lo = na.type_ptr[t]
    size = na.type_ptr[t + 1] - lo
    pos = alias_draw(kd, na.prob, na.alias, lo, size, (count,))
    local = jnp.where(pos >= 0, na.ids[jnp.maximum(pos, 0)], -1)
    global_id = jnp.where(local >= 0,
                          local * S + view.my_shard, -1)
    mine = shard_choice == view.my_shard
    return _combine_ids(mine, global_id, view.axis, -1)


def sample_edge_sharded(view: ShardView, key, count, edge_type=-1):
    key = _sync_key(view, key)
    S = view.num_shards
    ET = view.meta.num_edge_types
    if isinstance(edge_type, str):
        edge_type = view.meta.edge_type_id(edge_type)
    kt, ks, kd = jax.random.split(key, 3)
    if edge_type == -1:
        w_type = view.shard_edge_w.sum(axis=0)
        cdf_t = jnp.cumsum(w_type)
        rt = jax.random.uniform(kt, (count,)) * cdf_t[-1]
        t = jnp.minimum(jnp.searchsorted(cdf_t, rt, side="right"),
                        ET - 1).astype(jnp.int32)
    else:
        t = jnp.full((count,), edge_type, jnp.int32)
    w_shard = view.shard_edge_w[:, t].T
    cdf_s = jnp.cumsum(w_shard, axis=1)
    rs = jax.random.uniform(ks, (count,)) * cdf_s[:, -1]
    shard_choice = jnp.minimum(jnp.sum(rs[:, None] >= cdf_s, axis=1),
                               S - 1).astype(jnp.int32)

    ea = view.edge_alias
    kd = jax.random.fold_in(kd, view.my_shard)
    lo = ea.type_ptr[t]
    size = ea.type_ptr[t + 1] - lo
    pos = alias_draw(kd, ea.prob, ea.alias, lo, size, (count,))
    slot = jnp.where(pos >= 0, ea.ids[jnp.maximum(pos, 0)], -1)
    sl = jnp.clip(slot, 0, view.adj_dst.shape[0] - 1)
    # recover global src: local row = group index // ET
    n_max = view.node_type.shape[0]
    row = jnp.searchsorted(view.group_ptr, sl, side="right") - 1
    src_local = row // ET
    src = jnp.where(slot >= 0, src_local * S + view.my_shard, -1)
    dst = jnp.where(slot >= 0, view.adj_dst[sl], -1)
    ty = jnp.where(slot >= 0, view.adj_type[sl], -1)
    eid = jnp.where(slot >= 0, view.adj_eid[sl], -1)
    mine = shard_choice == view.my_shard
    ax = view.axis
    return (_combine_ids(mine, src, ax, -1), _combine_ids(mine, dst, ax, -1),
            _combine_ids(mine, ty, ax, -1), _combine_ids(mine, eid, ax, -1))


def get_full_neighbor_sharded(view: ShardView, nodes, ets, cap,
                              default_id=-1, sorted_by_id=False,
                              offset=0):
    """Sharded GetFullNeighbor: spread roots, owner answers from its local
    CSR, psum-merge (reference: GET_NB_NODE split/merge, optimizer.h:49-86).
    ``offset`` windows the concatenated neighborhood like the single-chip
    verb.
    """
    nodes = jnp.asarray(nodes, jnp.int32)
    b = nodes.shape[0]
    alln = _spread(view, nodes)
    owned, rows = _own_rows(view, alln)
    B = alln.shape[0]
    ET = view.meta.num_edge_types
    et_arr = jnp.asarray(ets, jnp.int32)
    gidx = rows[:, None] * ET + et_arr[None, :]
    lo = view.group_ptr[gidx]
    hi = view.group_ptr[gidx + 1]
    deg = hi - lo
    offs = jnp.concatenate(
        [jnp.zeros((B, 1), deg.dtype), jnp.cumsum(deg, axis=1)], axis=1)
    total = offs[:, -1]
    j = offset + jnp.arange(cap, dtype=jnp.int32)
    k_idx = jnp.sum(j[None, :, None] >= offs[:, None, 1:], axis=-1)
    k_idx = jnp.minimum(k_idx, len(ets) - 1)
    base = jnp.take_along_axis(lo, k_idx, axis=1)
    off_k = jnp.take_along_axis(offs[:, :-1], k_idx, axis=1)
    slot = base + (j[None, :] - off_k)
    ok = (j[None, :] < total[:, None]) & (alln >= 0)[:, None] & \
        owned[:, None]
    s = jnp.clip(slot, 0, view.adj_dst.shape[0] - 1)
    nbr = jnp.where(ok, view.adj_dst[s], default_id)
    w = jnp.where(ok, view.adj_w[s], 0.0)
    ty = jnp.where(ok, view.adj_type[s], -1)
    eid = jnp.where(ok, view.adj_eid[s], -1)
    nbr = _route_ids(view, ok, nbr, b, default_id)
    w = _route_vals(view, ok, w, b)
    ty = _route_ids(view, ok, ty, b, -1)
    eid = _route_ids(view, ok, eid, b, -1)
    okg = _owner_to_mine(view, ok.astype(jnp.int32), b) > 0
    if sorted_by_id:
        sort_key = jnp.where(okg, nbr, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(sort_key, axis=1)
        take = lambda x: jnp.take_along_axis(x, order, axis=1)
        nbr, w, ty, eid, okg = (take(nbr), take(w), take(ty), take(eid),
                                take(okg))
    return nbr, w, ty, eid, okg


def sample_node_with_src_sharded(view: ShardView, key, src, count):
    """Same-type negative sampling under a mesh: resolve each src's type
    from its owner, then proportional shard choice + per-shard typed alias
    draw (query_proxy.cc:93-145 applied per row)."""
    key = _sync_key(view, key)
    src = jnp.asarray(src, jnp.int32).reshape(-1)
    b = src.shape[0]
    alln = _spread(view, src)
    owned, rows = _own_rows(view, alln)
    ax = view.axis
    t = _combine_ids(owned, jnp.where(owned, view.node_type[rows], -1),
                     ax, -1)                                   # [S*b]
    B = alln.shape[0]
    S = view.num_shards
    ks, kd = jax.random.split(key)
    ts = jnp.maximum(t, 0)
    w_shard = view.shard_node_w[:, ts].T                       # [B, S]
    cdf_s = jnp.cumsum(w_shard, axis=1)
    rs = jax.random.uniform(ks, (B, count)) * cdf_s[:, -1:]
    shard_choice = jnp.minimum(
        jnp.sum(rs[..., None] >= cdf_s[:, None, :], axis=-1),
        S - 1).astype(jnp.int32)
    na = view.node_alias
    kd = jax.random.fold_in(kd, view.my_shard)
    lo = na.type_ptr[ts][:, None]
    size = (na.type_ptr[ts + 1] - na.type_ptr[ts])[:, None]
    from euler_tpu.ops.alias import alias_draw as _ad
    pos = _ad(kd, na.prob, na.alias, lo, size, (B, count))
    local = jnp.where(pos >= 0, na.ids[jnp.maximum(pos, 0)], -1)
    gid = jnp.where(local >= 0, local * S + view.my_shard, -1)
    mine = (shard_choice == view.my_shard) & (t >= 0)[:, None]
    return _route_ids(view, mine, gid, b, -1)


def sparse_get_adj_sharded(view: ShardView, nodes, nb_nodes, ets):
    """Sharded bipartite adjacency: every shard answers the membership
    tests for the rows it owns against each querying device's nb list."""
    nodes = jnp.asarray(nodes, jnp.int32).reshape(-1)
    nb = jnp.asarray(nb_nodes, jnp.int32).reshape(-1)
    b, m = nodes.shape[0], nb.shape[0]
    S = view.num_shards
    alln = _spread(view, nodes)                    # [S*b]
    allnb = _spread(view, nb).reshape(S, m)
    owned, rows = _own_rows(view, alln)
    B = alln.shape[0]
    E = view.adj_dst.shape[0]
    ET = view.meta.num_edge_types
    # row i of the spread queries pairs with nb chunk i // b
    tgt = jnp.broadcast_to(allnb[:, None, :], (S, b, m)).reshape(B, m)
    conn = jnp.zeros((B, m), bool)
    w = jnp.zeros((B, m), jnp.float32)
    for et in ets:
        gidx = rows * ET + et
        lo = jnp.broadcast_to(view.group_ptr[gidx][:, None], (B, m))
        hi = jnp.broadcast_to(view.group_ptr[gidx + 1][:, None], (B, m))

        def body(_, carry):
            l, h = carry
            mid = (l + h) // 2
            v = view.adj_dst[jnp.clip(mid, 0, E - 1)]
            go_right = v < tgt
            return jnp.where(go_right, mid + 1, l), \
                jnp.where(go_right, h, mid)

        l, h = jax.lax.fori_loop(0, 32, body, (lo, hi))
        slot = jnp.clip(l, 0, E - 1)
        hit = (l < hi) & (view.adj_dst[slot] == tgt) & \
            (alln >= 0)[:, None] & (tgt >= 0) & owned[:, None]
        conn = conn | hit
        w = jnp.where(hit, view.adj_w[slot], w)
    conn_g = _owner_to_mine(view, conn.astype(jnp.int32), b) > 0
    w_g = _owner_to_mine(view, w, b)
    return conn_g, jnp.where(conn_g, w_g, 0.0)


def is_neighbor_sharded(view: ShardView, src, ets, cand):
    """Membership test cand in N_etype(src) under a mesh (walk.py biased
    node2vec step)."""
    src = jnp.asarray(src, jnp.int32).reshape(-1)
    cand = jnp.asarray(cand, jnp.int32).reshape(-1)
    b = src.shape[0]
    alls = _spread(view, src)
    allc = _spread(view, cand)
    owned, rows = _own_rows(view, alls)
    E = view.adj_dst.shape[0]
    ET = view.meta.num_edge_types
    found = jnp.zeros(alls.shape, bool)
    for et in ets:
        gidx = rows * ET + et
        lo, hi = view.group_ptr[gidx], view.group_ptr[gidx + 1]

        def body(_, carry):
            l, h = carry
            mid = (l + h) // 2
            v = view.adj_dst[jnp.clip(mid, 0, E - 1)]
            go_right = v < allc
            return jnp.where(go_right, mid + 1, l), \
                jnp.where(go_right, h, mid)

        l, h = jax.lax.fori_loop(0, 32, body, (lo, hi))
        slot = jnp.clip(l, 0, E - 1)
        hit = (l < hi) & (view.adj_dst[slot] == allc)
        found = found | hit
    found = found & owned & (alls >= 0) & (allc >= 0)
    return _owner_to_mine(view, found.astype(jnp.int32), b) > 0


def _eid_lookup_local(view: ShardView, eids):
    """(found, local slot) of global edge rows on this shard."""
    pos = jnp.searchsorted(view.eid_sorted, eids, side="left")
    pos = jnp.clip(pos, 0, view.eid_sorted.shape[0] - 1).astype(jnp.int32)
    found = (view.eid_sorted[pos] == eids) & (eids >= 0)
    return found, view.eid_slot[pos]


def get_edge_feature_sharded(view: ShardView, eids, names, kind):
    """Sharded edge feature fetch by global edge row; kind in
    {'dense','sparse'} (reference: remote GetEdgeFeature via the edge's
    owning shard, get_feature_op.cc)."""
    eids = jnp.asarray(eids, jnp.int32)
    shape_in = eids.shape
    flat_in = eids.reshape(-1)
    b = flat_in.shape[0]
    flat_all = _spread(view, flat_in)
    found, slot = _eid_lookup_local(view, flat_all)
    out = []
    for n in names:
        if kind == "dense":
            tab = view.dense_ef[n]
            v = jnp.where(found[:, None], tab[slot], 0.0)
            v = _owner_to_mine(view, v, b)
            out.append(v.reshape(shape_in + (tab.shape[-1],)))
        else:
            tab, _ = view.sparse_ef[n]
            ids = jnp.where(found[:, None], tab[slot] + 1, 0)
            ids = _owner_to_mine(view, ids, b) - 1
            ids = ids.reshape(shape_in + (tab.shape[-1],))
            out.append((ids, ids >= 0))
    return out


def get_edge_type_sharded(view: ShardView, eids):
    """Edge type of global edge rows (RGCN relation lookup under a mesh)."""
    eids = jnp.asarray(eids, jnp.int32)
    shape_in = eids.shape
    flat_in = eids.reshape(-1)
    b = flat_in.shape[0]
    flat_all = _spread(view, flat_in)
    found, slot = _eid_lookup_local(view, flat_all)
    ty = jnp.where(found, view.adj_type[slot] + 1, 0)
    out = _owner_to_mine(view, ty, b) - 1
    return out.reshape(shape_in)


def sample_node_with_condition_sharded(view: ShardView, key, count, dnf,
                                       node_type=-1):
    """Conditional sampling under a mesh: local DNF mask + masked weights,
    proportional shard choice over gathered totals, local masked-CDF draw
    (reference: index-backed sample_node_op.cc:65-103 behind query_proxy
    shard weighting)."""
    key = _sync_key(view, key)
    from euler_tpu.ops import index as index_ops
    mask = index_ops.dnf_mask(view, dnf)
    if node_type != -1:
        if isinstance(node_type, str):
            node_type = view.meta.node_type_id(node_type)
        mask = mask & (view.node_type == node_type)
    mask = mask & (view.node_type >= 0)           # padding rows are -1
    wloc = view.node_w * mask
    tot = jnp.sum(wloc)
    ks, kd = jax.random.split(key)
    from euler_tpu.parallel import comms
    tots = comms.all_gather(tot, view.axis)     # [S]
    cdf = jnp.cumsum(tots)
    r = jax.random.uniform(ks, (count,)) * cdf[-1]
    shard_choice = jnp.minimum(
        jnp.sum(r[:, None] >= cdf[None, :], axis=-1),
        view.num_shards - 1).astype(jnp.int32)
    kd = jax.random.fold_in(kd, view.my_shard)
    local = index_ops.masked_weighted_sample(kd, wloc, count)
    gid = jnp.where(local >= 0,
                    local * view.num_shards + view.my_shard, -1)
    mine = (shard_choice == view.my_shard) & (cdf[-1] > 0)
    return _combine_ids(mine, gid, view.axis, -1)


def sample_in_neighbor_sharded(view: ShardView, key, nodes, ets, count,
                               default_id=-1):
    """Weighted in-neighbor sampling under the mesh: the DST shard owns
    each node's in-groups (dst-partitioned in-CSR), answers its draws
    from per-group alias tables, and routes results back
    (reference: Node::SampleInNeighbor node.h:87-112 served remotely)."""
    nodes = jnp.asarray(nodes, jnp.int32)
    b = nodes.shape[0]
    alln = _spread(view, nodes)
    B = alln.shape[0]
    owned, rows = _own_rows(view, alln)
    kt, kd = jax.random.split(key)
    ET = view.meta.num_edge_types
    et_arr = jnp.asarray(ets, jnp.int32)
    W = view.in_group_w_sum[rows][:, et_arr]
    cdf = jnp.cumsum(W, axis=1)
    total = cdf[:, -1]
    r = jax.random.uniform(kt, (B, count)) * total[:, None]
    t_idx = jnp.minimum(
        jnp.sum(r[:, :, None] >= cdf[:, None, :], axis=-1), len(ets) - 1)
    etype = et_arr[t_idx]
    gidx = rows[:, None] * ET + etype
    lo = view.in_group_ptr[gidx]
    hi = view.in_group_ptr[gidx + 1]
    pos = alias_draw(kd, view.in_adj_prob, view.in_adj_alias, lo, hi - lo,
                     (B, count))
    ok = (pos >= 0) & owned[:, None] & (total > 0)[:, None]
    s = jnp.clip(jnp.maximum(pos, 0), 0, view.in_adj_src.shape[0] - 1)
    nbr = jnp.where(ok, view.in_adj_src[s], default_id)
    w = jnp.where(ok, view.in_adj_w[s], 0.0)
    ty = jnp.where(ok, etype, -1)
    eid = jnp.where(ok, view.in_adj_eid[s], -1)
    own_any = owned[:, None]
    return (_route_ids(view, own_any, nbr, b, default_id),
            _route_vals(view, own_any, w, b),
            _route_ids(view, own_any, ty, b, -1),
            _route_ids(view, own_any, eid, b, -1))


def get_full_in_neighbor_sharded(view: ShardView, nodes, ets, cap,
                                 default_id=-1, sorted_by_id=False):
    """Sharded padded full in-neighborhood (node.h:87-112 mirror of
    get_full_neighbor_sharded over the dst-partitioned in-CSR)."""
    nodes = jnp.asarray(nodes, jnp.int32)
    b = nodes.shape[0]
    alln = _spread(view, nodes)
    owned, rows = _own_rows(view, alln)
    B = alln.shape[0]
    ET = view.meta.num_edge_types
    et_arr = jnp.asarray(ets, jnp.int32)
    gidx = rows[:, None] * ET + et_arr[None, :]
    lo = view.in_group_ptr[gidx]
    hi = view.in_group_ptr[gidx + 1]
    deg = hi - lo
    offs = jnp.concatenate(
        [jnp.zeros((B, 1), deg.dtype), jnp.cumsum(deg, axis=1)], axis=1)
    total = offs[:, -1]
    j = jnp.arange(cap, dtype=jnp.int32)
    k_idx = jnp.minimum(
        jnp.sum(j[None, :, None] >= offs[:, None, 1:], axis=-1),
        len(ets) - 1)
    base = jnp.take_along_axis(lo, k_idx, axis=1)
    off_k = jnp.take_along_axis(offs[:, :-1], k_idx, axis=1)
    slot = base + (j[None, :] - off_k)
    ok = (j[None, :] < total[:, None]) & (alln >= 0)[:, None] & \
        owned[:, None]
    s = jnp.clip(slot, 0, view.in_adj_src.shape[0] - 1)
    nbr = jnp.where(ok, view.in_adj_src[s], default_id)
    w = jnp.where(ok, view.in_adj_w[s], 0.0)
    ty = jnp.where(ok, et_arr[k_idx], -1)
    eid = jnp.where(ok, view.in_adj_eid[s], -1)
    nbr = _route_ids(view, ok, nbr, b, default_id)
    w = _route_vals(view, ok, w, b)
    ty = _route_ids(view, ok, ty, b, -1)
    eid = _route_ids(view, ok, eid, b, -1)
    okg = _owner_to_mine(view, ok.astype(jnp.int32), b) > 0
    if sorted_by_id:
        sort_key = jnp.where(okg, nbr, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(sort_key, axis=1)
        take = lambda x: jnp.take_along_axis(x, order, axis=1)
        nbr, w, ty, eid, okg = (take(nbr), take(w), take(ty), take(eid),
                                take(okg))
    return nbr, w, ty, eid, okg


def query_index_ids_sharded(view: ShardView, dnf, cap):
    """Matching global ids across shards, padded to cap with -1."""
    from euler_tpu.ops import index as index_ops
    mask = index_ops.dnf_mask(view, dnf) & (view.node_type >= 0)
    n_max = mask.shape[0]
    S = view.num_shards
    gids = jnp.arange(n_max, dtype=jnp.int32) * S + view.my_shard
    big = jnp.iinfo(jnp.int32).max
    local = jnp.where(mask, gids, big)
    from euler_tpu.parallel import comms
    allv = comms.all_gather(local, view.axis).reshape(-1)
    topv = jnp.sort(allv)[:cap]
    ids = jnp.where(topv < big, topv, -1)
    return ids, ids >= 0


def refresh_fan_pack_sharded(sg: ShardedGraphTensors, mesh,
                             key) -> ShardedGraphTensors:
    """Redraw every shard's fan_pack reservoir rows on device.

    The multi-chip mirror of ops.sampling.refresh_fan_pack (estimator
    RunConfig.reservoir_refresh semantics): without it, groups with
    degree > FAN_D would expose only their initial FAN_D pre-drawn
    neighbors for the whole run. The key folds with the GRAPH axis index
    only, so data-axis replicas compute identical rows (the array stays
    consistently replicated over 'data')."""
    if sg.fan_pack is None:
        return sg
    from euler_tpu.ops import sampling as _sampling

    def body(gp, dst, prob, alias, fp, key):
        k = jax.random.fold_in(key, jax.lax.axis_index("graph"))
        out = _sampling.refresh_fan_rows(gp[0], dst[0], prob[0], alias[0],
                                         fp[0], k)
        return out[None]

    gspec = P("graph")
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(gspec, gspec, gspec, gspec, gspec, P()),
        out_specs=gspec, check_vma=False))
    with mesh:
        fp = fn(sg.group_ptr, sg.adj_dst, sg.adj_prob, sg.adj_alias,
                sg.fan_pack, key)
    changed = dict(fan_pack=fp)
    if sg.fanu_pack is not None:
        from euler_tpu.ops.alias import FANU_SHIFT

        def body_u(ptr, dst, ty, prob, alias, fp, key):
            k = jax.random.fold_in(
                jax.random.fold_in(key, 1), jax.lax.axis_index("graph"))
            packed = (ty[0] << FANU_SHIFT) | jnp.maximum(dst[0], 0)
            out = _sampling.refresh_fan_rows(ptr[0], packed, prob[0],
                                             alias[0], fp[0], k)
            return out[None]

        fn_u = jax.jit(jax.shard_map(
            body_u, mesh=mesh,
            in_specs=(gspec,) * 6 + (P(),),
            out_specs=gspec, check_vma=False))
        with mesh:
            changed["fanu_pack"] = fn_u(
                sg.fanu_ptr, sg.adj_dst, sg.adj_type, sg.fanu_prob,
                sg.fanu_alias, sg.fanu_pack, key)
    return sg.replace(**changed)
