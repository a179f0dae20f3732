"""Device-resident graph store.

TPU-native counterpart of the reference's C++ in-memory graph engine
(reference: euler/core/graph/graph.h:41 ``Graph`` singleton, node.h:59
``Node`` with edge-type-grouped neighbor arrays + per-group
``CompactWeightedCollection``). Instead of a pointer-rich object store
queried per batch over RPC, the whole graph is a pytree of flat arrays
(``GraphTensors``) living in device/host memory, so sampling, gather and
aggregation compile into one XLA program — the per-batch client/server
round-trip of the reference disappears.

Layout (see convert.build_csr):
  * edges sorted by (src, edge_type, dst); ``group_ptr[r*ET+t]`` brackets the
    neighbors of node r under edge type t (grouped layout of node.h:49-57);
    within a group, neighbors are sorted by dst id, enabling binary-search
    membership tests (used by node2vec walks, cf. GetSortedFullNeighbor).
  * ``adj_w_cumsum`` is a global prefix sum of edge weights: a weighted
    neighbor draw = one uniform + one searchsorted (the vectorized
    equivalent of compact_weighted_collection.h:54-100).
  * per-type alias tables for global node/edge sampling (graph.h:133
    ``BuildGlobalSampler``).
"""
from __future__ import annotations

import glob
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from euler_tpu.graph import convert as _convert
from euler_tpu.graph.meta import BINARY, DENSE, SPARSE, GraphMeta
from euler_tpu.ops.alias import (build_fan_pack, build_group_alias,
                                 build_typed_alias_tables)


def _adj_pack_np(adj_dst, adj_type, adj_eid, adj_w):
    """Interleaved (dst, type, eid, weight-bits) int32 rows."""
    return np.stack(
        [adj_dst.astype(np.int32), adj_type.astype(np.int32),
         adj_eid.astype(np.int32),
         adj_w.astype(np.float32).view(np.int32)], axis=1)


def _sample_pack_np(group_ptr, prob, alias, adj_pack):
    """Fused alias-draw rows (see GraphTensors.sample_pack).

    ``alias`` holds within-group slots; resolve to global CSR slots via
    each slot's group start, then inline both candidate payloads so a
    weighted draw needs exactly one random row read.
    """
    gp = np.asarray(group_ptr, np.int64)
    e = adj_pack.shape[0]
    seg = np.repeat(np.arange(len(gp) - 1), np.diff(gp))
    start = gp[seg]                                  # group start per slot
    alias_global = (start + np.asarray(alias, np.int64)).astype(np.int64)
    out = np.empty((e, 9), np.int32)
    out[:, 0] = np.asarray(prob, np.float32).view(np.int32)
    out[:, 1:5] = adj_pack
    out[:, 5:9] = adj_pack[alias_global] if e else adj_pack
    return out


def string_hash32(s: str) -> int:
    """Deterministic FNV-1a 32-bit string hash (host + trace time).
    Plays the role of the reference's exported py_hash64
    (euler/common/hash.cc) for device-side string equality."""
    h = 2166136261
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h - 2**32 if h >= 2**31 else h


@struct.dataclass
class AliasTables:
    ids: jnp.ndarray       # int32 [n] population sorted by type
    type_ptr: jnp.ndarray  # int32 [T+1]
    prob: jnp.ndarray      # f32   [n]
    alias: jnp.ndarray     # int32 [n] (within-type slots)
    w_sum: jnp.ndarray     # f32   [T]


@struct.dataclass
class GraphTensors:
    """The jit-visible graph. Every field is a device array (or dict of)."""

    meta: GraphMeta = struct.field(pytree_node=False)

    node_type: jnp.ndarray   # int32 [N]
    node_w: jnp.ndarray      # f32   [N]

    # out-adjacency, grouped CSR over (node, edge_type)
    group_ptr: jnp.ndarray   # int32 [N*ET + 1]
    adj_src: jnp.ndarray     # int32 [E]
    adj_dst: jnp.ndarray     # int32 [E]
    adj_type: jnp.ndarray    # int32 [E]
    adj_w: jnp.ndarray       # f32   [E]
    adj_w_cumsum: jnp.ndarray  # f32 [E]
    adj_eid: jnp.ndarray     # int32 [E] CSR slot -> original edge row
    group_w_sum: jnp.ndarray  # f32  [N, ET]

    node_alias: AliasTables
    edge_alias: AliasTables  # population = CSR slots, typed by edge type

    dense_nf: Dict[str, jnp.ndarray]
    sparse_nf: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]  # (ids, len)
    dense_ef: Dict[str, jnp.ndarray]   # indexed by original edge row
    sparse_ef: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]

    # int32 hash codes of binary (string) features so equality predicates
    # run on device (the reference's HashSampleIndex role,
    # euler/core/index/hash_sample_index.h:41)
    binary_hash_nf: Dict[str, jnp.ndarray] = struct.field(
        default_factory=dict)

    # graph-classification support: graphs defined by the 'graph_label'
    # binary node feature (reference: API_GET_GRAPH_BY_LABEL,
    # euler/core/kernels/get_graph_by_label_op.cc)
    graph_members: Optional[jnp.ndarray] = None       # int32 [G, maxN] (-1 pad)
    graph_member_cnt: Optional[jnp.ndarray] = None    # int32 [G]

    # optional in-adjacency (reference: node.h in-neighbor variants)
    in_group_ptr: Optional[jnp.ndarray] = None
    in_adj_src: Optional[jnp.ndarray] = None   # the *neighbor* (true src)
    in_adj_w: Optional[jnp.ndarray] = None
    in_adj_w_cumsum: Optional[jnp.ndarray] = None
    in_adj_eid: Optional[jnp.ndarray] = None
    in_group_w_sum: Optional[jnp.ndarray] = None

    # per-(node, edge_type)-group alias tables: O(1) weighted neighbor
    # draws (2 random reads) instead of the O(log E) searchsorted chain;
    # alias values are within-group slots (ops/alias.build_group_alias)
    adj_prob: Optional[jnp.ndarray] = None     # f32   [E]
    adj_alias: Optional[jnp.ndarray] = None    # int32 [E]
    in_adj_prob: Optional[jnp.ndarray] = None
    in_adj_alias: Optional[jnp.ndarray] = None

    # interleaved hot-path packs: a random row gather costs ~10ns/row on
    # TPU regardless of row width (latency-bound, measured), so the
    # sampling verbs read ONE packed row per draw instead of N parallel
    # single-column gathers.
    group_pack: Optional[jnp.ndarray] = None   # int32 [N*ET, 2] (lo, hi)
    adj_pack: Optional[jnp.ndarray] = None     # int32 [E, 4] (dst, type,
    #                                            eid, weight bits)
    # the fused alias-draw row: prob_bits | payload-if-kept (dst,type,eid,
    # w_bits) | payload-if-aliased. A weighted neighbor draw = one uniform
    # pair + ONE random row read (the alias indirection is pre-resolved at
    # build time) — vs 2 dependent reads (alias row, then payload row)
    sample_pack: Optional[jnp.ndarray] = None  # int32 [E, 9]

    # per-(node, edge_type) packed alias rows: ONE row gather per frontier
    # node serves all its draws (ops/alias.py FAN_* layout + rationale).
    # The ids-only hot path of sample_neighbor/sample_fanout.
    fan_pack: Optional[jnp.ndarray] = None     # int32 [N*ET, 128]
    # groups with degree > FAN_D (reservoir rows) — the only rows
    # refresh_fan_pack must redraw (ops/sampling.refresh_fan_rows)
    fan_over_rows: Optional[jnp.ndarray] = None  # int32 [K]

    # UNION fan rows ("fanu" pack, ops/alias.py FANU_*): one row per
    # NODE over all edge types, lanes packing (etype<<27)|dst — the
    # multi-type draw costs one row gather + a decode. fanu_ptr/dst/
    # prob/alias are the union-group CSR view the reservoir refresh
    # redraws from.
    fanu_pack: Optional[jnp.ndarray] = None      # int32 [N, 128]
    fanu_over_rows: Optional[jnp.ndarray] = None  # int32 [K]
    fanu_ptr: Optional[jnp.ndarray] = None       # int32 [N+1]
    fanu_dst: Optional[jnp.ndarray] = None       # int32 [E] packed
    fanu_prob: Optional[jnp.ndarray] = None      # f32   [E]
    fanu_alias: Optional[jnp.ndarray] = None     # int32 [E]

    # prebuilt sorted attribute indexes (ops/index.AttrIndex): value-
    # sorted id arrays + weight prefix sums per indexed attribute, the
    # device-resident Hash/RangeSampleIndex (index_manager.h:34). Built
    # post-load with ops.index.build_attr_index; conditional sampling
    # uses them for O(count log N) draws instead of full-column scans.
    node_index: Dict[str, "object"] = struct.field(default_factory=dict)
    edge_index_: Dict[str, "object"] = struct.field(default_factory=dict)

    # whole-graph ELL pack: every node's neighborhood (union of types,
    # node's CSR slots are contiguous) laid out as regular [N, C] rows so
    # full-graph propagation aggregates by reshape+reduce instead of
    # XLA's serialized segment-scatter (tools/micro/micro_spmm.py:
    # sorted segment_sum = 10.6 ns/edge vs reshape-reduce ~streaming).
    # ell_tpos holds, per node u, the flat block-edge positions (t*C+c)
    # of the cells that READ u — the transpose adjacency — so the
    # backward of the per-layer source gather is another gather
    # (dataflow/block.ell_expand), never a scatter.
    ell_nbr: Optional[jnp.ndarray] = None      # int32 [N, C] (-1 pad)
    ell_w: Optional[jnp.ndarray] = None        # f32   [N, C]
    ell_eid: Optional[jnp.ndarray] = None      # int32 [N, C]
    ell_ty: Optional[jnp.ndarray] = None       # int32 [N, C]
    ell_tpos: Optional[jnp.ndarray] = None     # int32 [N, C_in] (-1 pad)
    ell_in_deg: Optional[jnp.ndarray] = None   # f32   [N, ET]

    # edge type per ORIGINAL edge row (adj_type is CSR-slot-ordered; eids
    # returned by the sampling verbs are original rows — RGCN relation
    # lookup must go through this table, ops/feature_ops.get_edge_type)
    eid_type: Optional[jnp.ndarray] = None     # int32 [E]
    # eid -> CSR slot inverse permutation, built once at load so verbs
    # addressing edges by original id (Query.e) never argsort per run
    eid_slot: Optional[jnp.ndarray] = None     # int32 [E]

    @property
    def n_nodes(self) -> int:
        return self.node_type.shape[0]

    @property
    def n_edges(self) -> int:
        return self.adj_dst.shape[0]


def _ell_pack_np(n, net, group_ptr, adj_dst, adj_w, adj_eid, adj_type):
    """Build the whole-graph ELL pack (see GraphTensors.ell_* docs).

    Returns None (pack skipped) when padding would explode: ELL rows are
    max-degree wide, so a power-law hub would inflate [N, C] far past
    the CSR's footprint. Gate: C and C_in each <= max(64, 4 * avg_deg).
    """
    E = len(adj_dst)
    node_lo = group_ptr[np.arange(n) * net]
    node_hi = group_ptr[np.arange(n) * net + net]
    row_deg = (node_hi - node_lo).astype(np.int64)
    in_deg = np.bincount(adj_dst, minlength=n).astype(np.int64)
    C = int(row_deg.max(initial=0))
    C_in = int(in_deg.max(initial=0))
    cap = max(64, 4 * max(1, E // max(n, 1)))
    if C > cap or C_in > cap or n * C >= 2 ** 31:
        return None
    rows = np.repeat(np.arange(n, dtype=np.int64), row_deg)
    pos = np.arange(E, dtype=np.int64) - np.repeat(node_lo, row_deg)
    nbr = np.full((n, C), -1, np.int32)
    w = np.zeros((n, C), np.float32)
    eid = np.full((n, C), -1, np.int32)
    ty = np.full((n, C), -1, np.int32)
    nbr[rows, pos] = adj_dst
    w[rows, pos] = adj_w
    eid[rows, pos] = adj_eid
    ty[rows, pos] = adj_type
    # transpose positions: for node u, the flat cells (row*C + pos) that
    # read u — sorted stable by u so each u's slots pack left
    p = (rows * C + pos).astype(np.int64)
    order = np.argsort(adj_dst, kind="stable")
    u_sorted = adj_dst[order]
    start = np.concatenate([[0], np.cumsum(in_deg)[:-1]])
    pos_in_u = np.arange(E, dtype=np.int64) - np.repeat(start, in_deg)
    tpos = np.full((n, C_in), -1, np.int64)
    tpos[u_sorted, pos_in_u] = p[order]
    ell_in_deg = np.zeros((n, net), np.float32)
    np.add.at(ell_in_deg, (adj_dst, adj_type), 1.0)
    return dict(ell_nbr=nbr, ell_w=w, ell_eid=eid, ell_ty=ty,
                ell_tpos=tpos.astype(np.int32), ell_in_deg=ell_in_deg)


def _load_parts(path: str):
    from euler_tpu.utils import io as _io
    files = _io.glob(_io.join(path, "part_*.npz"))
    if not files:
        raise FileNotFoundError(f"no part_*.npz under {path}")

    def rd(f):
        with _io.open_file(f, "rb") as fh:
            return dict(np.load(fh, allow_pickle=False))

    if len(files) > 1:
        # parallel partition reads — zlib decompression and file IO both
        # release the GIL (the reference's 8-thread partition loading,
        # graph_builder.cc:57-157)
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(8, len(files))) as ex:
            parts = list(ex.map(rd, files))
    else:
        parts = [rd(f) for f in files]
    merged = {}
    for k in parts[0]:
        merged[k] = np.concatenate([p[k] for p in parts], axis=0)
    return merged


class Graph:
    """Host-side graph: numpy arrays + binary features + device tensors.

    The equivalent of ``initialize_embedded_graph``
    (reference: tf_euler/python/euler_ops/base.py:63-67 ->
    QueryProxy::Init -> GraphBuilder::Build, graph_builder.cc:57-157).
    """

    #: all hot-path packs (see GraphTensors docstrings)
    ALL_PACKS = ("group", "adj", "sample", "fan", "ell")

    def __init__(self, meta: GraphMeta, arrays: Dict[str, np.ndarray],
                 device_put: bool = True,
                 packs: Tuple[str, ...] = ALL_PACKS,
                 feature_dtype=None):
        """``packs`` selects which interleaved hot-path layouts to build:
        'group' (group_pack), 'adj' (adj_pack), 'sample' (sample_pack),
        'fan' (fan_pack). Every verb falls back gracefully when a pack is
        absent; skipping unused packs cuts load time and device-transfer
        bytes (sample_pack alone is 36 B/edge).

        ``feature_dtype`` (e.g. jnp.bfloat16) stores DENSE feature
        matrices in that dtype: feature-row gathers are effective-
        bandwidth bound on TPU (tools/micro/micro_featpack.py), so bf16
        halves the dominant HBM traffic of sampled training; models
        upcast where they need f32."""
        self.meta = meta
        n, net = meta.n_nodes, meta.num_edge_types

        # nodes may arrive partition-interleaved: restore local-id order
        order = np.argsort(arrays["node_local"], kind="stable")
        self.ext_ids = arrays["ext_ids"][order]
        node_type = arrays["node_type"][order]
        node_w = arrays["node_w"][order]
        self._local_of = {int(e): i for i, e in enumerate(self.ext_ids)}

        src, dst = arrays["src"], arrays["dst"]
        etype, ew = arrays["etype"], arrays["ew"]
        eid = arrays["eid"]
        # eid-indexed tables (dense_ef/sparse_ef/eid_type and the sharded
        # eid->slot lookup) require edge ids to be the dense permutation
        # 0..E-1; anything else would silently misindex edge features
        e_sorted = np.sort(np.asarray(eid, np.int64))
        if len(e_sorted) and not (e_sorted[0] == 0
                                  and e_sorted[-1] == len(e_sorted) - 1
                                  and np.array_equal(
                                      e_sorted,
                                      np.arange(len(e_sorted), dtype=np.int64))):
            raise ValueError(
                "edge ids must be a dense permutation of 0..E-1 "
                f"(got min={e_sorted[0]}, max={e_sorted[-1]}, E={len(e_sorted)}); "
                "re-run the converter, which assigns them")

        (group_ptr, adj_dst, adj_w, w_cum, adj_eid, perm) = _convert.build_csr(
            n, net, src, dst, etype, ew, eid)
        adj_src = src[perm].astype(np.int32)
        adj_type = etype[perm].astype(np.int32)
        group_w_sum = np.diff(
            np.concatenate([[0.0], w_cum.astype(np.float64)])[group_ptr]
        ).astype(np.float32).reshape(n, net)
        # recompute exactly per group to avoid cumsum cancellation error
        # (cheap: one segment sum)
        seg = np.repeat(np.arange(n * net), np.diff(group_ptr))
        gws = np.zeros(n * net, np.float64)
        np.add.at(gws, seg, adj_w.astype(np.float64))
        group_w_sum = gws.astype(np.float32).reshape(n, net)

        node_alias_np = build_typed_alias_tables(node_type, node_w,
                                                 meta.num_node_types)
        edge_alias_np = build_typed_alias_tables(adj_type, adj_w, net)
        adj_prob, adj_alias = build_group_alias(group_ptr, adj_w)

        # features (original-order for edges; node features sorted to local id)
        dense_nf, sparse_nf, self.binary_nf = {}, {}, {}
        for spec in meta.node_features:
            if spec.kind == DENSE:
                dense_nf[spec.name] = arrays[f"nf_d:{spec.name}"][order]
            elif spec.kind == SPARSE:
                sparse_nf[spec.name] = (arrays[f"nf_sp:{spec.name}"][order],
                                        arrays[f"nf_splen:{spec.name}"][order])
            else:
                self.binary_nf[spec.name] = arrays[f"nf_bin:{spec.name}"][order]
        dense_ef, sparse_ef, self.binary_ef = {}, {}, {}
        eorder = np.argsort(eid, kind="stable")
        for spec in meta.edge_features:
            if spec.kind == DENSE:
                dense_ef[spec.name] = arrays[f"ef_d:{spec.name}"][eorder]
            elif spec.kind == SPARSE:
                sparse_ef[spec.name] = (arrays[f"ef_sp:{spec.name}"][eorder],
                                        arrays[f"ef_splen:{spec.name}"][eorder])
            else:
                self.binary_ef[spec.name] = arrays[f"ef_bin:{spec.name}"][eorder]

        in_fields = {}
        if meta.has_in_edges:
            # in-CSR: group by dst; "neighbor" column is the src node
            (ig_ptr, i_col, i_w, i_cum, i_eid, _) = _convert.build_csr(
                n, net, dst, src, etype, ew, eid)
            iseg = np.repeat(np.arange(n * net), np.diff(ig_ptr))
            igws = np.zeros(n * net, np.float64)
            np.add.at(igws, iseg, i_w.astype(np.float64))
            i_prob, i_alias = build_group_alias(ig_ptr, i_w)
            in_fields = dict(
                in_group_ptr=ig_ptr, in_adj_src=i_col, in_adj_w=i_w,
                in_adj_w_cumsum=i_cum, in_adj_eid=i_eid,
                in_group_w_sum=igws.astype(np.float32).reshape(n, net),
                in_adj_prob=i_prob, in_adj_alias=i_alias)

        binary_hash = {
            name: np.asarray([string_hash32(v) for v in vals], np.int32)
            for name, vals in self.binary_nf.items()}

        # graph-label membership (host binary feature -> padded device table)
        graph_fields = {}
        self.graph_labels = None
        if "graph_label" in self.binary_nf:
            vals = self.binary_nf["graph_label"]
            uniq = sorted({v for v in vals if v != ""})
            self.graph_labels = uniq
            members = [np.nonzero(vals == u)[0].astype(np.int32)
                       for u in uniq]
            if members:
                maxn = max(len(m) for m in members)
                tab = np.full((len(uniq), maxn), -1, np.int32)
                for i, m in enumerate(members):
                    tab[i, : len(m)] = m
                graph_fields = dict(
                    graph_members=tab,
                    graph_member_cnt=np.asarray([len(m) for m in members],
                                                np.int32))

        put = jnp.asarray if device_put else (lambda x: x)

        def put_alias(t):
            return AliasTables(ids=put(t["ids"]),
                               type_ptr=put(t["type_ptr"].astype(np.int32)),
                               prob=put(t["prob"]), alias=put(t["alias"]),
                               w_sum=put(t["w_sum"]))

        pack_fields = {}
        if "group" in packs:
            pack_fields["group_pack"] = put(np.stack(
                [group_ptr[:-1], group_ptr[1:]], axis=1).astype(np.int32))
        if "adj" in packs or "sample" in packs:
            adj_pack = _adj_pack_np(adj_dst, adj_type, adj_eid, adj_w)
            if "adj" in packs:
                pack_fields["adj_pack"] = put(adj_pack)
            if "sample" in packs:
                pack_fields["sample_pack"] = put(_sample_pack_np(
                    group_ptr, adj_prob, adj_alias, adj_pack))
        if "fan" in packs:
            from euler_tpu.ops.alias import FAN_D
            pack_fields["fan_pack"] = put(build_fan_pack(
                group_ptr, adj_dst, adj_prob, adj_alias,
                group_w_sum.reshape(-1)))
            pack_fields["fan_over_rows"] = put(np.nonzero(
                np.diff(group_ptr) > FAN_D)[0].astype(np.int32))
        if "fanu" in packs and n and len(adj_dst) and 2 <= net:
            from euler_tpu.ops.alias import (FAN_D, FANU_MAX_TYPES,
                                             FANU_SHIFT)
            if n < (1 << FANU_SHIFT) and net <= FANU_MAX_TYPES:
                node_ptr = group_ptr[::net].astype(np.int64)  # [N+1]
                packed = (adj_type.astype(np.int32) << FANU_SHIFT) \
                    | adj_dst
                prob_u, alias_u = build_group_alias(node_ptr, adj_w)
                wsum_u = group_w_sum.reshape(n, net).sum(axis=1)
                pack_fields["fanu_pack"] = put(build_fan_pack(
                    node_ptr, packed, prob_u, alias_u, wsum_u))
                pack_fields["fanu_over_rows"] = put(np.nonzero(
                    np.diff(node_ptr) > FAN_D)[0].astype(np.int32))
                pack_fields["fanu_ptr"] = put(node_ptr.astype(np.int32))
                pack_fields["fanu_dst"] = put(packed)
                pack_fields["fanu_prob"] = put(prob_u)
                pack_fields["fanu_alias"] = put(alias_u)
        if "ell" in packs and n and len(adj_dst):
            ell = _ell_pack_np(n, net, group_ptr, adj_dst, adj_w,
                               adj_eid, adj_type)
            if ell is not None:          # degree-gated (see _ell_pack_np)
                pack_fields.update({k: put(v) for k, v in ell.items()})

        self.tensors = GraphTensors(
            meta=meta,
            node_type=put(node_type),
            node_w=put(node_w),
            group_ptr=put(group_ptr.astype(np.int32)),
            adj_src=put(adj_src),
            adj_dst=put(adj_dst),
            adj_type=put(adj_type),
            adj_w=put(adj_w),
            adj_w_cumsum=put(w_cum),
            adj_prob=put(adj_prob),
            adj_alias=put(adj_alias),
            adj_eid=put(adj_eid),
            **pack_fields,
            eid_type=put(etype[eorder].astype(np.int32)),
            eid_slot=put(np.argsort(adj_eid, kind="stable"
                                    ).astype(np.int32)),
            group_w_sum=put(group_w_sum),
            node_alias=put_alias(node_alias_np),
            edge_alias=put_alias(edge_alias_np),
            dense_nf={k: put(v if feature_dtype is None
                             else np.asarray(v, feature_dtype))
                      for k, v in dense_nf.items()},
            sparse_nf={k: (put(v[0]), put(v[1])) for k, v in sparse_nf.items()},
            dense_ef={k: put(v if feature_dtype is None
                             else np.asarray(v, feature_dtype))
                      for k, v in dense_ef.items()},
            sparse_ef={k: (put(v[0]), put(v[1])) for k, v in sparse_ef.items()},
            binary_hash_nf={k: put(v) for k, v in binary_hash.items()},
            **{k: put(v) for k, v in graph_fields.items()},
            **{k: put(v) for k, v in in_fields.items()},
        )

    # ---- host-side lookups ------------------------------------------------
    def local_id(self, ext_id: int) -> int:
        return self._local_of[int(ext_id)]

    def local_ids(self, ext_ids) -> np.ndarray:
        return np.asarray([self._local_of[int(e)] for e in ext_ids], np.int32)

    def get_binary_feature(self, nodes, names):
        """Host-only (strings can't live on device).

        reference: tf_euler get_binary_feature (feature_ops.py)."""
        nodes = np.asarray(nodes)
        return [self.binary_nf[n][nodes] for n in names]

    def get_edge_binary_feature(self, eids, names):
        eids = np.asarray(eids)
        return [self.binary_ef[n][eids] for n in names]

    @property
    def max_id(self) -> int:
        return self.meta.n_nodes - 1


def load_graph(path: str, device_put: bool = True,
               feature_dtype=None,
               packs: Tuple[str, ...] = Graph.ALL_PACKS) -> Graph:
    """Load a converted shard directory (see convert.convert_json_graph).

    ``feature_dtype=jnp.bfloat16`` stores dense features half-width in
    HBM — the biggest lever on sampled-training feature traffic (see
    Graph.__init__). ``packs`` selects the hot-path layouts to build
    (huge-graph loads pick only what their access pattern reads —
    every pack is O(E) or O(N*max_deg) extra host memory)."""
    from euler_tpu.utils import io as _io
    with _io.open_file(_io.join(path, _convert.META_FILE), "r") as f:
        meta = GraphMeta.from_json(f.read())
    return Graph(meta, _load_parts(path), device_put=device_put,
                 feature_dtype=feature_dtype, packs=packs)


# ---- module-level default graph (tf_euler-style convenience) --------------
_default_graph: Optional[Graph] = None


def initialize_graph(path_or_graph) -> Graph:
    """Set the process-default graph (cf. tf_euler initialize_embedded_graph,
    reference: tf_euler/python/euler_ops/base.py:37-75)."""
    global _default_graph
    if isinstance(path_or_graph, Graph):
        _default_graph = path_or_graph
    else:
        _default_graph = load_graph(path_or_graph)
    return _default_graph


def default_graph() -> Graph:
    if _default_graph is None:
        raise RuntimeError("no graph initialized; call initialize_graph first")
    return _default_graph
