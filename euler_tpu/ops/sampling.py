"""Jit-compiled graph sampling ops.

TPU-native counterparts of the reference's query kernels
(reference: euler/core/kernels/sample_node_op.cc, sample_neighbor_op.cc,
get_feature_op.cc and the tf_euler wrappers
tf_euler/python/euler_ops/{sample,neighbor}_ops.py). Where the reference
issues a GQL string per batch through a DAG executor, here every verb is a
pure function over ``GraphTensors`` that traces into the training step's
XLA program: ragged results become fixed-shape padded blocks with masks
(SURVEY.md §7 "Fixed shapes vs ragged graph data"), and missing neighbors
get ``default_id`` with weight 0 — the convention of
tf_euler/kernels/sample_fanout_op.cc:109-113.

Conventions:
  * node ids are int32 local ids; ``-1`` marks "no node" / padding
  * ``edge_types`` arguments are static tuples of edge-type ids
  * every randomized op takes an explicit jax PRNG key
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from euler_tpu.graph.store import GraphTensors
from euler_tpu.ops.alias import (FAN_ALIAS_OFF, FAN_D, FAN_KEPT_OFF,
                                 FAN_PROB_OFF, alias_draw)

Array = jnp.ndarray


from euler_tpu.ops.dispatch import is_shard_view as _is_shard_view


def _as_etypes(g, edge_types) -> Tuple[int, ...]:
    if isinstance(edge_types, (int, str)):
        edge_types = (edge_types,)
    return tuple(g.meta.edge_type_id(t) for t in edge_types)


# ---------------------------------------------------------------------------
# global node / edge sampling (alias tables)
# ---------------------------------------------------------------------------

def sample_node(g: GraphTensors, key, count: int, node_type=-1) -> Array:
    """Weighted global node sampling.

    reference: API_SAMPLE_NODE (euler/core/kernels/sample_node_op.cc) via
    per-type alias tables (graph.h:133). ``node_type=-1`` samples across all
    types proportionally to per-type weight sums.
    """
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.sample_node_sharded(g, key, count, node_type)
    na = g.node_alias
    if isinstance(node_type, str):
        node_type = g.meta.node_type_id(node_type)
    if node_type == -1:
        kt, kd = jax.random.split(key)
        cdf = jnp.cumsum(na.w_sum)
        r = jax.random.uniform(kt, (count,)) * cdf[-1]
        t = jnp.searchsorted(cdf, r, side="right").astype(jnp.int32)
        t = jnp.minimum(t, na.w_sum.shape[0] - 1)
        lo = na.type_ptr[t]
        size = na.type_ptr[t + 1] - lo
        pos = alias_draw(kd, na.prob, na.alias, lo, size, (count,))
    else:
        lo = na.type_ptr[node_type]
        size = na.type_ptr[node_type + 1] - lo
        pos = alias_draw(key, na.prob, na.alias, lo, size, (count,))
    return jnp.where(pos >= 0, na.ids[jnp.maximum(pos, 0)], -1)


def sample_node_with_src(g: GraphTensors, key, src_nodes: Array,
                         count: int) -> Array:
    """For each src node, sample ``count`` nodes of the same node type
    (negative sampling; reference: tf_euler sample_ops.sample_node_with_src /
    API_SAMPLE_N_WITH_TYPES)."""
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.sample_node_with_src_sharded(g, key, src_nodes, count)
    na = g.node_alias
    types = g.node_type[jnp.maximum(src_nodes, 0)]
    lo = na.type_ptr[types][:, None]
    size = (na.type_ptr[types + 1] - na.type_ptr[types])[:, None]
    pos = alias_draw(key, na.prob, na.alias, lo, size,
                     (src_nodes.shape[0], count))
    out = jnp.where(pos >= 0, na.ids[jnp.maximum(pos, 0)], -1)
    # invalid (padded) src rows yield -1, matching the sharded path
    return jnp.where((src_nodes >= 0)[:, None], out, -1)


def sample_edge(g: GraphTensors, key, count: int, edge_type=-1):
    """Weighted global edge sampling; returns (src, dst, etype, eid).

    reference: API_SAMPLE_EDGE (euler/core/kernels/sample_edge_op.cc)."""
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.sample_edge_sharded(g, key, count, edge_type)
    ea = g.edge_alias
    if isinstance(edge_type, str):
        edge_type = g.meta.edge_type_id(edge_type)
    if edge_type == -1:
        kt, kd = jax.random.split(key)
        cdf = jnp.cumsum(ea.w_sum)
        r = jax.random.uniform(kt, (count,)) * cdf[-1]
        t = jnp.searchsorted(cdf, r, side="right").astype(jnp.int32)
        t = jnp.minimum(t, ea.w_sum.shape[0] - 1)
        lo = ea.type_ptr[t]
        size = ea.type_ptr[t + 1] - lo
        pos = alias_draw(kd, ea.prob, ea.alias, lo, size, (count,))
    else:
        lo = ea.type_ptr[edge_type]
        size = ea.type_ptr[edge_type + 1] - lo
        pos = alias_draw(key, ea.prob, ea.alias, lo, size, (count,))
    slot = jnp.where(pos >= 0, ea.ids[jnp.maximum(pos, 0)], -1)
    ok = slot >= 0
    s = jnp.maximum(slot, 0)
    return (jnp.where(ok, g.adj_src[s], -1),
            jnp.where(ok, g.adj_dst[s], -1),
            jnp.where(ok, g.adj_type[s], -1),
            jnp.where(ok, g.adj_eid[s], -1))


# ---------------------------------------------------------------------------
# neighbor sampling over the grouped CSR
# ---------------------------------------------------------------------------

def _group_bounds(g: GraphTensors, rows: Array, etype: Array):
    """(lo, hi) CSR slot bounds of group (row, etype); rows/etype broadcast."""
    ET = g.meta.num_edge_types
    gidx = rows * ET + etype
    if getattr(g, "group_pack", None) is not None:
        gp = g.group_pack[gidx]          # one packed row read, not two
        return gp[..., 0], gp[..., 1]
    return g.group_ptr[gidx], g.group_ptr[gidx + 1]


def _weighted_group_draw(g: GraphTensors, key, rows: Array, etype: Array,
                         shape):
    """Weighted draw of one CSR slot per (row, etype) entry.

    O(1) per-group alias draw (two uniforms + two random reads) — the
    vectorized CompactWeightedCollection (compact_weighted_collection.h:
    54-100), upgraded from CDF binary search to the alias method: on
    device a searchsorted over the edge cumsum is a log2(E)-long chain of
    dependent random HBM reads per draw (~13x slower measured at 5M
    edges). Falls back to the cumsum search for stores built without
    group alias tables. rows/etype must already have ``shape``. Returns
    slot, -1 where empty.
    """
    lo, hi = _group_bounds(g, rows, etype)
    if getattr(g, "adj_prob", None) is not None:
        return alias_draw(key, g.adj_prob, g.adj_alias, lo, hi - lo, shape)
    w_lo = jnp.where(lo > 0, g.adj_w_cumsum[jnp.maximum(lo - 1, 0)], 0.0)
    w_hi = jnp.where(hi > 0, g.adj_w_cumsum[jnp.maximum(hi - 1, 0)], 0.0)
    u = jax.random.uniform(key, shape)
    target = w_lo + u * (w_hi - w_lo)
    slot = jnp.searchsorted(g.adj_w_cumsum, target, side="left")
    slot = jnp.clip(slot, lo, jnp.maximum(hi - 1, 0)).astype(jnp.int32)
    return jnp.where(hi > lo, slot, -1)


def sample_neighbor(g: GraphTensors, key, nodes: Array, edge_types,
                    count: int, default_id: int = -1):
    """Sample ``count`` weighted neighbors per node from the union of the
    given edge-type groups (with replacement, like the reference).

    reference: API_SAMPLE_NB -> Node::SampleNeighbor (euler/core/graph/
    node.h:82, per-edge-type-group CompactWeightedCollection) and the TF op
    SampleNeighbor (tf_euler/python/euler_ops/neighbor_ops.py:33-70).

    Returns (nbr_ids [B,count], weights, types, eids); missing neighbors are
    ``default_id`` with weight 0 / type -1 / eid -1.
    """
    ets = _as_etypes(g, edge_types)
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.sample_neighbor_sharded(g, key, nodes, ets, count,
                                               default_id)
    nodes = jnp.asarray(nodes, jnp.int32)
    B = nodes.shape[0]
    rows = jnp.maximum(nodes, 0)
    kt, kd = jax.random.split(key)

    et_arr = jnp.asarray(ets, jnp.int32)                      # [K]
    W = g.group_w_sum[rows][:, et_arr]                        # [B,K]
    cdf = jnp.cumsum(W, axis=1)
    total = cdf[:, -1]
    r = jax.random.uniform(kt, (B, count)) * total[:, None]
    t_idx = jnp.sum(r[:, :, None] >= cdf[:, None, :], axis=-1)
    t_idx = jnp.minimum(t_idx, len(ets) - 1)
    etype = et_arr[t_idx]                                     # [B,count]

    valid = (nodes >= 0)[:, None] & (total > 0)[:, None]
    if getattr(g, "sample_pack", None) is not None:
        lo, hi = _group_bounds(g, rows[:, None], etype)
        size = hi - lo
        k1, k2 = jax.random.split(kd)
        u1 = jax.random.uniform(k1, (B, count))
        u2 = jax.random.uniform(k2, (B, count))
        slot = jnp.minimum((u1 * size).astype(jnp.int32),
                           jnp.maximum(size - 1, 0))
        row = g.sample_pack[lo + slot]                # ONE read per draw
        prob = jax.lax.bitcast_convert_type(row[..., 0], jnp.float32)
        keep = (u2 < prob)[..., None]
        sel = jnp.where(keep, row[..., 1:5], row[..., 5:9])
        ok = valid & (size > 0)
        nbr = jnp.where(ok, sel[..., 0], default_id)
        ty = jnp.where(ok, sel[..., 1], -1)
        eid = jnp.where(ok, sel[..., 2], -1)
        w = jnp.where(ok, jax.lax.bitcast_convert_type(sel[..., 3],
                                                       jnp.float32), 0.0)
        return nbr, w, ty, eid

    slot = _weighted_group_draw(g, kd, rows[:, None], etype, (B, count))
    ok = (slot >= 0) & valid
    s = jnp.maximum(slot, 0)
    return _fetch_slots(g, s, ok, default_id)


def sample_neighbor_fast(g: GraphTensors, key, nodes: Array, edge_types,
                         count: int, default_id: int = -1,
                         return_types: bool = False):
    """Ids-only weighted neighbor sampling over the packed fan rows.

    The hot path of the sampled dataflows: ONE 128-lane row gather per
    (frontier node, edge type) + ``count`` in-row one-hot picks — measured
    ~10x cheaper than per-draw gathers on TPU v5e, where a random row
    gather costs ~11ns regardless of width (see ops/alias.py FAN_* layout).
    Matches Node::SampleNeighbor's weighted-with-replacement distribution
    (reference: euler/core/graph/node.h:82) exactly for groups with degree
    <= FAN_D; larger groups draw from an exact-marginal reservoir
    (refresh with refresh_fan_pack).

    Returns (nbr_ids [B,count], valid [B,count] bool); with
    ``return_types=True`` additionally the drawn edge's TYPE per draw
    ([B,count], -1 invalid) — free on this path, because the multi-type
    draw already computes which type-group served each draw (the RGCN
    relation feed without the per-draw payload gathers of
    sample_neighbor). Use sample_neighbor for weights/eids.

    Multi-type draws covering ALL edge types prefer the union fan pack
    (``fanu``, one row gather + a lane decode) when the store built it —
    single-chip AND under the mesh (build_sharded stacks per-shard union
    rows whenever the global graph fits the packed-lane encoding).
    """
    ets = _as_etypes(g, edge_types)
    if _is_shard_view(g):
        if getattr(g, "fan_pack", None) is not None or (
                getattr(g, "fanu_pack", None) is not None
                and len(ets) > 1
                and sorted(ets) == list(range(g.meta.num_edge_types))):
            from euler_tpu.parallel import sharded
            return sharded.sample_neighbor_fast_sharded(
                g, key, nodes, ets, count, default_id,
                return_types=return_types)
        nbr, w, ty, eid = sample_neighbor(g, key, nodes, ets, count,
                                          default_id)
        return (nbr, ty >= 0, ty) if return_types else (nbr, ty >= 0)
    use_fanu = (getattr(g, "fanu_pack", None) is not None
                and len(ets) > 1
                and sorted(ets) == list(range(g.meta.num_edge_types)))
    if getattr(g, "fan_pack", None) is None and not use_fanu:
        nbr, w, ty, eid = sample_neighbor(g, key, nodes, ets, count,
                                          default_id)
        return (nbr, ty >= 0, ty) if return_types else (nbr, ty >= 0)
    nodes = jnp.asarray(nodes, jnp.int32)
    B = nodes.shape[0]
    rows = jnp.maximum(nodes, 0)
    ET = g.meta.num_edge_types
    et_arr = jnp.asarray(ets, jnp.int32)
    K = len(ets)

    if use_fanu:
        # union fan row: ONE 128-lane gather per frontier node serves a
        # multi-type draw; lanes pack (etype << FANU_SHIFT) | dst (see
        # alias.py FANU_*). The per-type path below costs K row gathers
        # + a one-hot type contraction — measured as the whole RGCN
        # premium (tools/micro/rgcn_decomp.py)
        from euler_tpu.ops.alias import FANU_MASK, FANU_SHIFT
        packu = g.fanu_pack[rows]                         # [B, 128]
        deg_c = jnp.broadcast_to(packu[:, 0:1], (B, count))
        total = jax.lax.bitcast_convert_type(packu[:, 1], jnp.float32)
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (B, count))
        u2 = jax.random.uniform(k2, (B, count))
        from euler_tpu.ops import pallas_fan
        if pallas_fan.enabled():
            draw = pallas_fan.fan_draw(
                packu, u1, u2,
                interpret=jax.default_backend() != "tpu")
        else:
            slot = jnp.minimum((u1 * deg_c).astype(jnp.int32),
                               jnp.maximum(deg_c - 1, 0))
            oh = (slot[..., None] ==
                  jnp.arange(FAN_D, dtype=jnp.int32)).astype(jnp.int32)
            pick = lambda off: jnp.einsum(
                "bcd,bd->bc", oh, packu[:, off:off + FAN_D])
            prob = jax.lax.bitcast_convert_type(pick(FAN_PROB_OFF),
                                                jnp.float32)
            draw = jnp.where(u2 < prob, pick(FAN_KEPT_OFF),
                             pick(FAN_ALIAS_OFF))
        valid = (nodes >= 0)[:, None] & (deg_c > 0) & (total > 0)[:, None]
        ids = jnp.where(valid, draw & FANU_MASK, default_id)
        if return_types:
            ty = jnp.where(valid, draw >> FANU_SHIFT, -1)
            return ids, valid, ty
        return ids, valid

    packs = g.fan_pack[rows[:, None] * ET + et_arr[None, :]]  # [B,K,128]
    deg = packs[..., 0]                                       # [B,K]
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
        from euler_tpu.ops import pallas_fan
        if pallas_fan.enabled():
            # Pallas VMEM selection kernel — bit-exact vs the jnp path
            # below for the same key (shared u1/u2); interpret mode on
            # non-TPU backends
            ids = pallas_fan.fan_draw(
                packs[:, 0, :], u1, u2,
                interpret=jax.default_backend() != "tpu")
            valid = (nodes >= 0)[:, None] & (deg_c > 0) \
                & (total > 0)[:, None]
            if return_types:
                ty = jnp.where(valid, et_arr[0], -1)
                return jnp.where(valid, ids, default_id), valid, ty
            return jnp.where(valid, ids, default_id), valid
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
        oh = ohk[:, :, :, None] * ohs[:, :, None, :]          # [B,C,K,D]
        pick = lambda bank: jnp.einsum("bckd,bkd->bc", oh, bank)

    prob = jax.lax.bitcast_convert_type(pick(prob_bank), jnp.float32)
    kept = pick(kept_bank)
    alias = pick(alias_bank)
    ids = jnp.where(u2 < prob, kept, alias)
    valid = (nodes >= 0)[:, None] & (deg_c > 0) & (total > 0)[:, None]
    if return_types:
        # the draw's serving type-group IS its edge type — no payload
        # row fetch needed
        ty = et_arr[kidx] if K > 1 else jnp.broadcast_to(
            et_arr[0], ids.shape)
        return (jnp.where(valid, ids, default_id), valid,
                jnp.where(valid, ty, -1))
    return jnp.where(valid, ids, default_id), valid


def refresh_fan_rows(group_ptr, adj_dst, adj_prob, adj_alias, fan_pack,
                     key, over_rows=None):
    """Array-level fan_pack reservoir redraw; returns the new fan_pack.

    Kept separate from :func:`refresh_fan_pack` so callers can jit exactly
    (arrays in, 1 array out) — jitting over the whole GraphTensors would
    round-trip every CSR column through the device as program outputs.

    ``over_rows`` (int32 [K], the groups with degree > FAN_D, precomputed
    at build time — store.GraphTensors.fan_over_rows) restricts the
    redraw to the reservoir rows: exact-alias rows never go stale, and on
    most graphs overflow rows are a small fraction, so the refresh is a
    [K, FAN_D] scatter instead of a full-pack rewrite.
    """
    gp = group_ptr
    E = adj_dst.shape[0]
    k1, k2 = jax.random.split(key)

    if over_rows is not None:
        rows = over_rows                                     # [K]
        lo = gp[rows][:, None]
        deg = (gp[rows + 1] - gp[rows])[:, None]
        K = rows.shape[0]
        if K == 0:
            return fan_pack
        u1 = jax.random.uniform(k1, (K, FAN_D))
        u2 = jax.random.uniform(k2, (K, FAN_D))
        slot = jnp.minimum((u1 * jnp.maximum(deg, 1)).astype(jnp.int32),
                           jnp.maximum(deg - 1, 0))
        idx = jnp.clip(lo + slot, 0, E - 1)
        keep = u2 < adj_prob[idx]
        alias_idx = jnp.clip(lo + adj_alias[idx], 0, E - 1)
        draw = jnp.where(keep, adj_dst[idx], adj_dst[alias_idx])
        fp = fan_pack.at[rows[:, None],
                         FAN_KEPT_OFF + jnp.arange(FAN_D)[None, :]].set(
            draw)
        return fp.at[rows[:, None],
                     FAN_ALIAS_OFF + jnp.arange(FAN_D)[None, :]].set(draw)

    G = gp.shape[0] - 1
    deg = gp[1:] - gp[:-1]                                    # [G]
    over = deg > FAN_D
    u1 = jax.random.uniform(k1, (G, FAN_D))
    u2 = jax.random.uniform(k2, (G, FAN_D))
    safe_deg = jnp.maximum(deg, 1)[:, None]
    slot = jnp.minimum((u1 * safe_deg).astype(jnp.int32), safe_deg - 1)
    idx = gp[:-1][:, None] + slot
    idx = jnp.clip(idx, 0, E - 1)
    keep = u2 < adj_prob[idx]
    alias_idx = jnp.clip(gp[:-1][:, None] + adj_alias[idx], 0, E - 1)
    draw = jnp.where(keep, adj_dst[idx], adj_dst[alias_idx])
    fp = fan_pack
    new_kept = jnp.where(over[:, None], draw,
                         fp[:, FAN_KEPT_OFF:FAN_KEPT_OFF + FAN_D])
    new_alias = jnp.where(over[:, None], draw,
                          fp[:, FAN_ALIAS_OFF:FAN_ALIAS_OFF + FAN_D])
    fp = fp.at[:, FAN_KEPT_OFF:FAN_KEPT_OFF + FAN_D].set(new_kept)
    fp = fp.at[:, FAN_ALIAS_OFF:FAN_ALIAS_OFF + FAN_D].set(new_alias)
    return fp


_refresh_fan_rows_jit = jax.jit(refresh_fan_rows)


def refresh_fan_pack(g: GraphTensors, key) -> GraphTensors:
    """Redraw the reservoir rows of fan_pack (and the union fanu_pack)
    on device (one bulk pass).

    Groups with degree > FAN_D hold FAN_D precomputed i.i.d. draws; calling
    this per epoch (or every RunConfig.reservoir_refresh steps) re-randomizes
    them so long runs see the full neighborhood of high-degree nodes.
    """
    changed = {}
    k1, k2 = jax.random.split(key)
    if getattr(g, "fan_pack", None) is not None:
        changed["fan_pack"] = _refresh_fan_rows_jit(
            g.group_ptr, g.adj_dst, g.adj_prob, g.adj_alias, g.fan_pack,
            k1, getattr(g, "fan_over_rows", None))
    if getattr(g, "fanu_pack", None) is not None:
        changed["fanu_pack"] = _refresh_fan_rows_jit(
            g.fanu_ptr, g.fanu_dst, g.fanu_prob, g.fanu_alias,
            g.fanu_pack, k2, g.fanu_over_rows)
    return g.replace(**changed) if changed else g


def _fetch_slots(g: GraphTensors, s: Array, ok: Array, default_id: int):
    """(nbr, w, type, eid) of CSR slots ``s``, masked by ``ok`` — one
    packed-row read when adj_pack is present (4x fewer random reads)."""
    if getattr(g, "adj_pack", None) is not None:
        pk = g.adj_pack[s]                          # [..., 4]
        nbr = jnp.where(ok, pk[..., 0], default_id)
        ty = jnp.where(ok, pk[..., 1], -1)
        eid = jnp.where(ok, pk[..., 2], -1)
        w = jnp.where(ok, jax.lax.bitcast_convert_type(pk[..., 3],
                                                       jnp.float32), 0.0)
        return nbr, w, ty, eid
    nbr = jnp.where(ok, g.adj_dst[s], default_id)
    w = jnp.where(ok, g.adj_w[s], 0.0)
    ty = jnp.where(ok, g.adj_type[s], -1)
    eid = jnp.where(ok, g.adj_eid[s], -1)
    return nbr, w, ty, eid


def get_full_neighbor(g: GraphTensors, nodes: Array, edge_types, cap: int,
                      default_id: int = -1, sorted_by_id: bool = False,
                      offset: int = 0):
    """Padded full neighborhood over the union of edge-type groups.

    reference: API_GET_NB_NODE GetFullNeighbor / GetSortedFullNeighbor
    (euler/core/graph/node.h:87-99); the reference returns a SparseTensor,
    here a fixed [B, cap] block + mask (jit-static shape). Neighbors beyond
    ``cap`` are dropped (weight-descending order is NOT applied — use
    get_top_k_neighbor for that). ``offset`` starts the window at
    concatenated-neighborhood position ``offset`` instead of 0, so
    callers can cover arbitrarily large neighborhoods in cap-sized
    windows with static shapes (random_walk's chunked-exact node2vec
    reweighting).
    """
    ets = _as_etypes(g, edge_types)
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.get_full_neighbor_sharded(g, nodes, ets, cap,
                                                 default_id, sorted_by_id,
                                                 offset)
    nodes = jnp.asarray(nodes, jnp.int32)
    B = nodes.shape[0]
    rows = jnp.maximum(nodes, 0)
    et_arr = jnp.asarray(ets, jnp.int32)
    lo, hi = _group_bounds(g, rows[:, None], et_arr[None, :])  # [B,K]
    deg = hi - lo
    offs = jnp.concatenate(
        [jnp.zeros((B, 1), deg.dtype), jnp.cumsum(deg, axis=1)], axis=1)
    total = offs[:, -1]

    j = offset + jnp.arange(cap, dtype=jnp.int32)             # [cap]
    # group k owns positions [offs[k], offs[k+1])
    k_idx = jnp.sum(j[None, :, None] >= offs[:, None, 1:], axis=-1)
    k_idx = jnp.minimum(k_idx, len(ets) - 1)
    base = jnp.take_along_axis(lo, k_idx, axis=1)
    off_k = jnp.take_along_axis(offs[:, :-1], k_idx, axis=1)
    slot = base + (j[None, :] - off_k)
    ok = (j[None, :] < total[:, None]) & (nodes >= 0)[:, None]
    s = jnp.clip(slot, 0, g.adj_dst.shape[0] - 1)
    nbr, w, ty, eid = _fetch_slots(g, s, ok, default_id)
    if sorted_by_id:
        sort_key = jnp.where(ok, nbr, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(sort_key, axis=1)
        take = lambda x: jnp.take_along_axis(x, order, axis=1)
        nbr, w, ty, eid, ok = take(nbr), take(w), take(ty), take(eid), take(ok)
    return nbr, w, ty, eid, ok


def get_top_k_neighbor(g: GraphTensors, nodes: Array, edge_types, k: int,
                       cap: int = None, default_id: int = -1):
    """Top-k neighbors by edge weight (reference: API_GET_NB_NODE TopK,
    node.h:100; tf op GetTopKNeighbor)."""
    cap = cap or max(k, 16)
    nbr, w, ty, eid, ok = get_full_neighbor(g, nodes, edge_types, cap,
                                            default_id)
    neg = jnp.where(ok, w, -jnp.inf)
    _, idx = jax.lax.top_k(neg, k)
    take = lambda x: jnp.take_along_axis(x, idx, axis=1)
    nbr, w, ty, eid, ok = take(nbr), take(w), take(ty), take(eid), take(ok)
    nbr = jnp.where(ok, nbr, default_id)
    return nbr, jnp.where(ok, w, 0.0), jnp.where(ok, ty, -1), \
        jnp.where(ok, eid, -1), ok


# ---------------------------------------------------------------------------
# in-neighbor verbs over the in-CSR (stores built with has_in_edges=True)
# ---------------------------------------------------------------------------

def _require_in_csr(g, name):
    if getattr(g, "in_group_ptr", None) is None:
        raise ValueError(
            f"{name} needs the in-adjacency: build the graph with "
            "has_in_edges=True (GraphMeta.has_in_edges)")


def _in_group_bounds(g: GraphTensors, rows: Array, etype: Array):
    gidx = rows * g.meta.num_edge_types + etype
    return g.in_group_ptr[gidx], g.in_group_ptr[gidx + 1]


def _fetch_in_slots(g: GraphTensors, s: Array, ty: Array, ok: Array,
                    default_id: int):
    nbr = jnp.where(ok, g.in_adj_src[s], default_id)
    w = jnp.where(ok, g.in_adj_w[s], 0.0)
    eid = jnp.where(ok, g.in_adj_eid[s], -1)
    return nbr, w, jnp.where(ok, ty, -1), eid


def sample_in_neighbor(g: GraphTensors, key, nodes: Array, edge_types,
                       count: int, default_id: int = -1):
    """Weighted in-neighbor sampling: ``count`` draws per node over the
    union of (dst=node, etype) in-groups.

    reference: Node::SampleInNeighbor (euler/core/graph/node.h:87-112, the
    in-edge mirror of SampleNeighbor). Same O(1) per-group alias draws as
    the out verb, over the in-CSR built at load time.
    """
    _require_in_csr(g, "sample_in_neighbor")
    ets = _as_etypes(g, edge_types)
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.sample_in_neighbor_sharded(g, key, nodes, ets,
                                                  count, default_id)
    nodes = jnp.asarray(nodes, jnp.int32)
    B = nodes.shape[0]
    rows = jnp.maximum(nodes, 0)
    kt, kd = jax.random.split(key)
    et_arr = jnp.asarray(ets, jnp.int32)
    W = g.in_group_w_sum[rows][:, et_arr]
    cdf = jnp.cumsum(W, axis=1)
    total = cdf[:, -1]
    r = jax.random.uniform(kt, (B, count)) * total[:, None]
    t_idx = jnp.minimum(
        jnp.sum(r[:, :, None] >= cdf[:, None, :], axis=-1), len(ets) - 1)
    etype = et_arr[t_idx]
    lo, hi = _in_group_bounds(g, rows[:, None], etype)
    pos = alias_draw(kd, g.in_adj_prob, g.in_adj_alias, lo, hi - lo,
                     (B, count))
    ok = (pos >= 0) & (nodes >= 0)[:, None] & (total > 0)[:, None]
    return _fetch_in_slots(g, jnp.maximum(pos, 0), etype, ok, default_id)


def get_full_in_neighbor(g: GraphTensors, nodes: Array, edge_types,
                         cap: int, default_id: int = -1,
                         sorted_by_id: bool = False):
    """Padded full in-neighborhood, the mirror of get_full_neighbor.
    reference: Node::GetFullInNeighbor / GetSortedFullInNeighbor
    (euler/core/graph/node.h:87-112)."""
    _require_in_csr(g, "get_full_in_neighbor")
    ets = _as_etypes(g, edge_types)
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.get_full_in_neighbor_sharded(
            g, nodes, ets, cap, default_id, sorted_by_id)
    nodes = jnp.asarray(nodes, jnp.int32)
    B = nodes.shape[0]
    rows = jnp.maximum(nodes, 0)
    et_arr = jnp.asarray(ets, jnp.int32)
    lo, hi = _in_group_bounds(g, rows[:, None], et_arr[None, :])  # [B,K]
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
    ok = (j[None, :] < total[:, None]) & (nodes >= 0)[:, None]
    s = jnp.clip(slot, 0, g.in_adj_src.shape[0] - 1)
    nbr, w, ty, eid = _fetch_in_slots(g, s, et_arr[k_idx], ok, default_id)
    if sorted_by_id:
        sort_key = jnp.where(ok, nbr, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(sort_key, axis=1)
        take = lambda x: jnp.take_along_axis(x, order, axis=1)
        nbr, w, ty, eid, ok = (take(nbr), take(w), take(ty), take(eid),
                               take(ok))
    return nbr, w, ty, eid, ok


def get_top_k_in_neighbor(g: GraphTensors, nodes: Array, edge_types, k: int,
                          cap: int = None, default_id: int = -1):
    """Top-k in-neighbors by edge weight (reference: node.h:100-112)."""
    cap = cap or max(k, 16)
    nbr, w, ty, eid, ok = get_full_in_neighbor(g, nodes, edge_types, cap,
                                               default_id)
    neg = jnp.where(ok, w, -jnp.inf)
    _, idx = jax.lax.top_k(neg, k)
    take = lambda x: jnp.take_along_axis(x, idx, axis=1)
    nbr, w, ty, eid, ok = take(nbr), take(w), take(ty), take(eid), take(ok)
    nbr = jnp.where(ok, nbr, default_id)
    return nbr, jnp.where(ok, w, 0.0), jnp.where(ok, ty, -1), \
        jnp.where(ok, eid, -1), ok


def sample_fanout(g: GraphTensors, key, nodes: Array, edge_types_per_hop,
                  counts: Sequence[int], default_id: int = -1):
    """Multi-hop fanout sampling (GraphSAGE inner loop).

    reference: SampleFanout (tf_euler/kernels/sample_fanout_op.cc:30-148),
    which builds a sampleNB GQL chain; here it is a python loop of
    ``sample_neighbor`` calls that unrolls into one XLA program.

    Returns (hop_nodes, hop_weights, hop_types, hop_eids): hop_nodes[0] is
    ``nodes``; hop_nodes[i] has shape [B * prod(counts[:i])].
    """
    nodes = jnp.asarray(nodes, jnp.int32).reshape(-1)
    hop_nodes = [nodes]
    hop_w, hop_ty, hop_eid = [], [], []
    cur = nodes
    for i, (ets, cnt) in enumerate(zip(edge_types_per_hop, counts)):
        key, sub = jax.random.split(key)
        nbr, w, ty, eid = sample_neighbor(g, sub, cur, ets, cnt, default_id)
        cur = nbr.reshape(-1)
        hop_nodes.append(cur)
        hop_w.append(w.reshape(-1))
        hop_ty.append(ty.reshape(-1))
        hop_eid.append(eid.reshape(-1))
    return hop_nodes, hop_w, hop_ty, hop_eid


def get_multi_hop_neighbor(g: GraphTensors, key, nodes: Array,
                           edge_types_per_hop, counts: Sequence[int]):
    """Like the reference's get_multi_hop_neighbor
    (tf_euler/python/euler_ops/neighbor_ops.py:209-242) but with static
    shapes: returns per-hop (frontier, edge_src_pos, edge_dst_nodes, mask)
    where edge arrays describe the sampled bipartite adjacency."""
    hop_nodes, hop_w, *_ = sample_fanout(g, key, nodes, edge_types_per_hop,
                                         counts)
    out = []
    for i, cnt in enumerate(counts):
        src = jnp.repeat(jnp.arange(hop_nodes[i].shape[0]), cnt)
        dst = hop_nodes[i + 1]
        mask = dst >= 0
        out.append((hop_nodes[i + 1], src, dst, mask))
    return out


def sample_layer(g: GraphTensors, key, frontier: Array, edge_types,
                 candidates_per_node: int, n_layer_nodes: int,
                 weight_func="sqrt"):
    """One shared layer sampled from the union of frontier neighborhoods
    (the op behind ``sampleLNB`` / sample_fanout_layerwise).

    reference: API_SAMPLE_L / local_sample_layer_op.cc:94-102 — candidate
    importance = weight_func(summed edge weight), default sqrt. Device
    formulation: candidate pool of weighted draws, Gumbel top-k without
    replacement. Returns (layer_ids [m], layer_weights [m]); -1 padded.
    """
    wf = {"sqrt": jnp.sqrt, "id": lambda x: x,
          "uniform": jnp.ones_like}.get(weight_func, weight_func)
    k1, k2 = jax.random.split(key)
    cand, cw, _, _ = sample_neighbor(g, k1, frontier.reshape(-1),
                                     edge_types, candidates_per_node)
    flat, fw = cand.reshape(-1), cw.reshape(-1)
    score = jnp.where(flat >= 0, wf(jnp.maximum(fw, 0.0)), 0.0)
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(k2, flat.shape, minval=1e-20, maxval=1.0)))
    keyed = jnp.where(score > 0, jnp.log(score) + gumbel, -jnp.inf)
    _, top = jax.lax.top_k(keyed, n_layer_nodes)
    ok = jnp.isfinite(keyed[top])
    return jnp.where(ok, flat[top], -1), jnp.where(ok, fw[top], 0.0)


def sparse_get_adj(g: GraphTensors, nodes: Array, nb_nodes: Array,
                   edge_types):
    """Bipartite adjacency between ``nodes`` [B] and ``nb_nodes`` [M] under
    the given edge types, as a dense [B, M] (connected, weight) pair.

    reference: SparseGetAdj (tf_euler/ops/euler_ops.cc:22,
    euler/core/kernels/sparse_get_adj_op.cc) returning a SparseTensor;
    here a fixed-shape mask — the jit-friendly layout WholeDataFlow
    consumes. Membership tests are binary searches over the per-group
    dst-sorted CSR (the GetSortedFullNeighbor layout, node.h:96).
    """
    ets = _as_etypes(g, edge_types)
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.sparse_get_adj_sharded(g, nodes, nb_nodes, ets)
    nodes = jnp.asarray(nodes, jnp.int32).reshape(-1)
    nb = jnp.asarray(nb_nodes, jnp.int32).reshape(-1)
    rows = jnp.maximum(nodes, 0)
    conn = jnp.zeros((nodes.shape[0], nb.shape[0]), bool)
    w = jnp.zeros((nodes.shape[0], nb.shape[0]), jnp.float32)
    E = g.adj_dst.shape[0]
    for et in ets:
        lo, hi = _group_bounds(g, rows, jnp.full_like(rows, et))  # [B]
        # vectorized per-row binary search: 32 halving steps over [lo,hi)
        B, M = nodes.shape[0], nb.shape[0]
        lo_b = jnp.broadcast_to(lo[:, None], (B, M))
        hi_b = jnp.broadcast_to(hi[:, None], (B, M))
        tgt = jnp.broadcast_to(nb[None, :], (B, M))

        def body(_, carry):
            l, h = carry
            mid = (l + h) // 2
            v = g.adj_dst[jnp.clip(mid, 0, E - 1)]
            go_right = v < tgt
            return jnp.where(go_right, mid + 1, l), \
                jnp.where(go_right, h, mid)

        l, h = jax.lax.fori_loop(0, 32, body, (lo_b, hi_b))
        slot = jnp.clip(l, 0, E - 1)
        hit = (l < hi_b) & (g.adj_dst[slot] == tgt) & \
            (nodes >= 0)[:, None] & (nb >= 0)[None, :]
        conn = conn | hit
        w = jnp.where(hit, g.adj_w[slot], w)
    return conn, w


def _require_graph_members(g, name):
    if getattr(g, "graph_members", None) is None:
        raise ValueError(
            f"{name} needs graph-label membership: the graph must carry a "
            "'graph_label' binary node feature (store.Graph builds the "
            "table; build_sharded replicates it onto the mesh)")


def sample_graph_label(g: GraphTensors, key, count: int) -> Array:
    """Uniformly sample graph indices (graph-classification batches).

    reference: API_SAMPLE_GRAPH_LABEL
    (euler/core/kernels/sample_graph_label_op.cc). Under a mesh the
    graph-membership table is replicated (mutag-scale), so the verb is
    local on every device."""
    _require_graph_members(g, "sample_graph_label")
    G = g.graph_members.shape[0]
    return jax.random.randint(key, (count,), 0, G, dtype=jnp.int32)


def get_graph_by_label(g: GraphTensors, graph_idx: Array):
    """Nodes of each graph as a padded block + flattened graph index.

    reference: API_GET_GRAPH_BY_LABEL (get_graph_by_label_op.cc) returning
    SparseTensor graph->nodes; here (node_ids [B,maxN], mask [B,maxN],
    node_graph_idx [B*maxN]). Works identically under a mesh: the
    membership table is replicated, and the returned (global) node ids
    feed the sharded feature/neighbor verbs.
    """
    _require_graph_members(g, "get_graph_by_label")
    members = g.graph_members[graph_idx]          # [B, maxN]
    mask = members >= 0
    B, maxN = members.shape
    node_graph_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), maxN)
    return members, mask, node_graph_idx


def get_node_type(g: GraphTensors, nodes: Array) -> Array:
    """reference: API_GET_NODE_T (type_ops.py)."""
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.get_node_type_sharded(g, nodes)
    nodes = jnp.asarray(nodes, jnp.int32)
    return jnp.where(nodes >= 0, g.node_type[jnp.maximum(nodes, 0)], -1)
