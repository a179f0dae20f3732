"""Alias-method weighted sampling.

TPU-native counterpart of the reference's O(1) global samplers
(reference: euler/common/alias_method.h:28 ``AliasMethod::Init/Next`` and
euler/common/fast_weighted_collection.h:28). Tables are built once on the
host at graph-load time (numpy, O(n)); draws are branch-free vectorized
device code — two uniforms + two gathers per sample, ideal for the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_alias_table(weights: np.ndarray):
    """Build (prob, alias) arrays for Vose's alias method.

    prob[i]  : probability of keeping slot i on the first draw
    alias[i] : slot used otherwise
    Empty input yields empty tables. Zero/negative total weight falls back to
    uniform (matching the reference's behavior of normalizing sums).
    """
    w = np.asarray(weights, np.float64)
    n = len(w)
    if n == 0:
        return np.zeros(0, np.float32), np.zeros(0, np.int32)
    if n > 4096:  # native fast path for big tables
        from euler_tpu.native import loader as _native
        res = _native.build_alias_native(w.astype(np.float32))
        if res is not None:
            return res
    total = w.sum()
    if not np.isfinite(total) or total <= 0:
        w = np.ones(n, np.float64)
        total = float(n)
    p = w * (n / total)
    prob = np.ones(n, np.float64)
    alias = np.arange(n, dtype=np.int32)
    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]
    while small and large:
        s, l = small.pop(), large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = (p[l] + p[s]) - 1.0
        (small if p[l] < 1.0 else large).append(l)
    return prob.astype(np.float32), alias


def build_typed_alias_tables(type_of: np.ndarray, weights: np.ndarray,
                             num_types: int):
    """Per-type alias tables over a typed population, concatenated.

    Mirrors the reference's per-node-type/per-edge-type global samplers
    (euler/core/graph/graph.h:203-208 ``BuildGlobalSampler``).

    Returns dict of numpy arrays:
      ids      int32 [n]  — population sorted by type (values = member index)
      type_ptr int64 [num_types+1]
      prob     f32   [n]
      alias    int32 [n]  — *within-type* alias slot
      w_sum    f32   [num_types] — per-type total weight (used for
                 proportional cross-shard root sampling,
                 reference: euler/client/query_proxy.cc:93-145)
    """
    n = len(type_of)
    order = np.argsort(type_of, kind="stable").astype(np.int32)
    sorted_types = type_of[order]
    type_ptr = np.searchsorted(sorted_types, np.arange(num_types + 1)).astype(
        np.int64)
    prob = np.zeros(n, np.float32)
    alias = np.zeros(n, np.int32)
    w_sum = np.zeros(num_types, np.float32)
    for t in range(num_types):
        lo, hi = type_ptr[t], type_ptr[t + 1]
        p, a = build_alias_table(weights[order[lo:hi]])
        prob[lo:hi] = p
        alias[lo:hi] = a
        w_sum[t] = float(weights[order[lo:hi]].sum())
    return dict(ids=order, type_ptr=type_ptr, prob=prob, alias=alias,
                w_sum=w_sum)


def build_group_alias(group_ptr: np.ndarray, weights: np.ndarray):
    """Per-CSR-group alias tables: one Vose table per group segment.

    Replaces the per-neighbor-group CDF sampler of the reference
    (compact_weighted_collection.h:54-100) with O(1) alias draws — on
    device a CDF draw is a log2(E) chain of random HBM reads
    (searchsorted), while an alias draw is two. Returns
    (prob f32 [E], alias int32 [E]); ``alias`` holds *within-group* slots.
    """
    gp = np.asarray(group_ptr, np.int64)
    w = np.asarray(weights, np.float32)
    from euler_tpu.native import loader as _native
    res = _native.build_group_alias_native(gp, w)
    if res is not None:
        return res
    m = len(w)
    prob = np.ones(m, np.float32)
    alias = np.zeros(m, np.int32)
    for k in range(len(gp) - 1):
        a, b = gp[k], gp[k + 1]
        if b > a:
            p, al = _vose(w[a:b].astype(np.float64))
            prob[a:b] = p
            alias[a:b] = al
    return prob, alias


def _vose(w: np.ndarray):
    """Plain-python Vose build (fallback when the native core is absent)."""
    n = len(w)
    total = w.sum()
    p = (w * (n / total)) if (np.isfinite(total) and total > 0) \
        else np.ones(n)
    prob = np.ones(n, np.float32)
    alias = np.arange(n, dtype=np.int32)
    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]
    while small and large:
        s, l = small.pop(), large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = (p[l] + p[s]) - 1.0
        (small if p[l] < 1.0 else large).append(l)
    return prob, alias


# --------------------------------------------------------------------------
# per-group packed "fan rows": the hot-path neighbor-sampling layout.
#
# Measured on TPU v5e: a random row gather costs ~11ns regardless of row
# width (latency-bound, up to 128 lanes), while in-register one-hot
# selection over a fetched row is ~free. So the fastest possible weighted
# neighbor draw packs a whole per-(node, edge_type) alias table into ONE
# 128-lane row: sampling `count` neighbors of a node costs ONE row gather
# (per frontier node) + `count` in-row one-hot picks, instead of one row
# gather PER DRAW (the sample_pack path, kept for the exact full verbs).
#
# Row layout (int32 lanes):
#   lane 0                      : effective degree (0 = empty group)
#   lane 1                      : group weight-sum, f32 bits
#   lanes  2..44  (FAN_D = 42)  : alias keep-probability, f32 bits
#   lanes 44..86                : kept neighbor id per slot
#   lanes 86..128               : alias neighbor id per slot
#
# Groups with degree <= FAN_D store their exact Vose alias table (draws are
# exactly the reference's weighted-with-replacement distribution,
# euler/core/graph/node.h:82). Larger groups store a RESERVOIR of FAN_D
# i.i.d. draws from the exact distribution (prob=1): each runtime draw picks
# uniformly among them, so the per-draw marginal stays exact, but draws
# share the reservoir until it is refreshed (see store.Graph.refresh_fan_
# reservoir / estimator RunConfig.reservoir_refresh).
# --------------------------------------------------------------------------

FAN_D = 42
FAN_LANES = 128
FAN_PROB_OFF = 2
FAN_KEPT_OFF = FAN_PROB_OFF + FAN_D
FAN_ALIAS_OFF = FAN_KEPT_OFF + FAN_D

# Union fan rows (the "fanu" pack): ONE row per NODE over the union of
# all edge types, kept/alias lanes packing (etype << FANU_SHIFT) | dst.
# Fits graphs with < 2^27 nodes and <= 16 edge types (papers100M's 111M
# nodes just fit); multi-type draws cost ONE row gather + a decode
# instead of ET row gathers + a one-hot type contraction — the K=4 fan
# gather was the entire RGCN-family premium on chip
# (tools/micro/rgcn_decomp.py: 1.87 vs 0.52 ms for the hop-2 call).
FANU_SHIFT = 27
FANU_MASK = (1 << FANU_SHIFT) - 1
FANU_MAX_TYPES = 16


def build_fan_pack(group_ptr: np.ndarray, adj_dst: np.ndarray,
                   prob: np.ndarray, alias: np.ndarray,
                   group_w_sum: np.ndarray, seed: int = 0) -> np.ndarray:
    """Build the [G, 128] fan rows from per-group alias tables.

    group_ptr [G+1], adj_dst/prob/alias [E] (alias = within-group slots),
    group_w_sum [G] f32. Returns int32 [G, FAN_LANES].
    """
    gp = np.asarray(group_ptr, np.int64)
    G = len(gp) - 1
    E = len(adj_dst)
    deg = np.diff(gp)
    adj_dst = np.asarray(adj_dst, np.int32)
    pack = np.zeros((G, FAN_LANES), np.int32)
    pack[:, 1] = np.asarray(group_w_sum, np.float32).reshape(-1).view(
        np.int32)

    seg = np.repeat(np.arange(G, dtype=np.int64), deg)
    j = np.arange(E, dtype=np.int64) - gp[seg]

    small = (deg <= FAN_D)
    sel = small[seg]
    rows, cols = seg[sel], j[sel]
    pack[rows, FAN_PROB_OFF + cols] = np.asarray(prob, np.float32)[sel].view(
        np.int32)
    pack[rows, FAN_KEPT_OFF + cols] = adj_dst[sel]
    alias_global = gp[seg] + np.asarray(alias, np.int64)
    pack[rows, FAN_ALIAS_OFF + cols] = adj_dst[alias_global[sel]]
    pack[small, 0] = deg[small]

    big = np.nonzero(~small)[0]
    if len(big):
        pack[big] = _fan_reservoir_rows(
            gp, adj_dst, prob, alias_global, big,
            np.asarray(group_w_sum, np.float32).reshape(-1)[big],
            np.random.default_rng(seed))
    return pack


def _fan_reservoir_rows(gp, adj_dst, prob, alias_global, big, w_sum, rng):
    """FAN_D i.i.d. exact alias draws per overflow group (prob=1 rows)."""
    n = len(big)
    deg = (gp[big + 1] - gp[big])[:, None]
    lo = gp[big][:, None]
    u1 = rng.random((n, FAN_D))
    u2 = rng.random((n, FAN_D))
    s = np.minimum((u1 * deg).astype(np.int64), deg - 1)
    idx = lo + s
    keep = u2 < np.asarray(prob, np.float32)[idx]
    res = np.where(keep, adj_dst[idx], adj_dst[alias_global[idx]])
    rows = np.zeros((n, FAN_LANES), np.int32)
    rows[:, 0] = FAN_D
    rows[:, 1] = w_sum.view(np.int32)
    rows[:, FAN_PROB_OFF:FAN_PROB_OFF + FAN_D] = \
        np.float32(1.0).view(np.int32)
    rows[:, FAN_KEPT_OFF:FAN_KEPT_OFF + FAN_D] = res
    rows[:, FAN_ALIAS_OFF:FAN_ALIAS_OFF + FAN_D] = res
    return rows


def alias_draw(key, prob, alias, segment_start, segment_size, shape):
    """Draw ``shape`` samples from the alias table segment.

    segment_start/segment_size may be traced scalars (per-type segments).
    Returns int32 indices in [segment_start, segment_start + segment_size)
    into the table's population array; -1 where segment is empty.
    """
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, shape)
    u2 = jax.random.uniform(k2, shape)
    size = jnp.maximum(segment_size, 1)
    slot = jnp.minimum((u1 * size).astype(jnp.int32), size - 1)
    idx = segment_start + slot
    keep = u2 < prob[idx]
    picked = jnp.where(keep, slot, alias[idx])
    out = segment_start + picked
    return jnp.where(segment_size > 0, out, -1).astype(jnp.int32)


def alias_draw_packed(key, alias_pack, segment_start, segment_size, shape):
    """alias_draw over the interleaved [n, 2] (alias, prob-bits) pack:
    one random row read instead of two column gathers (random 4-byte
    gathers each cost a full HBM line on TPU)."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, shape)
    u2 = jax.random.uniform(k2, shape)
    size = jnp.maximum(segment_size, 1)
    slot = jnp.minimum((u1 * size).astype(jnp.int32), size - 1)
    row = alias_pack[segment_start + slot]           # [..., 2]
    prob = jax.lax.bitcast_convert_type(row[..., 1], jnp.float32)
    picked = jnp.where(u2 < prob, slot, row[..., 0])
    out = segment_start + picked
    return jnp.where(segment_size > 0, out, -1).astype(jnp.int32)
