"""Random walks + skip-gram pair generation.

TPU-native counterpart of the reference's walk ops
(reference: tf_euler/kernels/random_walk_op.cc:34-140 — iterative node2vec
with p/q reweighting via per-step full-neighbor queries and a fresh
CompactWeightedCollection per root — and gen_pair_op.cc:28-96).

The reference walks on the host, one GQL round-trip per step. Here the walk
is a fused device program: the p=q=1 fast path is one weighted CSR draw per
step; the node2vec-biased path uses vectorized rejection sampling with a
branch-free binary-search membership test over the dst-sorted CSR groups
(SURVEY.md §7 "Random-walk with p/q").
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from euler_tpu.graph.store import GraphTensors
from euler_tpu.ops.dispatch import is_shard_view as _is_shard_view
from euler_tpu.ops.sampling import _as_etypes, _group_bounds, \
    _weighted_group_draw, sample_neighbor

Array = jnp.ndarray

_REJECT_TRIES = 8  # fixed unroll for node2vec rejection sampling


def _is_neighbor(g: GraphTensors, src: Array, etypes, cand: Array) -> Array:
    """Membership test cand ∈ N_etype(src), vectorized binary search.

    Groups are dst-sorted at conversion time (store.py layout), so each
    (src, etype) group supports an O(log deg) search — the device analogue
    of the reference's sorted-merge in BuildWeights
    (random_walk_op.cc BuildWeights)."""
    if _is_shard_view(g):
        from euler_tpu.parallel import sharded
        return sharded.is_neighbor_sharded(g, src, etypes, cand)
    found = jnp.zeros(src.shape, bool)
    for t in etypes:
        lo, hi = _group_bounds(g, src, jnp.int32(t))
        lo0, hi0 = lo, hi

        def body(_, lh):
            lo, hi = lh
            mid = (lo + hi) // 2
            v = g.adj_dst[jnp.clip(mid, 0, g.adj_dst.shape[0] - 1)]
            active = lo < hi
            go_right = active & (v < cand)
            return (jnp.where(go_right, mid + 1, lo),
                    jnp.where(active & ~go_right, mid, hi))

        lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
        pos = jnp.clip(lo, 0, g.adj_dst.shape[0] - 1)
        hit = (lo < hi0) & (lo >= lo0) & (g.adj_dst[pos] == cand)
        found = found | hit
    return found


def random_walk(g: GraphTensors, key, nodes: Array, edge_types,
                walk_len: int, p: float = 1.0, q: float = 1.0,
                default_id: int = -1, exact: bool = True,
                bias_cap: int = 64, bias_windows: int = 1) -> Array:
    """Walk ``walk_len`` steps from each node; returns [B, walk_len+1].

    ``edge_types`` is a tuple of edge-type ids/names used for every step, or
    a per-step list of such tuples (matching the reference API,
    tf_euler/python/euler_ops/walk_ops.py:30-43). Dead ends emit
    ``default_id`` from that step on (random_walk_op.cc default_node).

    Biased (node2vec) steps: with ``exact=True`` (default) each step
    reweights the neighborhood by the p/q factor and draws via
    Gumbel-max — the reference's exact per-step BuildWeights semantics
    (random_walk_op.cc:113-140). The reweighting covers the first
    ``bias_cap * bias_windows`` neighbors, streamed in ``bias_windows``
    cap-sized windows with a running Gumbel-argmax (shapes stay static;
    Gumbel noise is drawn fresh per window, so the windowed maximum is
    distributed exactly like one draw over the concatenation): size
    ``bias_windows`` to the graph's max degree for full exactness —
    :func:`check_bias_cap` reports host-side whether the cap binds and
    how many windows exactness needs. Degrees beyond the covered span
    truncate (deviation quantified in tests/test_walk.py).
    ``exact=False`` uses O(1) rejection sampling with forced acceptance
    after 8 tries, which skews toward the unbiased proposal for walkers
    with low acceptance probability (quantified in tests/test_walk.py).
    """
    nodes = jnp.asarray(nodes, jnp.int32).reshape(-1)
    if edge_types and isinstance(edge_types, (list,)) and \
            isinstance(edge_types[0], (list, tuple)):
        per_step = [_as_etypes(g, e) for e in edge_types]
        if len(per_step) != walk_len:
            raise ValueError("per-step edge_types must have len == walk_len")
    else:
        per_step = [_as_etypes(g, edge_types)] * walk_len

    B = nodes.shape[0]
    out = [nodes]
    prev = jnp.full((B,), -1, jnp.int32)
    cur = nodes
    biased = not (p == 1.0 and q == 1.0)
    max_m = max(1.0 / p, 1.0, 1.0 / q)

    for step in range(walk_len):
        key, sub = jax.random.split(key)
        ets = per_step[step]
        if not biased:
            nbr, _, _, _ = sample_neighbor(g, sub, cur, ets, 1, default_id)
            nxt = nbr[:, 0]
        elif exact:
            # exact per-step reweighting over the neighborhood, streamed
            # in bias_cap-sized windows with a running Gumbel-argmax:
            # m(c) = 1/p if c==prev, 1 if c in N(prev), 1/q otherwise;
            # draw ~ w*m via Gumbel-max (BuildWeights semantics)
            from euler_tpu.ops.sampling import get_full_neighbor
            best = jnp.full((B,), -jnp.inf)
            nxt = jnp.full((B,), default_id, jnp.int32)
            for win in range(bias_windows):
                nbr, w, _, _, ok = get_full_neighbor(
                    g, cur, ets, bias_cap, default_id,
                    offset=win * bias_cap)
                prev_b = jnp.broadcast_to(prev[:, None], nbr.shape)
                is_prev = (nbr == prev_b) & (prev >= 0)[:, None]
                in_pn = _is_neighbor(g, jnp.maximum(prev_b, 0), ets,
                                     nbr).reshape(nbr.shape) & \
                    (prev >= 0)[:, None]
                m = jnp.where(is_prev, 1.0 / p,
                              jnp.where(in_pn, 1.0, 1.0 / q))
                m = jnp.where(prev[:, None] >= 0, m, 1.0)
                score = jnp.where(ok & (w > 0),
                                  jnp.log(jnp.maximum(w, 1e-30))
                                  + jnp.log(m), -jnp.inf)
                gmb = -jnp.log(-jnp.log(jax.random.uniform(
                    jax.random.fold_in(sub, win), nbr.shape,
                    minval=1e-20, maxval=1.0)))
                sc = jnp.where(jnp.isfinite(score), score + gmb, -jnp.inf)
                pick = jnp.argmax(sc, axis=1)
                val = jnp.max(sc, axis=1, initial=-jnp.inf)
                better = val > best
                nxt = jnp.where(better,
                                jnp.take_along_axis(nbr, pick[:, None],
                                                    axis=1)[:, 0], nxt)
                best = jnp.maximum(best, val)
        else:
            # rejection sampling: candidate ~ w; accept w.p. m(c)/max_m,
            # m(c) = 1/p if c==prev, 1 if c in N(prev), 1/q otherwise.
            chosen = jnp.full((B,), default_id, jnp.int32)
            done = jnp.zeros((B,), bool)
            for t in range(_REJECT_TRIES):
                sub, k1, k2 = jax.random.split(sub, 3)
                cand, _, _, _ = sample_neighbor(g, k1, cur, ets, 1,
                                                default_id)
                cand = cand[:, 0]
                is_prev = cand == prev
                in_pn = _is_neighbor(g, jnp.maximum(prev, 0), ets, cand) & \
                    (prev >= 0)
                m = jnp.where(is_prev, 1.0 / p,
                              jnp.where(in_pn, 1.0, 1.0 / q))
                accept = (jax.random.uniform(k2, (B,)) < m / max_m) | \
                    (prev < 0)
                take = (~done) & (accept | (t == _REJECT_TRIES - 1)) & \
                    (cand >= 0)
                chosen = jnp.where(take, cand, chosen)
                done = done | take | (cand < 0)
            nxt = chosen
        nxt = jnp.where(cur >= 0, nxt, default_id)
        out.append(nxt)
        prev, cur = cur, nxt
    return jnp.stack(out, axis=1)


def check_bias_cap(graph_or_tensors, edge_types, bias_cap: int = 64,
                   bias_windows: int = 1, warn: bool = True):
    """Host-side exactness check for node2vec's windowed reweighting.

    Returns ``(max_union_degree, windows_needed, n_truncated_nodes)``
    over the union of ``edge_types`` groups, computed from the CSR
    pointers with numpy (cannot run under jit — call it at model/
    estimator setup). With ``warn=True`` emits a warning when
    ``bias_cap * bias_windows`` truncates any node, naming the
    ``bias_windows`` value that makes the walk exact (the runtime
    counterpart of the reference's always-exact host-side BuildWeights,
    random_walk_op.cc:113-140).
    """
    import numpy as np
    g = getattr(graph_or_tensors, "tensors", graph_or_tensors)
    ets = _as_etypes(g, edge_types)
    gp = np.asarray(g.group_ptr)
    ET = g.meta.num_edge_types
    deg = (gp[1:] - gp[:-1]).reshape(-1, ET)        # [N, ET]
    union = deg[:, list(ets)].sum(axis=1)
    max_deg = int(union.max(initial=0))
    span = bias_cap * bias_windows
    n_trunc = int((union > span).sum())
    need = max(1, -(-max_deg // bias_cap))
    if warn and n_trunc:
        import warnings
        warnings.warn(
            f"node2vec bias reweighting covers {span} neighbors but "
            f"{n_trunc} node(s) have union degree up to {max_deg}; the "
            f"walk distribution deviates there. Pass bias_windows="
            f"{need} (with bias_cap={bias_cap}) for exactness.",
            stacklevel=2)
    return max_deg, need, n_trunc


def gen_pair(paths: Array, left_win_size: int, right_win_size: int) -> Array:
    """Skip-gram (center, context) pairs from walks; [B, pair_count, 2].

    Exact pair layout of the reference (gen_pair_op.cc:60-77): for each
    position j, left contexts j-1..j-lw then right contexts j+1..j+rw, with
    out-of-range pairs dropped (the output is dense, not padded — pair_count
    is the same closed form as gen_pair_op.cc:47-55).
    """
    B, L = paths.shape
    pairs = []
    for j in range(L):
        for k in range(left_win_size):
            if j - k - 1 >= 0:
                pairs.append((j, j - k - 1))
        for k in range(right_win_size):
            if j + k + 1 < L:
                pairs.append((j, j + k + 1))
    ctr = jnp.asarray([a for a, _ in pairs], jnp.int32)
    ctx = jnp.asarray([b for _, b in pairs], jnp.int32)
    return jnp.stack([paths[:, ctr], paths[:, ctx]], axis=-1)
